package graft

import graft.functions.Tokenize
import org.apache.spark.sql.functions._

/** Property tests from SURVEY §5 (seeded-random instances; the scalacheck
  * bridge artifact is not in the offline cache, so generation is explicit):
  * aggregation invariance under input order, keep-latest ≡ row_number()=1,
  * and tokenizer invariants.
  */
class PropertySpec extends SparkSpec {

  private def cases(seed: Long, n: Int): Seq[(String, Long, Double)] = {
    val rng = new scala.util.Random(seed)
    Seq.fill(n)((s"k${rng.nextInt(6) + 1}", (rng.nextInt(50) + 1).toLong,
      (rng.nextInt(10000) + 1) / 100.0))
  }

  test("window sums are invariant under input order (shuffle-safety)") {
    import spark.implicits._
    for (seed <- 1L to 5L) {
      val rows = cases(seed, 60)
      val shuffled = new scala.util.Random(seed * 31).shuffle(rows)
      def total(xs: Seq[(String, Long, Double)]) = xs.toDF("k", "ts", "v")
        .withColumn("ts", timestamp_seconds(col("ts")))
        .groupBy(window(col("ts"), "10 seconds"), col("k"))
        .agg(sum(col("v").cast("decimal(18,2)")).cast("double").as("s"))
        .collect().map(r => (r.getStruct(0).toString, r.getString(1), r.getDouble(2)))
        .toSet
      assert(total(rows) == total(shuffled), s"seed=$seed")
    }
  }

  test("keepLatest batch oracle picks exactly the max-version row per key") {
    import spark.implicits._
    for (seed <- 10L to 14L) {
      val uniq = cases(seed, 40)
        .groupBy(r => (r._1, r._2)).values.map(_.head).toSeq
      val df = uniq.toDF("k", "ver", "v")
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("k")).orderBy(col("ver").desc)
      val kept = df.withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1).select("k", "ver")
        .collect().map(r => (r.getString(0), r.getLong(1))).toSet
      val expected = uniq.groupBy(_._1).map { case (k, vs) =>
        (k, vs.map(_._2).max)
      }.toSet
      assert(kept == expected, s"seed=$seed")
    }
  }

  test("tokenizer emits no empty tokens and covers all CJK bigrams") {
    val chars = "中文分词器引擎数据"
    val rng = new scala.util.Random(42)
    for (_ <- 1 to 50) {
      val c = Seq.fill(rng.nextInt(6) + 1)(chars(rng.nextInt(chars.length))).mkString
      val l = rng.alphanumeric.take(rng.nextInt(12)).mkString
      val toks = Tokenize.analyze(s"$l $c")
      assert(toks.forall(_.nonEmpty))
      assert(toks.forall(t => t == t.toLowerCase))
      val cjkToks = toks.filter(_.exists(ch =>
        Character.UnicodeScript.of(ch) == Character.UnicodeScript.HAN))
      if (c.length >= 2) assert(cjkToks.size >= c.length - 1, s"c=$c toks=$toks")
    }
  }

  test("RangeOps.groupedRowNumber equals the window form on seeded-random " +
    "skewed instances (all ties, all bucket counts)") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    import graft.operators.RangeOps
    for (seed <- 20L to 24L) {
      val rng = new scala.util.Random(seed)
      // skew knob varies per seed: 50-95% of rows in one group; values
      // drawn from a small domain so ties are everywhere
      val hot = 50 + rng.nextInt(46)
      val rows = (1 to 800).map { i =>
        val g = if (rng.nextInt(100) < hot) "hot" else s"g${rng.nextInt(4)}"
        (i.toLong, g, rng.nextInt(17).toLong)
      }
      val df = rows.toDF("id", "g", "v")
      val nb = 1 + rng.nextInt(12) // bucket count must never change results
      val got = RangeOps.groupedRowNumber(df, "g", "v", Seq("id"), "rn", "n", nb)
        .select("id", "rn", "n").collect()
        .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
      val w = Window.partitionBy(col("g")).orderBy(col("v"), col("id"))
      val exact = df
        .withColumn("rn", row_number().over(w).cast("long"))
        .withColumn("n", count(lit(1)).over(Window.partitionBy(col("g"))))
        .select("id", "rn", "n").collect()
        .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
      assert(got == exact, s"seed=$seed nBuckets=$nb")
    }
  }

  test("RangeOps.groupedValueCounts cum/n satisfy the rank identities on " +
    "seeded-random instances") {
    import spark.implicits._
    import graft.operators.RangeOps
    for (seed <- 30L to 33L) {
      val rng = new scala.util.Random(seed)
      val rows = (1 to 500).map { i =>
        (i.toLong, s"g${rng.nextInt(3)}", rng.nextInt(9))
      }
      val df = rows.toDF("id", "g", "v")
      val roll = RangeOps.groupedValueCounts(df, "g", "v")
        .collect().map(r => (r.getString(0), r.getInt(1),
          r.getLong(2), r.getLong(3), r.getLong(4)))
      val byGroup = rows.groupBy(_._2)
      roll.groupBy(_._1).foreach { case (g, rs) =>
        val vs = byGroup(g).map(_._3)
        // n is the group size on every rollup row; cnt sums to n;
        // cum(v) counts rows with value <= v — the exact rank base
        assert(rs.forall(_._5 == vs.size), s"seed=$seed g=$g")
        assert(rs.map(_._3).sum == vs.size)
        rs.foreach { case (_, v, _, cum, _) =>
          assert(cum == vs.count(_ <= v), s"seed=$seed g=$g v=$v")
        }
      }
    }
  }

  test("DupSpans island merge ≡ brute-force interval union on random " +
    "position sets (tolerance-N correctness, no off-by-one)") {
    import spark.implicits._
    val N = graft.operators.DupSpans.N
    for (seed <- 40L to 47L) {
      val rng = new scala.util.Random(seed)
      // several docs; sparse + dense position mixes, incl. exact-gap edges
      val rows = (1 to 5).flatMap { doc =>
        val ps = Seq.fill(rng.nextInt(30) + 1)(rng.nextInt(120))
          .distinct.sorted
        ps.map(p => (doc.toLong, p))
      }
      val got = graft.operators.DupSpans
        .perDocStats(rows.toDF("doc_id", "pos"))
        .collect()
        .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
          r.getLong(3)))).toMap
      // brute force: union of [p, p+N-1] per doc, then measure segments
      for ((doc, ps) <- rows.groupBy(_._1)) {
        val covered = ps.flatMap(t => t._2 to (t._2 + N - 1)).toSet
        val segs = scala.collection.mutable.ListBuffer.empty[Int]
        var run = 0
        for (i <- 0 to (covered.max + 1)) {
          if (covered(i)) run += 1
          else if (run > 0) { segs += run; run = 0 }
        }
        val (nSpans, dupTokens, maxSpan) = got(doc)
        assert(nSpans == segs.size.toLong, s"seed=$seed doc=$doc spans")
        assert(dupTokens == covered.size.toLong, s"seed=$seed doc=$doc size")
        assert(maxSpan == segs.max.toLong, s"seed=$seed doc=$doc max")
      }
    }
  }
}
