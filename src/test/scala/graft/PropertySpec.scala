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
}
