package graft.queries

import java.nio.file.Files

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Property checks for the two cross-set sketch operators beyond the hash
  * oracle: the log-histogram quantile sketch's worst-case relative-error
  * bound and mergeability (the property that makes it a SKETCH — shard
  * count-vectors add), and the KMV overlap estimator's exact-when-
  * unsaturated contract plus estimate quality on a planted-overlap corpus.
  */
class SketchSpec extends SparkSpec {

  private def run(name: String, dir: String) =
    graft.Registry.all.find(_.name == name).get.run(spark, dir)

  /** Write a documents.parquet with the given (doc_id, text, lang, source,
    * n_chars) rows and return the dir.
    */
  private def corpus(rows: Seq[(Long, String, String, String, Long)]): String = {
    val dir = Files.createTempDirectory("graft_sketch_").toString
    import spark.implicits._
    rows.toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.parquet(s"$dir/documents.parquet")
    dir
  }

  test("q138 estimates honor the gamma=2^(1/8) relative-error bound") {
    // worst case: bid >= 16 buckets have width 2^(L-3) and lower bound
    // (8+m)*2^(L-3), so |rep - x| <= width/2 and rel err <= 1/(2*(8+m))
    // <= 1/16; bids < 16 are exact. The bound must hold on ANY corpus —
    // checked on a synthetic one spanning five orders of magnitude.
    val rows = (1L to 2000L).map { i =>
      val len = (math.pow(1.31, (i % 97).toDouble) + i % 13).toLong max 1L
      (i, "x", s"l${i % 3}", "s0", len)
    }
    val dir = corpus(rows)
    val out = run("q138_logq_sketch", dir).collect()
    assert(out.nonEmpty)
    for (r <- out) {
      val err = r.getAs[Long]("max_err_ppm")
      assert(err <= 62500L, s"lang ${r.get(0)}: max_err_ppm $err > 1/16")
    }
  }

  test("q138 sketch buckets merge by addition across shards") {
    // The scale claim: per-shard bucket count-vectors ADD to the corpus
    // sketch. Rebuild the bucket histogram on two disjoint halves and on
    // the union; the merged (summed) histogram must equal the union's —
    // and therefore every quantile estimate derived from it.
    val mk = (ids: Seq[Long]) =>
      corpus(ids.map(i => (i, "x", "en", "s0", (i * 37) % 4001 + 1)))
    val all = (1L to 1200L)
    val (a, b) = all.partition(_ % 2 == 0)
    def buckets(dir: String) = {
      val vh = graft.Tables(spark, dir, "documents")
        .filter(col("n_chars") > 0)
        .select(col("n_chars").cast("long").as("w"))
        .withColumn("bid", graft.functions.LogHistogram.bid("w"))
        .groupBy("bid").agg(count(lit(1)).as("c"))
      vh.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    }
    val (bu, ba, bb) = (buckets(mk(all)), buckets(mk(a)), buckets(mk(b)))
    val merged = (ba.keySet ++ bb.keySet).map(k =>
      k -> (ba.getOrElse(k, 0L) + bb.getOrElse(k, 0L))).toMap
    assert(merged == bu, "shard bucket counts do not add to the union's")
  }

  test("q139 is exact when the union sketch is unsaturated") {
    // two sources, 30 + 30 words with 10 shared: union 50 < k=64, so the
    // estimator must return the EXACT union/intersection/Jaccard.
    val w = (i: Int) => s"w$i"
    val ta = (0 until 30).map(w).mkString(" ")             // w0..w29
    val tb = (20 until 50).map(w).mkString(" ")            // w20..w49
    val dir = corpus(Seq(
      (1L, ta, "en", "sa", ta.length.toLong),
      (2L, tb, "en", "sb", tb.length.toLong)))
    val r = run("q139_kmv_overlap", dir).collect()
    assert(r.length == 1)
    val row = r.head
    assert(row.getAs[Long]("n1") == 30 && row.getAs[Long]("n2") == 30)
    assert(row.getAs[Long]("exact_inter") == 10)
    assert(row.getAs[Long]("u_sz") == 50)
    assert(row.getAs[Long]("est_union") == 50)
    assert(row.getAs[Long]("boths") == 10)
    assert(row.getAs[Long]("est_inter") == 10)
    assert(row.getAs[Long]("est_jacc_ppm") == 200000L)
    assert(row.getAs[Long]("jacc_err_ppm") == 0L)
  }

  test("q139 saturated estimate lands near a planted 1/3 Jaccard") {
    // 1000 + 1000 words, 500 shared: exact Jaccard = 500/1500 = 1/3.
    // Deterministic md5 hashes -> a fixed estimate; KMV stderr at k=64 is
    // ~ J/sqrt(k) ≈ 4 ppt, assert within ±3 sigma (±12.5 ppt) so the
    // check pins estimator sanity, not one lucky draw.
    val w = (i: Int) => s"word$i"
    val ta = (0 until 1000).map(w).mkString(" ")           // 0..999
    val tb = (500 until 1500).map(w).mkString(" ")         // 500..1499
    val dir = corpus(Seq(
      (1L, ta, "en", "sa", ta.length.toLong),
      (2L, tb, "en", "sb", tb.length.toLong)))
    val row = run("q139_kmv_overlap", dir).collect().head
    assert(row.getAs[Long]("exact_jacc_ppm") == 333333L)
    val est = row.getAs[Long]("est_jacc_ppm")
    assert(math.abs(est - 333333L) <= 125000L,
      s"est_jacc_ppm $est implausibly far from planted 333333")
    val estU = row.getAs[Long]("est_union")
    assert(math.abs(estU - 1500L) <= 600L,
      s"est_union $estU implausibly far from exact 1500")
  }
}
