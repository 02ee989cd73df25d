package graft.queries

import java.nio.file.Files

import graft.SparkSpec
import graft.functions.TextFns
import org.apache.spark.sql.functions._

/** q135 priority-sampling edge semantics (round-8 VERDICT directive #7).
  *
  * The τ estimator depends on the (k+1)-th priority per stratum, so the
  * case that can go hash-unstable cross-engine is a PRIORITY TIE at the
  * rank-k/k+1 boundary: both engines' row_number must break the tie the
  * same way. q135 orders by (pri DESC, doc_id), making the kept set and τ
  * fully deterministic; this suite pins that with fixtures that force
  * exact ties — something the driver corpus can't be relied on to contain.
  *
  * Strata:
  *   - "aa": exactly k+1 = 6 docs whose priorities are ALL equal by
  *     construction (w_i = u_i, so pri = w·10⁶ div u = 10⁶ for every doc).
  *     Every rank is a tie; doc_id must decide membership and τ.
  *   - "bb": 7 zero-weight docs (pri = 0 everywhere) — the degenerate
  *     all-tied stratum; kept set must be the 5 smallest doc_ids, τ = 0,
  *     ŵ = max(0, 0) = 0.
  *   - "cc": 3 docs (≤ k) — no rank k+1 exists, so τ must coalesce to 0
  *     and ŵ = w (inclusion probability 1).
  */
class PrioritySampleSpec extends SparkSpec {

  private val k = 5

  private lazy val tieDir: String = {
    val dir = Files.createTempDirectory("graft_q135_tie_").toString
    import spark.implicits._
    // u exactly as q135 computes it: hash32(doc_id as string) % 1e6 + 1
    val ids = (100L to 105L) ++ (200L to 206L) ++ (300L to 302L)
    val u = ids.toDF("doc_id")
      .select(col("doc_id"),
        (pmod(TextFns.hash32(col("doc_id").cast("string")), lit(1000000)) + 1)
          .as("u"))
      .as[(Long, Long)].collect().toMap
    val rows = ids.map { id =>
      val (lang, w) =
        if (id < 200L) ("aa", u(id)) // pri = w*1e6 div u = exactly 1e6
        else if (id < 300L) ("bb", 0L) // pri = 0
        else ("cc", 40L + id) // ordinary small stratum
      (id, s"doc $id", lang, "src", w)
    }
    rows.toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.parquet(s"$dir/documents.parquet")
    dir
  }

  private lazy val out = graft.SparkEntry
    .queries("q135_priority_sample")(spark, tieDir).cache()

  test("an all-tied stratum of exactly k+1 docs keeps the k smallest " +
    "doc_ids and takes τ from the excluded one") {
    import spark.implicits._
    val aa = out.filter(col("lang") === "aa")
      .select("doc_id", "rn", "pri", "tau", "w_est")
      .as[(Long, Int, Long, Long, Long)].collect().sortBy(_._2)
    assert(aa.map(_._1).toSeq == Seq(100L, 101L, 102L, 103L, 104L),
      s"doc_id tiebreak must keep the smallest ids in id order: ${aa.toSeq}")
    assert(aa.forall(_._3 == 1000000L), s"constructed priorities: ${aa.toSeq}")
    // τ is the 6th (excluded) doc's priority — also 1e6 by construction —
    // and ŵ = max(w, τ) = τ since every w = u ≤ 1e6
    assert(aa.forall(_._4 == 1000000L) && aa.forall(_._5 == 1000000L))
  }

  test("a zero-weight stratum is all-tied at pri 0: smallest ids kept, " +
    "τ = 0, ŵ = 0") {
    import spark.implicits._
    val bb = out.filter(col("lang") === "bb")
      .select("doc_id", "pri", "tau", "w_est")
      .as[(Long, Long, Long, Long)].collect()
    assert(bb.map(_._1).sorted.toSeq == Seq(200L, 201L, 202L, 203L, 204L))
    assert(bb.forall(r => r._2 == 0L && r._3 == 0L && r._4 == 0L), bb.toSeq.toString)
  }

  test("a stratum with ≤ k members has τ = 0 and ŵ = w") {
    import spark.implicits._
    val cc = out.filter(col("lang") === "cc")
      .select("doc_id", "w", "tau", "w_est")
      .as[(Long, Long, Long, Long)].collect()
    assert(cc.map(_._1).sorted.toSeq == Seq(300L, 301L, 302L))
    assert(cc.forall(r => r._3 == 0L && r._4 == r._2), cc.toSeq.toString)
  }
}
