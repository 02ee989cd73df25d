package graft.operators

import graft.functions.TextFns.{tokens, wordNgrams}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The duplicated-span core shared by batch q149 and its streaming twin
  * [[graft.streaming.StreamingSpanMerge]]: positional gram derivation and
  * the tolerance-n island merge that turns duplicated gram-start
  * positions into maximal DISJOINT spans (the removal geometry of
  * exact-substring dedup, Lee et al. 2022, at word granularity).
  */
object DupSpans {

  /** Gram size shared by both renditions (and their oracles). */
  val N = 10

  /** Positional word n-grams of a (doc_id, text) frame, hashed:
    * (doc_id, pos, ng) with pos the 0-based token start. Null/short texts
    * yield no rows (wordNgrams returns [] below N tokens).
    */
  def positionalGrams(docs: DataFrame): DataFrame =
    docs
      .select(col("doc_id"), posexplode(wordNgrams(tokens(col("text")), N)))
      .select(col("doc_id"), col("pos"), xxhash64(col("col")).as("ng"))

  /** Per-doc span statistics over duplicated gram-start positions
    * (doc_id, pos): a start at p covers tokens [p, p+N-1], so two starts
    * belong to one contiguous duplicated region iff they are ≤ N apart —
    * the lag-flag island form (NOT the pos-row_number trick, which only
    * merges adjacent starts and double-counts overlapping spans). Spans
    * are therefore DISJOINT and dup_tokens is the exact duplicated-token
    * count (≤ the doc's token count — spec-pinned).
    *
    * Output: (doc_id, n_spans, dup_tokens, max_span_tokens); docs with no
    * duplicated positions are ABSENT — callers zero-fill.
    *
    * Scale shape: one shuffle by doc_id (both windows and both groupBys
    * share the partitioning); only (doc_id, pos) pairs move.
    */
  def perDocStats(dupPos: DataFrame): DataFrame = {
    val byDoc = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    val cum = byDoc.rowsBetween(Window.unboundedPreceding,
      Window.currentRow)
    dupPos
      .withColumn("newSpan",
        when(col("pos") - lag(col("pos"), 1).over(byDoc) <= N, 0)
          .otherwise(1)) // first row: lag is null → comparison null → 1
      .withColumn("island", sum(col("newSpan")).over(cum))
      .groupBy(col("doc_id"), col("island"))
      .agg(min(col("pos")).as("s0"),
        (max(col("pos")) + lit(N - 1)).as("e0"))
      .select(col("doc_id"),
        (col("e0") - col("s0") + lit(1)).cast("long").as("span_tokens"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_spans"),
        sum(col("span_tokens")).as("dup_tokens"),
        max(col("span_tokens")).as("max_span_tokens"))
  }
}
