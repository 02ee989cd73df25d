package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.{LinearCounting, LogHistogram}
import graft.functions.TextFns.hash32

/** Streaming twin of the q138 log-histogram quantile sketch — the sketch
  * family's ingest path, and the reason a sketch (not a sort) is the
  * 100 TB quantile answer: bucket counts MERGE BY ADDITION, so the
  * running corpus sketch is literally a streaming aggregation. The bucket
  * id is a stateless in-row projection ([[LogHistogram.bid]], shared with
  * the batch query — one definition site); the keyed state is one count
  * per (stratum, bucket) — bounded by strata × ~100 buckets regardless of
  * how much has been ingested, the same state-size invariance the
  * LSH/decon/ANN twins measure.
  *
  * Quantile ESTIMATES are computed from the stored sketch at serving
  * time ([[estimates]]): windows over the sketch-sized frame, never over
  * raw data — the batch q138's estimate leg minus its exact-audit
  * columns (an exact quantile needs the raw corpus; the sketch is what
  * streams).
  *
  * StreamingSketchSpec proves streamed bucket counts ≡ the batch value
  * histogram and streamed estimates ≡ q138's est columns on the same
  * corpus.
  */
object StreamingSketch {

  /** Running per-(lang, bucket) counts for a streaming (or batch) frame
    * with `lang` and `n_chars` — an update/complete-mode aggregation
    * whose state IS the mergeable sketch.
    */
  def sketch(docs: DataFrame): DataFrame =
    docs
      .filter(col("n_chars").isNotNull && col("n_chars") > 0)
      .select(col("lang"), col("n_chars").cast("long").as("w"))
      .withColumn("bid", LogHistogram.bid("w"))
      .groupBy("lang", "bid")
      .agg(count(lit(1)).as("c"))

  /** Streaming form of q140's per-(day, event_type) distinct-user
    * occupancy: arriving events are bucket-hashed in-row, first-seen
    * (window, type, bucket) triples pass a watermarked dropDuplicates —
    * whose keyed state is SKETCH-sized (≤ m buckets per window key) and
    * EVICTED when the watermark passes the window (the day-truncated
    * event time is itself the dedup key's event-time column) — and a
    * windowed count emits each closed window's `occupied` with the q140
    * linear-counting estimate as a pure projection. No current twin
    * exercises watermark-evicted dedup state; this one is additionally
    * bounded per key by construction.
    *
    * `slack` is the lateness horizon measured against the DAY-TRUNCATED
    * event time (the dedup key's own event-time column — that truncation
    * is what lets the dedup state evict by day). Tolerating events that
    * arrive up to L behind the newest event therefore needs
    * slack ≥ 1 day + L: any slack below 24 h behaves like zero for
    * cross-day stragglers. The default 25 hours = one day window + 1 h
    * of true lateness.
    */
  def windowedOccupancy(events: DataFrame, slack: String = "25 hours"): DataFrame = {
    val m = 4096
    events
      .filter(col("user_id").isNotNull && col("ts").isNotNull)
      .select(col("event_type"),
        date_trunc("day", col("ts")).as("dts"),
        pmod(hash32(col("user_id").cast("string")), lit(m)).as("b"))
      .withWatermark("dts", slack)
      .dropDuplicates("event_type", "b", "dts")
      .groupBy(window(col("dts"), "1 day"), col("event_type"))
      .agg(count(lit(1)).as("occupied"))
      .select(date_format(col("window.start"), "yyyy-MM-dd").as("day"),
        col("event_type"), col("occupied"),
        LinearCounting.estimate(col("occupied"), m).as("lc_est"))
  }

  /** Serving-time quantile estimates from a stored sketch frame
    * (lang, bid, c): p50/p90/p99 at the bucket midpoint representative.
    * All windows run over the sketch, which is bounded by
    * strata × buckets — never the ingested corpus.
    */
  def estimates(sk: DataFrame): DataFrame = {
    val ec = sk
      .withColumn("cum",
        sum(col("c")).over(Window.partitionBy("lang").orderBy("bid")))
      .withColumn("n", sum(col("c")).over(Window.partitionBy("lang")))
    def q(p: Int) =
      min(when(col("cum") * 100 >= lit(p) * col("n"), col("bid")))
    ec.groupBy("lang")
      .agg(max(col("n")).as("n"),
        countDistinct(col("bid")).as("n_buckets"),
        q(50).as("b50"), q(90).as("b90"), q(99).as("b99"))
      .select(col("lang"), col("n"), col("n_buckets"),
        LogHistogram.rep("b50").as("est_p50"),
        LogHistogram.rep("b90").as("est_p90"),
        LogHistogram.rep("b99").as("est_p99"))
  }
}
