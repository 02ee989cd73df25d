package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

import graft.functions.Tokenize
import graft.queries.Dwd

/** The DWD-log vertical as one Structured Streaming topology — the last
  * reference pipeline driven end-to-end as a stream (ref
  * RT/app/dwd/log/DwdTrafficBaseLogSplit.java:148-237 feeding
  * RT/app/dws/DwsTrafficSourceKeywordPageViewWindow.java:21-83):
  *
  *   log-envelope JSON → from_json parse (P1) → D1 five-way split,
  *   with the page side output continuing through ST1 new-visitor repair
  *   (flatMapGroupsWithState) into the tokenizer keyword window (X1/X2 +
  *   W1/W4 watermarked tumbling counts).
  *
  * Every stage reuses the BATCH transformation (Dwd.logSplit) or the
  * streaming operator already proven stream≡batch (StatefulOps
  * .newVisitorRepair) — this object only composes them under `readStream`;
  * DwdLogStreamSpec asserts the split's per-micro-batch output equals the
  * batch q26 form, and StreamDemo drives the whole topology with a
  * checkpoint.
  *
  * Scale: the split is stateless projections off ONE parsed scan (Catalyst
  * shares the parse under the union exactly as the reference's single-pass
  * side outputs); repair shuffles once on mid with O(1) state per device;
  * the keyword window shuffles once on (window, keyword) with partial
  * aggregation upstream.
  */
object DwdLogStream {

  /** D1 under streaming: byte-identical transformation to batch q26. */
  def split(parsedLog: DataFrame): DataFrame = Dwd.logSplit(parsedLog)

  /** The page side output as typed PageViews for ST1: device id from
    * common.mid, session-start marker from last_page_id; records enter as
    * claimed-new (isNew=1) and the repair rewrites stale claims.
    */
  def pageViews(parsedLog: DataFrame): Dataset[PageView] = {
    import parsedLog.sparkSession.implicits._
    parsedLog.filter(col("env.page").isNotNull)
      .select(
        element_at(col("env.common"), "mid").as("mid"),
        col("env.page.page_id").as("pageId"),
        col("env.page.last_page_id").as("lastPageId"),
        lit(1).as("isNew"),
        timestamp_millis(col("env.ts")).as("ts"))
      .as[PageView]
  }

  /** Keyword window over the (repaired) page stream: native tokenizer →
    * lateral flatten → 10 s tumbling counts under a 3 s watermark (W2).
    */
  def keywordWindow(pages: Dataset[PageView]): DataFrame =
    pages.toDF()
      .withWatermark("ts", "3 seconds")
      .select(col("ts"),
        explode(Tokenize.tokenizeNative(col("pageId"))).as("keyword"))
      .filter(col("keyword") =!= "")
      .groupBy(window(col("ts"), "10 seconds"), col("keyword"))
      .agg(count(lit(1)).as("keyword_count"))
      .select(
        date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss").as("stt"),
        col("keyword"), col("keyword_count"))
}
