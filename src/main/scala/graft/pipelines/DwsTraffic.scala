package graft.pipelines

import graft.{Q, Tables}
import graft.functions.Tokenize
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The remaining DWS traffic pipelines recomposed (SURVEY §3.3):
  * flag-stream union → windowed sums (DwsTrafficVcChArIsNewPageViewWindow)
  * and the tokenizer keyword window
  * (DwsTrafficSourceKeywordPageViewWindow).
  */
object DwsTraffic {

  /** DwsTrafficVcChArIsNewPageViewWindow (ref RT/app/dws/DwsTrafficVcChAr
    * IsNewPageViewWindow.java:157-216): three flag streams from the same
    * log — page views (pv + duration), daily-unique visitors (uv), bounce
    * sessions (uj) — unioned into one bean stream (U1), then 10 s windows
    * per channel summing the 0/1 flags (A1/A6).
    */
  def vcChArWindow(s: SparkSession, dir: String): DataFrame = {
    val e = Tables(s, dir, "events")
    val k = get_json_object(col("props"), "$.k").cast("int")
    val base = e.select(col("event_id"), col("user_id"), col("ts"),
      col("event_type").as("ch"), k.as("dur"))
    val pv = base.select(col("ch"), col("ts"),
      lit(1L).as("pv_ct"), col("dur").cast("long").as("dur_sum"),
      lit(0L).as("uv_ct"), lit(0L).as("uj_ct"))
    val wUv = Window.partitionBy(col("user_id"), to_date(col("ts")))
      .orderBy(col("ts"), col("event_id"))
    val uv = base
      .withColumn("rn", row_number().over(wUv)).filter(col("rn") === 1)
      .select(col("ch"), col("ts"),
        lit(0L).as("pv_ct"), lit(0L).as("dur_sum"),
        lit(1L).as("uv_ct"), lit(0L).as("uj_ct"))
    // uj: single-event sessions under a 10 s inactivity gap (q21 semantics)
    val wOrd = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val uj = base
      .withColumn("prev_ts", lag(col("ts"), 1).over(wOrd))
      .withColumn("next_ts", lead(col("ts"), 1).over(wOrd))
      .filter(
        (col("prev_ts").isNull ||
          Tables.tsSeconds(col("ts")) - Tables.tsSeconds(col("prev_ts")) > 10.0) &&
        (col("next_ts").isNull ||
          Tables.tsSeconds(col("next_ts")) - Tables.tsSeconds(col("ts")) > 10.0))
      .select(col("ch"), col("ts"),
        lit(0L).as("pv_ct"), lit(0L).as("dur_sum"),
        lit(0L).as("uv_ct"), lit(1L).as("uj_ct"))
    pv.unionByName(uv).unionByName(uj)
      .groupBy(window(col("ts"), "10 seconds"), col("ch"))
      .agg(sum("pv_ct").as("pv_ct"), sum("dur_sum").as("dur_sum"),
        sum("uv_ct").as("uv_ct"), sum("uj_ct").as("uj_ct"))
      .select(
        date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss").as("stt"),
        col("ch"), col("pv_ct"), col("dur_sum"), col("uv_ct"), col("uj_ct"))
  }

  /** DwsTrafficSourceKeywordPageViewWindow (ref :21-83): tokenizer UDTF →
    * lateral flatten → per-window keyword counts, using the native
    * StaticInvoke tokenizer (X1/X2) — documents keyed to synthetic
    * event times (doc_id seconds) to exercise the windowed form.
    */
  def keywordWindow(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "documents")
      .select(timestamp_seconds(col("doc_id")).as("rowtime"), col("text"))
      .select(col("rowtime"),
        explode(Tokenize.tokenizeNative(col("text"))).as("keyword"))
      .filter(col("keyword") =!= "")
      .groupBy(window(col("rowtime"), "10 seconds"), col("keyword"))
      .agg(count(lit(1)).as("keyword_count"))
      .select(
        date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss").as("stt"),
        col("keyword"), col("keyword_count"))

  val all: Seq[Q] = Seq(
    Q(
      "q43_dws_vc_ch_window",
      vcChArWindow,
      Some("""
        WITH base AS (
          SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts,
                 event_type AS ch,
                 CAST(json_extract_string(props, '$.k') AS INT) AS dur
          FROM events),
        pv AS (SELECT ch, ts, 1 AS pv_ct, dur AS dur_sum, 0 AS uv_ct, 0 AS uj_ct FROM base),
        uv AS (SELECT ch, ts, 0, 0, 1, 0
               FROM (SELECT *, row_number() OVER (
                       PARTITION BY user_id, CAST(ts AS DATE)
                       ORDER BY ts, event_id) AS rn FROM base)
               WHERE rn = 1),
        uj AS (SELECT ch, ts, 0, 0, 0, 1
               FROM (SELECT *,
                       lag(ts) OVER w AS prev_ts,
                       lead(ts) OVER w AS next_ts
                     FROM base
                     WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
               WHERE (prev_ts IS NULL OR epoch(ts) - epoch(prev_ts) > 10.0)
                 AND (next_ts IS NULL OR epoch(next_ts) - epoch(ts) > 10.0)),
        u AS (SELECT * FROM pv UNION ALL SELECT * FROM uv UNION ALL SELECT * FROM uj)
        SELECT strftime(time_bucket(INTERVAL '10 seconds', ts), '%Y-%m-%d %H:%M:%S') AS stt,
               ch,
               CAST(SUM(pv_ct) AS BIGINT) AS pv_ct,
               CAST(SUM(dur_sum) AS BIGINT) AS dur_sum,
               CAST(SUM(uv_ct) AS BIGINT) AS uv_ct,
               CAST(SUM(uj_ct) AS BIGINT) AS uj_ct
        FROM u GROUP BY 1, 2"""),
      "Pipeline: DwsTrafficVcChArIsNewPageViewWindow — pv/uv/uj flag " +
        "streams unioned then 10 s windows per channel summing flags " +
        "(U1 + A1/A6, ref RT/app/dws/DwsTrafficVcChArIsNewPageViewWindow" +
        ".java:157-216)."),

    Q(
      "q44_keyword_window",
      keywordWindow,
      // Oracle tokenization is the Unicode-aware split [^\pL\p{Nd}]+ —
      // RE2's \pL/\p{Nd} match Java Character.isLetterOrDigit for every
      // non-CJK script (accents, Cyrillic, digits), so parity with
      // tokenizeNative holds for any non-CJK corpus, not just ASCII
      // (FunctionsSpec pins this equivalence on non-ASCII fixtures; the
      // CJK-bigram branch diverges by design and is pinned separately).
      Some("""
        WITH toks AS (
          SELECT CAST(to_timestamp(doc_id) AS TIMESTAMP) AS rowtime,
                 unnest(string_split_regex(lower(text), '[^\pL\p{Nd}]+')) AS keyword
          FROM documents)
        SELECT strftime(time_bucket(INTERVAL '10 seconds', rowtime), '%Y-%m-%d %H:%M:%S') AS stt,
               keyword, COUNT(*) AS keyword_count
        FROM toks
        WHERE keyword <> ''
        GROUP BY 1, 2"""),
      "Pipeline: keyword window — native tokenizer expression -> lateral " +
        "flatten -> per-window keyword counts (X1/X2 + D2 + W6 + A3, ref " +
        "RT/app/dws/DwsTrafficSourceKeywordPageViewWindow.java:21-83)."))
}
