package graft.queries

import graft.{Q, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Batch renditions of the reference's keyed-state operators (SURVEY.md
  * §2.6 ST1-ST7 and §2.7 C1). Each stateful record-at-a-time Flink operator
  * has an equivalent declarative form over the full history — that form is
  * the DuckDB-checkable oracle here; the incremental streaming rendition
  * (flatMapGroupsWithState) lives in graft.streaming.StatefulOps and is
  * asserted equal to these in the test suite.
  *
  * Scale: all are window functions or aggregations partitioned by a key
  * (user_id) — they shuffle once on the key and parallelize per key group,
  * exactly how the 1000-executor plan should look.
  */
object Stateful {
  private def ev(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "events")

  private val dt = date_format(col("ts"), "yyyy-MM-dd")

  val all: Seq[Q] = Seq(
    // ----------------------------------------------------------------- ST1
    Q(
      "q15_new_visitor_repair",
      (s, dir) => {
        val e = ev(s, dir)
        // is_new=1 only on the user's first-seen date (ref semantics: state
        // lastVisitDate per device; rewrite is_new when a later date visits).
        val w = Window.partitionBy(col("user_id"))
        e.withColumn("first_date", min(dt).over(w))
          .select(
            col("event_id"), col("user_id"),
            dt.as("event_date"),
            when(dt === col("first_date"), lit(1)).otherwise(lit(0)).as("is_new"))
      },
      Some("""
        SELECT event_id, user_id,
               strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%d') AS event_date,
               CASE WHEN strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%d') =
                         min(strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%d')) OVER (PARTITION BY user_id)
                    THEN 1 ELSE 0 END AS is_new
        FROM events"""),
      "ST1: new/returning-visitor repair via first-seen date per key " +
        "(ref RT/app/dwd/log/DwdTrafficBaseLogSplit.java:102-145)."),

    // ----------------------------------------------------------------- ST2
    Q(
      "q16_daily_uv",
      (s, dir) =>
        ev(s, dir)
          .groupBy(dt.as("cur_date"))
          .agg(countDistinct(col("user_id")).as("uv_ct")),
      Some("""
        SELECT strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%d') AS cur_date,
               COUNT(DISTINCT user_id) AS uv_ct
        FROM events
        GROUP BY 1"""),
      "ST2: daily unique-visitor dedup (first visit of day passes) " +
        "(ref RT/app/dwd/log/DwdTrafficUniqueVisitorDetail.java:51-88)."),

    // ----------------------------------------------------------------- ST4
    Q(
      "q17_first_order_of_day",
      (s, dir) => {
        val e = ev(s, dir).filter(col("event_type") === "purchase")
        val w = Window.partitionBy(col("user_id"), dt)
          .orderBy(col("ts"), col("event_id"))
        e.withColumn("rn", row_number().over(w))
          .select(
            col("event_id"), col("user_id"), dt.as("order_date"),
            when(col("rn") === 1, lit(1)).otherwise(lit(0)).as("order_uu"))
      },
      Some("""
        SELECT event_id, user_id,
               strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%d') AS order_date,
               CASE WHEN row_number() OVER (
                      PARTITION BY user_id, strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%d')
                      ORDER BY CAST(ts AS TIMESTAMP), event_id) = 1
                    THEN 1 ELSE 0 END AS order_uu
        FROM events
        WHERE event_type = 'purchase'"""),
      "ST4: daily first-order-per-user flag " +
        "(ref RT/app/dws/DwsTradeSkuOrderWindow.java:188-214)."),

    // ----------------------------------------------------------------- ST5
    Q(
      "q18_home_detail_uv",
      (s, dir) =>
        ev(s, dir)
          .filter(col("event_type").isin("view", "click"))
          .groupBy(dt.as("cur_date"))
          .agg(
            countDistinct(when(col("event_type") === "view", col("user_id")))
              .as("home_uv_ct"),
            countDistinct(when(col("event_type") === "click", col("user_id")))
              .as("detail_uv_ct")),
      Some("""
        SELECT strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%d') AS cur_date,
               COUNT(DISTINCT CASE WHEN event_type = 'view' THEN user_id END) AS home_uv_ct,
               COUNT(DISTINCT CASE WHEN event_type = 'click' THEN user_id END) AS detail_uv_ct
        FROM events
        WHERE event_type IN ('view','click')
        GROUP BY 1"""),
      "ST5: home/detail page daily UV flags " +
        "(ref RT/app/dws/DwsTrafficHomeDetailPageViewWindow.java:88-141)."),

    // ----------------------------------------------------------------- ST6
    Q(
      "q19_login_uu_back",
      (s, dir) => {
        val e = ev(s, dir)
        // one row per (user, active day); backCt=1 when gap from previous
        // active day >= 8 days (ref: (ts-lastTs)/86400000 >= 8).
        val days = e.select(col("user_id"), dt.as("d")).distinct()
        val w = Window.partitionBy(col("user_id")).orderBy(col("d"))
        days
          .withColumn("prev_d", lag(col("d"), 1).over(w))
          .groupBy(col("d").as("cur_date"))
          .agg(
            count(lit(1)).as("uu_ct"),
            sum(
              when(col("prev_d").isNotNull &&
                datediff(col("d").cast("date"), col("prev_d").cast("date")) >= 8, 1)
                .otherwise(0)).as("back_ct"))
      },
      Some("""
        SELECT d AS cur_date, COUNT(*) AS uu_ct,
               CAST(SUM(CASE WHEN prev_d IS NOT NULL
                         AND date_diff('day', CAST(prev_d AS DATE), CAST(d AS DATE)) >= 8
                        THEN 1 ELSE 0 END) AS BIGINT) AS back_ct
        FROM (SELECT user_id, d,
                     lag(d) OVER (PARTITION BY user_id ORDER BY d) AS prev_d
              FROM (SELECT DISTINCT user_id,
                           strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%d') AS d
                    FROM events))
        GROUP BY d"""),
      "ST6: login unique + 7-day returning users " +
        "(ref RT/app/dws/DwsUserUserLoginWindow.java:84-129)."),

    // ----------------------------------------------------------------- ST7
    Q(
      "q20_cart_add_uu",
      (s, dir) =>
        ev(s, dir)
          .filter(col("event_type") === "click")
          .groupBy(dt.as("cur_date"))
          .agg(countDistinct(col("user_id")).as("cart_add_uu_ct")),
      Some("""
        SELECT strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%d') AS cur_date,
               COUNT(DISTINCT user_id) AS cart_add_uu_ct
        FROM events
        WHERE event_type = 'click'
        GROUP BY 1"""),
      "ST7: cart-add unique-user per day " +
        "(ref RT/app/dws/DwsTradeCartAddUuWindow.java:76-98)."),

    // ------------------------------------------------------------------ C1
    Q(
      "q21_bounce_detection",
      (s, dir) => {
        val e = ev(s, dir)
        // C1 batch analog: sessionize per user with a 10 s inactivity gap;
        // sessions containing exactly one event are bounces. The streaming
        // rendition is the flatMapGroupsWithState state machine in
        // graft.streaming.StatefulOps.bounce.
        val wOrd = Window.partitionBy(col("user_id"))
          .orderBy(col("ts"), col("event_id"))
        val flagged = e
          .withColumn("prev_ts", lag(col("ts"), 1).over(wOrd))
          .withColumn(
            "new_session",
            when(
              col("prev_ts").isNull ||
                Tables.tsSeconds(col("ts")) - Tables.tsSeconds(col("prev_ts")) > 10.0,
              1).otherwise(0))
        val sessions = flagged.withColumn(
          "session_id",
          sum(col("new_session")).over(
            wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        sessions
          .groupBy(col("user_id"), col("session_id"))
          .agg(count(lit(1)).as("n"))
          .groupBy(col("user_id"))
          .agg(
            count(lit(1)).as("session_cnt"),
            sum(when(col("n") === 1, 1).otherwise(0)).as("bounce_cnt"))
      },
      Some("""
        WITH flagged AS (
          SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts,
                 CASE WHEN lag(CAST(ts AS TIMESTAMP)) OVER w IS NULL
                       OR epoch(CAST(ts AS TIMESTAMP)) - epoch(lag(CAST(ts AS TIMESTAMP)) OVER w) > 10.0
                      THEN 1 ELSE 0 END AS new_session
          FROM events
          WINDOW w AS (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id)),
        sessions AS (
          SELECT user_id,
                 SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
          FROM flagged),
        per_session AS (
          SELECT user_id, session_id, COUNT(*) AS n
          FROM sessions GROUP BY user_id, session_id)
        SELECT user_id, COUNT(*) AS session_cnt,
               CAST(SUM(CASE WHEN n = 1 THEN 1 ELSE 0 END) AS BIGINT) AS bounce_cnt
        FROM per_session GROUP BY user_id"""),
      "C1: bounce (user-jump) detection — 10 s session gap, single-event " +
        "sessions are bounces (ref RT/app/dwd/log/DwdTrafficUserJumpDetail.java:86-129)."),

    // ------------------------------------------------------------------ A4
    Q(
      "q22_distinct_order_count",
      (s, dir) =>
        ev(s, dir)
          .filter(col("event_type") === "purchase")
          .groupBy(dt.as("cur_date"))
          .agg(
            countDistinct(col("user_id")).as("order_user_ct"),
            count(lit(1)).as("order_ct"),
            sum(col("value").cast("decimal(18,2)")).cast("double")
              .as("order_amount")),
      Some("""
        SELECT strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%d') AS cur_date,
               COUNT(DISTINCT user_id) AS order_user_ct,
               COUNT(*) AS order_ct,
               CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS order_amount
        FROM events
        WHERE event_type = 'purchase'
        GROUP BY 1"""),
      "A4/A2: exact distinct count (Set-union semantics) + amount sums " +
        "(ref RT/bean/TradeSkuOrderBean.java:42-44, DwsTradeProvinceOrderWindow)."))
}
