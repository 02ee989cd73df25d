package graft.queries

import graft.{Q, Tables}
import graft.model.Envelopes
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** DWD-layer operators over the Maxwell CDC and log-event envelopes
  * (SURVEY.md §2: P1-P5, P9, D1, J3, J5, J7, J8, W5, F13). Each query replays
  * the driver's `events` table as envelope-encoded JSON (graft.model
  * .Envelopes), pushes it through the real parse path (`from_json` against
  * the declared schema), and applies the reference operator; the DuckDB
  * oracle computes the same semantics directly from the raw columns.
  *
  * Scale notes: envelope parsing is a per-row projection (codegen'd, no
  * shuffle); the dict/config joins broadcast their small side; the log split
  * derives five streams from ONE parsed scan (Catalyst shares it under
  * union) exactly as the reference's single-pass side outputs do.
  */
object Dwd {
  private def ev(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "events")

  /** Parsed Maxwell envelope of the events replay, staged once per session
    * (the DWD-topic materialization analog — see graft.Staging).
    */
  private def cdc(s: SparkSession, dir: String): DataFrame =
    graft.Staging.stage(s, dir, "cdc") {
      // parallelism-floored entry scan: the JSON encode+parse round-trip is
      // the expensive part of the build and must not serialize on one core
      // when the events file is a single row group (Tables.parallel is a
      // passthrough on production layouts)
      Envelopes.parseMaxwell(
        Envelopes.maxwellFromEvents(Tables.parallel(s, dir, "events")))
    }

  private def logEnv(s: SparkSession, dir: String): DataFrame =
    graft.Staging.stage(s, dir, "log") {
      Envelopes.parseLog(
        Envelopes.logFromEvents(Tables.parallel(s, dir, "events")))
    }

  /** D1: the 5-way log split (err/start/page side outputs plus per-element
    * display/action flattening, ref RT/app/dwd/log/DwdTrafficBaseLogSplit
    * .java:148-237) as a reusable transformation over a parsed log-envelope
    * frame. Entirely stateless projections/filters/explodes, so it applies
    * unchanged to a STREAMING frame — graft.streaming.DwdLogStream drives
    * exactly this function under readStream, and DwdLogStreamSpec asserts
    * the per-micro-batch outputs equal this batch form.
    */
  def logSplit(parsed: DataFrame): DataFrame = {
    val err = parsed.filter(col("env.err").isNotNull)
      .select(lit("err").as("stream"), col("event_id"),
        col("env.err.error_code").as("payload"))
    val start = parsed.filter(col("env.start").isNotNull)
      .select(lit("start").as("stream"), col("event_id"),
        col("env.start.open_ad_id").as("payload"))
    val page = parsed.filter(col("env.page").isNotNull)
      .select(lit("page").as("stream"), col("event_id"),
        col("env.page.during_time").as("payload"))
    val display = parsed
      .select(col("event_id"), explode(col("env.displays")).as("d"))
      .select(lit("display").as("stream"), col("event_id"),
        col("d.display_id").as("payload"))
    val action = parsed
      .select(col("event_id"), explode(col("env.actions")).as("a"))
      .select(lit("action").as("stream"), col("event_id"),
        col("a.action_id").as("payload"))
    err.unionByName(start).unionByName(page)
      .unionByName(display).unionByName(action)
  }

  /** Oracle-side CTE shared by the CDC queries: the same deterministic
    * event→CDC mapping as Envelopes.maxwellFromEvents.
    */
  private val cdcCte = """
    WITH cdc AS (
      SELECT event_id, user_id,
             CAST(json_extract_string(props, '$.k') AS INT) AS k,
             CASE event_type
               WHEN 'view' THEN 'order_info' WHEN 'click' THEN 'cart_info'
               WHEN 'purchase' THEN 'order_detail' WHEN 'error' THEN 'comment_info'
               ELSE 'user_info' END AS tbl,
             event_id % 10 AS m
      FROM events)"""

  val all: Seq[Q] = Seq(
    // ------------------------------------------------------- P1/P2/P3/F10
    Q(
      "q23_cdc_insert_facts",
      (s, dir) =>
        cdc(s, dir)
          // P2: drop bootstrap markers and envelope-less records
          .filter(col("env.data").isNotNull &&
            !col("env.type").isin("bootstrap-start", "bootstrap-insert", "bootstrap-complete"))
          // P4-lite + P3: table/type predicate then map-access projection
          .filter(col("env.table") === "order_detail" && col("env.type") === "insert")
          .select(
            element_at(col("env.data"), "id").cast("long").as("id"),
            element_at(col("env.data"), "user_id").cast("long").as("user_id"),
            element_at(col("env.data"), "sku_num").cast("int").as("sku_num")),
      Some(cdcCte + """
        SELECT event_id AS id, user_id, k AS sku_num
        FROM cdc WHERE tbl = 'order_detail' AND m <= 5"""),
      "P1/P2/P3/F10: Maxwell envelope parse -> bootstrap ETL filter -> " +
        "map-access projection (ref RT/app/dim/DimApp.java:127-144, " +
        "RT/app/dwd/db/DwdTradeOrderPreProcess.java:34-51)."),

    // ---------------------------------------------------------------- P4
    Q(
      "q24_cdc_cancel_filter",
      (s, dir) =>
        cdc(s, dir)
          .filter(col("env.table") === "order_info" && col("env.type") === "update" &&
            element_at(col("env.old"), "order_status").isNotNull &&
            element_at(col("env.data"), "order_status") === "1003")
          .select(
            element_at(col("env.data"), "id").cast("long").as("id"),
            element_at(col("env.old"), "order_status").as("prev_status"),
            element_at(col("env.data"), "order_status").as("cur_status")),
      Some(cdcCte + """
        SELECT event_id AS id, '1001' AS prev_status, '1003' AS cur_status
        FROM cdc WHERE tbl = 'order_info' AND m IN (6, 7)"""),
      "P4: update-to-state CDC predicate on the old-column pre-image " +
        "(ref RT/app/dwd/db/DwdTradeOrderCancelDetail.java:79-82)."),

    // ------------------------------------------------------------ P5 + J3
    Q(
      "q25_cart_add_delta",
      (s, dir) => {
        val dic = Tables(s, dir, "nation")
          .select(col("n_nationkey").as("dic_code"), col("n_name").as("dic_name"))
        val cart = cdc(s, dir)
          .filter(col("env.table") === "cart_info" &&
            (col("env.type") === "insert" ||
              (col("env.type") === "update" &&
                element_at(col("env.old"), "sku_num").cast("int") <
                  element_at(col("env.data"), "sku_num").cast("int"))))
          .select(
            element_at(col("env.data"), "id").cast("long").as("id"),
            when(col("env.type") === "insert",
              element_at(col("env.data"), "sku_num").cast("int"))
              .otherwise(
                element_at(col("env.data"), "sku_num").cast("int") -
                  element_at(col("env.old"), "sku_num").cast("int"))
              .as("qty"))
        // J3 lookup join: tiny slowly-changing dict, broadcast per batch
        cart.join(broadcast(dic), pmod(cart("id"), lit(25)) === dic("dic_code"))
          .select(col("id"), col("qty"), col("dic_name"))
      },
      Some(cdcCte + """
        SELECT c.event_id AS id,
               CAST(CASE WHEN c.m <= 5 THEN c.k ELSE c.k - c.k // 2 END AS INT) AS qty,
               n.n_name AS dic_name
        FROM cdc c JOIN nation n ON c.event_id % 25 = n.n_nationkey
        WHERE c.tbl = 'cart_info'
          AND (c.m <= 5 OR (c.m IN (6, 7) AND c.k // 2 < c.k))"""),
      "P5 + J3: cart-add delta predicate with conditional qty, then dict " +
        "lookup join (ref RT/app/dwd/db/DwdTradeCartAdd.java:31-56)."),

    // ---------------------------------------------------------------- D1
    Q(
      "q26_log_split",
      (s, dir) => logSplit(logEnv(s, dir)),
      Some("""
        WITH ev AS (
          SELECT event_id, event_type,
                 CAST(json_extract_string(props, '$.k') AS INT) AS k
          FROM events)
        SELECT 'err' AS stream, event_id, CAST(k AS BIGINT) AS payload
        FROM ev WHERE event_type = 'error'
        UNION ALL
        SELECT 'start', event_id, CAST(k AS BIGINT) FROM ev WHERE event_type = 'signup'
        UNION ALL
        SELECT 'page', event_id, CAST(k AS BIGINT)
        FROM ev WHERE event_type NOT IN ('error', 'signup')
        UNION ALL
        SELECT 'display', event_id, event_id * 10 + i
        FROM ev, UNNEST(generate_series(0, (k % 3) - 1)) AS t(i)
        WHERE event_type = 'view'
        UNION ALL
        SELECT 'action', event_id, event_id * 100 + i
        FROM ev, UNNEST(generate_series(0, (k % 2) - 1)) AS t(i)
        WHERE event_type = 'click'"""),
      "D1: 5-way log split — err/start/page side outputs plus per-element " +
        "display/action flattening, all from one parsed scan " +
        "(ref RT/app/dwd/log/DwdTrafficBaseLogSplit.java:148-237)."),

    // ------------------------------------------------------- J5/P9 router
    Q(
      "q27_config_router",
      (s, dir) => {
        import s.implicits._
        // The broadcast config stream (ref table_process, RT/bean/
        // TableProcess.java:12-24): source table -> sink table + kept columns.
        val config = Seq(
          ("order_info", "dim_order_info", "id,user_id"),
          ("cart_info", "dim_cart_info", "id,sku_num"),
          ("user_info", "dim_user_info", "id"))
          .toDF("source_table", "sink_table", "sink_columns")
        val main = cdc(s, dir)
          .filter(col("env.data").isNotNull &&
            col("env.type").isin("insert", "update"))
        // J5: config joined as broadcast state; unconfigured tables drop out.
        // P9: prune env.data to the config's sink_columns, data-driven.
        main.join(broadcast(config), col("env.table") === col("source_table"))
          .withColumn("kept", map_filter(col("env.data"),
            (key, _) => array_contains(split(col("sink_columns"), ","), key)))
          .select(
            col("sink_table"),
            element_at(col("env.data"), "id").cast("long").as("id"),
            array_join(
              array_sort(transform(map_entries(col("kept")),
                e => concat(e("key"), lit("="), e("value")))), ",").as("row_kv"))
      },
      Some(cdcCte + """
        SELECT CASE tbl WHEN 'order_info' THEN 'dim_order_info'
                        WHEN 'cart_info' THEN 'dim_cart_info'
                        ELSE 'dim_user_info' END AS sink_table,
               event_id AS id,
               CASE tbl
                 WHEN 'order_info' THEN 'id=' || event_id || ',user_id=' || user_id
                 WHEN 'cart_info'  THEN 'id=' || event_id || ',sku_num=' || k
                 ELSE 'id=' || event_id END AS row_kv
        FROM cdc
        WHERE tbl IN ('order_info', 'cart_info', 'user_info') AND m <= 7"""),
      "J5/P9: config-driven dim router — broadcast config join + " +
        "data-driven column pruning " +
        "(ref RT/app/func/TableProcessFunction.java:42-115)."),

    // ---------------------------------------------------------------- J7
    Q(
      "q28_right_full_join",
      (s, dir) => {
        val c = Tables(s, dir, "customer").filter(pmod(col("c_custkey"), lit(2)) === 0)
        val o = Tables(s, dir, "orders").filter(pmod(col("o_orderkey"), lit(3)) === 0)
        def counts(joined: DataFrame, jt: String) = joined.agg(
          lit(jt).as("jt"),
          sum(when(col("c_custkey").isNotNull && col("o_orderkey").isNotNull, 1)
            .otherwise(0)).as("matched_cnt"),
          sum(when(col("o_orderkey").isNull, 1).otherwise(0)).as("cust_only_cnt"),
          sum(when(col("c_custkey").isNull, 1).otherwise(0)).as("order_only_cnt"))
          .select(col("jt"), col("matched_cnt"), col("cust_only_cnt"),
            col("order_only_cnt"))
        val cond = c("c_custkey") === o("o_custkey")
        counts(c.join(o, cond, "full_outer"), "full")
          .unionByName(counts(c.join(o, cond, "right_outer"), "right"))
      },
      Some("""
        WITH c AS (SELECT * FROM customer WHERE c_custkey % 2 = 0),
             o AS (SELECT * FROM orders WHERE o_orderkey % 3 = 0)
        SELECT 'full' AS jt,
               CAST(SUM(CASE WHEN c_custkey IS NOT NULL AND o_orderkey IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS matched_cnt,
               CAST(SUM(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS cust_only_cnt,
               CAST(SUM(CASE WHEN c_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS order_only_cnt
        FROM c FULL JOIN o ON c_custkey = o_custkey
        UNION ALL
        SELECT 'right',
               CAST(SUM(CASE WHEN c_custkey IS NOT NULL AND o_orderkey IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT),
               CAST(0 AS BIGINT),
               CAST(SUM(CASE WHEN c_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
        FROM c RIGHT JOIN o ON c_custkey = o_custkey"""),
      "J7: right and full outer joins with unmatched-side accounting " +
        "(ref RTT/TestSqlJoin.java:14-18,57-76)."),

    // ------------------------------------------------------- J8 composite
    Q(
      "q29_composite_key_join",
      (s, dir) => {
        val e = ev(s, dir)
        val dt = date_format(col("ts"), "yyyy-MM-dd")
        val p = e.filter(col("event_type") === "purchase")
          .select(col("user_id").as("p_user"), dt.as("p_day"))
        val v = e.filter(col("event_type") === "view")
          .select(col("user_id").as("v_user"), dt.as("v_day"))
        p.join(v, p("p_user") === v("v_user") && p("p_day") === v("v_day"))
          .groupBy(col("p_day").as("day"))
          .agg(count(lit(1)).as("pair_cnt"))
      },
      Some("""
        WITH p AS (SELECT user_id, strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%d') AS day
                   FROM events WHERE event_type = 'purchase'),
             v AS (SELECT user_id, strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%d') AS day
                   FROM events WHERE event_type = 'view')
        SELECT p.day AS day, COUNT(*) AS pair_cnt
        FROM p JOIN v ON p.user_id = v.user_id AND p.day = v.day
        GROUP BY p.day"""),
      "J8: composite-key equi join on (user, day) " +
        "(ref RT/app/dwd/db/DwdTradeRefundPaySuc.java:101-104)."),

    // ------------------------------------------------------- W5 keyless
    Q(
      "q30_global_window",
      (s, dir) =>
        ev(s, dir)
          .groupBy(window(col("ts"), "10 seconds"))
          .agg(count(lit(1)).as("pv_ct"),
            sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_value"))
          .select(
            date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss").as("stt"),
            date_format(col("window.end"), "yyyy-MM-dd HH:mm:ss").as("edt"),
            col("pv_ct"), col("sum_value")),
      Some("""
        SELECT strftime(time_bucket(INTERVAL '10 seconds', CAST(ts AS TIMESTAMP)), '%Y-%m-%d %H:%M:%S') AS stt,
               strftime(time_bucket(INTERVAL '10 seconds', CAST(ts AS TIMESTAMP)) + INTERVAL 10 SECOND, '%Y-%m-%d %H:%M:%S') AS edt,
               COUNT(*) AS pv_ct,
               CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        FROM events
        GROUP BY 1, 2"""),
      "W5: keyless (windowAll) tumbling window — in Spark the same " +
        "groupBy(window) with no key columns, which pre-aggregates per " +
        "partition instead of serializing (ref " +
        "RT/app/dws/DwsTrafficHomeDetailPageViewWindow.java:143-144)."),

    // ------------------------------------------------------------- F13
    Q(
      "q31_ts_string_compare",
      (s, dir) => {
        val k = Envelopes.kOf(ev(s, dir))
        ev(s, dir)
          .select(
            col("event_id"),
            date_format(col("ts"), "yyyy-MM-dd HH:mm:ss").as("s1"),
            date_format(expr("timestampadd(SECOND, " +
              "cast(get_json_object(props, '$.k') as int) - 50, ts)"),
              "yyyy-MM-dd HH:mm:ss").as("s2"))
          .withColumn("lex_gt", col("s2") > col("s1"))
          .withColumn("ts_gt",
            col("s2").cast("timestamp") > col("s1").cast("timestamp"))
          .withColumn("agree", col("lex_gt") === col("ts_gt"))
      },
      Some("""
        WITH b AS (
          SELECT event_id,
                 strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%d %H:%M:%S') AS s1,
                 strftime(CAST(ts AS TIMESTAMP)
                   + (CAST(json_extract_string(props, '$.k') AS INT) - 50) * INTERVAL 1 SECOND,
                   '%Y-%m-%d %H:%M:%S') AS s2
          FROM events)
        SELECT event_id, s1, s2,
               s2 > s1 AS lex_gt,
               CAST(s2 AS TIMESTAMP) > CAST(s1 AS TIMESTAMP) AS ts_gt,
               (s2 > s1) = (CAST(s2 AS TIMESTAMP) > CAST(s1 AS TIMESTAMP)) AS agree
        FROM b"""),
      "F13/F1/F7: lexicographic vs temporal ordering of ISO timestamp " +
        "strings agree — the property the reference's " +
        "TimestampLtz3CompareUtil.java:9-17 relies on."),

    // --------------------------------------------- SCD2 dimension history
    Q(
      "q89_scd2_history",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        // Slowly-changing-dimension type 2 built from the CDC stream: each
        // user_info change event becomes a validity-interval version row
        // (valid_from = its ts, valid_to = the next version's ts, open
        // interval on the current row). One shuffle, partitioned by the
        // dimension pk — each key's history is tiny, so the window state
        // is O(versions-per-key) regardless of corpus size. Timestamps as
        // integer microseconds (unix_micros ≡ DuckDB epoch_us) so the
        // hash compare is engine-exact; (tus, event_id) is the total
        // order for same-microsecond ties.
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("tus"), col("event_id"))
        cdc(s, dir)
          .filter(col("env.table") === "user_info")
          .select(col("user_id"), col("event_id"),
            Tables.tsMicros(col("ts")).as("tus"),
            element_at(col("env.data"), "order_status").as("status"))
          .withColumn("version", row_number().over(w).cast("int"))
          .withColumn("valid_from_us", col("tus"))
          .withColumn("valid_to_us", lead(col("tus"), 1).over(w))
          .withColumn("is_current",
            (lead(col("tus"), 1).over(w).isNull).cast("int"))
          .select("user_id", "event_id", "version", "status",
            "valid_from_us", "valid_to_us", "is_current")
      },
      Some(cdcCte + """,
        v AS (
          SELECT cdc.user_id, cdc.event_id,
                 epoch_us(CAST(events.ts AS TIMESTAMP)) AS tus,
                 CASE WHEN cdc.m IN (6, 7) THEN '1003' ELSE '1001' END AS status
          FROM cdc JOIN events USING (event_id)
          WHERE cdc.tbl = 'user_info')
        SELECT user_id, event_id,
               CAST(ROW_NUMBER() OVER w AS INT) AS version,
               status,
               tus AS valid_from_us,
               LEAD(tus, 1) OVER w AS valid_to_us,
               CAST(LEAD(tus, 1) OVER w IS NULL AS INT) AS is_current
        FROM v
        WINDOW w AS (PARTITION BY user_id ORDER BY tus, event_id)"""),
      "SCD2 dimension history from CDC: validity intervals per pk version " +
        "via lead over a deterministic total order — the warehouse-history " +
        "form of the reference's dim layer (ref RT/app/dim/DimApp.java " +
        "keep-latest upsert, extended to full history)."),

    // ------------------------------------------------- snapshot diff audit
    Q(
      "q111_snapshot_diff",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        // Table reconciliation: diff the user_info dimension as-of
        // 2024-01-16 against the final state (both keep-latest per pk over
        // the CDC stream) and classify every key added / changed /
        // unchanged — the audit op behind backfill validation. Two
        // keep-latest passes over one staged scan + a full outer join on
        // the pk; 'removed' is impossible for this append-only feed but
        // classified anyway (the general contract).
        val cutoffUs = 1705363200000000L // 2024-01-16T00:00:00Z in micros
        val versions = cdc(s, dir)
          .filter(col("env.table") === "user_info")
          .select(col("user_id"), col("event_id"),
            Tables.tsMicros(col("ts")).as("tus"),
            element_at(col("env.data"), "order_status").as("status"))
        def latest(df: DataFrame) = {
          val w = Window.partitionBy(col("user_id"))
            .orderBy(col("tus").desc, col("event_id").desc)
          df.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
            .select(col("user_id"), col("status"))
        }
        val old = latest(versions.filter(col("tus") < cutoffUs))
          .withColumnRenamed("status", "old_status")
        val neu = latest(versions).withColumnRenamed("status", "new_status")
        old.join(neu, Seq("user_id"), "full_outer")
          .select(
            when(col("old_status").isNull, "added")
              .when(col("new_status").isNull, "removed")
              .when(col("old_status") =!= col("new_status"), "changed")
              .otherwise("unchanged").as("diff_class"))
          .groupBy("diff_class").agg(count(lit(1)).as("n_keys"))
      },
      Some(cdcCte + """,
        v AS (
          SELECT cdc.user_id, cdc.event_id,
                 epoch_us(CAST(events.ts AS TIMESTAMP)) AS tus,
                 CASE WHEN cdc.m IN (6, 7) THEN '1003' ELSE '1001' END AS status
          FROM cdc JOIN events USING (event_id)
          WHERE cdc.tbl = 'user_info'),
        old AS (
          SELECT user_id, status AS old_status FROM (
            SELECT user_id, status, row_number() OVER (PARTITION BY user_id
              ORDER BY tus DESC, event_id DESC) AS rn
            FROM v WHERE tus < 1705363200000000) WHERE rn = 1),
        neu AS (
          SELECT user_id, status AS new_status FROM (
            SELECT user_id, status, row_number() OVER (PARTITION BY user_id
              ORDER BY tus DESC, event_id DESC) AS rn
            FROM v) WHERE rn = 1)
        SELECT CASE WHEN old.old_status IS NULL THEN 'added'
                    WHEN neu.new_status IS NULL THEN 'removed'
                    WHEN old.old_status <> neu.new_status THEN 'changed'
                    ELSE 'unchanged' END AS diff_class,
               COUNT(*) AS n_keys
        FROM old FULL OUTER JOIN neu USING (user_id)
        GROUP BY 1"""),
      "Snapshot diff / reconciliation: keep-latest dimension state at two " +
        "points in time, full-outer compared and classified " +
        "added/changed/unchanged — the backfill-audit op over the same " +
        "CDC substrate as q89 (beyond-reference engine surface)."))
}
