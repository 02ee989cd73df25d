package graft.queries

import graft.{Q, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Core relational operators from SURVEY.md §2 (projection/filter P1-P9,
  * joins J1-J8, flatten D1-D2, windows W4-W6, aggregations A1-A6, unions U1,
  * scalar functions F1-F14, serving queries Q1-Q2), re-expressed as batch
  * DataFrame queries over the TESTDATA tables so the DuckDB oracle can check
  * them. The streaming renditions of the stateful variants live in
  * graft.streaming.
  *
  * Scale notes (100 TB): every query here is a declarative plan — filters
  * and projections push to the parquet scan, dimension joins are broadcast,
  * fact-fact joins hash-partition on the join key, and aggregations get
  * map-side partial aggregation from Catalyst. Nothing collects to the
  * driver.
  */
object CoreQueriesDoc

object Core {
  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    Tables(s, dir, n)

  /** Money sums: cast to decimal(18,2) BEFORE aggregating so both engines sum
    * exactly (double summation order differs across engines/partitions). The
    * FINAL output column is then cast once to double on both sides — Spark's
    * and DuckDB's decimal encodings hash differently, but one cast of an
    * exact decimal sum yields the identical double bit pattern.
    */
  private def dec(c: org.apache.spark.sql.Column) = c.cast("decimal(18,2)")

  val all: Seq[Q] = Seq(
    // ---------------------------------------------------------------- A1/A5
    Q(
      "q01_pricing_summary",
      (s, dir) => {
        val li = t(s, dir, "lineitem")
        li.filter(col("l_shipdate") < lit("1998-09-01").cast("timestamp"))
          .groupBy(col("l_returnflag"), col("l_linestatus"))
          .agg(
            sum(dec(col("l_quantity"))).cast("double").as("sum_qty"),
            sum(dec(col("l_extendedprice"))).cast("double").as("sum_base"),
            sum(dec(col("l_extendedprice")) * dec(lit(1) - col("l_discount")))
              .cast("double").as("sum_disc_price"),
            count(lit(1)).as("cnt"))
      },
      Some("""
        SELECT l_returnflag, l_linestatus,
               CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1 - l_discount AS DECIMAL(18,2))) AS DOUBLE) AS sum_disc_price,
               COUNT(*) AS cnt
        FROM lineitem
        WHERE l_shipdate < TIMESTAMP '1998-09-01'
        GROUP BY l_returnflag, l_linestatus"""),
      "A1/A5/A6: incremental grouped aggregation with computed measures " +
        "(ref RT/app/dws/DwsTradeSkuOrderWindow.java:238-265 reduce semantics)."),

    // ------------------------------------------------------------- P2/P3/P6
    Q(
      "q02_filter_project_json",
      (s, dir) =>
        t(s, dir, "events")
          .filter(col("event_type").isin("view", "click"))
          .select(
            col("event_id"), col("user_id"), col("event_type"),
            get_json_object(col("props"), "$.k").as("k_val")),
      Some("""
        SELECT event_id, user_id, event_type,
               json_extract_string(props, '$.k') AS k_val
        FROM events
        WHERE event_type IN ('view','click')"""),
      "P1/P2/P3/P6/F10: parse-filter-project with JSON map access " +
        "(ref RT/app/dwd/db/DwdTradeOrderPreProcess.java:34-51)."),

    // ---------------------------------------------------------------- P5/F4
    Q(
      "q03_conditional_delta",
      (s, dir) =>
        t(s, dir, "events")
          .filter(col("event_type").isin("purchase", "click"))
          .select(
            col("event_id"), col("user_id"),
            when(col("event_type") === "purchase", dec(col("value")))
              .otherwise(dec(col("value")) * dec(lit(2)))
              .cast("double").as("qty")),
      Some("""
        SELECT event_id, user_id,
               CAST(CASE WHEN event_type = 'purchase'
                         THEN CAST(value AS DECIMAL(18,2))
                         ELSE CAST(value AS DECIMAL(18,2)) * CAST(2 AS DECIMAL(18,2)) END
                    AS DOUBLE) AS qty
        FROM events
        WHERE event_type IN ('purchase','click')"""),
      "P5/F4: conditional quantity (cart-add delta pattern, " +
        "ref RT/app/dwd/db/DwdTradeCartAdd.java:31-44)."),

    // -------------------------------------------------------------- J1 join
    Q(
      "q04_fact_join_agg",
      (s, dir) => {
        val o = t(s, dir, "orders")
        val li = t(s, dir, "lineitem")
        // fact-fact equi join: shuffles both sides on the key; at 100 TB this
        // is the plan we want (sort-merge/shuffled-hash on l_orderkey).
        o.join(li, o("o_orderkey") === li("l_orderkey"), "inner")
          .groupBy(col("o_orderpriority"))
          .agg(
            count(lit(1)).as("cnt"),
            sum(dec(col("l_extendedprice")) * dec(lit(1) - col("l_discount")))
              .cast("double").as("revenue"))
      },
      Some("""
        SELECT o_orderpriority, COUNT(*) AS cnt,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1 - l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        GROUP BY o_orderpriority"""),
      "J1: stream-stream inner equi join, batch rendition " +
        "(ref RT/app/dwd/db/DwdTradeOrderPreProcess.java:125-127)."),

    // ------------------------------------------------------ J4 dim snowflake
    Q(
      "q05_snowflake_enrich",
      (s, dir) => {
        val o = t(s, dir, "orders")
        val c = t(s, dir, "customer")
        val n = t(s, dir, "nation")
        val r = t(s, dir, "region")
        // The reference chains six async dim lookups (sku→tm→spu→c3→c2→c1);
        // in Spark the whole snowflake collapses into broadcast hash joins.
        o.join(broadcast(c), o("o_custkey") === c("c_custkey"))
          .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
          .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
          .groupBy(col("r_name"), col("n_name"))
          .agg(
            count(lit(1)).as("order_cnt"),
            sum(dec(col("o_totalprice"))).cast("double").as("total_amount"))
      },
      Some("""
        SELECT r_name, n_name, COUNT(*) AS order_cnt,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_amount
        FROM orders
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        GROUP BY r_name, n_name"""),
      "J4: chained dimension enrichment as broadcast snowflake joins " +
        "(ref RT/app/dws/DwsTradeSkuOrderWindow.java:270-380, DimAsyncFunction)."),

    // ----------------------------------------------------------- J2 left join
    Q(
      "q06_left_join_orders",
      (s, dir) => {
        val c = t(s, dir, "customer")
        val o = t(s, dir, "orders")
        c.join(o, c("c_custkey") === o("o_custkey"), "left_outer")
          .groupBy(col("c_custkey"))
          .agg(count(col("o_orderkey")).as("order_cnt"))
      },
      Some("""
        SELECT c_custkey, COUNT(o_orderkey) AS order_cnt
        FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        GROUP BY c_custkey"""),
      "J2: left outer join with unmatched-left retention " +
        "(ref RT/app/dwd/db/DwdTradeOrderPreProcess.java:128-131)."),

    // ----------------------------------------------------- ST3 keep-latest
    Q(
      "q07_keep_latest",
      (s, dir) => {
        val ev = t(s, dir, "events")
        // ST3 batch oracle: row_number over (key order by version desc) = 1.
        // The streaming rendition (5 s event-time grace timeout) is
        // graft.streaming.StatefulOps.keepLatest, asserted equal to this
        // row_number()=1 form in StatefulOpsSpec.
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("ts").desc, col("event_id").desc)
        ev.withColumn("rn", row_number().over(w))
          .filter(col("rn") === 1)
          .select(
            col("user_id"), col("event_id"), col("event_type"),
            dec(col("value")).cast("double").as("value_dec"))
      },
      Some("""
        SELECT user_id, event_id, event_type,
               CAST(CAST(value AS DECIMAL(18,2)) AS DOUBLE) AS value_dec
        FROM (SELECT *, row_number() OVER (PARTITION BY user_id
                    ORDER BY CAST(ts AS TIMESTAMP) DESC, event_id DESC) AS rn
              FROM events)
        WHERE rn = 1"""),
      "ST3: keep-latest-version dedup per key " +
        "(ref RT/app/dws/DwsTradeSkuOrderWindow.java:113-155)."),

    // -------------------------------------------------------- J6 interval join
    Q(
      "q08_interval_join",
      (s, dir) => {
        val ev = t(s, dir, "events")
        val p = ev.filter(col("event_type") === "purchase")
          .select(col("user_id").as("p_user"), col("ts").as("p_ts"))
        val c = ev.filter(col("event_type") === "click")
          .select(col("user_id").as("c_user"), col("ts").as("c_ts"))
        // time-range equi join: Spark plans this as a shuffled join on the
        // equi key with the range as a post-filter — the right shape at scale.
        p.join(
            c,
            p("p_user") === c("c_user") &&
              c("c_ts") >= p("p_ts") - expr("INTERVAL 10 MINUTES") &&
              c("c_ts") <= p("p_ts"),
            "inner")
          .groupBy(col("p_user").as("user_id"))
          .agg(count(lit(1)).as("pair_cnt"))
      },
      Some("""
        SELECT p.user_id AS user_id, COUNT(*) AS pair_cnt
        FROM (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts FROM events WHERE event_type = 'purchase') p
        JOIN (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts FROM events WHERE event_type = 'click') c
          ON p.user_id = c.user_id
         AND c.ts >= p.ts - INTERVAL 10 MINUTE
         AND c.ts <= p.ts
        GROUP BY p.user_id"""),
      "J6: interval join (clicks within 10 min before each purchase, " +
        "ref RTT/TestIntervalJoin.java:69-80)."),

    // -------------------------------------------------------------- U1 union
    Q(
      "q09_union_streams",
      (s, dir) => {
        val ev = t(s, dir, "events")
        val a = ev.filter(col("event_type") === "view")
        val b = ev.filter(col("event_type") === "click")
        val c = ev.filter(col("event_type") === "error")
        a.unionByName(b).unionByName(c)
          .groupBy(col("event_type"))
          .agg(count(lit(1)).as("cnt"),
            sum(dec(col("value"))).cast("double").as("sum_value"))
      },
      Some("""
        SELECT event_type, COUNT(*) AS cnt,
               CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        FROM (
          SELECT * FROM events WHERE event_type = 'view'
          UNION ALL SELECT * FROM events WHERE event_type = 'click'
          UNION ALL SELECT * FROM events WHERE event_type = 'error')
        GROUP BY event_type"""),
      "U1/U2: 3-way stream union then aggregate " +
        "(ref RT/app/dws/DwsTrafficVcChArIsNewPageViewWindow.java:157)."),

    // --------------------------------------------------- W4/A1 tumbling window
    Q(
      "q10_tumbling_window",
      (s, dir) =>
        t(s, dir, "events")
          .groupBy(window(col("ts"), "10 seconds"), col("event_type"))
          .agg(count(lit(1)).as("cnt"),
            sum(dec(col("value"))).cast("double").as("sum_value"))
          .select(
            date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss").as("stt"),
            date_format(col("window.end"), "yyyy-MM-dd HH:mm:ss").as("edt"),
            col("event_type"), col("cnt"), col("sum_value")),
      Some("""
        SELECT strftime(time_bucket(INTERVAL '10 seconds', CAST(ts AS TIMESTAMP)), '%Y-%m-%d %H:%M:%S') AS stt,
               strftime(time_bucket(INTERVAL '10 seconds', CAST(ts AS TIMESTAMP)) + INTERVAL 10 SECOND, '%Y-%m-%d %H:%M:%S') AS edt,
               event_type, COUNT(*) AS cnt,
               CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        FROM events
        GROUP BY 1, 2, 3"""),
      "W4/W6/A1/F9: 10 s tumbling event-time window with stt/edt stamps " +
        "(ref RT/app/dws/DwsTradeSkuOrderWindow.java:234-265)."),

    // ------------------------------------------------------------ Q1 serving
    Q(
      "q11_gmv_by_day",
      (s, dir) =>
        t(s, dir, "orders")
          .groupBy(date_format(col("o_orderdate"), "yyyyMMdd").as("dt"))
          .agg(sum(dec(col("o_totalprice"))).cast("double").as("gmv")),
      Some("""
        SELECT strftime(o_orderdate, '%Y%m%d') AS dt,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS gmv
        FROM orders
        GROUP BY 1"""),
      "Q1 serving: GMV per day (toYYYYMMDD bucketing, " +
        "ref PUB/mapper/TradeStatMapper.java:15-16)."),

    // ------------------------------------------------------------ Q2 serving
    Q(
      "q12_amount_by_province",
      (s, dir) => {
        val o = t(s, dir, "orders")
        val c = t(s, dir, "customer")
        val n = t(s, dir, "nation")
        o.join(broadcast(c), o("o_custkey") === c("c_custkey"))
          .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
          .groupBy(col("n_name").as("province_name"))
          .agg(sum(dec(col("o_totalprice"))).cast("double").as("order_amount"))
      },
      Some("""
        SELECT n_name AS province_name,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS order_amount
        FROM orders
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        GROUP BY n_name"""),
      "Q2 serving: amount by province (nation as province analog, " +
        "ref PUB/mapper/TradeStatMapper.java:18-20)."),

    // -------------------------------------------------------- F1-F14 scalars
    Q(
      "q13_scalar_suite",
      (s, dir) =>
        t(s, dir, "events")
          .select(
            col("event_id"),
            date_format(col("ts"), "yyyy-MM-dd").as("event_date"),
            date_format(col("ts"), "yyyy-MM-dd HH:mm:ss").as("event_sec"),
            dec(col("value")).cast("double").as("value_dec"),
            (dec(col("value")) * dec(lit(2))).cast("double").as("value_x2"),
            when(col("value") > 100, lit("hi")).otherwise(lit("lo")).as("band"),
            (unix_timestamp(col("ts")) * 1000).as("epoch_ms"),
            concat(lit("u:"), col("user_id").cast("string")).as("user_key"),
            upper(col("event_type")).as("event_type_uc"),
            get_json_object(col("props"), "$.k").cast("int").as("k_int")),
      Some("""
        SELECT event_id,
               strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%d') AS event_date,
               strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%d %H:%M:%S') AS event_sec,
               CAST(CAST(value AS DECIMAL(18,2)) AS DOUBLE) AS value_dec,
               CAST(CAST(value AS DECIMAL(18,2)) * CAST(2 AS DECIMAL(18,2)) AS DOUBLE) AS value_x2,
               CASE WHEN value > 100 THEN 'hi' ELSE 'lo' END AS band,
               CAST(floor(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT) * 1000 AS epoch_ms,
               'u:' || CAST(user_id AS VARCHAR) AS user_key,
               upper(event_type) AS event_type_uc,
               CAST(json_extract_string(props, '$.k') AS INT) AS k_int
        FROM events"""),
      "F1-F14: scalar function suite — date_format, decimal cast, arithmetic, " +
        "if/case, epoch math, concat, JSON access (ref RT/util/DateFormatUtil, " +
        "DwdTradeCartAdd.java:38-44)."),

    // ----------------------------------------------------- D2/X1/A3 tokenize
    Q(
      "q14_token_explode_count",
      (s, dir) =>
        t(s, dir, "documents")
          .select(explode(split(col("text"), " ")).as("keyword"))
          .filter(col("keyword") =!= "")
          .groupBy(col("keyword"))
          .agg(count(lit(1)).as("keyword_count")),
      Some("""
        SELECT keyword, COUNT(*) AS keyword_count
        FROM (SELECT unnest(string_split(text, ' ')) AS keyword FROM documents)
        WHERE keyword <> ''
        GROUP BY keyword"""),
      "D2/X1/X2/A3: tokenizer UDTF → lateral flatten → per-keyword count " +
        "(ref RT/app/dws/DwsTrafficSourceKeywordPageViewWindow.java:55-69)."))
}
