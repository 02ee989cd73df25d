package graft.pipelines

import graft.{Q, Tables}
import graft.model.Envelopes
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The reference's multi-operator jobs recomposed as pipelines over the
  * envelope replay (SURVEY §3): each is a plain DataFrame→DataFrame
  * composition of the operator library, so the same code runs batch (for the
  * oracle) and under Structured Streaming (stateless stages stream as-is;
  * the stateful/join stages have streaming renditions in graft.streaming —
  * watermarked joins in StreamJoinSpec, keyed state in StatefulOps).
  *
  * Derivation of the "business tables" from the events replay (the driver
  * testdata has no FK-linked CDC tables, so user_id doubles as order_id —
  * deterministic and oracle-replicable):
  *  - order_detail: purchase events (detail_id, order_id=user_id, amount)
  *  - order_info:   one row per viewing user (order_id, status)
  *  - order_activity / order_coupon: click / error users (left-join sides)
  *  - base_dic:     nation (dic_code = order_id % 25)
  */
object Pipelines {

  /** DwdTradeOrderPreProcess (ref RT/app/dwd/db/DwdTradeOrderPreProcess
    * .java:17-178): inner join fact-fact + two left joins + dict lookup, the
    * reference's heaviest DWD topology (J1+J2+J3+P3/P4 in one plan).
    */
  def orderPreprocess(s: SparkSession, dir: String): DataFrame = {
    val e = Tables(s, dir, "events")
    val k = Envelopes.kOf(e)
    val detail = e.filter(col("event_type") === "purchase")
      .select(col("event_id").as("detail_id"), col("user_id").as("order_id"),
        k.as("sku_num"))
    val info = e.filter(col("event_type") === "view")
      .groupBy(col("user_id").as("oi_order_id"))
      .agg(min(col("event_id")).as("oi_min_event"))
    val activity = e.filter(col("event_type") === "click")
      .groupBy(col("user_id").as("act_order_id"))
      .agg(min(Envelopes.kOf(e)).as("activity_id"))
    val coupon = e.filter(col("event_type") === "error")
      .groupBy(col("user_id").as("cou_order_id"))
      .agg(min(Envelopes.kOf(e)).as("coupon_id"))
    val dic = Tables(s, dir, "nation")
      .select(col("n_nationkey").as("dic_code"), col("n_name").as("dic_name"))
    detail
      .join(info, col("order_id") === col("oi_order_id"), "inner")
      .join(activity, col("order_id") === col("act_order_id"), "left_outer")
      .join(coupon, col("order_id") === col("cou_order_id"), "left_outer")
      .join(broadcast(dic), pmod(col("order_id"), lit(25)) === col("dic_code"))
      .select(col("detail_id"), col("order_id"), col("sku_num"),
        col("oi_min_event"), col("activity_id"), col("coupon_id"),
        col("dic_name"))
  }

  /** DwsTradeSkuOrderWindow (ref RT/app/dws/DwsTradeSkuOrderWindow
    * .java:88-387): stateful first-order flag → 10 s tumbling window per sku
    * → amount sums + exact distinct users → dim enrichment. The reference's
    * six chained async dim lookups collapse into one broadcast join.
    */
  def skuOrderWindow(s: SparkSession, dir: String): DataFrame = {
    val e = Tables(s, dir, "events")
    val orders = e.filter(col("event_type") === "purchase")
      .withColumn("sku_id", pmod(Envelopes.kOf(e), lit(10)) + 1)
    val flagged = orders.withColumn("order_uu",
      when(row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("user_id"), to_date(col("ts")))
          .orderBy(col("ts"), col("event_id"))) === 1, 1).otherwise(0))
    val windowed = flagged
      .groupBy(window(col("ts"), "10 seconds"), col("sku_id"))
      .agg(
        sum(col("value").cast("decimal(18,2)")).cast("double").as("order_amount"),
        countDistinct(col("user_id")).as("order_user_ct"),
        sum(col("order_uu")).as("order_uu_ct"))
    val part = Tables(s, dir, "part")
      .select(col("p_partkey"), col("p_name"), col("p_brand"))
    windowed
      .join(broadcast(part), col("sku_id") === col("p_partkey"))
      .select(
        date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss").as("stt"),
        date_format(col("window.end"), "yyyy-MM-dd HH:mm:ss").as("edt"),
        col("sku_id"), col("p_name"), col("p_brand"),
        col("order_amount"), col("order_user_ct"), col("order_uu_ct"))
  }

  /** DwsTradeProvinceOrderWindow (ref RT/app/dws/DwsTradeProvinceOrderWindow
    * .java:82-201): keep-latest dedup per order-detail key (ST3) → 3 s OOO
    * watermark → 10 s tumbling window per province → amount sum + EXACT
    * distinct order-id set (A4, the reference's HashSet-in-bean semantics,
    * here the typed DistinctSetAgg Aggregator) → broadcast province dim.
    * The async HBase dim lookup collapses into one broadcast join.
    */
  def provinceOrderWindow(s: SparkSession, dir: String): DataFrame = {
    val e = Tables(s, dir, "events")
    val detail = e.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("ts"), col("user_id").as("order_id"),
        Envelopes.kOf(e).as("sku_num"), col("value"))
    // ST3: one live version per (order_id, sku_num) detail key, latest wins
    val w = Window.partitionBy(col("order_id"), col("sku_num"))
      .orderBy(col("ts").desc, col("event_id").desc)
    val dedup = detail.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
    val setCount = udaf(graft.functions.DistinctSetAgg)
    val windowed = dedup
      .withColumn("province_id", pmod(col("order_id"), lit(25)))
      .groupBy(window(col("ts"), "10 seconds"), col("province_id"))
      .agg(
        sum(col("value").cast("decimal(18,2)")).cast("double").as("order_amount"),
        setCount(col("order_id").cast("string")).as("order_count"))
    val prov = Tables(s, dir, "nation")
      .select(col("n_nationkey"), col("n_name"))
    windowed
      .join(broadcast(prov), col("province_id") === col("n_nationkey"))
      .select(
        date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss").as("stt"),
        date_format(col("window.end"), "yyyy-MM-dd HH:mm:ss").as("edt"),
        col("province_id"), col("n_name").as("province_name"),
        col("order_amount"), col("order_count"))
  }

  /** DwdTradePayDetailSuc (ref RT/app/dwd/db/DwdTradePayDetailSuc
    * .java:26-108): order_detail ⋈ payment_info ⋈ dict lookup. The
    * reference's 15 min 10 s idle-state retention is the join's real
    * semantic — a detail row waits a bounded time for its payment — so the
    * batch rendition carries it as an explicit interval predicate
    * (pay.ts in [detail.ts, detail.ts + TTL]); the streaming rendition is
    * the watermarked range join in StreamJoinSpec. TTL scaled 15 min → 24 h
    * because the events replay dilates one business day over ~30 days.
    */
  def payDetailSuc(s: SparkSession, dir: String): DataFrame = {
    val e = Tables(s, dir, "events")
    val detail = e.filter(col("event_type") === "purchase")
      .select(col("event_id").as("detail_id"), col("user_id").as("order_id"),
        Envelopes.kOf(e).as("sku_num"), col("ts").as("od_ts"),
        col("value").cast("decimal(18,2)").as("split_payment_amount"))
    // payment success callbacks: every click within the TTL of the detail
    // row (the reference joins every payment_info row — no dedup)
    val clicks = e.filter(col("event_type") === "click")
    val payment = clicks
      .select(col("user_id").as("pay_order_id"), col("ts").as("callback_time"),
        pmod(Envelopes.kOf(clicks), lit(25)).as("payment_type"))
    val dic = Tables(s, dir, "nation")
      .select(col("n_nationkey").as("dic_code"), col("n_name").as("payment_type_name"))
    detail
      .join(payment,
        col("order_id") === col("pay_order_id") &&
          col("callback_time") >= col("od_ts") &&
          col("callback_time") <= col("od_ts") + expr("INTERVAL 24 HOURS"))
      .join(broadcast(dic), col("payment_type") === col("dic_code"))
      .select(col("detail_id"), col("order_id"), col("sku_num"),
        col("payment_type_name"),
        date_format(col("callback_time"), "yyyy-MM-dd HH:mm:ss").as("callback_time"),
        col("split_payment_amount").cast("double").as("split_payment_amount"))
  }

  val all: Seq[Q] = Seq(
    Q(
      "q41_order_preprocess",
      orderPreprocess,
      Some("""
        WITH k AS (SELECT event_id, user_id, event_type,
                          CAST(json_extract_string(props, '$.k') AS INT) AS k
                   FROM events),
        detail AS (SELECT event_id AS detail_id, user_id AS order_id, k AS sku_num
                   FROM k WHERE event_type = 'purchase'),
        info AS (SELECT user_id AS order_id, MIN(event_id) AS oi_min_event
                 FROM k WHERE event_type = 'view' GROUP BY 1),
        act AS (SELECT user_id AS order_id, MIN(k) AS activity_id
                FROM k WHERE event_type = 'click' GROUP BY 1),
        cou AS (SELECT user_id AS order_id, MIN(k) AS coupon_id
                FROM k WHERE event_type = 'error' GROUP BY 1)
        SELECT d.detail_id, d.order_id, d.sku_num, i.oi_min_event,
               a.activity_id, c.coupon_id, n.n_name AS dic_name
        FROM detail d
        JOIN info i USING (order_id)
        LEFT JOIN act a USING (order_id)
        LEFT JOIN cou c USING (order_id)
        JOIN nation n ON d.order_id % 25 = n.n_nationkey"""),
      "Pipeline: DwdTradeOrderPreProcess — inner + 2x left + dict lookup " +
        "joins in one plan (ref RT/app/dwd/db/DwdTradeOrderPreProcess" +
        ".java:92-133)."),

    Q(
      "q42_dws_sku_order_window",
      skuOrderWindow,
      Some("""
        WITH o AS (
          SELECT event_id, user_id, value, CAST(ts AS TIMESTAMP) AS ts,
                 CAST(json_extract_string(props, '$.k') AS INT) % 10 + 1 AS sku_id
          FROM events WHERE event_type = 'purchase'),
        f AS (SELECT *, CASE WHEN row_number() OVER (
                 PARTITION BY user_id, CAST(ts AS DATE)
                 ORDER BY ts, event_id) = 1 THEN 1 ELSE 0 END AS order_uu
              FROM o),
        w AS (SELECT time_bucket(INTERVAL '10 seconds', ts) AS ws, sku_id,
                     CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS order_amount,
                     COUNT(DISTINCT user_id) AS order_user_ct,
                     CAST(SUM(order_uu) AS BIGINT) AS order_uu_ct
              FROM f GROUP BY 1, 2)
        SELECT strftime(ws, '%Y-%m-%d %H:%M:%S') AS stt,
               strftime(ws + INTERVAL 10 SECOND, '%Y-%m-%d %H:%M:%S') AS edt,
               sku_id, p.p_name, p.p_brand,
               order_amount, order_user_ct, order_uu_ct
        FROM w JOIN part p ON w.sku_id = p.p_partkey"""),
      "Pipeline: DwsTradeSkuOrderWindow — first-order flag -> 10 s window " +
        "per sku -> sums + exact distinct -> broadcast dim enrichment " +
        "(ref RT/app/dws/DwsTradeSkuOrderWindow.java:88-387)."),

    Q(
      "q47_refund_pay_success",
      (s, dir) => {
        // DwdTradeRefundPaySuc: refund_payment ⋈ refund_info on the
        // composite (order_id, sku_id) key, plus TWO dict-join roles
        // (payment type / refund type) against the same broadcast dict
        // (ref RT/app/dwd/db/DwdTradeRefundPaySuc.java:39-107).
        val e = Tables(s, dir, "events")
        val k = Envelopes.kOf(e)
        val pay = e.filter(col("event_type") === "purchase")
          .select(col("event_id").as("pay_id"), col("user_id").as("order_id"),
            k.as("sku_id"), col("value").cast("decimal(18,2)").as("amount"))
        val refund = e.filter(col("event_type") === "error")
          .select(col("user_id").as("r_order_id"),
            Envelopes.kOf(e).as("r_sku_id"))
          .distinct()
        val dic = Tables(s, dir, "nation")
          .select(col("n_nationkey").as("dic_code"), col("n_name").as("dic_name"))
        val payDic = dic.select(col("dic_code").as("pay_dic_code"),
          col("dic_name").as("payment_type_name"))
        val refDic = dic.select(col("dic_code").as("ref_dic_code"),
          col("dic_name").as("refund_type_name"))
        pay
          .join(refund, col("order_id") === col("r_order_id") &&
            pmod(col("sku_id"), lit(5)) === pmod(col("r_sku_id"), lit(5)))
          .join(broadcast(payDic), pmod(col("pay_id"), lit(25)) === col("pay_dic_code"))
          .join(broadcast(refDic), pmod(col("order_id"), lit(25)) === col("ref_dic_code"))
          .groupBy(col("payment_type_name"), col("refund_type_name"))
          .agg(count(lit(1)).as("refund_ct"),
            sum(col("amount")).cast("double").as("refund_amount"))
      },
      Some("""
        WITH k AS (SELECT event_id, user_id, event_type, value,
                          CAST(json_extract_string(props, '$.k') AS INT) AS k
                   FROM events),
        pay AS (SELECT event_id AS pay_id, user_id AS order_id, k AS sku_id,
                       CAST(value AS DECIMAL(18,2)) AS amount
                FROM k WHERE event_type = 'purchase'),
        refund AS (SELECT DISTINCT user_id AS r_order_id, k AS r_sku_id
                   FROM k WHERE event_type = 'error')
        SELECT pd.n_name AS payment_type_name, rd.n_name AS refund_type_name,
               COUNT(*) AS refund_ct,
               CAST(SUM(amount) AS DOUBLE) AS refund_amount
        FROM pay p
        JOIN refund r ON p.order_id = r.r_order_id
                     AND p.sku_id % 5 = r.r_sku_id % 5
        JOIN nation pd ON p.pay_id % 25 = pd.n_nationkey
        JOIN nation rd ON p.order_id % 25 = rd.n_nationkey
        GROUP BY 1, 2"""),
      "Pipeline: DwdTradeRefundPaySuc — composite-key fact join (J8) plus " +
        "the double dict-lookup join with two roles (J3, ref " +
        "RT/app/dwd/db/DwdTradeRefundPaySuc.java:97-107)."),

    Q(
      "q54_dws_province_order_window",
      provinceOrderWindow,
      Some("""
        WITH o AS (
          SELECT event_id, user_id AS order_id, value, CAST(ts AS TIMESTAMP) AS ts,
                 CAST(json_extract_string(props, '$.k') AS INT) AS sku_num
          FROM events WHERE event_type = 'purchase'),
        d AS (SELECT *, row_number() OVER (PARTITION BY order_id, sku_num
                    ORDER BY ts DESC, event_id DESC) AS rn
              FROM o),
        dd AS (SELECT * FROM d WHERE rn = 1),
        w AS (SELECT time_bucket(INTERVAL '10 seconds', ts) AS ws,
                     order_id % 25 AS province_id,
                     CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS order_amount,
                     COUNT(DISTINCT order_id) AS order_count
              FROM dd GROUP BY 1, 2)
        SELECT strftime(ws, '%Y-%m-%d %H:%M:%S') AS stt,
               strftime(ws + INTERVAL 10 SECOND, '%Y-%m-%d %H:%M:%S') AS edt,
               province_id, n.n_name AS province_name,
               order_amount, order_count
        FROM w JOIN nation n ON w.province_id = n.n_nationkey"""),
      "Pipeline: DwsTradeProvinceOrderWindow — ST3 keep-latest dedup -> " +
        "10 s window per province -> amount sum + exact distinct order set " +
        "(A4 typed Aggregator) -> broadcast province dim " +
        "(ref RT/app/dws/DwsTradeProvinceOrderWindow.java:82-201)."),

    Q(
      "q55_pay_detail_suc",
      payDetailSuc,
      Some("""
        WITH k AS (SELECT event_id, user_id, event_type, value,
                          CAST(ts AS TIMESTAMP) AS ts,
                          CAST(json_extract_string(props, '$.k') AS INT) AS k
                   FROM events),
        detail AS (SELECT event_id AS detail_id, user_id AS order_id,
                          k AS sku_num, ts AS od_ts,
                          CAST(value AS DECIMAL(18,2)) AS amount
                   FROM k WHERE event_type = 'purchase'),
        pay AS (SELECT user_id AS pay_order_id, ts AS callback_time,
                       k % 25 AS payment_type
                FROM k WHERE event_type = 'click')
        SELECT d.detail_id, d.order_id, d.sku_num,
               n.n_name AS payment_type_name,
               strftime(p.callback_time, '%Y-%m-%d %H:%M:%S') AS callback_time,
               CAST(d.amount AS DOUBLE) AS split_payment_amount
        FROM detail d
        JOIN pay p ON d.order_id = p.pay_order_id
                  AND p.callback_time >= d.od_ts
                  AND p.callback_time <= d.od_ts + INTERVAL 24 HOUR
        JOIN nation n ON p.payment_type = n.n_nationkey"""),
      "Pipeline: DwdTradePayDetailSuc — order_detail x payment-success x " +
        "dict lookup with the 15 min idle-TTL as an explicit interval " +
        "predicate (ref RT/app/dwd/db/DwdTradePayDetailSuc.java:26-108)."))
}
