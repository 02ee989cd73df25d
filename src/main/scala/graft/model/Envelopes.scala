package graft.model

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The reference's two record envelopes, declared as Spark schemas, plus
  * deterministic synthesizers that replay the driver's `events` table as
  * envelope-encoded JSON streams (the stand-ins for the reference's Kafka
  * topics `topic_db` and `topic_log`).
  *
  * Maxwell CDC envelope (ref RT/util/MyKafkaUtil.java:72-82): `{database,
  * table, type, ts, old MAP<string,string>, data MAP<string,string>}` where
  * `old` is the pre-image of changed columns and all business columns ride as
  * strings inside `data`.
  *
  * Log-event envelope (ref RT/app/dwd/log/DwdTrafficBaseLogSplit.java:162-216
  * and RT/app/dws/DwsTrafficSourceKeywordPageViewWindow.java:36-42):
  * `{common map, page struct, displays array, actions array, err, start, ts}`.
  */
object Envelopes {

  val maxwellSchema: StructType = StructType(Seq(
    StructField("database", StringType),
    StructField("table", StringType),
    StructField("type", StringType),
    StructField("ts", StringType),
    StructField("old", MapType(StringType, StringType)),
    StructField("data", MapType(StringType, StringType))))

  val logSchema: StructType = StructType(Seq(
    StructField("common", MapType(StringType, StringType)),
    StructField("page", StructType(Seq(
      StructField("page_id", StringType),
      StructField("last_page_id", StringType),
      StructField("during_time", LongType)))),
    StructField("displays", ArrayType(StructType(Seq(
      StructField("display_id", LongType),
      StructField("pos_id", LongType))))),
    StructField("actions", ArrayType(StructType(Seq(
      StructField("action_id", LongType))))),
    StructField("err", StructType(Seq(StructField("error_code", LongType)))),
    StructField("start", StructType(Seq(StructField("open_ad_id", LongType)))),
    StructField("ts", LongType)))

  /** The integer payload carried in events.props (`{"k": n}`). */
  def kOf(df: DataFrame): Column = get_json_object(col("props"), "$.k").cast("int")

  /** Deterministic event→CDC mapping shared with the DuckDB oracles:
    * table by event_type, operation type by event_id % 10
    * (0-5 insert, 6-7 update, 8 bootstrap-insert, 9 delete).
    */
  def cdcTable: Column =
    when(col("event_type") === "view", "order_info")
      .when(col("event_type") === "click", "cart_info")
      .when(col("event_type") === "purchase", "order_detail")
      .when(col("event_type") === "error", "comment_info")
      .otherwise("user_info")

  def cdcType: Column = {
    val m = pmod(col("event_id"), lit(10))
    when(m <= 5, "insert")
      .when(m <= 7, "update")
      .when(m === 8, "bootstrap-insert")
      .otherwise("delete")
  }

  /** Replay `events` as a Maxwell-envelope JSON stream: one `value_json`
    * column per record, exactly as a Kafka consumer would see topic_db.
    * `old` carries the pre-image (sku_num halved, previous order_status) on
    * updates, mirroring Maxwell's changed-columns-only contract.
    */
  def maxwellFromEvents(events: DataFrame): DataFrame = {
    val k = get_json_object(col("props"), "$.k").cast("int")
    val m = pmod(col("event_id"), lit(10))
    val isUpdate = m === 6 || m === 7
    val data = map(
      lit("id"), col("event_id").cast("string"),
      lit("user_id"), col("user_id").cast("string"),
      lit("sku_num"), k.cast("string"),
      lit("order_status"), when(isUpdate, lit("1003")).otherwise(lit("1001")))
    val old = when(isUpdate, map(
      lit("sku_num"), floor(k / 2).cast("string"),
      lit("order_status"), lit("1001")))
    events.select(
      col("event_id"), col("user_id"), col("ts"),
      to_json(struct(
        lit("gmall").as("database"),
        cdcTable.as("table"),
        cdcType.as("type"),
        (unix_timestamp(col("ts")) * 1000).cast("string").as("ts"),
        old.as("old"),
        data.as("data"))).as("value_json"))
  }

  /** Parse a Maxwell JSON column through the declared schema (P1). */
  def parseMaxwell(df: DataFrame, jsonCol: String = "value_json"): DataFrame =
    df.withColumn("env", from_json(col(jsonCol), maxwellSchema))

  /** Replay `events` as the nested log-event envelope: error events carry
    * `err`, signups carry `start`, everything else is a page view; view
    * pages expose k%3 display entries, click pages k%2 action entries.
    */
  def logFromEvents(events: DataFrame): DataFrame = {
    val k = kOf(events)
    val nDisp = pmod(k, lit(3))
    val nAct = pmod(k, lit(2))
    val displays = when(col("event_type") === "view" && nDisp > 0,
      transform(sequence(lit(0), nDisp - 1), i =>
        struct(
          (col("event_id") * 10 + i).as("display_id"),
          i.cast("long").as("pos_id"))))
    val actions = when(col("event_type") === "click" && nAct > 0,
      transform(sequence(lit(0), nAct - 1), i =>
        struct((col("event_id") * 100 + i).as("action_id"))))
    val isPage = !col("event_type").isin("error", "signup")
    events.select(
      col("event_id"), col("user_id"), col("ts"),
      to_json(struct(
        map(lit("mid"), concat(lit("mid_"), col("user_id")),
          lit("ch"), col("event_type")).as("common"),
        when(isPage, struct(
          col("event_type").as("page_id"),
          lit(null).cast(StringType).as("last_page_id"),
          k.cast("long").as("during_time"))).as("page"),
        displays.as("displays"),
        actions.as("actions"),
        when(col("event_type") === "error",
          struct(k.cast("long").as("error_code"))).as("err"),
        when(col("event_type") === "signup",
          struct(k.cast("long").as("open_ad_id"))).as("start"),
        (unix_timestamp(col("ts")) * 1000).as("ts"))).as("value_json"))
  }

  /** Parse a log-envelope JSON column through the declared schema (P1). */
  def parseLog(df: DataFrame, jsonCol: String = "value_json"): DataFrame =
    df.withColumn("env", from_json(col(jsonCol), logSchema))

  /** Debezium envelope — the config-table CDC format (ref
    * RT/app/func/TableProcessFunction.java:78-81, RTT/TestFlinkCDC
    * .java:44-47): `{before, after, op}` with op ∈ {c,u,d,r} (create/
    * update/delete/read-snapshot). `before`/`after` carry the
    * table_process row (RT/bean/TableProcess.java:12-24).
    */
  val debeziumSchema: StructType = {
    val row = StructType(Seq(
      StructField("source_table", StringType),
      StructField("sink_table", StringType),
      StructField("sink_columns", StringType),
      StructField("sink_pk", StringType)))
    StructType(Seq(
      StructField("before", row),
      StructField("after", row),
      StructField("op", StringType),
      StructField("ts_ms", LongType))) // Debezium source event stamp — the
      // fold order; row order off the wire is NOT guaranteed
  }

  /** Parse a Debezium JSON column through the declared schema (P1). */
  def parseDebezium(df: DataFrame, jsonCol: String = "value_json"): DataFrame =
    df.withColumn("env", from_json(col(jsonCol), debeziumSchema))
}
