package graft.serving

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Serving-layer queries (SURVEY.md §2.13): the publisher's two HTTP
  * endpoints as date-parameterized library functions plus the exact JSON
  * response shapes (ref PUB/controller/TradeStatController.java:29-85,
  * PUB/mapper/TradeStatMapper.java:15-20).
  *
  * The reference serves these from ClickHouse DWS tables; here they run as
  * Spark SQL over the warehouse tables. The date predicate is a SARGABLE
  * half-open range on the raw timestamp column (never a function of the
  * column), so it reaches the parquet scan as PushedFilters and would prune
  * a date-partitioned production table — asserted in ServingSpec.
  */
object Serving {

  /** `[day, day+1)` on o_orderdate for a yyyyMMdd day string; both bounds are
    * foldable literals so the comparison pushes down to the scan.
    */
  private def dayRange(date: String) = {
    val d = to_date(lit(date), "yyyyMMdd")
    col("o_orderdate") >= d.cast("timestamp") &&
      col("o_orderdate") < date_add(d, 1).cast("timestamp")
  }

  /** Q1: GET /gmv?date= — total order amount for one yyyyMMdd day. */
  def gmv(spark: SparkSession, sfDir: String, date: String): DataFrame =
    Tables(spark, sfDir, "orders")
      .filter(dayRange(date))
      .agg(coalesce(sum(col("o_totalprice").cast("decimal(18,2)")), lit(0))
        .cast("double").as("gmv"))

  /** Q1 response: `{"status":0,"data":<amount>}`. */
  def gmvJson(spark: SparkSession, sfDir: String, date: String): String = {
    val amount = gmv(spark, sfDir, date).head().getDouble(0)
    s"""{"status":0,"data":$amount}"""
  }

  /** Q2: GET /province?date= — per-province amounts for one day (nation is
    * the province analog in the test schema).
    */
  def provinceAmounts(spark: SparkSession, sfDir: String, date: String): DataFrame = {
    val o = Tables(spark, sfDir, "orders")
      .filter(dayRange(date))
    val c = Tables(spark, sfDir, "customer")
    val n = Tables(spark, sfDir, "nation")
    o.join(broadcast(c), o("o_custkey") === c("c_custkey"))
      .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .groupBy(col("n_name").as("province_name"))
      .agg(sum(col("o_totalprice").cast("decimal(18,2)")).cast("double")
        .as("order_amount"))
  }

  /** Q2 response: `{"status":0,"data":{"mapData":[{"name":…,"value":…},…],
    * "valueName":"order_amount"}}` (the publisher's map-chart shape).
    */
  def provinceJson(spark: SparkSession, sfDir: String, date: String): String = {
    val rows = provinceAmounts(spark, sfDir, date)
      .orderBy(col("province_name"))
      .collect()
      .map(r => s"""{"name":"${r.getString(0)}","value":${r.getDouble(1)}}""")
    s"""{"status":0,"data":{"mapData":[${rows.mkString(",")}],"valueName":"order_amount"}}"""
  }

  // ------------------------------------------------------------------ DWS
  // The reference's actual serving split: the publisher never scans facts —
  // it reads pre-aggregated ClickHouse dws_* tables
  // (PUB/mapper/TradeStatMapper.java:15-20 FROM dws_trade_province_order
  // _window). The Spark analog: materialize the q54 window output
  // date-partitioned, and serve day queries from it with a partition-pruned
  // one-directory scan. ServingSpec asserts partitionCount == 1.

  /** Writes the q54 DWS province-order-window output as a date-partitioned
    * parquet table (partition column `dt` = the window's day) — run by the
    * batch/streaming pipeline, read by the serving endpoints below.
    */
  def writeDwsProvinceWindow(spark: SparkSession, sfDir: String, path: String): Unit =
    graft.pipelines.Pipelines.provinceOrderWindow(spark, sfDir)
      .withColumn("dt", to_date(substring(col("stt"), 1, 10)))
      .write.mode("overwrite").partitionBy("dt").parquet(path)

  /** `dt = day` against the DATE-typed partition column: lands in the
    * scan's PartitionFilters, so only one directory is listed or read.
    */
  private def dwsDay(date: String) =
    col("dt") === to_date(lit(date), "yyyyMMdd")

  /** GET /gmv served from the DWS table: one pruned partition, then a sum
    * of that day's pre-aggregated 10 s windows — the serving query touches
    * O(day's windows) rows however large the fact history grows.
    */
  def gmvFromDws(spark: SparkSession, dwsPath: String, date: String): DataFrame =
    spark.read.parquet(dwsPath)
      .filter(dwsDay(date))
      .agg(coalesce(sum(col("order_amount")), lit(0.0))
        .cast("double").as("gmv"))

  /** GET /province served from the DWS table: pruned day partition rolled
    * up from 10 s windows to per-province day totals.
    */
  def provinceAmountsFromDws(
      spark: SparkSession, dwsPath: String, date: String): DataFrame =
    spark.read.parquet(dwsPath)
      .filter(dwsDay(date))
      .groupBy(col("province_name"))
      .agg(sum(col("order_amount")).cast("double").as("order_amount"))
}
