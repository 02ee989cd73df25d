package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Streaming twin of the q54 DWS province order window WITH the watermark
  * drop-rate metric the reference never exposes (ref
  * RT/app/dws/DwsTradeSkuOrderWindow.java:216-227 — lateness is a silent
  * hard-coded 3 s; drops are invisible in production). Two legs over ONE
  * input stream, the [[StatefulOps.tumblingAggWithLateMetric]] shape:
  *
  *   - agg leg: 3 s OOO watermark → 10 s tumbling windows per province
  *     (user_id mod 25 — identical to q54's `pmod(order_id, 25)` because
  *     the batch detail aliases `user_id AS order_id`,
  *     Pipelines.scala:99) → amount sum + order count;
  *   - metric leg: per-event [[LateMark]]s under the SAME 3 s slack —
  *     exactly batch q113's accounting, so DwsTradeStreamSpec asserts the
  *     streamed drop counts equal the registered q113 on a shared fixture.
  *
  * The metric leg costs one extra shuffle on the key and O(1) state per
  * key, and turns the engine's silent lateness policy into an observable
  * per-day drop rate a 100 TB ingest would alert on.
  */
object DwsTradeStream {

  /** The reference's hard-coded lateness slack (3 s), audited not silent. */
  val SlackMs = 3000L

  /** Input: a streaming frame with `event_id`, `user_id`, `ts` (timestamp),
    * `amount` columns. Returns (windowed province aggregate, late marks).
    */
  def provinceOrderWindow(orders: DataFrame): (DataFrame, Dataset[LateMark]) = {
    import orders.sparkSession.implicits._
    val agg = StatefulOps.tumblingAgg(
      orders.toDF(), "ts", s"$SlackMs milliseconds", "10 seconds",
      keys = Seq(pmod(col("user_id"), lit(25)).as("province_id")),
      aggs = Seq(
        sum(col("amount").cast("decimal(18,2)")).cast("double").as("order_amount"),
        count(lit(1)).as("order_ct")))
    val stamped = orders
      .select(col("user_id").cast("long").as("userId"),
        col("event_id").cast("long").as("eventId"), col("ts"))
      .as[Stamped]
    (agg, StatefulOps.lateDropFlags(stamped, SlackMs))
  }

  /** The per-day drop-rate rollup of the metric leg (what a monitoring
    * sink ingests): day, events seen, events a 3 s watermark would drop.
    */
  def dropRate(marks: DataFrame): DataFrame =
    marks
      .groupBy(to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("late")).cast("long").as("n_late"))
}
