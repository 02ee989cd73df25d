package graft.streaming

import java.sql.Timestamp

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** J1/J2 in their true streaming form (ref RT/app/dwd/db/
  * DwdTradeOrderPreProcess.java:125-131): watermarked stream-stream joins
  * with a time-range condition bounding join state (the Spark analog of the
  * reference's 15-minute idle-state retention, SURVEY §2.8 W8).
  */
case class OrderInfo(orderId: Long, userId: String, oTs: Timestamp)
case class OrderDetail(detailId: Long, orderId2: Long, amount: Double, dTs: Timestamp)
case class PayInfo(payOrderId: Long, paymentType: Int, cbTs: Timestamp)

class StreamJoinSpec extends SparkSpec {

  private def ts(sec: Long): Timestamp = new Timestamp(sec * 1000L)

  test("J1 streaming inner equi join with watermark-bounded state") {
    import spark.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val infos = MemoryStream[OrderInfo]
    val details = MemoryStream[OrderDetail]
    val joined = infos.toDS().withWatermark("oTs", "10 seconds")
      .join(
        details.toDS().withWatermark("dTs", "10 seconds"),
        expr("orderId = orderId2 AND dTs BETWEEN oTs - INTERVAL 30 SECONDS " +
          "AND oTs + INTERVAL 30 SECONDS"))
      .select($"orderId", $"userId", $"amount")
    val q = joined.writeStream.format("memory").queryName("j1_out")
      .outputMode("append").start()
    try {
      infos.addData(Seq(OrderInfo(1, "u1", ts(100)), OrderInfo(2, "u2", ts(105))))
      q.processAllAvailable()
      // detail for order 1 arrives later, within the range: still joins
      details.addData(Seq(OrderDetail(11, 1, 9.5, ts(110)),
        OrderDetail(12, 3, 1.0, ts(110)))) // no matching order: dropped
      q.processAllAvailable()
    } finally q.stop()
    val rows = spark.table("j1_out").as[(Long, String, Double)].collect().toSeq
    assert(rows == Seq((1L, "u1", 9.5)))
  }

  test("J2 streaming left outer join emits left-null after watermark closes") {
    import spark.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val infos = MemoryStream[OrderInfo]
    val details = MemoryStream[OrderDetail]
    val joined = infos.toDS().withWatermark("oTs", "5 seconds")
      .join(
        details.toDS().withWatermark("dTs", "5 seconds"),
        expr("orderId = orderId2 AND dTs BETWEEN oTs AND oTs + INTERVAL 10 SECONDS"),
        "left_outer")
      .select($"orderId", $"amount")
    val q = joined.writeStream.format("memory").queryName("j2_out")
      .outputMode("append").start()
    try {
      infos.addData(Seq(OrderInfo(1, "u1", ts(100)), OrderInfo(2, "u2", ts(100))))
      details.addData(Seq(OrderDetail(11, 1, 9.5, ts(105))))
      q.processAllAvailable()
      // push both watermarks far past order 2's range: the unmatched left
      // row must be emitted with a null right side (no retraction needed —
      // the reference's downstream keep-latest handles the same case)
      infos.addData(Seq(OrderInfo(99, "zz", ts(500))))
      details.addData(Seq(OrderDetail(99, 98, 0.0, ts(500))))
      q.processAllAvailable()
      infos.addData(Seq(OrderInfo(100, "zz", ts(600))))
      details.addData(Seq(OrderDetail(100, 99, 0.0, ts(600))))
      q.processAllAvailable()
    } finally q.stop()
    val rows = spark.table("j2_out")
      .select($"orderId", $"amount").collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) None else Some(r.getDouble(1))))
      .toSeq.sortBy(_._1)
    assert(rows.contains((1L, Some(9.5))))
    assert(rows.contains((2L, None)), s"unmatched left not emitted: $rows")
  }

  test("q55 pay-detail-suc streaming: 15 min 10 s TTL as watermark range join " +
    "+ dict lookup (ref RT/app/dwd/db/DwdTradePayDetailSuc.java:26-108)") {
    import spark.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val details = MemoryStream[OrderDetail]
    val pays = MemoryStream[PayInfo]
    val dic = Seq((0, "cash"), (1, "card")).toDF("dic_code", "payment_type_name")
    // the reference's setIdleStateRetention(15 min 10 s) IS this pair of
    // watermarks + the range condition: a detail row's join state is
    // droppable once the payment watermark passes od_ts + TTL
    val joined = details.toDS().withWatermark("dTs", "10 seconds")
      .join(
        pays.toDS().withWatermark("cbTs", "10 seconds"),
        expr("orderId2 = payOrderId AND " +
          "cbTs BETWEEN dTs AND dTs + INTERVAL 15 MINUTES 10 SECONDS"))
      .join(broadcast(dic), col("paymentType") === col("dic_code"))
      .select($"detailId", $"payOrderId", $"payment_type_name", $"amount")
    val q = joined.writeStream.format("memory").queryName("q55_out")
      .outputMode("append").start()
    try {
      details.addData(Seq(
        OrderDetail(11, 1, 9.5, ts(1000)),
        OrderDetail(12, 2, 3.0, ts(1000))))
      q.processAllAvailable()
      // order 1 pays inside the TTL -> joins; order 2 pays after it -> dropped
      pays.addData(Seq(
        PayInfo(1, 0, ts(1000 + 900)),
        PayInfo(2, 1, ts(1000 + 911))))
      q.processAllAvailable()
    } finally q.stop()
    val rows = spark.table("q55_out")
      .as[(Long, Long, String, Double)].collect().toSeq
    assert(rows == Seq((11L, 1L, "cash", 9.5)), s"got $rows")
  }
}
