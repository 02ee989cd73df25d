package graft.streaming

import java.sql.Timestamp

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** The reference's heaviest DWD topology — DwdTradeOrderPreProcess's
  * 5-table join (inner ⋈ + two left ⋈ + dict lookup,
  * RT/app/dwd/db/DwdTradeOrderPreProcess.java:92-133) — as a genuine
  * Structured Streaming job: four MemoryStreams, watermarks + time-range
  * conditions bounding every join's state, broadcast dict, chained
  * stateful operators in one query.
  */
case class SDetail(detailId: Long, orderId: Long, skuNum: Int, dTs: Timestamp)
case class SInfo(infoOrderId: Long, status: String, iTs: Timestamp)
case class SAct(actOrderId: Long, activityId: Long, aTs: Timestamp)
case class SCou(couOrderId: Long, couponId: Long, cTs: Timestamp)

class OrderPreprocessStreamSpec extends SparkSpec {

  private def ts(sec: Long): Timestamp = new Timestamp(sec * 1000L)

  test("4-way watermarked stream join with dict lookup matches expected wide rows") {
    import spark.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val details = MemoryStream[SDetail]
    val infos = MemoryStream[SInfo]
    val acts = MemoryStream[SAct]
    val cous = MemoryStream[SCou]
    val dict = Seq((0L, "dic_zero"), (1L, "dic_one"))
      .toDF("dic_code", "dic_name")

    val wide = details.toDS().withWatermark("dTs", "5 seconds")
      .join(infos.toDS().withWatermark("iTs", "5 seconds"),
        expr("orderId = infoOrderId AND iTs BETWEEN dTs - INTERVAL 30 SECONDS " +
          "AND dTs + INTERVAL 30 SECONDS"))
      .join(acts.toDS().withWatermark("aTs", "5 seconds"),
        expr("orderId = actOrderId AND aTs BETWEEN dTs - INTERVAL 30 SECONDS " +
          "AND dTs + INTERVAL 30 SECONDS"), "left_outer")
      .join(cous.toDS().withWatermark("cTs", "5 seconds"),
        expr("orderId = couOrderId AND cTs BETWEEN dTs - INTERVAL 30 SECONDS " +
          "AND dTs + INTERVAL 30 SECONDS"), "left_outer")
      .join(broadcast(dict), pmod(col("orderId"), lit(2)) === col("dic_code"))
      .select($"detailId", $"orderId", $"status", $"activityId", $"couponId",
        $"dic_name")

    val q = wide.writeStream.format("memory").queryName("preproc_out")
      .outputMode("append").start()
    try {
      // order 1: full enrichment; order 2: no activity/coupon (left nulls)
      details.addData(Seq(
        SDetail(11, 1, 3, ts(100)), SDetail(12, 2, 1, ts(101))))
      infos.addData(Seq(SInfo(1, "1001", ts(100)), SInfo(2, "1002", ts(101))))
      acts.addData(Seq(SAct(1, 501, ts(102))))
      cous.addData(Seq(SCou(1, 601, ts(103))))
      q.processAllAvailable()
      // advance all four watermarks far enough to close order 2's ranges
      details.addData(Seq(SDetail(99, 999, 0, ts(500))))
      infos.addData(Seq(SInfo(998, "x", ts(500))))
      acts.addData(Seq(SAct(997, 0, ts(500))))
      cous.addData(Seq(SCou(996, 0, ts(500))))
      q.processAllAvailable()
      details.addData(Seq(SDetail(98, 995, 0, ts(900))))
      infos.addData(Seq(SInfo(994, "x", ts(900))))
      acts.addData(Seq(SAct(993, 0, ts(900))))
      cous.addData(Seq(SCou(992, 0, ts(900))))
      q.processAllAvailable()
    } finally q.stop()

    val rows = spark.table("preproc_out")
      .filter($"orderId" < 100)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        if (r.isNullAt(3)) -1L else r.getLong(3),
        if (r.isNullAt(4)) -1L else r.getLong(4),
        r.getString(5))).toSet
    assert(rows.contains((11L, 1L, "1001", 501L, 601L, "dic_one")),
      s"fully enriched row missing: $rows")
    assert(rows.contains((12L, 2L, "1002", -1L, -1L, "dic_zero")),
      s"left-null row missing: $rows")
  }
}
