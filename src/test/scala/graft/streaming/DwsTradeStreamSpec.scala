package graft.streaming

import java.sql.Timestamp

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** The DWS pipeline twin EMITS its lateness accounting (round-6 VERDICT
  * directive): DwsTradeStream.provinceOrderWindow's metric leg, rolled up
  * per day, must equal the registered batch q113's 3 s counts on a shared
  * fixture — the drop rate is a pipeline output, not a separate audit
  * someone has to remember to run.
  */
final case class OrderFixture(event_id: Long, user_id: Long, ts: Timestamp,
    amount: Double)

class DwsTradeStreamSpec extends SparkSpec {

  private def ts(sec: Long): Timestamp = new Timestamp(sec * 1000L)

  test("province window twin emits a drop-rate metric equal to batch " +
    "q113's 3 s count on a shared out-of-order fixture") {
    import spark.implicits._
    // same disorder pattern as the lateDropFlags equivalence fixture:
    // per-user mostly-increasing times with 5 s and 60 s regressions
    val orders = (for {
      u <- 1L to 3L
      i <- 0L until 60L
    } yield {
      val base = 1000L + i * 10
      val sec =
        if (i % 13 == 5) base - 15
        else if (i % 17 == 9) base - 70
        else base
      OrderFixture(u * 1000 + i, u, ts(sec + u), (i % 7) + 1.0)
    }).sortBy(_.event_id)
    val dir = java.nio.file.Files.createTempDirectory("dws_late_").toString
    orders.toDF().select(col("user_id"), col("event_id"), col("ts"))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")

    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[OrderFixture]
    val (agg, marks) = DwsTradeStream.provinceOrderWindow(input.toDF())
    val aggQ = agg.writeStream.format("memory").queryName("dws_prov_agg")
      .outputMode("append").start()
    val metricQ = marks.toDF().writeStream.format("memory")
      .queryName("dws_prov_marks").outputMode("append").start()
    try {
      orders.grouped((orders.length + 3) / 4).foreach { b =>
        input.addData(b.toSeq)
        aggQ.processAllAvailable(); metricQ.processAllAvailable()
      }
    } finally { aggQ.stop(); metricQ.stop() }

    val streamed = DwsTradeStream.dropRate(spark.table("dws_prov_marks"))
      .collect()
      .map(r => r.getDate(0).toString -> ((r.getLong(1), r.getLong(2)))).toMap
    val batch = graft.Registry.all.find(_.name == "q113_lateness_audit").get
      .run(spark, dir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(streamed.keySet == batch.keySet)
    batch.foreach { case (day, exp) =>
      assert(streamed(day) == exp, s"drop-rate mismatch on $day")
    }
    // the fixture's disorder is real: some events are late at 3 s
    assert(batch.values.map(_._2).sum > 0)
    // and the agg leg emitted closed province windows alongside the metric
    val aggRows = spark.table("dws_prov_agg")
    assert(aggRows.count() > 0)
    assert(aggRows.select("province_id").distinct().collect()
      .map(_.getLong(0)).forall(p => p >= 0 && p < 25))
  }
}
