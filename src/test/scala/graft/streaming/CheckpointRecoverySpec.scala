package graft.streaming

import java.nio.file.Files

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Fault tolerance: a stateful streaming query stopped and restarted from
  * its checkpoint must keep its keyed state (the reference's
  * checkpointing/exactly-once story, SURVEY §4 — `RT/app/dim/DimApp
  * .java:82-99`). If state were lost, the same (mid, day) would pass the
  * daily-UV dedup twice after restart.
  */
class CheckpointRecoverySpec extends SparkSpec {

  test("dailyUv state survives a stop/restart from checkpoint") {
    import spark.implicits._
    val inDir = Files.createTempDirectory("ckpt_in").toString
    val outDir = Files.createTempDirectory("ckpt_out").toString
    val ckpt = Files.createTempDirectory("ckpt_state").toString

    def writeBatch(name: String, rows: Seq[PageView]): Unit =
      rows.toDF().coalesce(1).write.mode("append").parquet(inDir)

    def ts(sec: Long) = new java.sql.Timestamp(sec * 1000L)

    // batch 1: mid "a" visits on day 1
    writeBatch("b1", Seq(
      PageView("a", "home", None, 1, ts(100)),
      PageView("b", "home", None, 1, ts(200))))

    def pipeline() = {
      val schema = spark.read.parquet(inDir).schema
      val src = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1").parquet(inDir).as[PageView]
      StatefulOps.dailyUv(src)
        .writeStream.format("parquet")
        .option("path", outDir).option("checkpointLocation", ckpt)
        .outputMode("append").start()
    }

    val q1 = pipeline()
    try q1.processAllAvailable() finally q1.stop()
    assert(spark.read.parquet(outDir).count() == 2)

    // batch 2 AFTER restart: a repeat visit (must be suppressed by the
    // restored state) and a genuinely new day (must pass)
    writeBatch("b2", Seq(
      PageView("a", "home", None, 1, ts(300)),         // same day: dedup
      PageView("a", "home", None, 1, ts(86400 + 10)))) // next day: passes

    val q2 = pipeline()
    try q2.processAllAvailable() finally q2.stop()

    val out = spark.read.parquet(outDir)
      .select("mid", "ts").collect()
      .map(r => (r.getString(0), r.getTimestamp(1).getTime / 1000)).toSet
    assert(out == Set(("a", 100L), ("b", 200L), ("a", 86410L)),
      s"state not restored correctly: $out")
  }
}
