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

  test("DwdLogStream repair+keyword topology resumes from checkpoint without dupes or losses") {
    import graft.model.Envelopes
    import spark.implicits._
    val inDir = Files.createTempDirectory("logckpt_in").toString
    val outDir = Files.createTempDirectory("logckpt_out").toString
    val ckpt = Files.createTempDirectory("logckpt_state").toString

    def ts(sec: Long) = new java.sql.Timestamp(sec * 1000L)
    def writeEvents(rows: Seq[(Long, Long, String, String, java.sql.Timestamp)]): Unit =
      rows.toDF("event_id", "user_id", "event_type", "props", "ts")
        .coalesce(1).write.mode("append").parquet(inDir)

    // pages tokenize their page_id (= event_type); 10 s windows
    writeEvents(Seq(
      (1L, 10L, "view", """{"k":1}""", ts(5)),
      (2L, 11L, "click", """{"k":1}""", ts(6))))

    def pipeline() = {
      val schema = spark.read.parquet(inDir).schema
      val src = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1").parquet(inDir)
      DwdLogStream.keywordWindow(
        StatefulOps.newVisitorRepair(
          DwdLogStream.pageViews(Envelopes.parseLog(Envelopes.logFromEvents(src)))))
        .writeStream.format("parquet")
        .option("path", outDir).option("checkpointLocation", ckpt)
        .outputMode("append").start()
    }

    val q1 = pipeline()
    try q1.processAllAvailable() finally q1.stop()

    // restart: more pages in a later window plus a wake event far ahead so
    // the earlier windows finalize AFTER recovery — their counts must
    // include the pre-restart events exactly once
    writeEvents(Seq(
      (3L, 10L, "view", """{"k":1}""", ts(15)),
      (4L, 12L, "purchase", """{"k":1}""", ts(16)),
      (5L, 99L, "view", """{"k":1}""", ts(1000))))

    val q2 = pipeline()
    try q2.processAllAvailable() finally q2.stop()

    val out = spark.read.parquet(outDir)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    assert(out == Set(
      ("1970-01-01 00:00:00", "view", 1L),
      ("1970-01-01 00:00:00", "click", 1L),
      ("1970-01-01 00:00:10", "view", 1L),
      ("1970-01-01 00:00:10", "purchase", 1L)),
      s"checkpoint recovery lost or duplicated window state: $out")
  }
}
