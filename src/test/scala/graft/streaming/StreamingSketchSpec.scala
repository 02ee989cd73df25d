package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

final case class LenRow(lang: String, n_chars: Long)

/** Streamed ≡ batch for the log-histogram quantile sketch twin: the
  * running (lang, bucket) counts accumulated over micro-batches must
  * equal the batch value histogram, and the serving-time estimates from
  * the streamed sketch must equal the registered q138's est columns on
  * the same corpus — the mergeable-sketch claim exercised through the
  * actual streaming engine, not just the shard-addition unit test.
  */
class StreamingSketchSpec extends SparkSpec {

  test("streamed sketch counts and estimates equal the batch q138 form") {
    import spark.implicits._
    val sfDir = "/root/testdata/sf0.001"
    val docsDf = graft.Tables(spark, sfDir, "documents")
      .select(col("lang"), col("n_chars"))

    val batchSketch = StreamingSketch.sketch(docsDf)
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2))
      .toMap

    val rows = docsDf.as[LenRow].collect().sortBy(r => (r.lang, r.n_chars))
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[LenRow]
    // complete mode: the sink table is replaced with the full (tiny,
    // strata × buckets-bounded) sketch state each trigger — the final
    // table IS the corpus sketch
    val q = StreamingSketch.sketch(input.toDF())
      .writeStream.format("memory").queryName("sketch_out")
      .outputMode("complete").start()
    try {
      rows.grouped((rows.length + 3) / 4).foreach { b =>
        input.addData(b.toSeq); q.processAllAvailable()
      }
    } finally q.stop()

    val streamed = spark.table("sketch_out")
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2))
      .toMap
    assert(streamed == batchSketch,
      "streamed bucket counts diverge from the batch value histogram")

    // serving-time estimates from the streamed sketch == q138's est leg
    val est = StreamingSketch.estimates(spark.table("sketch_out"))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5)))).toMap
    val q138 = graft.Registry.all.find(_.name == "q138_logq_sketch").get
      .run(spark, sfDir)
      .select(col("lang"), col("n"), col("n_buckets"),
        col("est_p50"), col("est_p90"), col("est_p99"))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5)))).toMap
    assert(est == q138,
      "estimates from the streamed sketch diverge from batch q138")
  }

  test("sketch state survives a stop/restart from checkpoint exactly once") {
    import java.nio.file.Files
    import spark.implicits._
    val inDir = Files.createTempDirectory("sketch_in").toString
    val ckpt = Files.createTempDirectory("sketch_ckpt").toString

    def write(rows: Seq[LenRow]): Unit =
      rows.toDF().coalesce(1).write.mode("append").parquet(inDir)

    val batch1 = (1L to 300L).map(i => LenRow(s"l${i % 2}", (i * 13) % 500 + 1))
    val batch2 = (301L to 500L).map(i => LenRow(s"l${i % 2}", (i * 13) % 500 + 1))
    write(batch1)

    def pipeline(name: String) = {
      val schema = spark.read.parquet(inDir).schema
      StreamingSketch.sketch(
          spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", "1").parquet(inDir))
        .writeStream.format("memory").queryName(name)
        .option("checkpointLocation", ckpt)
        .outputMode("complete").start()
    }

    val q1 = pipeline("sketch_run1")
    try q1.processAllAvailable() finally q1.stop()

    write(batch2)
    val q2 = pipeline("sketch_run2")
    try q2.processAllAvailable() finally q2.stop()

    // the restarted query's complete-mode state must cover BOTH batches
    // exactly once — lost state would count only batch2, replayed input
    // would double batch1
    val streamed = spark.table("sketch_run2")
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2))
      .toMap
    val expected = StreamingSketch.sketch((batch1 ++ batch2).toDF())
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2))
      .toMap
    assert(streamed == expected,
      "sketch state lost or duplicated across the restart")
  }

  test("windowed occupancy: streamed closed windows equal batch q140") {
    import spark.implicits._
    val sfDir = "/root/testdata/sf0.001"
    val ev = graft.Tables(spark, sfDir, "events")
      .filter(col("user_id").isNotNull && col("ts").isNotNull)
      .select(col("ts"), col("user_id"), col("event_type"))
      .as[(java.sql.Timestamp, Long, String)]
      .collect().sortBy(_._1.getTime)
    // wake event far past the last day so every real window closes and
    // emits in append mode; its own (never-closed) window must not emit
    val wake = (new java.sql.Timestamp(
      ev.last._1.getTime + 40L * 24 * 3600 * 1000), 999999L, "wake")

    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(java.sql.Timestamp, Long, String)]
    val q = StreamingSketch.windowedOccupancy(
        input.toDF().toDF("ts", "user_id", "event_type"))
      .writeStream.format("memory").queryName("wsketch_out")
      .outputMode("append").start()
    try {
      (ev.grouped((ev.length + 3) / 4).map(_.toSeq).toSeq :+ Seq(wake))
        .foreach { b => input.addData(b); q.processAllAvailable() }
    } finally q.stop()

    val streamed = spark.table("wsketch_out")
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), if (r.isNullAt(3)) -1L else r.getLong(3)))).toMap
    assert(!streamed.keySet.exists(_._2 == "wake"),
      "the never-closed wake window leaked into append output")

    val batch = graft.Registry.all
      .find(_.name == "q140_windowed_distinct_sketch").get.run(spark, sfDir)
      .select(col("day"), col("event_type"), col("occupied"), col("lc_est"))
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), if (r.isNullAt(3)) -1L else r.getLong(3)))).toMap
    assert(streamed == batch,
      "streamed windowed occupancy diverges from batch q140")
  }

  test("windowed occupancy keeps a cross-day straggler inside the slack") {
    // the slack contract: an event arriving < 1 h behind the newest
    // event but belonging to the PREVIOUS day must still be counted
    // (needs slack >= 1 day + lateness because the watermark column is
    // the day-truncated event time — the documented 25 h default)
    import spark.implicits._
    def ts(iso: String) = java.sql.Timestamp.from(java.time.Instant.parse(iso))
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(java.sql.Timestamp, Long, String)]
    val q = StreamingSketch.windowedOccupancy(
        input.toDF().toDF("ts", "user_id", "event_type"))
      .writeStream.format("memory").queryName("wsketch_late")
      .outputMode("append").start()
    try {
      // batch 1: day 1 user 1, then day 2 begins (watermark advances to
      // day-2-trunc - 25 h = day 1 23:00 the moment day 2 appears)
      input.addData(Seq(
        (ts("2024-03-01T10:00:00Z"), 1L, "view"),
        (ts("2024-03-02T00:30:00Z"), 2L, "view")))
      q.processAllAvailable()
      // batch 2: a day-1 straggler 40 min behind the newest event —
      // inside the 25 h slack, must land in day 1
      input.addData(Seq((ts("2024-03-01T23:50:00Z"), 3L, "view")))
      q.processAllAvailable()
      // wake: close every window
      input.addData(Seq((ts("2024-05-01T00:00:00Z"), 9L, "wake")))
      q.processAllAvailable()
    } finally q.stop()
    val out = spark.table("wsketch_late")
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2))
      .toMap
    assert(out == Map(
      ("2024-03-01", "view") -> 2L,   // user 1 + the straggler
      ("2024-03-02", "view") -> 1L),
      s"straggler dropped or misfiled: $out")
  }
}
