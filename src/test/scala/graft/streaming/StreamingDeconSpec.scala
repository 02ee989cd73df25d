package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

final case class DocRow(doc_id: Long, text: String)

/** Streamed ≡ batch for the ingest-time Bloom decontamination, on the real
  * corpus: the same projection over micro-batches must flag exactly what
  * the batch pass flags, and the bloom flags must cover every doc the
  * exact q63 join flags (no false negatives, by construction).
  */
class StreamingDeconSpec extends SparkSpec {

  test("streamed bloom flags equal batch flags and cover q63's exact set") {
    import spark.implicits._
    val sfDir = "/root/testdata/sf0.001"
    val docsDf = graft.Tables(spark, sfDir, "documents")
      .select(col("doc_id"), col("text"))
    val bloom = StreamingDecon.buildBloom(docsDf.filter(col("doc_id") < 10))

    val batch = StreamingDecon.flag(docsDf, bloom)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getInt(3))))
      .toMap

    val rows = docsDf.as[DocRow].collect().sortBy(_.doc_id)
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[DocRow]
    val q = StreamingDecon.flag(input.toDF(), bloom)
      .writeStream.format("memory").queryName("decon_out")
      .outputMode("append").start()
    try {
      rows.grouped((rows.length + 2) / 3).foreach { b =>
        input.addData(b.toSeq); q.processAllAvailable()
      }
    } finally q.stop()
    val streamed = spark.table("decon_out")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getInt(3))))
      .toMap
    assert(streamed == batch)

    // exact-join truth (q63's semantics) is a subset of the bloom flags
    val exact = graft.SparkEntry.queries("q63_decontamination")(spark, sfDir)
      .filter(col("contaminated") === 1)
      .collect().map(_.getLong(0)).toSet
    assert(exact.nonEmpty)
    val bloomFlagged = batch.collect {
      case (id, (_, _, 1)) if id >= 10 => id
    }.toSet
    assert(exact.subsetOf(bloomFlagged),
      s"missed exact hits: ${(exact -- bloomFlagged).take(5)}")
  }

  test("sized geometry: streamed flagSized equals batch and covers the exact set") {
    import graft.functions.BloomSizing
    import spark.implicits._
    val sfDir = "/root/testdata/sf0.001"
    val sz = BloomSizing(bits = 131072, probes = 3)
    val docsDf = graft.Tables(spark, sfDir, "documents")
      .select(col("doc_id"), col("text"))
    val bloom = StreamingDecon.buildBloomSized(docsDf.filter(col("doc_id") < 10), sz)

    val batch = StreamingDecon.flagSized(docsDf, bloom, sz)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getInt(3))))
      .toMap

    val rows = docsDf.as[DocRow].collect().sortBy(_.doc_id)
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[DocRow]
    val q = StreamingDecon.flagSized(input.toDF(), bloom, sz)
      .writeStream.format("memory").queryName("decon_sized_out")
      .outputMode("append").start()
    try {
      rows.grouped((rows.length + 2) / 3).foreach { b =>
        input.addData(b.toSeq); q.processAllAvailable()
      }
    } finally q.stop()
    val streamed = spark.table("decon_sized_out")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getInt(3))))
      .toMap
    assert(streamed == batch)

    // exact-join truth is still a subset (false negatives impossible in
    // any geometry), and the sized filter is far less loaded than the
    // legacy 4096 bits, so its flags are a (non-strict) subset of legacy's
    val exact = graft.SparkEntry.queries("q63_decontamination")(spark, sfDir)
      .filter(col("contaminated") === 1)
      .collect().map(_.getLong(0)).toSet
    val flagged = batch.collect { case (id, (_, _, 1)) if id >= 10 => id }.toSet
    assert(exact.subsetOf(flagged),
      s"missed exact hits: ${(exact -- flagged).take(5)}")
  }
}
