package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

final case class VecRow(vec_id: Long, embedding: Seq[Float])

/** Streamed ≡ batch for the ANN ingest twin on the real corpus: vectors
  * arriving over micro-batches, PQ-encoded and routed in-row, must build
  * exactly the batch index; queries served per-micro-batch against that
  * streamed index must return exactly the registered q128 top-5 (same
  * ADC values, same tie rules). This is the dedup-arm StreamingLsh /
  * decon-arm StreamingDecon discipline applied to the ANN arm.
  */
class StreamingAnnSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  test("streamed ingest + per-batch serving equals batch q128 exactly") {
    import spark.implicits._
    val m = StreamingAnn.model(spark, sfDir)
    val emb = graft.Tables(spark, sfDir, "embeddings")
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext

    // ingest: corpus vectors (q128's vec_id >= 5 side) over 4 micro-batches
    val corpus = emb.filter(col("vec_id") >= 5)
      .as[VecRow].collect().sortBy(_.vec_id)
    val cIn = MemoryStream[VecRow]
    val ingestQ = StreamingAnn.ingest(
        cIn.toDF().withColumnRenamed("vec_id", "neighbor_id"),
        "neighbor_id", m)
      .writeStream.format("memory").queryName("ann_lists")
      .outputMode("append").start()
    try {
      corpus.grouped((corpus.length + 3) / 4).foreach { b =>
        cIn.addData(b.toSeq); ingestQ.processAllAvailable()
      }
    } finally ingestQ.stop()
    val lists = spark.table("ann_lists").cache()
    assert(lists.count() == corpus.length.toLong)

    // serving: the query vectors arrive as their own stream; each
    // micro-batch is answered against the streamed index (foreachBatch —
    // per-query top-k depends only on the index, so per-batch is exact)
    val queries = emb.filter(col("vec_id") < 5)
      .as[VecRow].collect().sortBy(_.vec_id)
    val servedBatches = scala.collection.concurrent.TrieMap
      .empty[Long, Seq[(Long, Int, Long, Long)]]
    val qIn = MemoryStream[VecRow]
    val serveQ = qIn.toDF().writeStream
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, id: Long) =>
        servedBatches(id) = StreamingAnn.serveTopK(b, "vec_id", lists, m)
          .collect().toSeq
          .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3)))
        ()
      }.start()
    try {
      queries.grouped(2).foreach { b =>
        qIn.addData(b.toSeq); serveQ.processAllAvailable()
      }
    } finally serveQ.stop()
    val streamed = servedBatches.values.flatten.toSet

    val batch = graft.SparkEntry.queries("q128_ivfpq_ann")(spark, sfDir)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3)))
      .toSet
    lists.unpersist()
    assert(batch.nonEmpty)
    assert(streamed == batch,
      s"streamed-batch diff: ${(streamed diff batch).take(3)} / ${(batch diff streamed).take(3)}")
  }

  test("malformed arriving vectors route without crashing and never rank") {
    import spark.implicits._
    val m = StreamingAnn.model(spark, sfDir)
    val dirty = Seq(
      VecRow(9001L, null),
      VecRow(9002L, Seq.empty[Float]),
      VecRow(9003L, Seq.fill(3)(0.5f)),   // wrong dimension
      VecRow(9004L, Seq.fill(64)(0.25f))) // well-formed
    val out = StreamingAnn.ingest(
      dirty.toDF("neighbor_id", "embedding"), "neighbor_id", m)
    val rows = out.collect().map(r => r.getLong(0) ->
      (0 until graft.queries.SimilarityOps.PqM)
        .forall(i => !r.isNullAt(r.fieldIndex(s"code_$i")))).toMap
    assert(rows.keySet == Set(9001L, 9002L, 9003L, 9004L))
    // only the well-formed vector earns codes; malformed ones carry null
    // codes, so their ADC is null and sorts behind every real candidate
    assert(rows(9004L) && !rows(9001L) && !rows(9002L) && !rows(9003L))
  }
}
