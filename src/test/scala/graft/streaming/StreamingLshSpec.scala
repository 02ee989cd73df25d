package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Streaming MinHash-LSH ≡ batch: the in-row signature expressions match
  * the batch explode+aggregate rendition row-for-row, and the stateful
  * pair emitter reproduces batch q36's staged pair set across
  * micro-batches.
  */
class StreamingLshSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  test("in-row band assignments equal the batch explode+aggregate form") {
    // The batch q36 pipeline's bands are private; its PAIR output is the
    // public contract — but band equality is checkable directly against
    // a first-principles recomputation of the batch form over the staged
    // gram set, which IS what DedupOps.minhashBands does. Recompute it
    // here independently and compare to the in-row expressions.
    import graft.functions.MinHash
    import spark.implicits._
    val docs = graft.Tables(spark, sfDir, "documents")
    val inRow = StreamingLsh.bandAssignments(docs)
      .map(h => (h.docId, h.band, h.bkey)).collect().toSet
    val g = docs.select(col("doc_id"),
        explode(array_distinct(graft.functions.TextFns.wordNgrams(
          graft.functions.TextFns.tokens(col("text")), 3))).as("ng"))
      .select(col("doc_id"), graft.functions.TextFns.hash32(col("ng")).as("hv"))
    val sigCols = (0 until MinHash.Perms).map(j =>
      min(pmod(lit(MinHash.a(j)) * col("hv") + lit(MinHash.b(j)),
        lit(MinHash.P))).as(s"s$j"))
    val sigs = g.groupBy(col("doc_id")).agg(sigCols.head, sigCols.tail: _*)
    val batch = (0 until MinHash.Bands).flatMap { b =>
      sigs.select(col("doc_id"), lit(b),
          concat_ws(":", col(s"s${2 * b}"), col(s"s${2 * b + 1}")))
        .as[(Long, Int, String)].collect()
    }.toSet
    assert(inRow.nonEmpty)
    assert(inRow == batch)
  }

  test("a full bucket still detects arrivals, bounded by the cap") {
    import spark.implicits._
    // four docs colliding in one band bucket, cap 2, arriving over two
    // micro-batches: c and d arrive at a full bucket and must still pair
    // against the 2 stored members; (c,d) is the accepted miss (neither
    // was stored), and state never exceeds the cap
    val hits = Seq(1L, 2L, 3L, 4L).map(id => BandHit(0, "k", id))
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[BandHit]
    val query = StreamingLsh.pairs(input.toDS(), maxBucket = 2)
      .writeStream.format("memory").queryName("lsh_cap")
      .outputMode("append").start()
    try {
      input.addData(hits.take(2)); query.processAllAvailable()
      input.addData(hits.drop(2)); query.processAllAvailable()
    } finally query.stop()
    val pairs = spark.table("lsh_cap").as[NearDupPair]
      .collect().map(p => (p.i, p.j)).toSet
    assert(pairs == Set((1L, 2L), (1L, 3L), (2L, 3L), (1L, 4L), (2L, 4L)))
  }

  test("streamed pair set equals batch q36 across micro-batches") {
    import spark.implicits._
    val hits = StreamingLsh.bandAssignments(
      graft.Tables(spark, sfDir, "documents"))
      .collect().sortBy(_.docId)
    // arrival order = doc_id order, 3 micro-batches: cross-batch bucket
    // state must carry earlier members for later pairs
    val batches = hits.grouped((hits.length + 2) / 3).map(_.toSeq).toSeq
    assert(batches.length == 3)
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[BandHit]
    val query = StreamingLsh.pairs(input.toDS())
      .writeStream.format("memory").queryName("lsh_pairs")
      .outputMode("append").start()
    try {
      batches.foreach { b => input.addData(b); query.processAllAvailable() }
    } finally query.stop()
    val streamed = spark.table("lsh_pairs").as[NearDupPair]
      .collect().map(p => (p.i, p.j)).toSet
    val batchPairs = graft.Registry.all.find(_.name == "q36_minhash_band_dedup")
      .get.run(spark, sfDir)
      .select(col("i"), col("j")).as[(Long, Long)].collect().toSet
    assert(streamed.nonEmpty)
    assert(streamed == batchPairs)
  }
}
