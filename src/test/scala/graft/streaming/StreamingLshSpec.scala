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

  test("bucket state survives a kill-and-resume: post-restart arrivals " +
    "pair against pre-restart members exactly once, on RocksDB") {
    // The ingest-dedup twin's crash story (mirrors the DWS window leg in
    // CheckpointRecoverySpec): docs arrive, the query dies, MORE docs
    // arrive after the restart — a post-restart near-dup must still pair
    // with documents ingested BEFORE the crash (state restored), and the
    // pre-crash pairs must not re-emit (sink exactly-once). BandHits are
    // synthesized directly so bucket collisions are fully controlled.
    import spark.implicits._
    val inDir = java.nio.file.Files.createTempDirectory("lsh_in").toString
    val outDir = java.nio.file.Files.createTempDirectory("lsh_out").toString
    val ckpt = java.nio.file.Files.createTempDirectory("lsh_ck").toString

    def writeHits(hits: Seq[BandHit]): Unit =
      hits.toDS().toDF().coalesce(1).write.mode("append").parquet(inDir)

    // pre-crash: docs 1,2 collide in bucket (0,"k"); doc 3 alone in (1,"z")
    writeHits(Seq(BandHit(0, "k", 1L), BandHit(0, "k", 2L), BandHit(1, "z", 3L)))

    def pipeline() = {
      val schema = spark.read.parquet(inDir).schema
      val src = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1").parquet(inDir).as[BandHit]
      StreamingLsh.pairs(src)
        .writeStream.format("parquet")
        .option("path", outDir).option("checkpointLocation", ckpt)
        .outputMode("append").start()
    }

    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val q1 = pipeline()
      try q1.processAllAvailable() finally q1.stop()
      assert(spark.read.parquet(outDir).as[NearDupPair].collect().toSet
        == Set(NearDupPair(1L, 2L)))

      // post-restart: doc 4 lands in the pre-crash bucket (must pair with
      // the RESTORED members 1 and 2) and doc 5 joins doc 3's bucket
      writeHits(Seq(BandHit(0, "k", 4L), BandHit(1, "z", 5L)))
      val q2 = pipeline()
      try q2.processAllAvailable() finally q2.stop()
    } finally spark.conf.unset("spark.sql.streaming.stateStore.providerClass")

    val out = spark.read.parquet(outDir).as[NearDupPair].collect().toSeq
    // multiset: a re-emitted (1,2) would duplicate a row even though the
    // set view hides it
    assert(out.size == 4 && out.toSet == Set(
      NearDupPair(1L, 2L), NearDupPair(1L, 4L), NearDupPair(2L, 4L),
      NearDupPair(3L, 5L)),
      s"state lost or pairs re-emitted across restart: $out")
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
