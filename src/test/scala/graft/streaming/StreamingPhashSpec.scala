package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Streaming perceptual near-dup ≡ batch q163: the in-row band split
  * matches a first-principles recomputation of the 4×14-bit geometry,
  * the stateful emitter verifies Hamming before emission, and the
  * distinct streamed pair set reproduces batch q163 across micro-batches
  * and a kill-and-resume.
  */
class StreamingPhashSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  private def sigs() = {
    import graft.queries.MultimodalOps._
    decodeDHash(syntheticPgms(spark, sfDir)).toDF("doc_id", "dhash")
  }

  test("in-row band assignments equal the first-principles 4x14-bit " +
    "split of every decoded signature") {
    import spark.implicits._
    val raw = sigs().as[(Long, Long)].collect()
    val expected = raw.flatMap { case (id, sig) =>
      (0 until 4).map(b => (b, (sig >> (14 * b)) & 16383L, id, sig))
    }.toSet
    val got = StreamingPhash.bandAssignments(sigs())
      .collect().map(h => (h.band, h.bv, h.docId, h.sig)).toSet
    assert(got.nonEmpty && got == expected)
  }

  test("verification gates emission: colliding-bucket members pair only " +
    "within the Hamming budget, and a full bucket still verifies " +
    "arrivals, bounded by the cap") {
    import spark.implicits._
    // all four docs share band-0 value 0 (low 14 bits zero): 1 and 2 are
    // identical (d=0), 3 differs in 4 high bits (d=4, FAILS the d<=3
    // verify), 4 differs in 1 high bit (d=1). Cap 2: docs 3 and 4 arrive
    // at a full bucket, still verify against stored 1 and 2, aren't
    // stored — (3,4) is the documented miss class
    val s0 = 0L
    val s3 = java.lang.Long.parseLong("1111", 2) << 14
    val s4 = 1L << 14
    val hits = Seq((1L, s0), (2L, s0), (3L, s3), (4L, s4))
      .map { case (id, sg) => PhashHit(0, 0L, id, sg) }
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[PhashHit]
    val query = StreamingPhash.pairs(input.toDS(), maxBucket = 2)
      .writeStream.format("memory").queryName("phash_cap")
      .outputMode("append").start()
    try {
      input.addData(hits.take(2)); query.processAllAvailable()
      input.addData(hits.drop(2)); query.processAllAvailable()
    } finally query.stop()
    val pairs = spark.table("phash_cap").as[PhashPair]
      .collect().map(p => (p.i, p.j, p.hamming)).toSet
    assert(pairs == Set((1L, 2L, 0), (1L, 4L, 1), (2L, 4L, 1)),
      s"verify gate or cap diverged: $pairs")
  }

  test("bucket state survives a kill-and-resume on RocksDB: post-restart " +
    "arrivals verify against restored members exactly once") {
    import spark.implicits._
    val inDir = java.nio.file.Files.createTempDirectory("ph_in").toString
    val outDir = java.nio.file.Files.createTempDirectory("ph_out").toString
    val ckpt = java.nio.file.Files.createTempDirectory("ph_ck").toString

    def writeHits(hits: Seq[PhashHit]): Unit =
      hits.toDS().toDF().coalesce(1).write.mode("append").parquet(inDir)

    // pre-crash: docs 1,2 identical sigs in bucket (0,5); doc 3 alone
    writeHits(Seq(PhashHit(0, 5L, 1L, 5L), PhashHit(0, 5L, 2L, 5L),
      PhashHit(1, 9L, 3L, 9L << 14)))

    def pipeline() = {
      val schema = spark.read.parquet(inDir).schema
      val src = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1").parquet(inDir).as[PhashHit]
      StreamingPhash.pairs(src)
        .writeStream.format("parquet")
        .option("path", outDir).option("checkpointLocation", ckpt)
        .outputMode("append").start()
    }

    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val q1 = pipeline()
      try q1.processAllAvailable() finally q1.stop()
      assert(spark.read.parquet(outDir).as[PhashPair].collect().toSet
        == Set(PhashPair(1L, 2L, 0)))

      // post-restart: doc 4 (one bit flipped vs the restored sig 5, so
      // d=1) must pair with BOTH restored members; doc 5 joins doc 3's
      // bucket at d=0
      writeHits(Seq(PhashHit(0, 5L, 4L, 5L ^ 8L),
        PhashHit(1, 9L, 5L, 9L << 14)))
      val q2 = pipeline()
      try q2.processAllAvailable() finally q2.stop()
    } finally spark.conf.unset("spark.sql.streaming.stateStore.providerClass")

    val out = spark.read.parquet(outDir).as[PhashPair].collect().toSeq
    assert(out.size == 4 && out.toSet == Set(
      PhashPair(1L, 2L, 0), PhashPair(1L, 4L, 1), PhashPair(2L, 4L, 1),
      PhashPair(3L, 5L, 0)),
      s"state lost or pairs re-emitted across restart: $out")
  }

  /** Stream the given hits in doc_id order over 3 micro-batches and
    * return the distinct emitted (i, j, hamming) set.
    */
  private def streamPairs(hits: Seq[PhashHit], name: String)
      : Set[(Long, Long, Int)] = {
    import spark.implicits._
    val batches = hits.grouped((hits.length + 2) / 3).map(_.toSeq).toSeq
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[PhashHit]
    val query = StreamingPhash.pairs(input.toDS())
      .writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    try {
      batches.foreach { b => input.addData(b); query.processAllAvailable() }
    } finally query.stop()
    spark.table(name).as[PhashPair]
      .collect().map(p => (p.i, p.j, p.hamming)).toSet
  }

  test("distinct streamed pair set equals batch q163 exactly on a " +
    "corpus where no bucket exceeds the cap, across micro-batches") {
    import spark.implicits._
    // first 100 doc_ids of the synthetic corpus: the all-ones-gradient
    // bucket holds ~76% of docs, so 100 keeps every bucket under the
    // 100-member cap — asserted below, not assumed
    val dir = java.nio.file.Files.createTempDirectory("graft_ph_").toString
    graft.Tables(spark, sfDir, "documents")
      .orderBy(col("doc_id")).limit(100)
      .coalesce(1).write.parquet(s"$dir/documents.parquet")
    val sub = {
      import graft.queries.MultimodalOps._
      decodeDHash(syntheticPgms(spark, dir)).toDF("doc_id", "dhash")
    }
    val hits = StreamingPhash.bandAssignments(sub).collect().sortBy(_.docId)
    val sizes = hits.groupBy(h => (h.band, h.bv)).view.mapValues(_.length)
    assert(sizes.values.max <= 100, "precondition: all buckets under cap")
    val streamed = streamPairs(hits.toSeq, "phash_sub")
    val batchPairs = graft.Registry.all
      .find(_.name == "q163_image_perceptual_neardup").get
      .run(spark, dir)
      .select(col("i"), col("j"), col("hamming")).as[(Long, Long, Int)]
      .collect().toSet
    assert(streamed.nonEmpty)
    assert(streamed == batchPairs,
      s"streamed ${streamed.size} pairs vs batch ${batchPairs.size}")
  }

  test("signature-source generalization: the SAME streaming operator " +
    "over audio energy-contour fingerprints equals batch q177 on an " +
    "under-cap corpus — no third twin, the signature frame is the " +
    "parameter") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_pha_").toString
    graft.Tables(spark, sfDir, "documents")
      .orderBy(col("doc_id")).limit(100)
      .coalesce(1).write.parquet(s"$dir/documents.parquet")
    val sub = {
      import graft.queries.MultimodalOps._
      decodeAudioFingerprint(syntheticPcmWavs(spark, dir))
        .toDF("doc_id", "dhash")
    }
    val hits = StreamingPhash.bandAssignments(sub).collect().sortBy(_.docId)
    val sizes = hits.groupBy(h => (h.band, h.bv)).view.mapValues(_.length)
    assert(sizes.values.max <= 100, "precondition: all buckets under cap")
    val streamed = streamPairs(hits.toSeq, "phash_audio")
    val batchPairs = graft.Registry.all
      .find(_.name == "q177_audio_perceptual_neardup").get
      .run(spark, dir)
      .select(col("i"), col("j"), col("hamming")).as[(Long, Long, Int)]
      .collect().toSet
    assert(streamed.nonEmpty)
    assert(streamed == batchPairs,
      s"streamed ${streamed.size} pairs vs batch ${batchPairs.size}")
  }

  test("signature-source generalization, video: the SAME streaming " +
    "operator over frame-luma-contour fingerprints equals batch q182 on " +
    "an under-cap corpus — still no per-modality twin") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_phv_").toString
    graft.Tables(spark, sfDir, "documents")
      .orderBy(col("doc_id")).limit(100)
      .coalesce(1).write.parquet(s"$dir/documents.parquet")
    val sub = {
      import graft.queries.MultimodalOps._
      decodeVideoFingerprint(syntheticFramedMp4s(spark, dir))
        .toDF("doc_id", "dhash")
    }
    val hits = StreamingPhash.bandAssignments(sub).collect().sortBy(_.docId)
    val sizes = hits.groupBy(h => (h.band, h.bv)).view.mapValues(_.length)
    assert(sizes.values.max <= 100, "precondition: all buckets under cap")
    val streamed = streamPairs(hits.toSeq, "phash_video")
    val batchPairs = graft.Registry.all
      .find(_.name == "q182_video_perceptual_neardup").get
      .run(spark, dir)
      .select(col("i"), col("j"), col("hamming")).as[(Long, Long, Int)]
      .collect().toSet
    assert(streamed.nonEmpty)
    assert(streamed == batchPairs,
      s"streamed ${streamed.size} pairs vs batch ${batchPairs.size}")
  }

  test("full synthetic corpus (the cap adversary: one bucket holds ~76% " +
    "of docs): streamed DOMINATES batch q163, and every streamed extra " +
    "is a pair whose shared bands are all over-cap") {
    import spark.implicits._
    val hits = StreamingPhash.bandAssignments(sigs())
      .collect().sortBy(_.docId)
    val bucketSize = hits.groupBy(h => (h.band, h.bv)).view
      .mapValues(_.length).toMap
    assert(bucketSize.values.max > 100,
      "precondition: the corpus must actually exceed the cap")
    val sigOf = hits.map(h => h.docId -> h.sig).toMap
    val streamed = streamPairs(hits.toSeq, "phash_full")
    val batchPairs = graft.Registry.all
      .find(_.name == "q163_image_perceptual_neardup").get
      .run(spark, sfDir)
      .select(col("i"), col("j"), col("hamming")).as[(Long, Long, Int)]
      .collect().toSet
    // dominance: batch pairs come only from under-cap buckets, which the
    // twin stores in full
    assert(batchPairs.subsetOf(streamed),
      s"missing batch pairs: ${(batchPairs -- streamed).take(5)}")
    // extras confined: every shared band of an extra pair is an over-cap
    // bucket (exactly the pairs batch's wholesale bucket drop silenced)
    for ((i, j, d) <- streamed -- batchPairs) {
      assert(java.lang.Long.bitCount(sigOf(i) ^ sigOf(j)) == d)
      val shared = (0 until 4).filter(b =>
        ((sigOf(i) >> (14 * b)) & 16383L) == ((sigOf(j) >> (14 * b)) & 16383L))
      assert(shared.nonEmpty)
      assert(shared.forall(b =>
        bucketSize((b, (sigOf(i) >> (14 * b)) & 16383L)) > 100),
        s"extra pair ($i,$j) shares an under-cap band — batch should " +
          "have found it")
    }
  }
}
