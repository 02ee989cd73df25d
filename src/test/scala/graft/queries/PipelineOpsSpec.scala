package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Quality checks for the LLM-pipeline operators that have no SQL oracle:
  * LSH ANN recall vs the brute-force baseline, MinHash-LSH candidate
  * coverage of true high-Jaccard pairs, and the multimodal decode stub.
  */
class PipelineOpsSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  private def run(name: String) =
    graft.Registry.all.find(_.name == name).get.run(spark, sfDir)

  test("q39 LSH ANN finds a usable fraction of brute-force top-5 (recall)") {
    val exact = run("q38_knn_bruteforce")
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val approx = run("q39_ann_lsh")
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact intersect approx).size.toDouble / exact.size
    info(s"LSH recall@5 = $recall (${approx.size} approx rows)")
    // 4 tables x 6 bits over random vectors: modest recall is expected —
    // the assertion guards against a broken bucketing (recall ~ 0).
    assert(recall >= 0.2, s"LSH recall collapsed: $recall")
  }

  test("q72 multiprobe LSH recall is usable and its candidates cover the exact buckets") {
    val exact = run("q38_knn_bruteforce")
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val multi = run("q72_ann_multiprobe")
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact intersect multi).size.toDouble / exact.size
    info(s"multiprobe recall@5 = $recall (${multi.size} rows)")
    assert(recall >= 0.2, s"multiprobe recall collapsed: $recall")
  }

  test("q46 IVF ANN finds a usable fraction of brute-force top-5 (recall)") {
    val exact = run("q38_knn_bruteforce")
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val approx = run("q46_ann_ivf")
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact intersect approx).size.toDouble / exact.size
    info(s"IVF recall@5 = $recall (${approx.size} rows)")
    assert(recall >= 0.1, s"IVF recall collapsed: $recall")
  }

  test("q36 MinHash-LSH candidates cover every true Jaccard>=0.8 pair") {
    val truth = run("q35_ngram_jaccard")
      .select("i", "j").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val cands = run("q36_minhash_band_dedup")
      .select("i", "j").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val missed = truth -- cands
    info(s"true pairs=${truth.size} candidates=${cands.size} missed=${missed.size}")
    // 4 bands of 2 hashes: P(candidate) = 1-(1-j^2)^4 ≈ 0.997 at j=0.8;
    // every planted near-dup should surface.
    assert(missed.isEmpty, s"LSH missed true near-dups: $missed")
  }

  test("multimodal decodeStub extracts batch features with a real byte histogram") {
    import spark.implicits._
    val media = MultimodalOps.mediaFromDocs(spark, sfDir)
    val feats = MultimodalOps.decodeStub(media, batchSize = 16).collect()
    assert(feats.nonEmpty)
    val byId = feats.map(f => f.mediaId -> f).toMap
    val src = media.collect().map(r => r.mediaId -> r).toMap
    // histogram is over the real bytes and sums to the payload length
    for ((id, f) <- byId) {
      assert(f.byteHist.sum == f.byteLen, s"hist/byteLen mismatch for $id")
      assert(f.byteLen == src(id).content.length)
      assert(f.width == 320 + f.byteLen % 640)
      assert(src(id).meta.contains("lang"))
    }
    // kinds route deterministically
    assert(feats.forall(f => Set("image", "audio", "video")(f.kind)))
  }

  test("multimodal decode parses real PNG/GIF/JPEG header dimensions") {
    import spark.implicits._
    def png(w: Int, h: Int): Array[Byte] = {
      val sig = Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)
      val ihdr = Array[Byte](0, 0, 0, 13) ++ "IHDR".getBytes("US-ASCII") ++
        Array((w >> 24).toByte, (w >> 16).toByte, (w >> 8).toByte, w.toByte,
          (h >> 24).toByte, (h >> 16).toByte, (h >> 8).toByte, h.toByte,
          8.toByte, 6.toByte, 0.toByte, 0.toByte, 0.toByte)
      sig ++ ihdr
    }
    def gif(w: Int, h: Int): Array[Byte] =
      "GIF89a".getBytes("US-ASCII") ++
        Array((w & 0xff).toByte, (w >> 8).toByte,
          (h & 0xff).toByte, (h >> 8).toByte, 0.toByte, 0.toByte, 0.toByte)
    def jpeg(w: Int, h: Int): Array[Byte] =
      Array(0xff, 0xd8,                 // SOI
        0xff, 0xe0, 0x00, 0x04, 0, 0,   // APP0 segment (len 4)
        0xff, 0xc0, 0x00, 0x11, 8,      // SOF0, len 17, precision 8
        (h >> 8) & 0xff, h & 0xff, (w >> 8) & 0xff, w & 0xff,
        3, 0, 0, 0).map(_.toByte)
    assert(MultimodalOps.parseDims(png(640, 480)).contains((640, 480)))
    assert(MultimodalOps.parseDims(gif(1024, 37)).contains((1024, 37)))
    assert(MultimodalOps.parseDims(jpeg(1920, 1080)).contains((1920, 1080)))
    assert(MultimodalOps.parseDims("plain text".getBytes).isEmpty)
    assert(MultimodalOps.parseDims(Array[Byte]()).isEmpty)
    // and through the batched Dataset decoder
    val rows = Seq(
      MediaRow(1L, "image", png(800, 600), Map("fmt" -> "png")),
      MediaRow(2L, "image", gif(320, 200), Map("fmt" -> "gif")),
      MediaRow(3L, "image", jpeg(256, 128), Map("fmt" -> "jpeg")),
      MediaRow(4L, "audio", "not a container".getBytes, Map.empty[String, String]))
    val feats = MultimodalOps.decodeStub(rows.toDS(), batchSize = 2)
      .collect().map(f => f.mediaId -> f).toMap
    assert((feats(1L).width, feats(1L).height) == (800, 600))
    assert((feats(2L).width, feats(2L).height) == (320, 200))
    assert((feats(3L).width, feats(3L).height) == (256, 128))
    // non-container payload falls back to the deterministic stub
    val n4 = feats(4L).byteLen
    assert((feats(4L).width, feats(4L).height) == (320 + n4 % 640, 240 + n4 % 480))
  }

  test("multimodal resize and frame-sample stubs keep geometry and batch shape") {
    import spark.implicits._
    val media = MultimodalOps.mediaFromDocs(spark, sfDir)
    val feats = MultimodalOps.decodeStub(media)
    val resized = MultimodalOps.resizeStub(feats, maxDim = 256).collect()
    assert(resized.nonEmpty)
    for (f <- resized) {
      assert(math.max(f.width, f.height) <= 256)
      assert(f.width >= 1 && f.height >= 1)
    }
    val frames = MultimodalOps.frameSample(feats, everyK = 5).collect()
    val byId = frames.groupBy(_._1)
    val featById = feats.collect().map(f => f.mediaId -> f).toMap
    for ((id, fs) <- byId) {
      val f = featById(id)
      if (f.kind == "video") {
        assert(fs.map(_._2).toSeq.sorted == (0 until f.frames by 5).toSeq)
      } else assert(fs.map(_._2).toSeq == Seq(0))
    }
  }

  test("q45 embedding near-dup recovers planted near-duplicates (recall)") {
    import spark.implicits._
    import graft.functions.VectorFns.{buckets, cosine}
    import org.apache.spark.sql.functions._
    // plant: 30 random base vectors + a tiny-noise copy of each (cos ~0.99+)
    val rng = new scala.util.Random(7)
    val base = (0 until 30).map(i => i.toLong -> Array.fill(64)(rng.nextGaussian()))
    val rows = base.flatMap { case (id, v) =>
      val noisy = v.map(x => x + rng.nextGaussian() * 0.02)
      Seq((id, v.toSeq), (id + 1000L, noisy.toSeq))
    }
    val df = rows.toDF("vec_id", "v")
    val tables = 4; val bits = 6
    val withBuckets = df.select(
      (col("vec_id") +: col("v") +: buckets(col("v"), tables, bits)): _*)
    val cands = (0 until tables).map { t =>
      withBuckets.select(col("vec_id").as("i"), col("v").as("vi"), col(s"bucket$t").as("bk"))
        .join(withBuckets.select(col("vec_id").as("j"), col("v").as("vj"), col(s"bucket$t").as("bk")), "bk")
        .filter(col("i") < col("j"))
        .select(col("i"), col("j"), col("vi"), col("vj"))
    }.reduce(_ unionByName _).distinct()
    val found = cands.withColumn("sim", cosine(col("vi"), col("vj")))
      .filter(col("sim") >= 0.95)
      .select("i", "j").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val planted = base.map { case (id, _) => (id, id + 1000L) }.toSet
    val recall = (planted intersect found).size.toDouble / planted.size
    info(s"planted-pair recall = $recall (${found.size} pairs found)")
    // cos ~0.99 pairs collide per 6-bit table w.p. ~0.73 -> >=0.99 over 4 tables
    assert(recall >= 0.9, s"near-dup recall collapsed: $recall")
  }

  test("q136 labels put every planted dup cluster under one representative") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // end-to-end through the REGISTERED query: a temp embeddings table of
    // 30 planted 3-member clusters (base + two tiny-noise copies, cos
    // ~0.99) among 200 unrelated vectors; the star-verified bucket edges
    // must keep each planted cluster connected (the cluster min is a
    // member, so member→min edges verify) whatever the bucket mixture
    val rng = new scala.util.Random(11)
    val clusters = (0 until 30).map { i =>
      val v = Array.fill(64)(rng.nextGaussian().toFloat)
      val ids = Seq(i.toLong, 1000L + i, 2000L + i)
      ids -> ids.map(id => (id,
        if (id < 1000) v.toSeq
        else v.map(x => x + rng.nextGaussian().toFloat * 0.02f).toSeq))
    }
    val singles = (0 until 200).map(k =>
      (5000L + k, Seq.fill(64)(rng.nextGaussian().toFloat)))
    val dir = java.nio.file.Files.createTempDirectory("q136_fix_").toString
    (clusters.flatMap(_._2) ++ singles).toDF("vec_id", "embedding")
      .coalesce(1).write.parquet(s"$dir/embeddings.parquet")
    val labels = graft.SparkEntry.queries("q136_embedding_dedup_labels")(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val broken = clusters.collect {
      case (ids, _) if ids.map(labels).toSet.size != 1 =>
        ids.map(id => id -> labels(id))
    }
    assert(broken.isEmpty, s"planted clusters fractured: $broken")
    // and the planted clusters never merge with each other (cos of
    // independent 64-dim gaussians is ~0 — far under the 0.35 gate)
    val reps = clusters.map { case (ids, _) => labels(ids.head) }
    assert(reps.distinct.size == clusters.size,
      "unrelated planted clusters merged")
  }

  test("bucketArray packs the same bucket ids as the unrolled buckets columns") {
    import spark.implicits._
    import graft.functions.VectorFns.{buckets, bucketArray}
    import org.apache.spark.sql.functions._
    val rng = new scala.util.Random(13)
    val df = (0 until 50).map(i => i.toLong -> Seq.fill(64)(rng.nextGaussian()))
      .toDF("vec_id", "v")
    val tables = 6; val bits = 6
    val unrolled = df.select(
      (col("vec_id") +: buckets(col("v"), tables, bits)): _*)
      .collect().map(r => r.getLong(0) -> (1 to tables).map(r.getLong)).toMap
    val packed = df.select(col("vec_id"), bucketArray(col("v"), tables, bits).as("bks"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(packed.keySet == unrolled.keySet)
    packed.foreach { case (id, bks) => assert(bks == unrolled(id), s"vec $id") }
  }

  test("bucketArray raises on dimensionality drift instead of mis-bucketing") {
    import spark.implicits._
    import graft.functions.VectorFns.bucketArray
    import org.apache.spark.sql.functions._
    val df = Seq((1L, Seq.fill(63)(0.5))).toDF("vec_id", "v")
    val e = intercept[Exception] {
      df.select(bucketArray(col("v"), 2, 4)).collect()
    }
    assert(e.getMessage.contains("expected 64-dim"))
  }

  test("q52 rolling-hash chunks are insertion-robust") {
    import graft.functions.RollingHash
    val words = Seq("alpha","bridge","cloud","delta","ember","forest","glade",
      "harbor","inlet","jungle","kernel","lagoon","meadow","nectar","orchid")
    val rng = new scala.util.Random(11)
    val text = Seq.fill(400)(words(rng.nextInt(words.size))).mkString(" ")
    def hashes(t: String): Set[Long] = {
      val arr = RollingHash.chunkHashes(
        org.apache.spark.unsafe.types.UTF8String.fromString(t))
      (0 until arr.numElements()).map(arr.getLong).toSet
    }
    val base = hashes(text)
    // an insertion in the middle only perturbs nearby chunks
    val edited = hashes(text.substring(0, 600) + " INSERTED PHRASE " + text.substring(600))
    val overlap = (base intersect edited).size.toDouble / math.min(base.size, edited.size)
    info(s"chunks=${base.size} overlap-after-insertion=$overlap")
    assert(base.size >= 5, "texts of this size must produce multiple chunks")
    assert(overlap >= 0.6, s"chunking not insertion-robust: $overlap")
    // unrelated text shares (practically) nothing
    val other = hashes("completely different content with no shared phrasing at all " * 20)
    assert((base intersect other).isEmpty)
    // and the query runs end-to-end
    assert(run("q52_chunk_fingerprint_dedup").columns.toSeq == Seq("i", "j", "overlap"))
  }

  test("q34 exact-dedup canonical ids are minimal and counts sum to corpus size") {
    val rows = run("q34_exact_dedup").collect()
    val total = rows.map(_.getAs[Long]("dup_cnt")).sum
    val nDocs = graft.Tables(spark, sfDir, "documents").count()
    assert(total == nDocs)
  }
}
