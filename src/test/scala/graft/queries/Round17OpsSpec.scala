package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Round-17 additions: q176 physical export shard writer (plan → artifact
  * closure with corruption-detecting checksums). Planted-fixture geometry
  * plus the facts the hash oracle can't state: the written artifact
  * matches the q162 plan row-for-row, a corrupted shard file is CAUGHT by
  * the content checksum, and the publish is two-phase (no stage/ tree
  * survives a successful write; the memoized path is stable).
  */
class Round17OpsSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  private def run(name: String, dir: String = sfDir) =
    graft.Registry.all.find(_.name == name).get.run(spark, dir)

  private val shardSchema =
    "doc_id LONG, pos LONG, kept LONG, text STRING, shard_id LONG"

  // ------------------------------------------------------------- q176

  test("q176: the manifest recomputed from the WRITTEN files equals the " +
    "q162 plan exactly (shared columns), and content_checksum is " +
    "non-null on every shard") {
    val plan = run("q162_export_shard_plan").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))).toMap
    val rows = run("q176_export_shard_write").collect()
    val written = rows
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))).toMap
    assert(written == plan,
      s"written manifest diverged from the shard plan: $written vs $plan")
    assert(rows.forall(!_.isNullAt(6)),
      "every shard must carry a content checksum")
  }

  test("q176: a flipped byte in one written shard is CAUGHT by " +
    "content_checksum (and only that shard moves); a dropped doc is " +
    "caught by n_docs + checksum") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_q176_").toString
    // all-surviving corpus (distinct vocab per doc, ids >= 10) spanning
    // several shards — the q162 fixture's geometry
    val docs = (0 until 12).map { d =>
      (10L + d, "s", (0 until 700).map(j => s"d${d}w$j").mkString(" "))
    }
    docs.toDF("doc_id", "source", "text")
      .coalesce(1).write.parquet(s"$dir/documents.parquet")
    val manifest = run("q176_export_shard_write", dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(5),
        r.getLong(6)))).toMap
    val root = CorpusOps.shardFiles(spark, dir)
    // corrupt shard 1: rewrite its partition with one doc's text altered
    // (a flipped byte in the payload — kept/doc_id untouched)
    val p1 = s"$root/shard_id=1"
    val s1 = spark.read.parquet(p1).collect()
    assert(s1.nonEmpty, "fixture must place docs in shard 1")
    val victim = s1.map(_.getLong(0)).min
    val doctored = s1.map { r =>
      val t = r.getString(3)
      (r.getLong(0), r.getLong(1), r.getLong(2),
        if (r.getLong(0) == victim) t.updated(0, 'X') else t)
    }
    val tmp = java.nio.file.Files.createTempDirectory("graft_q176_c_")
    doctored.toSeq.toDF("doc_id", "pos", "kept", "text")
      .coalesce(1).write.mode("overwrite").parquet(s"$tmp/shard_id=1")
    // splice the doctored partition into a copied tree view: read the
    // intact tree minus shard 1, union the doctored partition
    val intact = spark.read.schema(shardSchema).parquet(root)
      .filter(col("shard_id") =!= 1L)
    val bad = spark.read.parquet(s"$tmp/shard_id=1")
      .withColumn("shard_id", lit(1L))
    val re = CorpusOps.shardRollup(intact.unionByName(bad)).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(5),
        r.getLong(6)))).toMap
    assert(re.keySet == manifest.keySet, "corruption must not add shards")
    for ((id, (n, ck, cck)) <- re) {
      val (n0, ck0, cck0) = manifest(id)
      assert(n == n0 && ck == ck0,
        s"shard $id: text corruption must not move doc counts or the " +
          "(doc_id, kept) checksum")
      if (id == 1L)
        assert(cck != cck0,
          "shard 1's content checksum must catch the flipped byte")
      else
        assert(cck == cck0, s"shard $id content checksum must be stable")
    }
    // dropped doc: remove the victim row entirely — n_docs AND the
    // order-independent checksum both move
    val dropped = CorpusOps.shardRollup(
      spark.read.schema(shardSchema).parquet(root)
        .filter(col("doc_id") =!= victim)).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(5)))).toMap
    assert(dropped(1L)._1 == manifest(1L)._1 - 1 &&
      dropped(1L)._2 != manifest(1L)._2,
      "a dropped doc must move shard 1's n_docs and checksum")
  }

  test("q176: publish is two-phase and memoized — the final tree exists, " +
    "no stage/ sibling survives, and a second call returns the same " +
    "path without rewriting") {
    val root = CorpusOps.shardFiles(spark, sfDir)
    val rootPath = java.nio.file.Paths.get(root)
    assert(java.nio.file.Files.isDirectory(rootPath), "shards/ must exist")
    assert(rootPath.getFileName.toString == "shards")
    assert(!java.nio.file.Files.exists(rootPath.resolveSibling("stage")),
      "a successful publish must leave no stage/ tree")
    val mtime = java.nio.file.Files.getLastModifiedTime(rootPath)
    assert(CorpusOps.shardFiles(spark, sfDir) == root,
      "the writer must be memoized per (session, dir)")
    assert(java.nio.file.Files.getLastModifiedTime(rootPath) == mtime,
      "a second call must not rewrite the published tree")
    // the written pack order is loadable and total: pos is a permutation
    // of 1..N within the whole tree
    val pos = spark.read.schema(shardSchema).parquet(root)
      .select(col("pos")).collect().map(_.getLong(0)).sorted
    assert(pos.toSeq == (1L to pos.length).toSeq,
      "written pos must be the total pack order 1..N")
  }

  // ------------------------------------------------------------- q177

  test("q177: parseWavPcm decodes the container for real — the " +
    "interposed LIST chunk is walked, header-only WAVs (q152's " +
    "fixtures: declared data absent) drop as truncated, garbage and " +
    "non-8-bit-mono layouts drop") {
    import graft.queries.MultimodalOps._
    val good = syntheticPcmWavs(spark, sfDir).head().content
    val samples = parseWavPcm(good)
    assert(samples.exists(_.length == FpFrames * FrameLen),
      "a real PCM payload must parse to exactly the synthesized samples")
    // truncation: chop the tail — the declared data length now exceeds
    // the bytes present
    assert(parseWavPcm(good.dropRight(100)).isEmpty,
      "a truncated payload must drop, never fingerprint partially")
    assert(parseWavPcm("garbage".getBytes("US-ASCII")).isEmpty)
    // header-only WAVs from the q152 fixture family declare dataBytes
    // they don't carry
    val headerOnly = syntheticWavs(spark, sfDir).head().content
    assert(parseWavPcm(headerOnly).isEmpty,
      "header-only WAVs must drop from the PCM path")
    // a hand-built 16-bit mono WAV: valid container, out-of-contract
    // sample layout
    val b16 = new java.io.ByteArrayOutputStream()
    def le16(v: Int): Unit = { b16.write(v & 0xff); b16.write((v >>> 8) & 0xff) }
    def le32(v: Int): Unit = for (s <- Seq(0, 8, 16, 24)) b16.write((v >>> s) & 0xff)
    b16.write("RIFF".getBytes("US-ASCII")); le32(4 + 24 + 8 + 4)
    b16.write("WAVE".getBytes("US-ASCII"))
    b16.write("fmt ".getBytes("US-ASCII")); le32(16)
    le16(1); le16(1); le32(8000); le32(16000); le16(2); le16(16)
    b16.write("data".getBytes("US-ASCII")); le32(4)
    b16.write(Array[Byte](1, 2, 3, 4))
    assert(parseWav(b16.toByteArray).nonEmpty,
      "the 16-bit WAV is a VALID container (q152's path accepts it)")
    assert(parseWavPcm(b16.toByteArray).isEmpty,
      "16-bit layouts are outside the fingerprint contract and drop")
  }

  test("q177: decoded fingerprints match a first-principles energy " +
    "recompute from the raw synthesized bytes, and the planted " +
    "id % 5 == 4 near-dups sit at Hamming <= 1 of their predecessor") {
    import spark.implicits._
    import graft.queries.MultimodalOps._
    val rows = syntheticPcmWavs(spark, sfDir)
      .filter(col("mediaId") < 25).collect().sortBy(_.mediaId)
    val got = decodeAudioFingerprint(
      syntheticPcmWavs(spark, sfDir).filter(col("mediaId") < 25))
      .collect().toMap
    for (r <- rows) {
      // the payload is the LAST FpFrames*FrameLen bytes of the container
      // (the synth appends PCM after the header) — an independent read
      // that never touches the chunk walk
      val pcm = r.content.takeRight(FpFrames * FrameLen).map(_ & 0xff)
      val e = (0 until FpFrames).map(f =>
        (0 until FrameLen).map(j => pcm(f * FrameLen + j).toLong).sum)
      var sig = 0L
      for (f <- 0 until FpFrames - 1) if (e(f + 1) > e(f)) sig |= 1L << f
      assert(got(r.mediaId) == sig,
        s"doc ${r.mediaId}: decoded fingerprint diverged from the " +
          "first-principles energy recompute")
    }
    val near = rows.filter(_.mediaId % 5 == 4)
    assert(near.nonEmpty)
    for (r <- near) {
      val d = java.lang.Long.bitCount(got(r.mediaId) ^ got(r.mediaId - 1))
      assert(d <= 1,
        s"planted pair (${r.mediaId - 1}, ${r.mediaId}) at Hamming $d > 1")
    }
    // and the query itself surfaces every planted pair
    val out = run("q177_audio_perceptual_neardup")
      .select(col("i"), col("j")).as[(Long, Long)].collect().toSet
    val planted = graft.Tables(spark, sfDir, "documents")
      .select(col("doc_id")).as[Long].collect()
      .filter(id => id % 5 == 4).map(id => (id - 1, id)).toSet
    assert(planted.nonEmpty && planted.subsetOf(out),
      s"missing planted pairs: ${(planted -- out).take(5)}")
  }

  // ------------------------------------------------------------- q176

  test("q176 dirty corpus: null-text survivors write and fingerprint " +
    "null-safely (the <null-text> rule)") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_q176_d_").toString
    // one null-text doc + two real docs, all corpus-side; the null doc is
    // its group's canonical (min doc_id of the null-fp class) so it
    // survives with kept = 0
    Seq((10L, "s", null: String),
      (11L, "s", (0 until 30).map(j => s"aw$j").mkString(" ")),
      (12L, "s", (0 until 30).map(j => s"bw$j").mkString(" ")))
      .toDF("doc_id", "source", "text")
      .coalesce(1).write.parquet(s"$dir/documents.parquet")
    val out = run("q176_export_shard_write", dir).collect()
    assert(out.nonEmpty, "the dirty fixture must produce shards")
    assert(out.map(_.getLong(1)).sum == 3L,
      "all three docs (including the null-text survivor) must be written")
    assert(out.forall(!_.isNullAt(6)),
      "content checksums must be non-null with a null-text member")
  }
}
