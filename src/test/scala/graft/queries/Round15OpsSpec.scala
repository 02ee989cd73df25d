package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Round-15 additions: q157 MP4/ISO-BMFF header decode (completing the
  * modality triad), q158 LSH band-plan optimizer (with the MEASURED
  * recall-ordering audit the S-curve predicts), and q159 paragraph-level
  * exact dedup. Planted-fixture geometry plus invariants the hash oracle
  * can't state (parser fallback, recall ordering, keep-first survival).
  */
class Round15OpsSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  private def run(name: String, dir: String = sfDir) =
    graft.Registry.all.find(_.name == name).get.run(spark, dir)

  // ------------------------------------------------------------- q157

  test("q157: parseMp4 walks the box tree for real — garbage, " +
    "truncation, no-moov, undersized and oversized boxes fall back to " +
    "None; the size-0 (to-end) and largesize forms parse") {
    import graft.queries.MultimodalOps._
    assert(parseMp4("not an mp4".getBytes("US-ASCII")).isEmpty)
    assert(parseMp4(Array.emptyByteArray).isEmpty)
    // valid ftyp but no moov anywhere
    def rawBox(t: String, payload: Array[Byte]): Array[Byte] =
      Array(24, 16, 8, 0).map(s =>
        (((8L + payload.length) >>> s) & 0xff).toByte) ++
        t.getBytes("US-ASCII") ++ payload
    val ftyp = rawBox("ftyp",
      "isom".getBytes("US-ASCII") ++ new Array[Byte](4) ++
        "isom".getBytes("US-ASCII"))
    assert(parseMp4(ftyp ++ rawBox("mdat", new Array[Byte](9))).isEmpty)
    // a full valid payload, then truncated mid-moov: must halt → None
    val whole = {
      val ds = syntheticMp4s(spark, sfDir).filter(_.mediaId == 7L).collect()
      ds.head.content
    }
    assert(parseMp4(whole).nonEmpty)
    assert(parseMp4(whole.dropRight(30)).isEmpty,
      "truncated tkhd must not parse")
    // declared box size below the header length (corrupt) halts the walk
    val under = ftyp ++ Array[Byte](0, 0, 0, 3) ++
      "moov".getBytes("US-ASCII") ++ new Array[Byte](16)
    assert(parseMp4(under).isEmpty)
    // declared size past the buffer halts the walk
    val over = ftyp ++ Array[Byte](0x7f, -1, -1, -1) ++
      "free".getBytes("US-ASCII") ++ new Array[Byte](16)
    assert(parseMp4(over).isEmpty)
    // size32 == 0 legally means "extends to the end of the enclosing
    // scope": rebuild doc 7's payload with its trailing moov re-headed
    // as a size-0 box — must parse to the same fields
    val moovAt = {
      // find the top-level moov header by walking sizes
      var i = 0
      var at = -1
      while (at < 0 && i + 8 <= whole.length) {
        val sz = ((whole(i) & 0xffL) << 24) | ((whole(i + 1) & 0xffL) << 16) |
          ((whole(i + 2) & 0xffL) << 8) | (whole(i + 3) & 0xffL)
        val t = new String(whole.slice(i + 4, i + 8), "US-ASCII")
        if (t == "moov") at = i else i += sz.toInt
      }
      at
    }
    assert(moovAt > 0, "fixture must carry a top-level moov")
    val zeroSized = whole.clone()
    zeroSized(moovAt) = 0; zeroSized(moovAt + 1) = 0
    zeroSized(moovAt + 2) = 0; zeroSized(moovAt + 3) = 0
    assert(parseMp4(zeroSized) == parseMp4(whole),
      "a size-0 trailing moov must parse identically")
  }

  test("q157: an audio-first trak order (width/height 0 in the first " +
    "tkhd) still resolves the video trak's dimensions; a file with NO " +
    "video trak is dropped") {
    import graft.queries.MultimodalOps._
    def be32b(v: Long): Array[Byte] =
      Array(24, 16, 8, 0).map(s => ((v >>> s) & 0xff).toByte)
    def rawBox(t: String, payload: Array[Byte]): Array[Byte] =
      be32b(8L + payload.length) ++ t.getBytes("US-ASCII") ++ payload
    val ftyp = rawBox("ftyp",
      "isom".getBytes("US-ASCII") ++ new Array[Byte](4) ++
        "isom".getBytes("US-ASCII"))
    // v0 mvhd: ver/flags + 8 bytes times + timescale + duration + tail
    val mvhd = rawBox("mvhd", new Array[Byte](12) ++ be32b(600L) ++
      be32b(2400L) ++ new Array[Byte](80))
    // v0 tkhd: 76 bytes ver/flags/times/track_id/reserved/layer/matrix,
    // then 16.16 width/height
    def tkhd(w: Int, h: Int): Array[Byte] = rawBox("trak",
      rawBox("tkhd", new Array[Byte](76) ++
        be32b(w.toLong << 16) ++ be32b(h.toLong << 16)))
    // the common real-world layout: audio trak (0x0 dims) FIRST
    val audioFirst = ftyp ++ rawBox("moov",
      mvhd ++ tkhd(0, 0) ++ tkhd(640, 360))
    assert(parseMp4(audioFirst) ==
      Some(VideoMeta(0L, 600L, 2400L, 640, 360)),
      "must iterate past the non-video first trak")
    // no video trak anywhere: drop the file (the unparseable contract)
    val noVideo = ftyp ++ rawBox("moov", mvhd ++ tkhd(0, 0) ++ tkhd(0, 0))
    assert(parseMp4(noVideo).isEmpty)
  }

  test("q157: the synthetic fixture round-trips the doc_id arithmetic " +
    "for every row — both mvhd/tkhd versions, the largesize form, and " +
    "the interposed mdat all occur and parse") {
    import graft.queries.MultimodalOps._
    val metas = decodeVideoStub(syntheticMp4s(spark, sfDir)).collect()
    assert(metas.length == 500, "every fixture row must parse")
    for (m <- metas) {
      val id = m.mediaId
      assert(m.timescale == 600L * (1 + id % 4), s"doc $id timescale")
      assert(m.duration == (1000L + id % 100000) * 3, s"doc $id duration")
      assert(m.width == (160 * (1 + id % 8)).toInt, s"doc $id width")
      assert(m.height == (120 * (1 + id % 6)).toInt, s"doc $id height")
    }
    // branch coverage is structural: ids 0/1 alternate versions, id%4==0
    // rows use largesize, id%3==0 rows interpose mdat — all present
    assert(metas.exists(_.mediaId % 2 == 0) && metas.exists(_.mediaId % 2 == 1))
    assert(metas.exists(_.mediaId % 4 == 0) && metas.exists(_.mediaId % 3 == 0))
  }

  test("q157: unparseable payloads are dropped by the batched decoder " +
    "(the K6 dirty-side contract), parseable ones all survive") {
    import graft.queries.MultimodalOps._
    val mixed = mediaFromDocs(spark, sfDir) // text bytes — none parse
    assert(decodeVideoStub(mixed).isEmpty)
    val good = syntheticMp4s(spark, sfDir)
    assert(decodeVideoStub(good).count() == good.count())
  }

  // ------------------------------------------------------------- q158

  test("q158 plan-table invariants: the rule derives the fixed 4x2 " +
    "geometry; p is monotone in s per geometry and monotone in bands " +
    "per s; the integer S-curve hits the exact rational endpoints") {
    val rows = run("q158_lsh_band_plan").collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getInt(2)) ->
        ((r.getLong(3), r.getInt(4)))).toMap
    assert(rows.size == 76, "4 geometries x 19 grid points")
    // chosen: every (4,2) row and nothing else
    for (((b, _, _), (_, ch)) <- rows)
      assert(ch == (if (b == 4) 1 else 0), s"chosen flag wrong for bands=$b")
    // monotone in s within a geometry; monotone in bands at fixed s
    for (b <- Seq(1, 2, 4, 8); k <- 2 to 19)
      assert(rows((b, 8 / b, 5 * k))._1 >= rows((b, 8 / b, 5 * (k - 1)))._1)
    for (k <- 1 to 19; (lo, hi) <- Seq((1, 2), (2, 4), (4, 8)))
      assert(rows((hi, 8 / hi, 5 * k))._1 >= rows((lo, 8 / lo, 5 * k))._1)
    // exact rational checks (no float pow anywhere): at s=1/2, 4x2
    // gives 1-(3/4)^4 = 1-81/256; 8x1 gives 1-(1/2)^8 = 1-1/256
    assert(rows((4, 2, 50))._1 == 1000000L - 1000000L * 81L / 256L)
    assert(rows((8, 1, 50))._1 == 1000000L - 1000000L / 256L)
    // the constraint that rejects 8x1: its false-positive mass at
    // s=0.25 is ~90%, far above the 300000 ppm cap; 4x2 sits under it
    assert(rows((8, 1, 25))._1 > 300000L && rows((4, 2, 25))._1 <= 300000L)
  }

  test("q158 recall audit: the planned geometry's recall ordering is " +
    "MEASURED with q124's machinery, not assumed — recall(4x2) >= " +
    "recall(2x4) >= recall(1x8) on the corpus, the chosen pairs equal " +
    "the fixed q36 pipeline's, and the rejected 8x1 shows its " +
    "candidate blowup") {
    val truth = DedupOps.jaccardPairs(spark, sfDir, 0.5)
      .select(col("i"), col("j")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(truth.nonEmpty, "audit needs a non-empty truth set")
    def cand(nBands: Int): Set[(Long, Long)] =
      DedupOps.minhashPairsGeom(spark, sfDir, nBands).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val byBands = Seq(1, 2, 4, 8).map(b => b -> cand(b)).toMap
    def recall(b: Int): Double =
      truth.count(byBands(b)).toDouble / truth.size
    info(f"recall 1x8=${recall(1)}%.3f 2x4=${recall(2)}%.3f " +
      f"4x2=${recall(4)}%.3f 8x1=${recall(8)}%.3f")
    info(s"candidates 1x8=${byBands(1).size} 2x4=${byBands(2).size} " +
      s"4x2=${byBands(4).size} 8x1=${byBands(8).size}")
    // more bands = more OR-chances: candidate sets are supersets down
    // the split chain, so recall is monotone — measured, per the plan
    assert(recall(4) >= recall(2) && recall(2) >= recall(1))
    // the chosen plan reproduces the fixed pipeline's candidates exactly
    val fixed = run("q36_minhash_band_dedup").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(byBands(4) == fixed)
    // what the FP cap rejected: 8x1 buys its recall with a candidate
    // set at least as large as every other geometry's
    assert(byBands(8).size >= byBands(4).size &&
      byBands(4).size >= byBands(2).size)
  }

  // ------------------------------------------------------------- q159

  test("q159 planted fixture: cross-doc keep-first, within-doc " +
    "repetition, short tails, exact-copy docs, offset copies, and " +
    "null text all account exactly") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_q159_").toString
    val p = (1 to 20).map(i => s"p$i")
    val q = (1 to 20).map(i => s"q$i")
    val r = (1 to 20).map(i => s"r$i")
    val ss = (1 to 20).map(i => s"s$i")
    Seq(
      // doc 1: two unique paragraphs — everything survives
      (1L, Some((p ++ q).mkString(" "))),
      // doc 2: P0 duplicates doc 1's first paragraph (dropped), then a
      // unique paragraph and a unique 5-token tail
      (2L, Some((p ++ r ++ Seq("z1", "z2", "z3", "z4", "z5")).mkString(" "))),
      // doc 3: the same paragraph twice WITHIN one doc — second dropped
      (3L, Some((ss ++ ss).mkString(" "))),
      // doc 4: null text — zero paragraphs, zero tokens
      (4L, None),
      // doc 5: an exact copy of doc 1 — every paragraph dropped
      (5L, Some((p ++ q).mkString(" "))),
      // doc 6: doc 1 shifted by one token — chunk boundaries no longer
      // align, so NOTHING matches (paragraph dedup is alignment-bound;
      // gram-level q149/q155 would catch this, which is why a recipe
      // runs both)
      (6L, Some((Seq("w0") ++ p ++ q).mkString(" "))))
      .toDF("doc_id", "text")
      .coalesce(1).write.parquet(s"$dir/documents.parquet")
    val out = run("q159_paragraph_dedup", dir).collect()
      .map(row => row.getLong(0) -> ((row.getLong(1), row.getLong(2),
        row.getLong(3), row.getLong(4), row.getLong(5)))).toMap
    // (n_tokens, n_paras, n_paras_kept, tokens_kept, kept_ppm)
    assert(out(1L) == ((40L, 2L, 2L, 40L, 1000000L)))
    assert(out(2L) == ((45L, 3L, 2L, 25L, 25L * 1000000L / 45L)))
    assert(out(3L) == ((40L, 2L, 1L, 20L, 500000L)))
    assert(out(4L) == ((0L, 0L, 0L, 0L, 0L)))
    assert(out(5L) == ((40L, 2L, 0L, 0L, 0L)))
    assert(out(6L) == ((41L, 3L, 3L, 41L, 1000000L)))
  }

  test("q159 invariants on the driver corpus: chunk counts are exact, " +
    "survivors equal distinct paragraphs, and the keep-first rule " +
    "credits the minimal (doc_id, idx) occurrence") {
    import graft.functions.TextFns.tokens
    val rows = run("q159_paragraph_dedup").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    assert(rows.size == 500)
    for ((id, (nTok, nP, nKept, tokKept, ppm)) <- rows) {
      assert(nP == (nTok + 19) / 20, s"doc $id chunk count")
      assert(nKept >= 0 && nKept <= nP, s"doc $id survivors bounded")
      assert(tokKept <= nTok, s"doc $id kept tokens bounded")
      assert(ppm == tokKept * 1000000L / math.max(nTok, 1L), s"doc $id ppm")
    }
    // corpus-wide: total surviving paragraphs == distinct paragraph
    // texts (keep-first keeps exactly one occurrence per distinct chunk)
    val distinctParas = graft.Tables(spark, sfDir, "documents")
      .filter(col("text").isNotNull)
      .select(col("doc_id"), tokens(col("text")).as("t"))
      .select(explode(expr(
        "transform(sequence(0, (size(t) + 19) div 20 - 1), " +
          "i -> array_join(slice(t, i*20+1, 20), ' '))")).as("c"))
      .select(countDistinct(col("c"))).head().getLong(0)
    assert(rows.values.map(_._3).sum == distinctParas,
      "survivors must equal distinct paragraphs")
    // the dup mass is real on this corpus (the operator has work): some
    // doc must lose at least one paragraph
    assert(rows.values.exists(v => v._3 < v._2),
      "corpus carries no duplicate paragraphs — fixture regression")
  }

  // ------------------------------------------------------------- q160

  test("q160 planted fixture: the threshold sweep counts exactly at " +
    "every floor, with the bucket boundaries inclusive") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_q160_").toString
    Seq(
      // src a: TTR 1000 (all distinct), TTR 500 (each token twice),
      // TTR 250 (each token four times)
      (1L, "a", (1 to 8).map(i => s"t$i").mkString(" ")),
      (2L, "a", ((1 to 4) ++ (1 to 4)).map(i => s"u$i").mkString(" ")),
      (3L, "a", Seq.fill(4)(Seq("v1", "v2")).flatten.mkString(" ")),
      // src b: one doc at TTR 1000
      (4L, "b", "w1 w2 w3"))
      .toDF("doc_id", "source", "text")
      .coalesce(1).write.parquet(s"$dir/documents.parquet")
    val out = run("q160_quality_threshold_sweep", dir).collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    assert(out.size == 22, "2 sources x 11 thresholds")
    // src a (3 docs, 24 tokens): floor 0 keeps all; floor 300 drops the
    // TTR-250 doc; floor 600 drops the TTR-500 doc too; floor 1000
    // (boundary INCLUSIVE) still keeps the all-distinct doc
    assert(out(("a", 0L)) == ((3L, 24L, 1000000L, 1000000L)))
    assert(out(("a", 300L)) == ((2L, 16L, 2000000L / 3, 16L * 1000000L / 24)))
    assert(out(("a", 500L)) == ((2L, 16L, 2000000L / 3, 16L * 1000000L / 24)))
    assert(out(("a", 600L)) == ((1L, 8L, 1000000L / 3, 8L * 1000000L / 24)))
    assert(out(("a", 1000L)) == ((1L, 8L, 1000000L / 3, 8L * 1000000L / 24)))
    assert(out(("b", 1000L)) == ((1L, 3L, 1000000L, 1000000L)))
  }

  test("q160 invariants on the driver corpus: kept counts are monotone " +
    "nonincreasing in the threshold, floor 0 keeps everything, and the " +
    "curve agrees with a direct per-threshold recount") {
    import graft.functions.TextFns.tokens
    val rows = run("q160_quality_threshold_sweep").collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3)))).toMap
    val sources = rows.keySet.map(_._1)
    for (s <- sources; t <- 1 to 10) {
      val (dPrev, kPrev) = rows((s, (t - 1) * 100L))
      val (d, k) = rows((s, t * 100L))
      assert(d <= dPrev && k <= kPrev, s"$s: kept grew at floor ${t * 100}")
    }
    // floor 0 ≡ the whole source; one spot floor recounted directly
    val base = graft.Tables(spark, sfDir, "documents")
      .filter(col("source").isNotNull)
      .select(col("source"),
        coalesce(size(tokens(col("text"))), lit(0)).cast("long").as("n"),
        coalesce(size(array_distinct(tokens(col("text")))), lit(0))
          .cast("long").as("d"))
      .withColumn("q", expr("d * 1000L div greatest(n, 1L)"))
    val all = base.groupBy("source")
      .agg(count(lit(1)).as("c"), sum(col("n")).as("tk")).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    for ((s, (c, tk)) <- all) assert(rows((s, 0L)) == ((c, tk)))
    val spot = base.filter(expr("q div 100L >= 7"))
      .groupBy("source")
      .agg(count(lit(1)).as("c"), sum(col("n")).as("tk")).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    for (s <- sources)
      assert(rows((s, 700L)) == spot.getOrElse(s, (0L, 0L)),
        s"$s: floor-700 recount mismatch")
  }

  // ------------------------------------------------------------- q161

  test("q161 planted fixture: the coverage plan hits exact ranks, " +
    "achieved ppm, and frequency cutoffs on a known word distribution") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_q161_").toString
    // counts: a=4, b=2, c=1, d=1 over 8 tokens; rank order a,b,c,d
    // (count desc, word asc tiebreak) → cum ppm 500000/750000/875000/1e6
    Seq((1L, "a a a a b b"), (2L, "c d"))
      .toDF("doc_id", "text")
      .coalesce(1).write.parquet(s"$dir/documents.parquet")
    val out = run("q161_vocab_coverage_plan", dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3)))).toMap
    assert(out == Map(
      500000L -> ((1L, 500000L, 4L)),
      900000L -> ((4L, 1000000L, 1L)),
      950000L -> ((4L, 1000000L, 1L)),
      990000L -> ((4L, 1000000L, 1L))))
  }

  test("q161 invariants on the driver corpus: vocab_k monotone in the " +
    "target, achieved >= target, and the 50% plan agrees with an " +
    "independent driver-side recount") {
    import graft.functions.TextFns.tokens
    val rows = run("q161_vocab_coverage_plan").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3)))).toMap
    assert(rows.keySet == Set(500000L, 900000L, 950000L, 990000L))
    val ks = Seq(500000L, 900000L, 950000L, 990000L).map(t => rows(t)._1)
    assert(ks == ks.sorted, s"vocab_k must be monotone: $ks")
    for ((t, (_, achieved, cutoff)) <- rows) {
      assert(achieved >= t, s"target $t: achieved $achieved below target")
      assert(cutoff >= 1L, s"target $t: cutoff must be a real count")
    }
    // independent recount: collect the (tiny at sf0.001) vocab, sort by
    // (count desc, word asc) in plain Scala, find the minimal 50% prefix
    val counts = graft.Tables(spark, sfDir, "documents")
      .filter(col("text").isNotNull)
      .select(explode(tokens(col("text"))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("c")).collect()
      .map(r => r.getString(0) -> r.getLong(1))
    val ordered = counts.sortBy { case (w, c) => (-c, w) }
    val tot = ordered.map(_._2).sum
    var cum = 0L
    val k50 = ordered.indexWhere { case (_, c) =>
      cum += c; cum * 1000000L / tot >= 500000L
    } + 1
    assert(rows(500000L)._1 == k50.toLong,
      s"50% plan ${rows(500000L)._1} != driver recount $k50")
  }
}
