package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Round-16 additions: q162 physical export shard plan, q163 perceptual
  * image near-dup (real PGM pixel decode + dHash banding), q164 BPE merge
  * training, and q165 bigram-interpolated surprisal. Planted-fixture
  * geometry plus the invariants the hash oracle can't state (independent
  * in-test reimplementations, banding completeness, size bounds, the
  * q122-vs-q165 separation claim).
  */
class Round16OpsSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  private def run(name: String, dir: String = sfDir) =
    graft.Registry.all.find(_.name == name).get.run(spark, dir)

  /** In-test replica of TextFns.hash32 (md5 first-8-hex as long). */
  private def hash32(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    java.lang.Long.parseLong(
      d.take(4).map(b => f"${b & 0xff}%02x").mkString, 16)
  }

  // ------------------------------------------------------------- q162

  test("q162 planted fixture: the shard plan reproduces an independent " +
    "in-test pack (hash order, prefix sum, 4096-token bins, checksum) " +
    "on an all-surviving corpus spanning several shards") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_q162_").toString
    // 16 docs x 700 unique tokens each: no shared grams (nothing removed),
    // distinct fingerprints (all canonical), no bench ids — every doc
    // survives in full, so kept == n_tokens == 700; the 11200-token pack
    // spans shard starts up to 10500 div 4096 = shard 2 (3 shards)
    val docs = (0 until 16).map { d =>
      (10L + d, "s", (0 until 700).map(j => s"d${d}w$j").mkString(" "))
    }
    docs.toDF("doc_id", "source", "text")
      .coalesce(1).write.parquet(s"$dir/documents.parquet")
    // independent pack: same arithmetic in plain Scala
    val packed = docs.map(_._1).map(id => (hash32(s"1:$id"), id))
      .sortBy(identity)
    var cum = 0L
    val expected = packed.map { case (_, id) =>
      val start = cum; cum += 700L
      (start / 4096L, id)
    }.groupBy(_._1).map { case (shard, members) =>
      val ids = members.map(_._2)
      shard -> ((ids.size.toLong, 700L * ids.size, ids.head, ids.last,
        ids.map(id => hash32(s"$id:700")).sum))
    }
    val got = run("q162_export_shard_plan", dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))).toMap
    assert(got == expected, s"shard plan diverged: $got vs $expected")
    assert(got.size == 3, "fixture must span 3 shards")
  }

  test("q162 invariants on the driver corpus: shards partition q156's " +
    "manifest exactly (docs and tokens), ids are contiguous from 0, and " +
    "every non-final shard is size-bounded by C ± max kept doc") {
    val shards = run("q162_export_shard_plan").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    val manifest = run("q156_training_export_manifest").collect()
    assert(shards.map(_._2).sum == manifest.map(_.getLong(1)).sum,
      "shard doc counts must partition the manifest's exported docs")
    assert(shards.map(_._3).sum == manifest.map(_.getLong(3)).sum,
      "shard token counts must partition the manifest's exported tokens")
    assert(shards.map(_._1).toSeq == (0L until shards.length).toSeq,
      "shard ids must be contiguous from 0")
    // size bound: docs START inside their 4096-token window, so every
    // non-final shard holds C ± maxKept tokens (maxKept from q155's
    // per-doc kept accounting — a superset of the survivors)
    val maxKept = run("q155_dedup_removal_plan")
      .agg(max(col("tokens_kept"))).head().getLong(0)
    val C = 4096L
    for ((id, _, tok) <- shards.dropRight(1)) {
      assert(tok > C - maxKept && tok < C + maxKept,
        s"shard $id tokens $tok outside ($C ± $maxKept)")
    }
  }

  // ------------------------------------------------------------- q163

  test("q163: parsePgm decodes the format for real — comments and " +
    "whitespace in the header, maxval cap, truncated raster, garbage " +
    "and non-8x8 shapes all behave per contract") {
    import graft.queries.MultimodalOps._
    assert(parsePgm("not a pgm".getBytes("US-ASCII")).isEmpty)
    assert(parsePgm(Array.emptyByteArray).isEmpty)
    // comment lines between ANY header fields, mixed whitespace
    val bytes = (0 until 64).map(_.toByte).toArray
    val commented = ("P5 # trailing\n# full line\n 8\t# again\n8\n255 "
      .getBytes("US-ASCII")) ++ bytes
    val parsed = parsePgm(commented)
    assert(parsed.exists { case (w, h, px) =>
      w == 8 && h == 8 && px.toSeq == (0 until 64) })
    // truncated raster: 63 of 64 bytes
    assert(parsePgm(("P5\n8 8\n255\n".getBytes("US-ASCII")) ++
      bytes.take(63)).isEmpty)
    // 16-bit maxval (two-byte samples) is out of contract
    assert(parsePgm(("P5\n8 8\n65535\n".getBytes("US-ASCII")) ++
      bytes ++ bytes).isEmpty)
    // a 4x4 raster parses but dHash drops it (resize-first contract)
    val small = parsePgm(("P5\n4 4\n255\n".getBytes("US-ASCII")) ++
      bytes.take(16))
    assert(small.exists { case (w, h, _) => w == 4 && h == 4 })
    assert(small.flatMap { case (w, h, px) => dHash(w, h, px) }.isEmpty)
  }

  test("q163: dHash gradient bits are exact on a known raster, and a " +
    "one-pixel perturbation moves at most one bit") {
    import graft.queries.MultimodalOps._
    // row y = [y, y+1, ..., y+7]: strictly increasing rows → all 56 bits
    val inc = Array.tabulate(64)(k => k % 8 + k / 8)
    assert(dHash(8, 8, inc).contains((1L << 56) - 1))
    // constant raster: no strict increase anywhere → 0
    assert(dHash(8, 8, Array.fill(64)(7)).contains(0L))
    // perturb pixel (0,0) of the constant raster upward: only bit (0,0)'s
    // comparison px(1,0) > px(0,0) can change, and it stays 0; perturb
    // DOWN and bit 0 flips on
    val down = Array.fill(64)(7); down(0) = 6
    assert(dHash(8, 8, down).contains(1L))
  }

  test("q163 banding completeness on a small corpus: the query's pair " +
    "set equals an all-pairs brute force at Hamming <= 3 (4x14-bit " +
    "bands are pigeonhole-complete), and every planted near-dup pair " +
    "surfaces at distance <= 1") {
    import spark.implicits._
    import graft.queries.MultimodalOps._
    val dir = java.nio.file.Files.createTempDirectory("graft_q163_").toString
    val ids = (0L until 40L)
    ids.map(id => (id, s"t$id")).toDF("doc_id", "text")
      .coalesce(1).write.parquet(s"$dir/documents.parquet")
    // independent brute force: recompute the pixels and dHash in-test
    def px(id: Long): Array[Int] = {
      val base = if (id % 5 == 4) id - 1 else id
      Array.tabulate(64) { k =>
        val (x, y) = (k % 8, k / 8)
        ((base * 31 + x * 7 + y * 13) % 251).toInt +
          (if (id % 5 == 4 && k == 0) 1 else 0)
      }
    }
    val sigs = ids.map(id => id -> dHash(8, 8, px(id)).get).toMap
    val brute = (for {
      i <- ids; j <- ids if i < j
      d = java.lang.Long.bitCount(sigs(i) ^ sigs(j))
      if d <= 3
    } yield (i, j, d)).toSet
    val got = run("q163_image_perceptual_neardup", dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(got == brute, s"banded pairs diverge from brute force")
    for (id <- ids if id % 5 == 4)
      assert(got.exists(p => p._1 == id - 1 && p._2 == id && p._3 <= 1),
        s"planted near-dup ($id-1, $id) missing")
  }

  test("q163: dirty payloads (text bytes, truncated PGMs) are dropped " +
    "by the batched decoder; the synthetic corpus decodes in full") {
    import graft.queries.MultimodalOps._
    assert(decodeDHash(mediaFromDocs(spark, sfDir)).isEmpty)
    val good = syntheticPgms(spark, sfDir)
    assert(decodeDHash(good).count() == good.count())
  }

  // ------------------------------------------------------------- q164

  /** Independent in-test BPE: list-of-symbols merge loop (no strings,
    * no separators) — the classic reference algorithm.
    */
  private def bpeRef(words: Seq[(String, Long)], rounds: Int)
      : Seq[(Long, String, String, Long, Long)] = {
    var syms = words.map { case (w, f) => (w.map(_.toString).toList, f) }
    (1 to rounds).map { r =>
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      for ((ss, f) <- syms; p <- ss.zip(ss.tail))
        counts(p) = counts.getOrElse(p, 0L) + f
      assert(counts.nonEmpty, s"reference BPE exhausted at round $r")
      val ((a, b), c) = counts.toSeq.minBy { case ((x, y), n) => (-n, x, y) }
      def apply(ss: List[String]): List[String] = ss match {
        case x :: y :: rest if x == a && y == b => (a + b) :: apply(rest)
        case x :: rest => x :: apply(rest)
        case Nil => Nil
      }
      syms = syms.map { case (ss, f) => (apply(ss), f) }
      val after = syms.map { case (ss, f) => ss.size * f }.sum
      (r.toLong, a, b, c, after)
    }
  }

  test("q164 planted fixture: the merge table equals an independent " +
    "list-based BPE on the classic corpus, including the leftmost " +
    "non-overlapping rule ([aaaa] + (a,a) -> [aa,aa])") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_q164_").toString
    // word frequencies: low*5, lower*2, newest*6, widest*3, aaaa*1
    val corpus = Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
      Seq.fill(6)("newest") ++ Seq.fill(3)("widest") ++ Seq("aaaa")
    Seq((1L, corpus.mkString(" ")))
      .toDF("doc_id", "text")
      .coalesce(1).write.parquet(s"$dir/documents.parquet")
    val freq = corpus.groupBy(identity).view
      .mapValues(_.size.toLong).toSeq
    val expected = bpeRef(freq, 12)
    val got = run("q164_bpe_merge_train", dir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getLong(3), r.getLong(4))).toSeq.sortBy(_._1)
    assert(got == expected, s"merge table diverged:\n$got\nvs\n$expected")
    // the overlap rule concretely: find the round that merges (a, a) —
    // "aaaa" contributes pair count 3 but only 2 applied merges
    val aa = got.find(m => m._2 == "a" && m._3 == "a")
    assert(aa.isEmpty || aa.exists(_._4 >= 3L),
      "if (a,a) merges, its count must include the overlapping pair")
  }

  test("q164 invariants on the driver corpus: 12 rounds, tokens_after " +
    "strictly decreasing, every merge's count positive, and the table " +
    "equals the independent reference BPE on the real vocabulary") {
    import graft.functions.TextFns.tokens
    val got = run("q164_bpe_merge_train").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getLong(3), r.getLong(4))).toSeq.sortBy(_._1)
    assert(got.map(_._1) == (1L to 12L))
    assert(got.forall(_._4 > 0))
    val afters = got.map(_._5)
    assert(afters == afters.sorted.reverse && afters.distinct == afters,
      s"tokens_after must strictly decrease: $afters")
    val vocab = graft.Tables(spark, sfDir, "documents")
      .filter(col("text").isNotNull)
      .select(explode(tokens(col("text"))).as("w"))
      .filter(col("w").rlike("^[a-z]+$"))
      .groupBy("w").agg(count(lit(1)).as("f")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toSeq
    assert(got == bpeRef(vocab, 12),
      "driver-corpus merge table diverged from the reference algorithm")
  }

  // ------------------------------------------------------------- q165

  test("q165 planted fixture: two docs with IDENTICAL unigram stats — " +
    "q122 cannot tell them apart; the bigram model scores the " +
    "repetitive one strictly lower and flags the novel one as backoff") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_q165_").toString
    // same multiset (x,y,z,w each x3): doc 1 cycles one phrase (every
    // bigram repeats >= 2), doc 2 visits 11 distinct bigrams none of
    // which doc 1 uses
    val a = "x y z w x y z w x y z w"
    val b = "x x z y y w z z x w w y"
    Seq((1L, a), (2L, b)).toDF("doc_id", "text")
      .coalesce(1).write.parquet(s"$dir/documents.parquet")
    val q122 = run("q122_unigram_surprisal", dir).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(q122(1L) == q122(2L),
      "unigram surprisal must be blind to the word order")
    val q165 = run("q165_bigram_surprisal", dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3)))).toMap
    assert(q165(1L)._1 == 11L && q165(2L)._1 == 11L)
    assert(q165(1L)._3 == 0L, "the cyclic doc's bigrams all repeat")
    assert(q165(2L)._3 == 1000000L, "the novel doc is all backoff")
    assert(q165(1L)._2 < q165(2L)._2,
      "bigram surprisal must separate what unigram cannot")
  }

  test("q165 invariants on the driver corpus: n_bigrams = words - 1 per " +
    "doc, scores bounded by the corpus-size bit length, and backoff " +
    "share is a real fraction") {
    val words = run("q122_unigram_surprisal").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val n = words.values.sum
    val maxBits = (64 - java.lang.Long.numberOfLeadingZeros(n)) + 1L
    val rows = run("q165_bigram_surprisal").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3)))).toMap
    assert(rows.nonEmpty)
    for ((id, (nb, mbits, bppm)) <- rows) {
      assert(nb == words(id) - 1, s"doc $id bigram count")
      assert(mbits >= 0 && mbits <= maxBits * 1000, s"doc $id score range")
      assert(bppm >= 0 && bppm <= 1000000L, s"doc $id backoff share")
    }
    // docs with exactly one word produce no bigram row
    assert(rows.keySet == words.filter(_._2 >= 2).keySet)
  }

  // ------------------------------------------------------------- q166

  /** Apply a learned merge list to one word — the reference encoder. */
  private def encodeRef(w: String,
      merges: Seq[(Long, String, String, Long, Long)]): Int = {
    var syms = w.map(_.toString).toList
    for ((_, a, b, _, _) <- merges) {
      def app(ss: List[String]): List[String] = ss match {
        case x :: y :: rest if x == a && y == b => (a + b) :: app(rest)
        case x :: rest => x :: app(rest)
        case Nil => Nil
      }
      syms = app(syms)
    }
    syms.size
  }

  test("q166 planted fixture: per-doc subword counts equal an " +
    "independent reference encode under the reference-learned merges, " +
    "out-of-alphabet words fall back to char-level, and the trained-" +
    "word total reconciles with q164's final tokens_after") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_q166_").toString
    // q164's classic corpus split across three docs (same vocabulary ->
    // same merge table), plus a fourth doc with out-of-alphabet words
    val d1 = Seq.fill(5)("low") ++ Seq.fill(2)("lower")
    val d2 = Seq.fill(6)("newest")
    val d3 = Seq.fill(3)("widest") ++ Seq("aaaa")
    val d4 = Seq("ab3", "low", "x9z")
    val docsFx = Seq((1L, d1), (2L, d2), (3L, d3), (4L, d4))
    docsFx.map { case (id, ws) => (id, ws.mkString(" ")) }
      .toDF("doc_id", "text")
      .coalesce(1).write.parquet(s"$dir/documents.parquet")
    val freq = (d1 ++ d2 ++ d3 ++ d4).filter(_.matches("[a-z]+"))
      .groupBy(identity).view.mapValues(_.size.toLong).toSeq
    val merges = bpeRef(freq, 12)
    val expected = docsFx.map { case (id, ws) =>
      val bpe = ws.map(w =>
        if (w.matches("[a-z]+")) encodeRef(w, merges).toLong
        else w.length.toLong).sum
      id -> ((ws.size.toLong, bpe, ws.map(_.length.toLong).sum))
    }.toMap
    val got = run("q166_bpe_encode", dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3)))).toMap
    assert(got == expected, s"encode diverged: $got vs $expected")
    // reconciliation: summing freq * encoded-length over the TRAINED
    // vocabulary is exactly q164's round-12 tokens_after
    val after12 = run("q164_bpe_merge_train", dir).collect()
      .map(r => (r.getLong(0), r.getLong(4))).toMap.apply(12L)
    val trainedTotal = freq.map { case (w, f) =>
      f * encodeRef(w, merges) }.sum
    assert(trainedTotal == after12,
      "reference encode must reconcile with the q164 compression curve")
  }

  test("q166 invariants on the driver corpus: merges never lengthen " +
    "(n_bpe_tokens <= n_char_tokens, compression_ppm >= 1e6) and " +
    "word counts agree with q122's tokenization base") {
    val rows = run("q166_bpe_encode").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        if (r.isNullAt(4)) None else Some(r.getLong(4))))
    assert(rows.nonEmpty)
    for ((id, nw, bpe, chars, ppm) <- rows) {
      assert(bpe <= chars, s"doc $id: merges lengthened the encoding")
      assert(bpe >= nw, s"doc $id: a word encodes to >= 1 token")
      assert(ppm.forall(_ >= 1000000L), s"doc $id compression < 1")
    }
    // whitespace-token totals must match q32's per-doc n_tokens for the
    // same docs (null-text docs excluded on both sides)
    val q32 = run("q32_text_stats").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    for ((id, nw, _, _, _) <- rows)
      assert(nw == q32(id), s"doc $id word count diverged from q32")
  }

  // ------------------------------------------------------------- q167

  test("q167 planted fixture: fit/truncation/padding accounting is " +
    "exact on hand-computed token counts spanning the grid") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_q167_").toString
    val ns = Seq(100, 128, 129, 2048, 3000)
    ns.zipWithIndex.map { case (n, i) =>
      (i.toLong, (0 until n).map(j => s"w$j").mkString(" "))
    }.toDF("doc_id", "text")
      .coalesce(1).write.parquet(s"$dir/documents.parquet")
    val grid = Seq(128L, 256L, 512L, 1024L, 2048L)
    val expected = grid.map { c =>
      val fit = ns.filter(_ <= c)
      val kept = fit.map(_.toLong).sum + c * (ns.size - fit.size)
      c -> ((fit.size.toLong, (ns.size - fit.size).toLong, kept,
        ns.map(_.toLong).sum - kept, c * fit.size - fit.map(_.toLong).sum,
        kept * 1000000L / (c * ns.size)))
    }.toMap
    val got = run("q167_context_length_plan", dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))).toMap
    assert(got == expected, s"plan diverged: $got vs $expected")
  }

  test("q167 invariants on the driver corpus: docs_fit and kept_tokens " +
    "monotone in ctx_len, conservation against totals, padding and " +
    "utilization bounded") {
    val rows = run("q167_context_length_plan").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6))).toSeq.sortBy(_._1)
    assert(rows.map(_._1) == Seq(128L, 256L, 512L, 1024L, 2048L))
    val totDocs = rows.head._2 + rows.head._3
    val totTok = rows.head._4 + rows.head._5
    for (Seq(a, b) <- rows.sliding(2)) {
      assert(a._2 <= b._2, "docs_fit must grow with ctx_len")
      assert(a._4 <= b._4, "kept_tokens must grow with ctx_len")
    }
    for ((c, fit, trunc, kept, tr, pad, util) <- rows) {
      assert(fit + trunc == totDocs, s"C=$c doc conservation")
      assert(kept + tr == totTok, s"C=$c token conservation")
      assert(pad >= 0 && pad <= c * fit, s"C=$c padding bounds")
      assert(util >= 0 && util <= 1000000L, s"C=$c utilization bounds")
    }
  }

  // ------------------------------------------------------------- q168

  test("q168 planted fixture: cascade precedence is exact — a doc that " +
    "is both an exact dup and contaminated counts at stage 1; a " +
    "same-shingle-set (guaranteed-pair) doc falls at stage 2; a clean " +
    "contaminated doc at stage 3") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_q168_").toString
    val benchTxt = "b1 b2 b3 b4 b5"
    // 20-token base docs (distinct vocab per doc, > 3 tokens for grams)
    def mk(tag: String, n: Int) =
      (0 until n).map(j => s"$tag$j").mkString(" ")
    val docs = Seq(
      (1L, benchTxt), // bench side (doc_id < 10)
      (10L, mk("a", 20)), // clean survivor
      (11L, mk("a", 20)), // exact dup of 10 AND would-be contaminated? no
      (12L, mk("c", 17) + " b1 b2 b3 b4 b5"), // exact-dup... no: unique; contaminated (shares bench 5-gram)
      (13L, mk("c", 17) + " b1 b2 b3 b4 b5"), // exact dup of 12 AND contaminated -> stage 1
      // 14/15: same distinct 3-gram set, different token bags -> a
      // GUARANTEED identical minhash signature pair, different fps
      (14L, "p1 p2 p3 p1 p2 p3"),
      (15L, "p1 p2 p3 p1 p2 p3 p1"),
      (16L, mk("z", 20))) // clean survivor
    docs.toDF("doc_id", "text")
      .coalesce(1).write.parquet(s"$dir/documents.parquet")
    val got = run("q168_dedup_cascade_audit", dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7)))).toMap
    val toks = docs.filter(_._1 >= 10).map(_._2.split(" ").length.toLong).sum
    // stage 1: 7 corpus docs in; 11 (dup of 10, 20 tok) and 13 (dup of
    // 12, 22 tok) fall — 13 is ALSO contaminated, but precedence says 1
    assert(got(1L) == ((7L, toks, 2L, 42L, 5L, toks - 42L)),
      s"stage 1 diverged: ${got(1L)}")
    // stage 2: 15 falls (guaranteed pair with surviving 14)
    assert(got(2L) == ((5L, toks - 42L, 1L, 7L, 4L, toks - 49L)),
      s"stage 2 diverged: ${got(2L)}")
    // stage 3: 12 falls (shares the bench 5-gram)
    assert(got(3L) == ((4L, toks - 49L, 1L, 22L, 3L, toks - 71L)),
      s"stage 3 diverged: ${got(3L)}")
  }

  test("q168 on the driver corpus: the audit equals an independent " +
    "recomposition from the registered q34/q36/q63 outputs") {
    val d = graft.Tables(spark, sfDir, "documents")
      .selectExpr("doc_id",
        "CAST(COALESCE(size(split(text, ' ')), 0) AS LONG) AS tok")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .filter(_._1 >= 10L).toMap
    // q34 gives (fp, canonical_id, dup_cnt) over ALL docs; recompute the
    // corpus-side canonical rule in-test from raw text instead
    val raw = graft.Tables(spark, sfDir, "documents")
      .selectExpr("doc_id", "text").collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) null else r.getString(1)))
      .filter(_._1 >= 10L)
    def fp(t: String): String = {
      if (t == null) return "<null>"
      val norm = t.toLowerCase.replaceAll("\\s+", " ").trim
      norm.split(" ", -1).sorted.mkString(" ")
    }
    val byFp = raw.groupBy(p => fp(p._2))
    val keep1 = raw.map(_._1).filter(id =>
      byFp.values.exists(g => g.minBy(_._1)._1 == id)).toSet
    val pairs = run("q36_minhash_band_dedup").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val removed2 = pairs.filter { case (i, j) =>
      keep1(i) && keep1(j) }.map(_._2).toSet
    val contaminated = run("q63_decontamination").collect()
      .filter(_.getInt(2) == 1).map(_.getLong(0)).toSet
    val stageOf = raw.map(_._1).map { id =>
      id -> (if (!keep1(id)) 1
        else if (removed2(id)) 2
        else if (contaminated(id)) 3 else 0)
    }.toMap
    def stats(ids: Iterable[Long]) =
      (ids.size.toLong, ids.map(d).sum)
    val all3 = run("q168_dedup_cascade_audit").collect()
      .map(r => r.getLong(0) -> ((r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7)))).toMap
    var in = raw.map(_._1).toSeq
    for (st <- 1 to 3) {
      val (nIn, tIn) = stats(in)
      val fall = in.filter(stageOf(_) == st)
      val (nF, tF) = stats(fall)
      val out = in.filterNot(stageOf(_) == st)
      val (nO, tO) = stats(out)
      assert(all3(st.toLong) == ((nIn, tIn, nF, tF, nO, tO)),
        s"stage $st diverged from the recomposition: ${all3(st.toLong)} " +
          s"vs ${(nIn, tIn, nF, tF, nO, tO)}")
      in = out
    }
  }

  // ------------------------------------------------------------- q169

  test("q169 planted fixture: the 3-copy cap keeps by doc_id order and " +
    "accounts kept/dropped per source exactly, across sources sharing " +
    "a fingerprint") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_q169_").toString
    val dup = "d1 d2 d3 d4" // 4 tokens, same fp everywhere
    val docs = Seq(
      (1L, "s1", dup), (2L, "s1", dup), (3L, "s2", dup),
      (4L, "s2", dup), (5L, "s1", dup), // copies 4/5 (ids 4, 5) drop
      (6L, "s1", "u1 u2 u3"), // unique, kept
      // lower+collapse-normalizes to the same fingerprint as `dup` —
      // copy 6 of the fp, so it drops under the 3-copy cap
      (7L, "s2", "D1  d2 d3 d4"))
    docs.toDF("doc_id", "source", "text")
      .coalesce(1).write.parquet(s"$dir/documents.parquet")
    val got = run("q169_dup_cap_curation", dir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    // fp order by doc_id: 1,2,3 kept; 4 (s2), 5 (s1), 7 (s2) dropped.
    // Token counts ride the RAW text split, so doc 7's double space
    // contributes an empty token (5 raw tokens) even though its
    // NORMALIZED fingerprint equals the others'
    assert(got("s1") == ((4L, 3L, 1L, 11L, 4L)), s"s1: ${got("s1")}")
    assert(got("s2") == ((3L, 1L, 2L, 4L, 9L)), s"s2: ${got("s2")}")
  }

  test("q169 invariants on the driver corpus: per-source conservation, " +
    "and the cap can only drop docs q34 sees as duplicates") {
    val rows = run("q169_dup_cap_curation").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(rows.nonEmpty)
    for ((src, n, kept, dropped, tk, td) <- rows) {
      assert(kept + dropped == n, s"$src doc conservation")
      assert(kept >= 0 && dropped >= 0 && tk >= 0 && td >= 0)
    }
    val droppedTotal = rows.map(_._4).sum
    val beyondCap = run("q34_exact_dedup").collect()
      .map(_.getLong(2)).map(c => math.max(0L, c - 3L)).sum
    assert(droppedTotal == beyondCap,
      "total dropped must equal q34's copies beyond the cap")
  }

  // ------------------------------------------------------------- q170

  test("q170 equals an independent plain-Scala IVF sweep on the driver " +
    "embeddings (same fold order, same tie rules), and the curve is " +
    "monotone in nprobe") {
    import spark.implicits._
    val vs = graft.Tables(spark, sfDir, "embeddings")
      .select(col("vec_id"), col("embedding"))
      .as[(Long, Seq[Float])].collect()
      .map { case (id, e) => id -> e.map(_.toDouble).toArray }.toMap
    def dot(a: Array[Double], b: Array[Double]): Double = {
      var acc = 0.0; var k = 0
      while (k < a.length) { acc += a(k) * b(k); k += 1 }
      acc
    }
    def cos(a: Array[Double], b: Array[Double]): Double =
      dot(a, b) / (math.sqrt(dot(a, a)) * math.sqrt(dot(b, b)))
    val cents = (0L until 16L).map(c => c -> vs(c))
    val corp = vs.keys.filter(_ >= 5L).toSeq.sorted
    val qrys = vs.keys.filter(_ < 5L).toSeq.sorted
    def rankCents(v: Array[Double]) = cents
      .map { case (c, cv) => (c, cos(v, cv)) }
      .sortBy { case (c, s) => (-s, c) }.map(_._1)
    val listOf = corp.map(n => n -> rankCents(vs(n)).head).toMap
    val probesOf = qrys.map(q => q -> rankCents(vs(q)).take(8)).toMap
    val truth = qrys.map { q =>
      q -> corp.map(n => (n, cos(vs(q), vs(n))))
        .sortBy { case (n, s) => (-s, n) }.take(5).map(_._1).toSet
    }.toMap
    val expected = Seq(1, 2, 4, 8).map { np =>
      val cand = qrys.map { q =>
        q -> corp.filter(n => probesOf(q).take(np).contains(listOf(n)))
      }.toMap
      val nCand = cand.values.map(_.size.toLong).sum
      val hits = qrys.map { q =>
        cand(q).map(n => (n, cos(vs(q), vs(n))))
          .sortBy { case (n, s) => (-s, n) }.take(5).map(_._1)
          .count(truth(q))
      }.sum
      np.toLong -> ((hits.toLong * 1000000L / (5L * qrys.size), nCand))
    }.toMap
    val got = run("q170_ivf_nprobe_sweep").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got == expected, s"sweep diverged: $got vs $expected")
    val byNp = got.toSeq.sortBy(_._1)
    for (Seq((_, (r1, c1)), (_, (r2, c2))) <- byNp.sliding(2)) {
      assert(r1 <= r2, "recall must be monotone in nprobe")
      assert(c1 <= c2, "candidate cost must be monotone in nprobe")
    }
    assert(byNp.forall { case (_, (r, _)) => r >= 0 && r <= 1000000L })
  }

  // ------------------------------------------------------------- q171

  test("q171 reconciles with q166 and q33: per-language token sums " +
    "partition the corpus totals, doc counts match the q33 argmax, and " +
    "fertility is a real >= 1 ratio") {
    val fert = run("q171_tokenizer_fertility").collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))).toMap
    assert(fert.nonEmpty)
    val q166 = run("q166_bpe_encode").collect()
      .map(r => (r.getLong(1), r.getLong(2)))
    assert(fert.values.map(_._2).sum == q166.map(_._1).sum,
      "word totals must partition q166's")
    assert(fert.values.map(_._3).sum == q166.map(_._2).sum,
      "bpe token totals must partition q166's")
    val q33 = run("q33_langid").collect()
      .map(_.getString(2)).groupBy(identity).view.mapValues(_.size.toLong)
    for ((lang, (nDocs, nWords, nBpe, fppm)) <- fert) {
      assert(nDocs == q33(lang), s"$lang doc count diverged from q33")
      assert(fppm >= 1000000L, s"$lang fertility < 1 token per word")
      assert(nBpe >= nWords, s"$lang token accounting inverted")
    }
  }

  // ------------------------------------------------------------- q172

  test("q172 planted fixture: the greedy fill serves 4 epochs down the " +
    "quality ranks, a partial epoch at the budget edge, zero beyond") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_q172_").toString
    // three sources, 10 tokens each (total 30, budget 60, capacity 40
    // per source): quality order hi > mid > lo by construction —
    // hi all-distinct tokens (q=1000), mid half-repeated (q=500),
    // lo one token repeated (q=100)
    Seq(
      (1L, "hi", (0 until 10).map(i => s"h$i").mkString(" ")),
      (2L, "mid", "m0 m1 m2 m3 m4 m0 m1 m2 m3 m4"),
      (3L, "lo", "x x x x x x x x x x"))
      .toDF("doc_id", "source", "text")
      .coalesce(1).write.parquet(s"$dir/documents.parquet")
    val got = run("q172_epoch_repeat_plan", dir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    // budget 60: hi serves 40 (4 epochs), mid the remaining 20
    // (2 epochs), lo nothing
    assert(got("hi") == ((1L, 1000L, 10L, 40L, 4000000L)), s"${got("hi")}")
    assert(got("mid") == ((2L, 500L, 10L, 20L, 2000000L)), s"${got("mid")}")
    assert(got("lo") == ((3L, 100L, 10L, 0L, 0L)), s"${got("lo")}")
  }

  test("q172 invariants on the driver corpus: served tokens exactly " +
    "exhaust the 2x budget (capacity always suffices at a 4-epoch cap), " +
    "epochs are capped and nonincreasing down the ranks") {
    val rows = run("q172_epoch_repeat_plan").collect()
      .map(r => (r.getLong(1), r.getLong(3), r.getLong(4), r.getLong(5)))
      .toSeq.sortBy(_._1)
    assert(rows.nonEmpty)
    val tot = rows.map(_._2).sum
    assert(rows.map(_._3).sum == 2L * tot,
      "the whole 2x budget must be allocated")
    for (Seq((_, _, _, e1), (_, _, _, e2)) <- rows.sliding(2))
      assert(e1 >= e2, "epochs must be nonincreasing down the ranks")
    assert(rows.forall(_._4 <= 4000000L), "the 4-epoch cap binds")
  }

  // ------------------------------------------------------------- q173

  test("q173 planted fixture: a same-source df>=3 chunk drops in ALL " +
    "its occurrences (unlike q159's keep-first); df=2 and cross-source " +
    "repeats survive") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_q173_").toString
    val T = (0 until 20).map(i => s"t$i").mkString(" ") // the template
    val U = (0 until 20).map(i => s"u$i").mkString(" ")
    val V = (0 until 20).map(i => s"v$i").mkString(" ")
    val docs = Seq(
      (1L, "A", T + " x1 x2"), // template + 2-token tail
      (2L, "A", T + " y1 y2 y3"),
      (3L, "A", T), // df(A, T) = 3 -> boilerplate
      (4L, "A", "a1 a2 a3"),
      (5L, "B", U + " z1"), (6L, "B", U), // df(B, U) = 2 -> kept
      (7L, "C", V), (8L, "D", V), (9L, "E", V)) // cross-source -> kept
    docs.toDF("doc_id", "source", "text")
      .coalesce(1).write.parquet(s"$dir/documents.parquet")
    val got = run("q173_boilerplate_removal", dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(2), r.getLong(3), r.getLong(4),
        r.getLong(5), r.getLong(6)))).toMap
    assert(got(1L) == ((22L, 2L, 1L, 2L, 90909L)), s"${got(1L)}")
    assert(got(2L) == ((23L, 2L, 1L, 3L, 130434L)), s"${got(2L)}")
    assert(got(3L) == ((20L, 1L, 1L, 0L, 0L)),
      s"the first occurrence must drop too: ${got(3L)}")
    assert(got(4L) == ((3L, 1L, 0L, 3L, 1000000L)), s"${got(4L)}")
    for (id <- Seq(5L, 6L, 7L, 8L, 9L))
      assert(got(id)._3 == 0L, s"doc $id wrongly flagged as boilerplate")
  }

  test("q173 on the driver corpus equals an independent in-test " +
    "recompute of the chunk / same-source-df rule") {
    val raw = graft.Tables(spark, sfDir, "documents")
      .selectExpr("doc_id", "source", "text").collect()
      .map(r => (r.getLong(0),
        if (r.isNullAt(1)) null else r.getString(1),
        if (r.isNullAt(2)) null else r.getString(2)))
    def md5hex(s: String): String = java.security.MessageDigest
      .getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map(b => f"${b & 0xff}%02x").mkString
    val chunks = raw.filter(_._3 != null).flatMap { case (id, src, t) =>
      t.split(" ", -1).grouped(20).map(c =>
        (id, src, md5hex(c.mkString(" ")), c.length.toLong))
    }
    val boiler = chunks.groupBy(c => (c._2, c._3)).view
      .mapValues(_.map(_._1).distinct.size).filter(_._2 >= 3).keySet
    val expected = raw.map { case (id, src, t) =>
      val cs = chunks.filter(_._1 == id)
      val nTok = if (t == null) 0L else t.split(" ", -1).length.toLong
      val nB = cs.count(c => boiler((c._2, c._3))).toLong
      val kept = cs.filter(c => !boiler((c._2, c._3))).map(_._4).sum
      id -> ((nTok, cs.length.toLong, nB, kept,
        kept * 1000000L / math.max(nTok, 1L)))
    }.toMap
    val got = run("q173_boilerplate_removal").collect()
      .map(r => r.getLong(0) -> ((r.getLong(2), r.getLong(3), r.getLong(4),
        r.getLong(5), r.getLong(6)))).toMap
    assert(got == expected, "boilerplate accounting diverged from the " +
      "independent recompute")
  }

  // ------------------------------------------------------------- q174

  test("q174 planted fixture: each named rule fires on exactly its " +
    "engineered violator, 'any' is their OR, rates are exact") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_q174_").toString
    val clean = "the quick brown fox jumps over a lazy dog and " +
      "every word here is of fresh value to keep ratios sane"
    val docs = Seq(
      (1L, "s", clean), // fires nothing
      (2L, "s", "too few"), // word_count (2 < 5); also ttr/stop-dependent
      (3L, "s", "the the the the the the the the the the"), // top_tf + ttr
      (4L, "s", "aaaaaaaaaaaaaaaaaaaaa bbbbbbbbbbbbbbbbbbb " +
        "ccccccccccccccccccc ddddddddddddddddddd eeeeeeeeeeeeeeeeeee"),
      // mean_word_len > 12; no stopwords -> stop_words fires too
      (5L, "s", clean))
    docs.toDF("doc_id", "source", "text")
      .coalesce(1).write.parquet(s"$dir/documents.parquet")
    val got = run("q174_quality_rule_battery", dir).collect()
      .map(r => r.getString(1) -> ((r.getLong(2), r.getLong(3),
        r.getLong(4)))).toMap
    // doc 2 (n=2): word_count; top_tf (500 > 200 — short docs trip it
    // too); stop_words (0 < 10)
    // doc 3: top_tf (1000); ttr (100 < 300); stopword share 1000 ok
    // doc 4: mean_word_len (19400 milli); stop_words; top_tf exactly AT
    // the 200 threshold does NOT fire (strict >)
    assert(got("word_count") == ((5L, 1L, 200000L)), s"${got("word_count")}")
    assert(got("mean_word_len") == ((5L, 1L, 200000L)),
      s"${got("mean_word_len")}")
    assert(got("top_tf") == ((5L, 2L, 400000L)), s"${got("top_tf")}")
    assert(got("ttr") == ((5L, 1L, 200000L)), s"${got("ttr")}")
    assert(got("stop_words") == ((5L, 2L, 400000L)), s"${got("stop_words")}")
    assert(got("any") == ((5L, 3L, 600000L)), s"${got("any")}")
  }

  test("q174 invariants on the driver corpus: every source emits all " +
    "six rules, 'any' dominates each individual rule, counts conserve") {
    val rows = run("q174_quality_rule_battery").collect()
      .map(r => ((if (r.isNullAt(0)) null else r.getString(0)),
        r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    val bySrc = rows.groupBy(_._1)
    assert(bySrc.nonEmpty)
    for ((src, rs) <- bySrc) {
      val byRule = rs.map(t => t._2 -> ((t._3, t._4, t._5))).toMap
      assert(byRule.keySet == Set("word_count", "mean_word_len", "top_tf",
        "ttr", "stop_words", "any"), s"$src missing rules")
      val nDocs = byRule.values.map(_._1).toSet
      assert(nDocs.size == 1, s"$src: rule rows disagree on doc count")
      val anyFired = byRule("any")._2
      for ((rule, (_, fired, ppm)) <- byRule) {
        assert(fired <= anyFired || rule == "any",
          s"$src/$rule fired more than 'any'")
        assert(ppm >= 0 && ppm <= 1000000L)
      }
    }
  }

  // ------------------------------------------------------------- q175

  test("q175 planted fixture: docs engineered to share exactly " +
    "0/1/2/4/8/9 bench 5-grams land on the right side of every floor") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_q175_").toString
    val b = (1 to 14).map(i => s"b$i")
    def pre(k: Int) = b.take(k + 4).mkString(" ") // exactly k shared grams
    val docs = Seq(
      (1L, "s", b.mkString(" ")), // the bench doc (10 grams)
      (10L, "s", (1 to 10).map(i => s"c$i").mkString(" ")), // 0 shared
      (11L, "s", pre(1)), (12L, "s", pre(2)), (13L, "s", pre(4)),
      (14L, "s", pre(8)), (15L, "s", pre(9)))
    docs.toDF("doc_id", "source", "text")
      .coalesce(1).write.parquet(s"$dir/documents.parquet")
    val got = run("q175_contamination_sweep", dir).collect()
      .map(r => r.getLong(1) -> ((r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))).toMap
    assert(got(1L) == ((6L, 5L, 44L, 833333L)), s"floor 1: ${got(1L)}")
    assert(got(2L) == ((6L, 4L, 39L, 666666L)), s"floor 2: ${got(2L)}")
    assert(got(4L) == ((6L, 3L, 33L, 500000L)), s"floor 4: ${got(4L)}")
    assert(got(8L) == ((6L, 2L, 25L, 333333L)), s"floor 8: ${got(8L)}")
  }

  test("q175 invariants on the driver corpus: removal monotone " +
    "nonincreasing in the floor, and floor 1 equals q63's binary rule") {
    val rows = run("q175_contamination_sweep").collect()
      .map(r => ((if (r.isNullAt(0)) null else r.getString(0)),
        r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(rows.nonEmpty)
    for ((src, rs) <- rows.groupBy(_._1)) {
      val byFloor = rs.sortBy(_._2)
      for (Seq(a, c) <- byFloor.toSeq.sliding(2)) {
        assert(a._4 >= c._4, s"$src docs_removed not monotone")
        assert(a._5 >= c._5, s"$src tokens_removed not monotone")
      }
    }
    val floor1 = rows.filter(_._2 == 1L).map(_._4).sum
    val q63 = run("q63_decontamination").collect()
      .map(_.getInt(2).toLong).sum
    assert(floor1 == q63,
      "floor 1 must reproduce q63's binary contamination count")
  }
}
