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
}
