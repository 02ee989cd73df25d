package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Round-14 additions: q149 maximal duplicated-span merge, q150
  * token-budget quality selection, q151 curriculum mixture schedule, and
  * q152 WAV header decode. Planted-fixture geometry plus the invariants
  * the hash oracle can't state (disjointness bounds, prefix optimality,
  * endpoint exactness, parser fallback).
  */
class Round14OpsSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  private def run(name: String, dir: String = sfDir) =
    graft.Registry.all.find(_.name == name).get.run(spark, dir)

  // ------------------------------------------------------------- q149

  test("q149 planted fixture: exact span geometry — cross-doc prefix " +
    "span, far self-repetition splits, near-overlap merges, clean doc") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_q149_").toString
    val a = (1 to 12).map(i => s"a$i")
    val x = (1 to 10).map(i => s"x$i")
    val t = (1 to 12).map(i => s"t$i")
    Seq(
      // 1↔2 share the 10-grams starting at pos 0 and 1 (adjacent → one
      // span covering tokens 0..10 = 11 of 12)
      (1L, a.mkString(" ")),
      (2L, (a.take(11) :+ "zz").mkString(" ")),
      // self-repetition 11 apart (> n=10) → TWO disjoint 10-token spans
      (3L, (x ++ Seq("mid") ++ x).mkString(" ")),
      // no duplicated grams anywhere
      (4L, (1 to 15).map(i => s"c$i").mkString(" ")),
      // 5's duplicated starts are pos 0 and 2 (gap 2 ≤ n) → ONE merged
      // span covering the whole 12 tokens; 6 carries the two copies 11
      // apart → two spans
      (5L, t.mkString(" ")),
      (6L, (t.take(10) ++ Seq("qq") ++ t.drop(2)).mkString(" ")))
      .toDF("doc_id", "text")
      .coalesce(1).write.parquet(s"$dir/documents.parquet")
    val out = run("q149_dup_span_merge", dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))).toMap
    // (n_tokens, n_spans, dup_tokens, max_span_tokens, dup_ppm)
    assert(out(1L) == ((12L, 1L, 11L, 11L, 11000000L / 12)))
    assert(out(2L) == ((12L, 1L, 11L, 11L, 11000000L / 12)))
    assert(out(3L) == ((21L, 2L, 20L, 10L, 20000000L / 21)))
    assert(out(4L) == ((15L, 0L, 0L, 0L, 0L)))
    assert(out(5L) == ((12L, 1L, 12L, 12L, 1000000L)))
    assert(out(6L) == ((21L, 2L, 20L, 10L, 20000000L / 21)))
  }

  test("q149 invariants on the driver corpus: spans are disjoint " +
    "(dup_tokens ≤ n_tokens), bounds hold, and every q96 cross-doc " +
    "duplicate holder has at least one span") {
    val rows = run("q149_dup_span_merge").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))).toMap
    assert(rows.nonEmpty)
    for ((id, (nTok, nSpans, dupTok, maxSpan)) <- rows) {
      assert(dupTok <= nTok, s"doc $id: dup_tokens $dupTok > n_tokens $nTok")
      assert(maxSpan <= dupTok, s"doc $id: max span exceeds total")
      assert((nSpans == 0) == (dupTok == 0), s"doc $id: span/token mismatch")
      // a span is at least one gram long and spans don't touch (gap > n
      // would have merged) — so k spans cover at least 10k + (k-1) ... no:
      // disjoint spans each cover ≥ n tokens
      assert(dupTok >= 10 * nSpans, s"doc $id: span shorter than a gram")
    }
    val q96 = run("q96_repeated_ngram_dedup").collect()
      .map(r => r.getLong(0) -> r.getInt(3)).toMap
    for ((id, shared) <- q96 if shared == 1)
      assert(rows(id)._2 > 0, s"doc $id: q96 found a cross-doc duplicate " +
        "but q149 has no span")
  }

  test("DupSpans.perDocStats: the island window and BOTH rollups ride " +
    "ONE doc_id exchange (the scaladoc's one-shuffle claim, plan-pinned)") {
    import spark.implicits._
    val pos = Seq((1L, 0), (1L, 1), (1L, 15), (2L, 3), (2L, 20), (3L, 7))
      .toDF("doc_id", "pos")
    val stats = graft.operators.DupSpans.perDocStats(pos)
    stats.collect() // finalize AQE before reading the executed plan
    // AdaptiveSparkPlan's toString prints the same tree under both
    // "== Final Plan ==" and "== Initial Plan ==" — count in the final
    // section only
    val plan = stats.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    val docExchanges =
      "Exchange hashpartitioning\\(doc_id".r.findAllIn(plan).size
    assert(docExchanges == 1,
      s"expected exactly one doc_id exchange (window + groupBy(doc_id," +
        s" island) + groupBy(doc_id) must share it):\n$plan")
    // and nothing else shuffles — no range partitioning, no second hash
    assert("Exchange".r.findAllIn(plan).size == 1,
      s"an extra exchange crept into the island core:\n$plan")
  }

  // ------------------------------------------------------------- q150

  test("q150 planted fixture: budget fills in quality order, cut is " +
    "exact, ties break by doc_id") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_q150_").toString
    Seq(
      (1L, "s", (1 to 10).map(i => s"u$i").mkString(" ")), // TTR 1000
      (2L, "s", "p1 p1 p2 p2 p3 p3 p4 p4 p5 p5"),          // TTR 500
      (3L, "s", "r1 r2 r1 r2 r1 r2 r1 r2 r1 r2"))          // TTR 200
      .toDF("doc_id", "source", "text")
      .coalesce(1).write.parquet(s"$dir/documents.parquet")
    val out = run("q150_token_budget_select", dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(2), r.getLong(3), r.getLong(4),
        r.getInt(5)))).toMap
    // budget = 30 div 2 = 15: doc1 (cum 10) fits, doc2 (cum 20) crosses
    assert(out(1L) == ((10L, 1000L, 10L, 1)))
    assert(out(2L) == ((10L, 500L, 20L, 0)))
    assert(out(3L) == ((10L, 200L, 30L, 0)))
  }

  test("q150 on the driver corpus: per source, the selected set is " +
    "exactly the maximal quality-ordered prefix within budget") {
    val rows = run("q150_token_budget_select").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getInt(5)))
    assert(rows.nonEmpty)
    for ((source, docs) <- rows.groupBy(_._2)) {
      val budget = docs.map(_._3).sum / 2
      val ordered = docs.sortBy(d => (-d._4, d._1)) // quality desc, id asc
      // cum_tokens replays the ordered running sum
      var cum = 0L
      for (d <- ordered) {
        cum += d._3
        assert(d._5 == cum, s"$source/${d._1}: cum_tokens ${d._5} != $cum")
        assert(d._6 == (if (cum <= budget) 1 else 0),
          s"$source/${d._1}: selected flag disagrees with the budget cut")
      }
      // the flag is a PREFIX property: once over budget, never selected
      assert(!ordered.map(_._6).sliding(2).exists(w =>
        w.length == 2 && w(0) == 0 && w(1) == 1),
        s"$source: selection is not a prefix of the quality order")
    }
  }

  // ------------------------------------------------------------- q151

  test("q151: epoch 0 is exactly the natural distribution, epoch 4 " +
    "exactly uniform, and the anneal is monotone per source") {
    val rows = run("q151_curriculum_schedule").collect()
      .map(r => ((r.getLong(0), r.getString(1)),
        (r.getLong(3), r.getLong(4), r.getLong(5))))
    val sources = rows.map(_._1._2).distinct
    assert(rows.length == 5 * sources.length)
    for (((epoch, source), (nat, uni, mix)) <- rows) {
      if (epoch == 0L) assert(mix == nat, s"$source epoch 0: $mix != $nat")
      if (epoch == 4L) assert(mix == uni, s"$source epoch 4: $mix != $uni")
      assert(mix >= math.min(nat, uni) && mix <= math.max(nat, uni))
    }
    for ((source, ss) <- rows.groupBy(_._1._2)) {
      val byEpoch = ss.sortBy(_._1._1).map(_._2._3)
      val dirs = byEpoch.sliding(2).map(w => (w(1) - w(0)).sign).toSeq
      assert(dirs.toSet.filter(_ != 0).size <= 1,
        s"$source: anneal is not monotone: $byEpoch")
    }
  }

  // ------------------------------------------------------------- q153

  test("q153 planted fixture: first-holder novelty is exact — full, " +
    "half, zero, and gram-less docs") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_q153_").toString
    val t = (1 to 11).map(i => s"t$i")
    Seq(
      (1L, t.mkString(" ")),                       // both grams first here
      (2L, (t.take(10) :+ "zz").mkString(" ")),    // one shared, one own
      (3L, t.mkString(" ")),                       // exact copy of 1
      (4L, "a b c d e"))                           // below gram size
      .toDF("doc_id", "text")
      .coalesce(1).write.parquet(s"$dir/documents.parquet")
    val out = run("q153_gram_novelty", dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3)))).toMap
    assert(out(1L) == ((2L, 2L, 1000000L)))
    assert(out(2L) == ((2L, 1L, 500000L)))
    assert(out(3L) == ((2L, 0L, 0L)))
    assert(out(4L) == ((0L, 0L, 0L)))
  }

  test("q153 invariants on the driver corpus: n_first ≤ n_grams, the " +
    "lowest gram-holding doc is fully novel, and first-holder counts " +
    "conserve the distinct-gram total") {
    val rows = run("q153_gram_novelty").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    assert(rows.nonEmpty)
    rows.foreach { case (id, g, f) =>
      assert(f <= g, s"doc $id: n_first $f > n_grams $g")
    }
    val lowest = rows.find(_._2 > 0).get
    assert(lowest._3 == lowest._2,
      s"the lowest doc with grams must be fully novel: $lowest")
    // every distinct gram has exactly one first holder
    val distinctGrams = graft.Tables(spark, sfDir, "documents")
      .select(col("doc_id"),
        explode(array_distinct(graft.functions.TextFns.wordNgrams(
          graft.functions.TextFns.tokens(col("text")), 10))).as("gram"))
      .select(xxhash64(col("gram"))).distinct().count()
    assert(rows.map(_._3).sum == distinctGrams,
      "sum of first-holder counts must equal the distinct-gram total")
  }

  // ------------------------------------------------------------- q155

  test("q155 planted fixture: keep-first removal cuts exactly the later " +
    "occurrences — cross-doc, self-repetition, and first-holder docs") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_q155_").toString
    val a = (1 to 12).map(i => s"a$i")
    val x = (1 to 10).map(i => s"x$i")
    val t = (1 to 12).map(i => s"t$i")
    Seq(
      (1L, a.mkString(" ")),                        // first holder: keeps all
      (2L, (a.take(11) :+ "zz").mkString(" ")),     // loses the shared prefix
      (3L, (x ++ Seq("mid") ++ x).mkString(" ")),   // 2nd copy of itself cut
      (4L, (1 to 15).map(i => s"c$i").mkString(" ")), // clean: keeps all
      (5L, t.mkString(" ")),                        // first holder vs 6
      (6L, (t.take(10) ++ Seq("qq") ++ t.drop(2)).mkString(" ")))
      .toDF("doc_id", "text")
      .coalesce(1).write.parquet(s"$dir/documents.parquet")
    val out = run("q155_dedup_removal_plan", dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))).toMap
    // (n_tokens, n_removal_spans, tokens_removed, tokens_kept, kept_ppm)
    assert(out(1L) == ((12L, 0L, 0L, 12L, 1000000L)))
    assert(out(2L) == ((12L, 1L, 11L, 1L, 1000000L / 12)))
    assert(out(3L) == ((21L, 1L, 10L, 11L, 11000000L / 21)))
    assert(out(4L) == ((15L, 0L, 0L, 15L, 1000000L)))
    assert(out(5L) == ((12L, 0L, 0L, 12L, 1000000L)))
    assert(out(6L) == ((21L, 2L, 20L, 1L, 1000000L / 21)))
  }

  test("q155 invariants on the driver corpus: removal never exceeds " +
    "q149's duplicated coverage, and every gram survives somewhere") {
    val removal = run("q155_dedup_removal_plan").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(3)))).toMap
    val spans = run("q149_dup_span_merge").collect()
      .map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(removal.nonEmpty)
    for ((id, (nTok, removed)) <- removal) {
      assert(removed <= spans(id),
        s"doc $id: removed $removed > duplicated coverage ${spans(id)} — " +
          "the keep-first cut must be a subset of q149's spans")
      assert(removed <= nTok)
    }
    // conservation: at least one doc keeps everything (the corpus-order
    // first holder of its grams), and total removal is strictly less
    // than total duplicated coverage whenever any duplication exists
    assert(removal.values.exists { case (n, r) => r == 0L && n > 0L })
    val totalRemoved = removal.values.map(_._2).sum
    val totalDup = spans.values.sum
    if (totalDup > 0) assert(totalRemoved < totalDup,
      "keep-first must retain at least one occurrence per gram")
  }

  // ------------------------------------------------------------- q156

  test("q156 manifest equals an independent recomposition of its three " +
    "arms (q34 canonical ∘ q63 clean ∘ q155 kept tokens)") {
    val canonical = run("q34_exact_dedup").collect()
      .map(_.getLong(1)).toSet
    val contaminated = run("q63_decontamination").collect()
      .filter(_.getInt(2) == 1).map(_.getLong(0)).toSet
    val kept = run("q155_dedup_removal_plan").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(4)))).toMap
    val source = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("source")).collect()
      .map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    val exported = kept.keySet
      .filter(id => id >= 10 && canonical(id) && !contaminated(id))
    val expected = exported.groupBy(source).map { case (src, ids) =>
      (src, ids.size.toLong,
        ids.toSeq.map(kept(_)._1).sum, ids.toSeq.map(kept(_)._2).sum)
    }.toSet
    val got = run("q156_training_export_manifest").collect()
      .map(r => (Option(r.getString(0)), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSet
    assert(got == expected,
      s"manifest diverged from the arm recomposition:\n$got\nvs\n$expected")
    assert(got.nonEmpty && got.forall { case (_, n, raw, exp) =>
      n > 0 && exp <= raw
    })
  }

  // ------------------------------------------------------------- q154

  test("q154: audit shape — one row per dimension budget, hits bounded " +
    "by truth, ppm consistent, and a full-width budget is perfect recall") {
    val rows = run("q154_matryoshka_recall").collect()
      .map(r => r.getInt(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(rows.keySet == Set(8, 16, 32))
    for ((d, (nTruth, nHit, ppm)) <- rows) {
      assert(nTruth == 25L, s"dims $d: truth must be 5 queries x top-5")
      assert(nHit >= 0L && nHit <= nTruth, s"dims $d: hits out of range")
      assert(ppm == nHit * 1000000L / nTruth, s"dims $d: ppm inconsistent")
    }
    // the audit itself must be non-degenerate: a 32-of-64 budget on this
    // corpus retains most of the truth set (if this ever reads 0 the
    // slicing or scoring broke, not the corpus)
    assert(rows(32)._2 > 0L, "32-dim budget found no true neighbors")
  }

  // ------------------------------------------------------------- q152

  test("q152: parseWav walks chunks for real — garbage, truncation, and " +
    "non-WAVE RIFF fall back to None; the synthetic fixture round-trips") {
    import graft.queries.MultimodalOps._
    assert(parseWav("not a wav at all".getBytes("US-ASCII")).isEmpty)
    assert(parseWav(Array.emptyByteArray).isEmpty)
    assert(parseWav("RIFF1234AVI ".getBytes("US-ASCII")).isEmpty)
    // a RIFF/WAVE with a fmt chunk but NO data chunk must not parse
    val noData = {
      val b = new java.io.ByteArrayOutputStream()
      b.write("RIFFxxxxWAVE".getBytes("US-ASCII"))
      b.write("fmt ".getBytes("US-ASCII"))
      b.write(Array[Byte](16, 0, 0, 0, 1, 0, 1, 0))
      b.write(Array[Byte](0x40, 0x1f, 0, 0, 0x40, 0x1f, 0, 0, 1, 0, 8, 0))
      b.toByteArray
    }
    assert(parseWav(noData).isEmpty)
    // adversarial chunk length past Int range: the declared size would
    // wrap negative in the walk's advance — the parser must halt (not
    // loop) and report nothing
    val hugeChunk = {
      val b = new java.io.ByteArrayOutputStream()
      b.write("RIFFxxxxWAVE".getBytes("US-ASCII"))
      b.write("LIST".getBytes("US-ASCII"))
      b.write(Array[Byte](-1, -1, -1, -1)) // len = 0xFFFFFFFF
      b.write(new Array[Byte](32))
      b.toByteArray
    }
    assert(parseWav(hugeChunk).isEmpty)
    // the synthetic fixture (with its interposed odd-length LIST chunk)
    // parses back to the doc_id arithmetic for every row
    val metas = decodeAudioStub(syntheticWavs(spark, sfDir)).collect()
    assert(metas.nonEmpty)
    for (m <- metas) {
      val id = m.mediaId
      assert(m.channels == (1 + id % 2).toInt, s"doc $id channels")
      assert(m.sampleRate == (8000 + (id % 8) * 4800).toInt, s"doc $id rate")
      val bits = (id % 3) match { case 0 => 8; case 1 => 16; case _ => 32 }
      assert(m.bitsPerSample == bits, s"doc $id bits")
      assert(m.dataBytes == 1000 + id % 100000, s"doc $id data size")
    }
  }

  test("q152: unparseable payloads are dropped by the batched decoder " +
    "(the K6 dirty-side contract), parseable ones all survive") {
    import spark.implicits._
    import graft.queries.MultimodalOps._
    val mixed = mediaFromDocs(spark, sfDir) // text bytes — none parse
    assert(decodeAudioStub(mixed).isEmpty)
    val good = syntheticWavs(spark, sfDir)
    assert(decodeAudioStub(good).count() == good.count())
  }
}
