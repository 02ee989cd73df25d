package graft.queries

import graft.SparkSpec

/** Round-11 additions: q146 epoch-shuffled sequence packing and q147
  * post-dedup mixture accounting — the shuffle-then-pack manifest and the
  * mixture re-measurement step of a pretraining data pipeline.
  */
class Round11OpsSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  test("q146: each epoch packs the whole corpus; epochs are distinct " +
    "permutations; manifest is deterministic") {
    val rows = graft.SparkEntry.queries("q146_epoch_shuffle_pack")(spark, sfDir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    val corpus = spark.read.parquet(s"$sfDir/documents.parquet").count()
    val byEpoch = rows.groupBy(_._1)
    assert(byEpoch.keySet == Set(1L, 2L))
    byEpoch.foreach { case (ep, bins) =>
      // every doc starts in exactly one window; token mass is invariant
      assert(bins.map(_._3).sum == corpus, s"epoch $ep lost docs")
      // positions form a permutation: the per-bin [first_pos, last_pos]
      // ranges are disjoint and ordered when bins are sorted (the pack
      // order IS the position order), covering 1..corpus at the ends
      val sorted = bins.sortBy(_._2)
      sorted.sliding(2).foreach {
        case Array(a, b) => assert(a._6 < b._5,
          s"epoch $ep: bin ${a._2} last_pos ${a._6} overlaps bin ${b._2}")
        case _ =>
      }
      assert(sorted.head._5 == 1L && sorted.last._6 == corpus)
      // bins never exceed the total-token ceiling
      val totalTok = bins.map(_._4).sum
      assert(sorted.last._2 <= (totalTok - 1) / 512,
        s"epoch $ep: bin past the token ceiling")
    }
    // token mass identical across epochs (same docs, different order)...
    assert(byEpoch(1L).map(_._4).sum == byEpoch(2L).map(_._4).sum)
    // ...but the shuffle bites: the binned manifests differ
    assert(byEpoch(1L).map(t => (t._2, t._3, t._4)).toSet !=
      byEpoch(2L).map(t => (t._2, t._3, t._4)).toSet,
      "two epochs produced identical packing — the shuffle is not seeded")
    // replayable: a second run is bit-identical
    val again = graft.SparkEntry.queries("q146_epoch_shuffle_pack")(spark, sfDir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(rows.sorted.toSeq == again.sorted.toSeq)
  }

  test("q147: mixture conserves docs/tokens, survivor count matches the " +
    "q57 keep rule, ppm weights renormalize") {
    val rows = graft.SparkEntry.queries("q147_post_dedup_mixture")(spark, sfDir)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    val corpus = spark.read.parquet(s"$sfDir/documents.parquet").count()
    assert(rows.map(_._2).sum == corpus)
    rows.foreach { case (src, n, surv, tok, tokS, _) =>
      assert(surv >= 0 && surv <= n, s"$src survivors out of range")
      assert(tokS >= 0 && tokS <= tok, s"$src surviving tokens out of range")
    }
    // independent survivor count: corpus minus q57's dropped members
    // (docs outside the candidate graph survive by definition)
    val dropped = graft.SparkEntry.queries("q57_neardup_cluster")(spark, sfDir)
      .filter("keep = 0").count()
    assert(rows.map(_._3).sum == corpus - dropped,
      s"survivors ${rows.map(_._3).sum} != corpus $corpus - dropped $dropped")
    assert(dropped > 0, "fixture lost its bite: no near-dups dropped")
    // integer-floor ppm weights sum to 1e6 minus at most |sources|
    val ppm = rows.map(_._6).sum
    assert(ppm <= 1000000L && ppm > 1000000L - rows.length,
      s"ppm sum $ppm")
  }
}
