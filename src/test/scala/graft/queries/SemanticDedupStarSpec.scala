package graft.queries

import graft.SparkSpec

/** q133 (star-shaped SemDeDup) against q131 (all-pairs over the same
  * two-level assignment): identical clustering, and the star drop set is
  * a per-cluster SUBSET of the all-pairs drop set — the documented trade
  * (star only drops members ε-close to the representative; it can never
  * drop more than the pair pass).
  */
class SemanticDedupStarSpec extends SparkSpec {

  test("star clustering matches q131 and star drops are bounded by pair drops") {
    val sfDir = "/root/testdata/sf0.001"
    def byCid(name: String): Map[Long, (Long, Long)] =
      graft.SparkEntry.queries(name)(spark, sfDir).collect()
        .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val pairs = byCid("q131_semantic_dedup_scaledk")
    val star = byCid("q133_semantic_dedup_star")
    // same assignment → same clusters with the same member counts
    assert(star.keySet == pairs.keySet)
    assert(star.view.mapValues(_._1).toMap == pairs.view.mapValues(_._1).toMap)
    // star can only drop a subset of what all-pairs drops
    star.foreach { case (cid, (_, dStar)) =>
      assert(dStar <= pairs(cid)._2, s"cid $cid: star $dStar > pairs ${pairs(cid)._2}")
    }
    // the corpus has planted near-dups: the star pass must drop SOMETHING
    assert(star.values.map(_._2).sum > 0L)
  }
}
