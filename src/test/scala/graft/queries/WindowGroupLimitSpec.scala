package graft.queries

import graft.SparkSpec

/** Pins WHY the ANN family's per-query `row_number() <= k` windows are
  * scale-safe despite having only 5 query groups: Spark's
  * InferWindowGroupLimit inserts a PARTIAL WindowGroupLimit below the
  * exchange, so every map partition forwards at most k rows per group and
  * the post-shuffle sort sees ≤ k × nPartitions rows — never a
  * corpus-sized single-task sort. (The q83/q116 rank-EQUALITY shapes —
  * `rank = ceil(n*p)` — get no such rewrite, which is why those needed
  * RangeOps.) A manual two-stage top-k was measured and REVERTED this
  * round: it duplicates this rewrite while adding one extra exchange.
  *
  * If a Spark upgrade ever drops the rewrite, this spec fails and the
  * manual form (partial top-k per spark_partition_id, then global) goes
  * back in.
  */
class WindowGroupLimitSpec extends SparkSpec {

  // + q135: priority sampling's rn <= k+1 stratum top-k rides the same
  // rewrite (the filter sits directly on the row_number window)
  private val annQueries = Seq(
    "q38_knn_bruteforce", "q39_ann_lsh", "q46_ann_ivf",
    "q72_ann_multiprobe", "q128_ivfpq_ann", "q108_bottomk_sketch",
    "q135_priority_sample")

  test("every ANN top-k plan carries a Partial WindowGroupLimit below " +
    "the exchange") {
    for (name <- annQueries) {
      val plan = graft.SparkEntry.queries(name)(spark, "/root/testdata/sf0.001")
        .queryExecution.executedPlan.toString
      // the two substrings must be on ONE plan line (the node's own
      // rendering) — a Final-only WindowGroupLimit plus an unrelated
      // "Partial" elsewhere (e.g. AQE partition specs) must not pass
      assert(plan.linesIterator.exists(l =>
          l.contains("WindowGroupLimit") && l.contains("Partial")),
        s"$name lost the partial window-group-limit rewrite:\n" +
          plan.linesIterator.take(30).mkString("\n"))
    }
  }
}
