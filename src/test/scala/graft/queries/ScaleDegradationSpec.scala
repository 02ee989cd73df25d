package graft.queries

import graft.SparkSpec

/** Backs PERF.md's scale claim directly: the dim-join queries must produce
  * IDENTICAL results when size-based broadcast planning is disabled — the
  * situation at 100 TB where a "small" side (customer) outgrows the
  * broadcast threshold and Catalyst falls back to a shuffled join. Only
  * genuinely bounded dims are broadcast by explicit hint; everything else
  * must survive the fallback unchanged.
  */
class ScaleDegradationSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  private def run(name: String) =
    graft.Registry.all.find(_.name == name).get.run(spark, sfDir)

  private def rows(name: String): Set[String] =
    run(name).collect().map(_.toString).toSet

  test("dim-join queries survive broadcast-threshold exhaustion unchanged") {
    // queries relying on size-based broadcast planning (no explicit hint on
    // the large side): snowflake enrich, province rollup, fact-fact join
    val names = Seq("q05_snowflake_enrich", "q12_amount_by_province",
      "q04_fact_join_agg", "q29_composite_key_join")
    val before = names.map(n => n -> rows(n)).toMap
    // conf window via SparkSpec.withConfs (see its SEQUENTIAL-EXECUTION
    // ASSUMPTION note)
    withConfs("spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      for (n <- names) {
        val after = rows(n)
        assert(after == before(n), s"$n changed results under shuffled joins")
      }
      // and the plan really did degrade to a non-broadcast join somewhere
      val plan = run("q04_fact_join_agg").queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"),
        s"expected a shuffled join with broadcast disabled:\n$plan")
    }
  }
}
