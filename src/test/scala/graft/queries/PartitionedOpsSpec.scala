package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** q144's whole point is the PLAN: the day-partitioned fact scan must
  * carry a runtime `dynamicpruning` subquery from the filtered dim, so
  * only matching day directories are read. Content equality with the
  * unpartitioned join guards the layout change.
  */
class PartitionedOpsSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  test("fact scan is dynamically pruned; content matches the plain join") {
    val joined = PartitionedOps.campaignJoin(spark, sfDir)
    joined.collect() // finalize AQE before reading the executed plan
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("dynamicpruning"),
      s"no DPP subquery in the fact scan:\n$plan")

    val viaPartitions = joined
      .groupBy(col("event_day")).agg(count(lit(1)).as("n"))
      .collect()
      .map(r => r.getDate(0).toString -> r.getLong(1)).toMap
    // independent expectation: per-day counts over the ORIGINAL parquet,
    // restricted to the campaign set — a wrongly-pruned day with data
    // would be missing from viaPartitions and fail the equality
    val plain = graft.Tables(spark, sfDir, "events")
      .select(to_date(col("ts")).as("d"))
      .groupBy(col("d")).agg(count(lit(1)).as("n"))
      .collect()
      .map(r => r.getDate(0).toString -> r.getLong(1)).toMap
      .filter { case (d, _) => PartitionedOps.CampaignDays.contains(d) }
    assert(viaPartitions == plain && viaPartitions.nonEmpty,
      s"partitioned $viaPartitions vs plain $plain")
  }

  test("DPP still fires inside a FINALIZED adaptive plan at sf0.1 " +
    "(default confs, no pinning)") {
    // round-10 directive: assert the pruning subquery survives AQE
    // re-planning — on the finalized plan (isFinalPlan=true), not the
    // initial one, and at the bench scale factor
    assert(spark.conf.get("spark.sql.adaptive.enabled") == "true",
      "leg presumes default AQE")
    val joined = PartitionedOps.campaignJoin(spark, "/root/testdata/sf0.1")
    joined.collect()
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("AdaptiveSparkPlan"), plan)
    assert(plan.contains("isFinalPlan=true"), plan)
    assert(plan.contains("dynamicpruning"),
      s"no DPP subquery in the finalized adaptive plan:\n$plan")
  }
}
