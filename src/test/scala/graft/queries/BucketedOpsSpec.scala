package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** q143's whole point is the PLAN: a big⋈big sort-merge join over
  * matching bucketed tables must run with zero shuffle exchanges on the
  * join input. Content equality with the plain-parquet join guards
  * against the layout change ever touching semantics.
  */
class BucketedOpsSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  test("bucketed SMJ plans with zero exchanges; content matches plain join") {
    // disable broadcast so the tiny local fixture exercises the same SMJ
    // path a 100 TB fact⋈fact join takes; conf window via
    // SparkSpec.withConfs (see its SEQUENTIAL-EXECUTION ASSUMPTION note)
    withConfs(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1") {
      val joined = BucketedOps.colocatedJoin(spark, sfDir)
      joined.collect() // finalize AQE before reading the executed plan
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), plan)
      assert(!plan.contains("Exchange"),
        s"bucketed join still shuffles:\n$plan")

      val viaBuckets = joined
        .groupBy(col("o_orderpriority")).agg(count(lit(1)).as("n"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val plain = graft.Tables(spark, sfDir, "lineitem")
        .join(graft.Tables(spark, sfDir, "orders"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderpriority")).agg(count(lit(1)).as("n"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(viaBuckets == plain)
    }
  }

  test("default configs at sf0.1: zero-exchange SMJ survives AQE and a " +
    "broadcast-eligible small side (no config pinning)") {
    // the round-10 directive's honest worry: the first leg pins confs to
    // force the SMJ path, so it can't see an AQE interaction that only
    // appears at defaults — coalescing, or AQE swapping a hinted SMJ for
    // a broadcast join and silently reintroducing runtime exchanges on a
    // path sold as exchange-free. This leg runs the PRODUCTION
    // colocatedJoin (merge hint and all) at stock confs on sf0.1, where
    // the orders side is comfortably broadcast-eligible.
    assert(spark.conf.get("spark.sql.adaptive.enabled") == "true",
      "leg presumes default AQE")
    val joined = BucketedOps.colocatedJoin(spark, "/root/testdata/sf0.1")
    joined.collect() // finalize THIS QueryExecution's adaptive plan
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("AdaptiveSparkPlan"), plan)
    assert(plan.contains("SortMergeJoin"),
      s"AQE replaced the hinted bucket SMJ:\n$plan")
    assert(!plan.contains("Exchange"),
      s"bucketed join shuffles (or broadcasts) under AQE defaults:\n$plan")
  }
}
