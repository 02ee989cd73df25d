package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The brief's bucketing technique made concrete: facts written bucketed on
  * the join key join WITHOUT any shuffle exchange — the plan co-locates
  * matching buckets. At 100 TB this turns the nightly fact-fact join's
  * dominant cost (two full shuffles) into a map-side merge.
  */
class BucketingSpec extends SparkSpec {

  test("bucketed-by-key tables join with no shuffle exchange") {
    val sfDir = "/root/testdata/sf0.001"
    spark.sql("DROP TABLE IF EXISTS orders_b")
    spark.sql("DROP TABLE IF EXISTS lineitem_b")
    graft.Tables(spark, sfDir, "orders")
      .write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .mode("overwrite").saveAsTable("orders_b")
    graft.Tables(spark, sfDir, "lineitem")
      .write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .mode("overwrite").saveAsTable("lineitem_b")

    // force the shuffle-sensitive path (no broadcast shortcut); conf
    // window via SparkSpec.withConfs (see its SEQUENTIAL-EXECUTION
    // ASSUMPTION note)
    try withConfs("spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      val joined = spark.table("orders_b")
        .join(spark.table("lineitem_b"), col("o_orderkey") === col("l_orderkey"))
        .groupBy("o_orderpriority").count()
      val plan = joined.queryExecution.executedPlan.toString
      // the join itself must not shuffle either side: matching bucket
      // layouts satisfy the distribution requirement
      val exchangesBeforeAgg = plan.linesIterator
        .takeWhile(l => !l.contains("HashAggregate")).count(_.contains("Exchange"))
      assert(plan.contains("SortMergeJoin"), s"expected SMJ:\n$plan")
      val joinSection = plan.substring(plan.indexOf("SortMergeJoin"))
      assert(!joinSection.contains("Exchange"),
        s"bucketed join still shuffles:\n$plan")
      // and it computes the right thing
      val viaBuckets = joined.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val direct = graft.Tables(spark, sfDir, "orders")
        .join(graft.Tables(spark, sfDir, "lineitem"),
          col("o_orderkey") === col("l_orderkey"))
        .groupBy("o_orderpriority").count()
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(viaBuckets == direct)
    } finally {
      spark.sql("DROP TABLE IF EXISTS orders_b")
      spark.sql("DROP TABLE IF EXISTS lineitem_b")
    }
  }
}
