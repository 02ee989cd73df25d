package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SkewOpsSpec extends SparkSpec {

  test("saltedSum equals plain aggregation on a skewed key distribution") {
    import spark.implicits._
    // 90% of rows share one hot key
    val rows = (1 to 2000).map(i =>
      (if (i % 10 == 0) s"k${i % 7}" else "hot", i.toLong))
    val df = rows.toDF("k", "v")
    val plain = df.groupBy("k").agg(sum("v").as("total"), count(lit(1)).as("cnt"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val salted = SkewOps.saltedSum(df, col("k"), col("v"), saltBuckets = 16)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(salted == plain)
  }

  test("saltedJoin equals plain join on skewed fact against replicable dim") {
    import spark.implicits._
    val fact = (1 to 1000).map(i => (if (i % 5 == 0) i % 3 else 0, i))
      .toDF("dim_id", "m")
    val dim = (0 to 2).map(i => (i, s"name$i")).toDF("id", "name")
    val plain = fact.join(dim, col("dim_id") === col("id"))
      .select("dim_id", "m", "name")
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getString(2))).toSet
    val salted = SkewOps.saltedJoin(fact, dim, col("dim_id"), col("id"))
      .select("dim_id", "m", "name")
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getString(2))).toSet
    assert(salted == plain)
  }

  test("AQE skew join splits the hot partition at runtime (skew=true)") {
    // the runtime complement of manual salting (the brief's "salting for
    // skew, AQE for runtime re-plan"): a sort-merge join whose hot key
    // dwarfs the median partition is split by OptimizeSkewedJoin —
    // visible as skew=true on the join node — with NO query rewrite.
    // Thresholds are tuned down so the 0.5 MB fixture trips the same
    // logic a 100 TB hot key would.
    // global-conf window via SparkSpec.withConfs — see its
    // SEQUENTIAL-EXECUTION ASSUMPTION note (round-10 ADVICE #4)
    import spark.implicits._
    withConfs(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2.0",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "32KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "16KB",
      "spark.sql.adaptive.coalescePartitions.minPartitionSize" -> "1KB") {
      val pad = "x" * 64
      val fact = (1L to 20000L)
        .map(i => (if (i % 20 == 0) i % 7 else 0L, i, pad))
        .toDF("k", "m", "pad")
      val dim = (0L to 6L).map(i => (i, s"name$i" + pad)).toDF("id", "name")
      val joined = fact.join(dim, col("k") === col("id"))
      // collect THIS QueryExecution (count() would build its own) so the
      // adaptive plan finalizes before the skew assertion reads it
      val n = joined.collect().length
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"),
        s"hot partition not split by AQE:\n$plan")
      assert(n == 20000)
    }
  }
}
