package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation operators for the 100 TB path. AQE's skew-join handling
  * covers sort-merge joins automatically; these cover the two places it
  * does not: hot-key aggregations and broadcast-ineligible joins against a
  * replicable right side.
  */
object SkewOps {

  /** Two-phase salted aggregation: groupBy(key, salt) partial → groupBy(key)
    * final. Turns one reducer per hot key into `saltBuckets` parallel
    * partials. `aggs` must be re-aggregable (sum/count/min/max); the final
    * pass re-applies them over the partial columns.
    */
  def saltedSum(df: DataFrame, key: Column, valueCol: Column,
      saltBuckets: Int = 16): DataFrame = {
    val salted = df.withColumn("__salt",
      pmod(spark_partition_id() + monotonically_increasing_id(), lit(saltBuckets)))
    salted
      .groupBy(key.as("k"), col("__salt"))
      .agg(sum(valueCol).as("partial_sum"), count(lit(1)).as("partial_cnt"))
      .groupBy(col("k"))
      .agg(sum(col("partial_sum")).as("total"), sum(col("partial_cnt")).as("cnt"))
  }

  /** Salted join for a skewed left side: replicate each right-side row
    * `saltBuckets` times with an explicit salt column, salt the left side
    * randomly-but-deterministically, join on (key, salt). Right side grows
    * by the salt factor — use only when right is small enough to replicate
    * but too large (or ineligible) to broadcast.
    */
  def saltedJoin(left: DataFrame, right: DataFrame, leftKey: Column,
      rightKey: Column, saltBuckets: Int = 8): DataFrame = {
    val saltedLeft = left.withColumn("__salt",
      pmod(xxhash64(leftKey, spark_partition_id(), monotonically_increasing_id()),
        lit(saltBuckets)))
    val saltedRight = right.withColumn("__salt",
      explode(sequence(lit(0L), lit(saltBuckets - 1L))))
    saltedLeft.join(saltedRight,
      leftKey === rightKey && saltedLeft("__salt") === saltedRight("__salt"))
      .drop("__salt")
  }
}
