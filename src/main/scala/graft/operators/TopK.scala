package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Scale-safe per-group top-k: the `row_number() OVER (PARTITION BY g
  * ORDER BY ...) <= k` shape with FEW groups funnels each group's entire
  * candidate set through one task's sort (the ANN top-k over 5 queries ×
  * a corpus-sized candidate list). This operator runs it in two stages:
  *
  *   1. partial top-k per (group, physical input partition) — each task
  *      sorts only its local slice;
  *   2. exact top-k over the union of partials (≤ k × nPartitions rows
  *      per group — tiny).
  *
  * The result is EXACTLY the global top-k: any row outside its
  * partition's top-k is beaten by k rows in that partition alone, so it
  * cannot be in the global top-k. `spark_partition_id()` makes stage 1's
  * grouping physical-layout-dependent, but the FINAL rows — and their
  * ranks — are layout-invariant (TopKSpec asserts parity with the
  * single-window form under repartitioning). Ties must be broken by the
  * order columns (pass a unique tiebreak column last).
  */
object TopK {

  /** df + `rankCol` (1-based int) keeping only rank <= k per group. */
  def perGroup(df: DataFrame, groupCols: Seq[String], order: Seq[Column],
      k: Int, rankCol: String): DataFrame = {
    val g = groupCols.map(col)
    val wPart = Window.partitionBy(g :+ col("__tkp"): _*).orderBy(order: _*)
    val partial = df
      .withColumn("__tkp", spark_partition_id())
      .withColumn("__tkr", row_number().over(wPart))
      .filter(col("__tkr") <= k)
      .drop("__tkp", "__tkr")
    val wFinal = Window.partitionBy(g: _*).orderBy(order: _*)
    partial
      .withColumn(rankCol, row_number().over(wFinal).cast("int"))
      .filter(col(rankCol) <= k)
  }
}
