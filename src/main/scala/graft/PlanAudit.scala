package graft

import org.apache.spark.sql.SparkSession

/** Prints formatted physical plans for representative queries and greps them
  * for the scale-critical properties: parquet filter pushdown + column
  * pruning, broadcast joins on dim sides, and whole-stage codegen coverage.
  * Usage: runMain graft.PlanAudit [sfDir] [queryName...]
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val names = if (args.length > 1 && args(1) == "all") Registry.all.map(_.name)
      else if (args.length > 1) args.drop(1).toSeq
      else Seq("q01_pricing_summary", "q04_fact_join_agg", "q05_snowflake_enrich",
        "q25_cart_add_delta", "q35_ngram_jaccard", "q38_knn_bruteforce")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    for (q <- Registry.all if names.contains(q.name)) {
      println(s"\n========== ${q.name} ==========")
      val df = q.run(spark, sfDir)
      // execute THIS QueryExecution (not a write-wrapped copy) so AQE
      // finalizes and codegen ids appear in the formatted plan
      df.queryExecution.toRdd.foreach(_ => ())
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      println(plan)
      val checks = Seq(
        "PushedFilters pushed" ->
          (!plan.contains("PushedFilters: []") || !plan.contains("Filter")),
        "has WholeStageCodegen" -> plan.contains("codegen id"),
        "broadcast used" -> (plan.contains("BroadcastHashJoin") ||
          plan.contains("BroadcastNestedLoopJoin")))
      println(s"AUDIT ${q.name}: " + checks.map { case (k, v) => s"$k=$v" }.mkString(" "))
    }
    spark.stop()
  }
}
