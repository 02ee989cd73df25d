package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Column pruning pinned explicitly: a narrow projection must reach the
  * parquet scan's ReadSchema (the brief's rule — a scan that reads all
  * columns for a 2-column projection is wrong at 100 TB, where the
  * un-pruned columns are most of the bytes). PLAN_AUDIT greps pushdown/
  * codegen/broadcast; this is the missing fourth property, asserted on
  * both a bare projection and a registered query's full plan.
  */
class ColumnPruningSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  private def readSchemaLines(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      .linesIterator.filter(_.contains("ReadSchema:")).mkString("\n")

  test("a two-column projection prunes the lineitem scan to those columns") {
    val rs = readSchemaLines(
      graft.Tables(spark, sfDir, "lineitem")
        .select(col("l_orderkey"), col("l_quantity")))
    assert(rs.contains("l_orderkey") && rs.contains("l_quantity"), rs)
    // the widest money/date columns must NOT be read
    for (dropped <- Seq("l_extendedprice", "l_shipdate", "l_partkey"))
      assert(!rs.contains(dropped), s"unpruned column $dropped in: $rs")
  }

  test("q01's scan reads only the five columns the query touches") {
    val rs = readSchemaLines(
      graft.SparkEntry.queries("q01_pricing_summary")(spark, sfDir))
    for (kept <- Seq("l_returnflag", "l_linestatus", "l_quantity",
      "l_extendedprice", "l_discount", "l_shipdate"))
      assert(rs.contains(kept), s"missing $kept in: $rs")
    for (dropped <- Seq("l_orderkey", "l_partkey", "l_suppkey", "l_tax"))
      assert(!rs.contains(dropped), s"unpruned column $dropped in: $rs")
  }
}
