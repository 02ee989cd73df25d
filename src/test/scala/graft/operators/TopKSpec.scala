package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The two-stage top-k must equal the single-window form — including
  * ranks — for every physical layout of the input.
  */
class TopKSpec extends SparkSpec {

  private def fixture = {
    import spark.implicits._
    // few groups, many rows per group, heavy value ties broken by id —
    // exactly the shape the operator exists for
    (1 to 5000).map { i =>
      (i.toLong, s"q${i % 5}", (i % 97).toLong)
    }.toDF("id", "g", "v")
  }

  test("perGroup equals the single-window top-k under different " +
    "physical layouts") {
    val df = fixture
    val order = Seq(col("v").asc, col("id").asc)
    val w = Window.partitionBy(col("g")).orderBy(order: _*)
    val exact = df.withColumn("rank", row_number().over(w).cast("int"))
      .filter(col("rank") <= 7)
      .select("g", "rank", "id").collect()
      .map(r => (r.getString(0), r.getInt(1)) -> r.getLong(2)).toMap
    for (layout <- Seq(df, df.repartition(3), df.repartition(32, col("v")),
        df.coalesce(1), df.orderBy(col("id").desc))) {
      val got = TopK.perGroup(layout, Seq("g"), order, 7, "rank")
        .select("g", "rank", "id").collect()
        .map(r => (r.getString(0), r.getInt(1)) -> r.getLong(2)).toMap
      assert(got == exact)
    }
  }

  test("perGroup with k larger than any group returns everything ranked") {
    import spark.implicits._
    val df = Seq((1L, "a", 3L), (2L, "a", 1L), (3L, "b", 2L))
      .toDF("id", "g", "v")
    val got = TopK.perGroup(df.repartition(4), Seq("g"),
      Seq(col("v").asc, col("id").asc), 10, "rank")
      .select("g", "rank", "id").collect()
      .map(r => (r.getString(0), r.getInt(1)) -> r.getLong(2)).toMap
    assert(got == Map(("a", 1) -> 2L, ("a", 2) -> 1L, ("b", 1) -> 3L))
  }
}
