package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** VecDot (native codegen dot product) must be bit-identical to the HOF
  * fold it replaces — the fold order IS the oracle contract
  * (DuckDB list_dot_product). Also pins null/length-mismatch semantics and
  * the SQL registration.
  */
class VecDotSpec extends SparkSpec {

  import graft.functions.VectorFns.{dot, dotFold}

  test("native dot is bit-identical to the HOF fold on random vectors") {
    import spark.implicits._
    val rng = new scala.util.Random(17)
    val rows = (0 until 200).map { i =>
      (i.toLong,
        Seq.fill(64)(rng.nextGaussian() * math.pow(10, rng.nextInt(7) - 3)),
        Seq.fill(64)(rng.nextGaussian()))
    }
    val df = rows.toDF("id", "a", "b")
      .select(col("id"), dot(col("a"), col("b")).as("native"),
        dotFold(col("a"), col("b")).as("fold"))
    val bad = df.filter(col("native") =!= col("fold") ||
      col("native").isNull =!= col("fold").isNull)
    assert(bad.isEmpty, s"native/fold diverge: ${bad.collect().mkString(",")}")
    // bit-identical, not just ==-equal (rules out -0.0 vs 0.0 and ulp drift)
    df.collect().foreach { r =>
      assert(java.lang.Double.doubleToRawLongBits(r.getDouble(1)) ==
        java.lang.Double.doubleToRawLongBits(r.getDouble(2)), s"row ${r.getLong(0)}")
    }
  }

  test("null array, null element, and length mismatch all yield null") {
    import spark.implicits._
    val df = Seq(
      (1L, Some(Seq[java.lang.Double](1.0, 2.0)), Some(Seq[java.lang.Double](3.0, 4.0))),
      (2L, None, Some(Seq[java.lang.Double](3.0, 4.0))),
      (3L, Some(Seq[java.lang.Double](1.0, null)), Some(Seq[java.lang.Double](3.0, 4.0))),
      (4L, Some(Seq[java.lang.Double](1.0)), Some(Seq[java.lang.Double](3.0, 4.0))))
      .toDF("id", "a", "b")
      .select(col("id"), dot(col("a"), col("b")).as("d"))
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) null else r.getDouble(1))).toMap
    assert(df(1L) == 11.0)
    assert(df(2L) == null && df(3L) == null && df(4L) == null)
  }

  test("vec_dot is SQL-registered and plans inside WholeStageCodegen") {
    graft.GraftExtensions.install(spark)
    import spark.implicits._
    // literal inputs constant-fold to a LocalTableScan (which also proves
    // eval), so the codegen assertion runs over a real scan
    Seq((Seq(1.0, 2.0, 3.0), Seq(2.0, 4.0, 6.0))).toDF("a", "b")
      .createOrReplaceTempView("vecs")
    assert(spark.sql("SELECT vec_dot(a, b) AS d FROM vecs").head().getDouble(0) == 28.0)
    graft.Tables(spark, "/root/testdata/sf0.001", "embeddings")
      .createOrReplaceTempView("emb_vd")
    val res = spark.sql(
      """SELECT vec_dot(CAST(embedding AS ARRAY<DOUBLE>),
        |               CAST(embedding AS ARRAY<DOUBLE>)) AS d
        |FROM emb_vd""".stripMargin)
    assert(res.filter(col("d") >= 0).count() == res.count())
    val codegen = res.queryExecution.executedPlan
      .find(_.isInstanceOf[org.apache.spark.sql.execution.WholeStageCodegenExec])
    assert(codegen.isDefined,
      s"no codegen stage:\n${res.queryExecution.executedPlan}")
  }
}
