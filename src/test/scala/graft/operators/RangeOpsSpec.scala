package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Parity proofs for the distributed total-order operators: each must be
  * BIT-IDENTICAL to the single-partition window form it replaces (the
  * approx cutpoints steer balance only, never results).
  */
class RangeOpsSpec extends SparkSpec {

  // deterministic value distribution with heavy ties and a skewed tail
  private def fixture = {
    import spark.implicits._
    (1 to 3000).map { i =>
      val v = if (i % 3 == 0) (i % 7).toLong else (i % 211).toLong
      (i.toLong, v)
    }.toDF("id", "v")
  }

  test("globalRowNumber equals single-partition row_number") {
    val df = fixture
    val (ranked, total) = RangeOps.globalRowNumber(df, "v", "id", "grank", 8)
    assert(total == 3000L)
    val w = Window.orderBy(col("v"), col("id"))
    val exact = df.withColumn("grank", row_number().over(w).cast("long"))
    val a = ranked.select("id", "grank").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val b = exact.select("id", "grank").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(a == b)
  }

  test("ntileFromRank + globalRowNumber equals single-partition ntile " +
    "(uneven total exercises the extra-row tiles)") {
    import spark.implicits._
    val df = (1 to 1007).map(i => (i.toLong, (i % 97).toLong)).toDF("id", "v")
    val (ranked, total) = RangeOps.globalRowNumber(df, "v", "id", "grank", 8)
    val got = ranked.withColumn("decile", RangeOps.ntileFromRank("grank", total, 10))
      .select("id", "decile").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val w = Window.orderBy(col("v"), col("id"))
    val exact = df.select(col("id"), ntile(10).over(w).as("decile")).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(got == exact)
  }

  test("ntileFromRank covers total < n (each row its own tile)") {
    import spark.implicits._
    val df = (1 to 4).map(i => (i.toLong, i.toLong * 10)).toDF("id", "v")
    val (ranked, total) = RangeOps.globalRowNumber(df, "v", "id", "grank", 4)
    val got = ranked.withColumn("decile", RangeOps.ntileFromRank("grank", total, 10))
      .select("id", "decile").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(got == Map(1L -> 1, 2L -> 2, 3L -> 3, 4L -> 4))
  }

  test("runningSum equals single-partition running sum") {
    import spark.implicits._
    val df = (1 to 2500).map(i => (i.toLong * 3 % 2501, (i % 53).toLong))
      .toDF("k", "tok") // unique keys, shuffled order
    val got = RangeOps.runningSum(df, "k", "tok", "cum", 8)
      .select("k", "cum").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val w = Window.orderBy(col("k"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val exact = df.withColumn("cum", sum(col("tok")).over(w))
      .select("k", "cum").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == exact)
  }

  test("rankedRunningSum equals the composed globalRowNumber→runningSum " +
    "chain AND the single-partition window form (heavy ties; both " +
    "measured and arithmetic cutpoints)") {
    import spark.implicits._
    val df = (1 to 2500).map { i =>
      val v = if (i % 3 == 0) (i % 7).toLong else (i % 211).toLong
      (i.toLong, v, (i % 53).toLong)
    }.toDF("id", "v", "tok")
    val w = Window.orderBy(col("v"), col("id"))
    val exact = df
      .withColumn("pos", row_number().over(w).cast("long"))
      .withColumn("cum", sum(col("tok"))
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .select("id", "pos", "cum").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val (composedRanked, _) = RangeOps.globalRowNumber(df, "v", "id", "pos", 8)
    val composed = RangeOps.runningSum(composedRanked, "pos", "tok", "cum", 8)
      .select("id", "pos", "cum").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val (fusedDf, total) =
      RangeOps.rankedRunningSum(df, "v", "id", "tok", "pos", "cum", 8)
    val fused = fusedDf.select("id", "pos", "cum").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(total == 2500L)
    assert(fused == exact)
    assert(composed == exact)
    // arithmetic cutpoints change only bucket balance, never results —
    // exercise them off the value range so some buckets are empty
    val (fixedDf, _) = RangeOps.rankedRunningSum(df, "v", "id", "tok",
      "pos", "cum", cuts = Some(RangeOps.uniformCutpoints(256.0, 8)))
    val fixed = fixedDf.select("id", "pos", "cum").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(fixed == exact)
  }

  test("relativeRanks equals percent_rank/cume_dist on a 90%-one-group " +
    "skew fixture (the shape that kills the per-group window at scale)") {
    import spark.implicits._
    // one lang holds 90% of rows — exactly the skew VERDICT r05 flags;
    // heavy ties within groups exercise the rank()/range-frame semantics
    // a NULL lang group rides along: Window.partitionBy keeps nulls as
    // their own group, and relativeRanks' null-safe offset join must too
    // (a plain column-equality join silently dropped these rows)
    val df = (1 to 2000).map { i =>
      val lang = if (i % 100 == 0) null
        else if (i % 10 == 0) s"l${i % 4}" else "en"
      (i.toLong, lang, (i % 37).toLong)
    }.toDF("doc_id", "lang", "n_chars")
    val got = RangeOps.relativeRanks(df, "lang", "n_chars", "pct_rank", "cume", 8)
      .select("doc_id", "pct_rank", "cume").collect()
      .map(r => r.getLong(0) -> ((r.getDouble(1), r.getDouble(2)))).toMap
    val w = Window.partitionBy(col("lang")).orderBy(col("n_chars"))
    val exact = df
      .withColumn("pct_rank", percent_rank().over(w))
      .withColumn("cume", cume_dist().over(w))
      .select("doc_id", "pct_rank", "cume").collect()
      .map(r => r.getLong(0) -> ((r.getDouble(1), r.getDouble(2)))).toMap
    // exact double equality: both sides are the same integer-ratio division
    assert(got == exact)
  }

  test("groupedRowNumber equals per-group row_number on a 90%-one-group " +
    "skew fixture with a null group and heavy ties") {
    import spark.implicits._
    // same skew shape as the relativeRanks proof: one priority holds 90%
    // of rows, a NULL group rides along, ties broken by id so both sides
    // run the identical total order
    val df = (1 to 2000).map { i =>
      val g = if (i % 100 == 0) null
        else if (i % 10 == 0) s"p${i % 4}" else "hot"
      (i.toLong, g, (i % 37).toLong)
    }.toDF("id", "g", "v")
    val got = RangeOps.groupedRowNumber(df, "g", "v", Seq("id"), "rn", "n", 8)
      .select("id", "rn", "n").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val w = Window.partitionBy(col("g")).orderBy(col("v"), col("id"))
    val exact = df
      .withColumn("rn", row_number().over(w).cast("long"))
      .withColumn("n", count(lit(1)).over(Window.partitionBy(col("g"))))
      .select("id", "rn", "n").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got == exact)
  }

  test("groupedValueCounts rank-picked median equals the row_number " +
    "median on a skewed low-cardinality fixture") {
    import spark.implicits._
    // one group holds 90% of rows; values are low-cardinality ints with
    // heavy ties (the shape the rollup form is for); null group included
    val df = (1 to 2000).map { i =>
      val g = if (i % 100 == 0) null else if (i % 10 == 0) s"p${i % 4}" else "hot"
      (i.toLong, g, i % 23)
    }.toDF("id", "g", "v")
    val got = RangeOps.groupedValueCounts(df, "g", "v")
      .groupBy("g")
      .agg(min(when(col("cum") >= expr("(n + 1) div 2"), col("v"))).as("med"),
        first(col("n")).as("n"))
      .collect().map(r => Option(r.getString(0)) -> ((r.getInt(1), r.getLong(2)))).toMap
    val w = Window.partitionBy(col("g")).orderBy(col("v"), col("id"))
    val exact = df
      .withColumn("rn", row_number().over(w))
      .withColumn("n", count(lit(1)).over(Window.partitionBy(col("g"))))
      .groupBy("g")
      .agg(max(when(col("rn") === expr("(n + 1) div 2"), col("v"))).as("med"),
        first(col("n")).as("n"))
      .collect().map(r => Option(r.getString(0)) -> ((r.getInt(1), r.getLong(2)))).toMap
    assert(got == exact)
  }

  test("relativeRanks single-row group yields pct_rank 0, cume 1") {
    import spark.implicits._
    val df = Seq((1L, "solo", 5L), (2L, "en", 1L), (3L, "en", 2L))
      .toDF("doc_id", "lang", "n_chars")
    val got = RangeOps.relativeRanks(df, "lang", "n_chars", "p", "c", 4)
      .filter(col("lang") === "solo").select("p", "c").head()
    assert(got.getDouble(0) == 0.0 && got.getDouble(1) == 1.0)
  }
}
