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
}
