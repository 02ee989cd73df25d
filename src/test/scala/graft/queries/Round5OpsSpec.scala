package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Property checks for the round-5 operators beyond the hash oracle:
  * quantization round-trip error bounds, grid-fill density/monotonicity,
  * salted-join result invariance, and percentile ordering.
  */
class Round5OpsSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  private def run(name: String) =
    graft.Registry.all.find(_.name == name).get.run(spark, sfDir)

  test("q77 int8 codes bound the round-trip error by scale/254 per element") {
    // |x - q*scale/127| <= scale/254 (+ float slack) for round-half-up
    // codes — checked first-principles over every element of every vector.
    val worst = graft.Tables(spark, sfDir, "embeddings")
      .select(col("vec_id"),
        posexplode(transform(col("embedding"), x => x.cast("double")))
          .as(Seq("i", "x")))
      .withColumn("scale",
        max(abs(col("x"))).over(
          org.apache.spark.sql.expressions.Window.partitionBy(col("vec_id"))))
      .filter(col("scale") > 0)
      .withColumn("q", floor(col("x") / col("scale") * 127.0 + 0.5))
      .withColumn("err", abs(col("x") - col("q") * col("scale") / 127.0))
      .agg(max(col("err") / col("scale")).as("max_rel_err"))
      .head().getDouble(0)
    assert(worst <= 1.0 / 254 + 1e-12, s"quantization error too large: $worst")
  }

  test("q78 elects exactly one representative per q57 cluster, the longest") {
    val reps = run("q78_cluster_representative").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    val clusters = run("q57_neardup_cluster").collect()
      .map(r => (r.getLong(0), r.getLong(1))) // (doc_id, cluster_rep)
    val docs = graft.Tables(spark, sfDir, "documents")
      .select("doc_id", "n_chars").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(reps.keySet == clusters.map(_._2).toSet) // one row per cluster
    for ((cluster, members) <- clusters.groupBy(_._2)) {
      val (best, n, maxChars) = reps(cluster)
      assert(n == members.length)
      assert(maxChars == members.map(m => docs(m._1)).max)
      assert(docs(best) == maxChars, s"cluster $cluster best_doc not longest")
    }
  }

  test("q82 salted join equals the plain join exactly") {
    import spark.implicits._
    val events = graft.Tables(spark, sfDir, "events")
      .select(col("event_type"), col("user_id"))
    val dim = Seq(("click", 0), ("view", 0), ("signup", 1),
      ("purchase", 1), ("error", 0)).toDF("et", "conv")
    def agg(df: org.apache.spark.sql.DataFrame) = df
      .groupBy(col("conv"))
      .agg(count(lit(1)).as("n_events"),
        countDistinct(col("user_id")).as("n_users"))
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSet
    val salted = agg(
      graft.operators.SkewOps.saltedJoin(events, dim, col("event_type"), col("et")))
    val plain = agg(events.join(dim, col("event_type") === col("et")))
    assert(salted == plain)
  }

  test("q83 percentiles are ordered and are actual data values") {
    val vals = graft.Tables(spark, sfDir, "events")
      .select("event_type", "value").collect()
      .groupBy(_.getString(0)).view.mapValues(_.map(_.getDouble(1)).toSet).toMap
    run("q83_exact_percentiles").collect().foreach { r =>
      val (et, p50, p90, p99) =
        (r.getString(0), r.getDouble(2), r.getDouble(3), r.getDouble(4))
      assert(p50 <= p90 && p90 <= p99, s"$et percentiles out of order")
      assert(vals(et).contains(p50) && vals(et).contains(p90) &&
        vals(et).contains(p99), s"$et percentile not a data value")
    }
  }

  test("q85 grid is dense and days_since_active is consistent") {
    val rows = run("q85_time_grid_fill").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    val days = rows.map(_._2).distinct.sorted
    // every user has every spine day exactly once
    rows.groupBy(_._1).foreach { case (u, rs) =>
      assert(rs.map(_._2).sorted.toSeq == days.toSeq, s"user $u grid not dense")
      // forward fill: 0 on active days, +1 per idle day, -1 before first
      rs.sortBy(_._2).foldLeft(-1L) { case (prev, (_, _, n, since)) =>
        if (n > 0) { assert(since == 0); 0L }
        else if (prev == -1L) { assert(since == -1L); -1L }
        else { assert(since == prev + 1, s"user $u gap counter broke"); since }
      }
    }
  }
}
