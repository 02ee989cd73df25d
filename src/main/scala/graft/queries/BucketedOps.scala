package graft.queries


import graft.{Q, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Bucketed-table co-located join — the pre-shuffle half of the 100 TB
  * join playbook that the rest of the library only talks about: when both
  * fact tables are WRITTEN bucketed by the join key with the same bucket
  * count, a sort-merge join between them needs NO exchange — each task
  * reads bucket i of both sides, and the corpus-sized shuffle that
  * dominates every repeated big⋈big join is paid ONCE at write time and
  * amortized over every subsequent join (q82 salting attacks skew
  * INSIDE a shuffle; this removes the shuffle). BucketedOpsSpec executes
  * the join and asserts the finalized adaptive plan contains a
  * SortMergeJoin and ZERO shuffle exchanges on the join input.
  *
  * The bucketed copies are session-memoized side-effect tables (8
  * buckets, sorted within buckets) under a temp warehouse path — the
  * local analog of maintaining bucketed fact tables in a production
  * catalog. Bucketing changes LAYOUT, never content, so the oracle runs
  * the same join over the original parquet.
  */
object BucketedOps {

  /** Bucketed lineitem/orders table names for (session, dir), writing
    * them on first use. The write rides Staging.stage (the thunk runs
    * once per (session, dir), serialized) with a marker frame, so the
    * one-time layout cost is a first-class bench staging line item
    * (`bucketed_facts`) instead of hiding inside whichever q143 run
    * comes first — the round-8 staging-attribution discipline.
    */
  private def bucketedNames(s: SparkSession, dir: String): (String, String) = {
    // full md5 of the dir, not String.hashCode: a 32-bit collision would
    // silently repoint BOTH dirs' table names at one dir's data
    val tag = java.security.MessageDigest.getInstance("MD5")
      .digest(dir.getBytes("UTF-8")).map(b => f"$b%02x").mkString
    val (lt, ot) = (s"graft_bkt_lineitem_$tag", s"graft_bkt_orders_$tag")
    graft.Staging.stage(s, dir, "bucketed_facts") {
      // shutdown-hook-cleaned scratch root: a multi-dir sweep session
      // writes one lineitem+orders copy per (session, dir) — without
      // cleanup those accumulate across runs (round-10 ADVICE)
      val base = graft.Staging.scratchDir("graft_bucketed_")
      Tables(s, dir, "lineitem")
        .write.mode("overwrite").bucketBy(8, "l_orderkey")
        .sortBy("l_orderkey").option("path", s"$base/lineitem")
        .saveAsTable(lt)
      Tables(s, dir, "orders")
        .write.mode("overwrite").bucketBy(8, "o_orderkey")
        .sortBy("o_orderkey").option("path", s"$base/orders")
        .saveAsTable(ot)
      s.range(1).toDF("bucketed_facts_ready")
    }
    (lt, ot)
  }

  /** The co-located join, pre-aggregation — exposed for the spec's plan
    * assertion (SortMergeJoin, zero exchanges below it).
    */
  private[graft] def colocatedJoin(s: SparkSession, dir: String): DataFrame = {
    val (lt, ot) = bucketedNames(s, dir)
    // merge hint: the demo IS the sort-merge path — without it the
    // planner broadcasts the (locally tiny) orders side and the bucket
    // co-location never exercises
    s.table(lt).hint("merge")
      .join(s.table(ot), col("l_orderkey") === col("o_orderkey"))
  }

  private def dec(c: Column): Column = c.cast("decimal(18,2)")

  val all: Seq[Q] = Seq(
    Q(
      "q143_bucketed_join",
      (s, dir) =>
        colocatedJoin(s, dir)
          .groupBy(col("o_orderpriority"))
          .agg(count(lit(1)).as("n_items"),
            sum(dec(col("l_quantity"))).cast("double").as("sum_qty")),
      Some("""
        SELECT o_orderpriority, COUNT(*) AS n_items,
               CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
                 AS sum_qty
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        GROUP BY o_orderpriority"""),
      "Bucketed co-located fact join: both sides written bucketed by the " +
        "join key (8 buckets, sorted), so the sort-merge join runs with " +
        "zero exchanges — the write-once/join-many layout for repeated " +
        "big-fact joins at 100 TB (bucketing changes layout, not " +
        "content; the oracle joins the original parquet)."))
}
