package graft.queries

import scala.collection.concurrent.TrieMap

import graft.{Q, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dynamic partition pruning — the runtime half of the layout playbook
  * (q143 buckets remove the join shuffle; this removes the SCAN): a fact
  * table written partitioned by day is joined to a small filtered dim on
  * the partition column, and Spark's DPP turns the dim into a runtime
  * subquery inside the fact scan's PartitionFilters — only matching day
  * directories are listed and read. At 100 TB this is the difference
  * between scanning a month and scanning the five campaign days the
  * query actually touches; static pruning (ServingSpec,
  * PartitionPruningSpec) cannot do it because the day set is only known
  * after filtering the dim. PartitionedOpsSpec asserts `dynamicpruning`
  * appears in the fact scan and that results equal the unpartitioned
  * join.
  *
  * The partitioned copy is a one-time layout write, attributed as the
  * `partitioned_events` staging line (the q143/bucketed_facts
  * discipline). Partitioning changes layout, never content: the oracle
  * joins the original parquet.
  */
object PartitionedOps {

  /** The campaign dim: a handful of active days — in production a real
    * dimension table; the filter (`active = 1`) is what makes the day
    * set a RUNTIME value no static pruner can see.
    */
  private[graft] val CampaignDays = Seq(
    "2024-01-03", "2024-01-07", "2024-01-16", "2024-01-21", "2024-01-28")

  private val paths = TrieMap.empty[(SparkSession, String), (String, String)]

  /** Day-partitioned copy of `events` plus the campaign dim as a REAL
    * parquet table, written once per (session, dir) under the
    * `partitioned_events` staging entry. The dim must be file-backed:
    * on a LocalRelation the `active = 1` predicate constant-folds away
    * and DPP's has-selective-filter check never fires (measured — the
    * first cut of this operator joined a literal dim and planned a
    * plain broadcast join with an unpruned fact scan).
    */
  private def layoutPaths(s: SparkSession, dir: String): (String, String) = {
    graft.Staging.stage(s, dir, "partitioned_events") {
      // shutdown-hook-cleaned scratch root (round-10 ADVICE): one events
      // copy per (session, dir) must not outlive the JVM
      val base = graft.Staging.scratchDir("graft_part_events_")
      Tables(s, dir, "events")
        .withColumn("event_day", to_date(col("ts")))
        .write.mode("overwrite").partitionBy("event_day").parquet(s"$base/fact")
      // the dim covers every corpus day; only campaign days are active —
      // the runtime filter DPP pipes into the fact scan
      Tables(s, dir, "events")
        .select(to_date(col("ts")).as("dt")).distinct()
        .withColumn("active",
          col("dt").cast("string").isin(CampaignDays: _*).cast("int"))
        .coalesce(1)
        .write.mode("overwrite").parquet(s"$base/campaign_dim")
      paths((s, dir)) = (s"$base/fact", s"$base/campaign_dim")
      s.range(1).toDF("partitioned_events_ready")
    }
    paths((s, dir))
  }

  /** The DPP-shaped join, pre-aggregation — exposed for the spec's plan
    * assertion (`dynamicpruning` in the fact scan's PartitionFilters).
    */
  private[graft] def campaignJoin(s: SparkSession, dir: String): DataFrame = {
    val (factPath, dimPath) = layoutPaths(s, dir)
    val fact = s.read.parquet(factPath)
    val dim = s.read.parquet(dimPath)
    fact.join(dim.filter(col("active") === 1),
      fact("event_day") === dim("dt"))
  }

  val all: Seq[Q] = Seq(
    Q(
      "q144_dynamic_partition_pruning",
      (s, dir) =>
        campaignJoin(s, dir)
          .groupBy(col("event_day"))
          .agg(count(lit(1)).as("n_events"),
            countDistinct(col("user_id")).as("n_users"))
          .select(date_format(col("event_day"), "yyyy-MM-dd").as("day"),
            col("n_events"), col("n_users")),
      Some(s"""
        WITH f AS (SELECT strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%d') AS day,
                          user_id
                   FROM events),
        d AS (SELECT * FROM (VALUES ${CampaignDays
          .map(d => s"('$d')").mkString(", ")}) AS t(day))
        SELECT f.day, COUNT(*) AS n_events,
               COUNT(DISTINCT user_id) AS n_users
        FROM f JOIN d USING (day)
        GROUP BY f.day"""),
      "Dynamic partition pruning: a day-partitioned fact joined to a " +
        "small runtime-filtered campaign dim on the partition column — " +
        "the fact scan reads ONLY matching day directories via a DPP " +
        "subquery (the scan-side complement of q143's shuffle-side " +
        "bucketing; partitioning changes layout, not content, so the " +
        "oracle joins the original parquet)."))
}
