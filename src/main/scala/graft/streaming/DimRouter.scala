package graft.streaming

import graft.model.Envelopes
import graft.sources.Sources
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.hadoop.fs.Path

/** The reference's DIM layer as one streaming job (ref RT/app/dim/
  * DimApp.java:76-178 + RT/app/func/TableProcessFunction.java:42-155 +
  * DimSinkFunction.java:28-51): a Maxwell CDC stream routed by a broadcast
  * config table into per-dimension sinks.
  *
  * Per microbatch (foreachBatch):
  *  - the config table is re-read (S4/S5 snapshot semantics — the Flink-CDC
  *    broadcast-state analog, J5);
  *  - K6: unparseable records go to the `_dirty` side sink;
  *  - P2: bootstrap markers and delete ops are filtered;
  *  - P9: each record keeps only its config's sink_columns;
  *  - F5/F6: `row_op_ts`/`proc_time` are stamped per microbatch
  *    (current_timestamp — the PROCTIME()/current_row_timestamp analog);
  *  - K5: the sink table directory is created on first write;
  *  - K4: MERGE-style upsert — new snapshot = keep-latest by sink_pk over
  *    (existing ∪ batch), written atomically via tmp-dir swap.
  *
  * Scale: dims are small by definition (config-listed lookup tables); the
  * per-batch work is a broadcast join + per-table filtered writes. The fact
  * stream never collects to the driver; only the config list does.
  */
object DimRouter {

  final case class TableConfig(
      sourceTable: String,
      sinkTable: String,
      sinkColumns: Seq[String],
      sinkPk: String = "id")

  /** Fold a Debezium config-CDC history into the live config set (ref
    * RT/app/func/TableProcessFunction.java:92-115): c/u/r upsert the
    * `after` image keyed by source_table, d removes the `before` image's
    * key. Use as DimRouter's `config` callback to replay the reference's
    * broadcast-state maintenance from a CDC feed.
    */
  def configFromDebezium(cdc: DataFrame): Seq[TableConfig] = {
    val parsed = graft.model.Envelopes.parseDebezium(
      // ingest_seq is assigned BEFORE any shuffle: per-partition arrival
      // order, the Kafka-offset analog (order across partitions carries no
      // meaning on the wire either)
      cdc.withColumn("ingest_seq", monotonically_increasing_id()))
      .select(col("env.op").as("op"),
        col("env.before.source_table").as("b_src"),
        col("env.after.source_table").as("src"),
        col("env.after.sink_table").as("sink"),
        col("env.after.sink_columns").as("cols"),
        col("env.after.sink_pk").as("pk"),
        col("env.ts_ms").as("ts_ms"),
        col("ingest_seq"))
      .collect() // config stream is tiny by definition (J5 broadcast side)
      // DataFrame row order is NOT collection order: fold strictly by the
      // Debezium event stamp, then ingest order — a delete can otherwise be
      // applied before the create it tombstones
      .sortBy(r => (Option(r.getAs[java.lang.Long]("ts_ms")).map(_.toLong).getOrElse(0L),
        r.getAs[Long]("ingest_seq")))
    val live = scala.collection.mutable.LinkedHashMap.empty[String, TableConfig]
    parsed.foreach { r =>
      r.getAs[String]("op") match {
        case "d" => live.remove(r.getAs[String]("b_src"))
        case _ =>
          val src = r.getAs[String]("src")
          if (src != null) live(src) = TableConfig(
            src,
            r.getAs[String]("sink"),
            Option(r.getAs[String]("cols")).map(_.split(",").toSeq).getOrElse(Seq("id")),
            Option(r.getAs[String]("pk")).getOrElse("id"))
      }
    }
    live.values.toSeq
  }

  def run(
      cdcJson: DataFrame,
      config: () => Seq[TableConfig],
      outDir: String,
      checkpoint: String): StreamingQuery = {
    cdcJson.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        routeBatch(batch, config(), outDir)
      }
      .start()
  }

  /** One microbatch of routing — also directly usable in batch mode.
    *
    * Ordering contract: within a microbatch, two versions of the same pk
    * with equal envelope `ts` resolve by `src_seq` (per-partition ingest
    * sequence from monotonically_increasing_id). That equals arrival order
    * only when the upstream feed delivers all versions of a key through the
    * SAME input partition — the Kafka keyed-topic contract the reference
    * relies on too (Maxwell partitions by pk). Feeding this from a source
    * that sprays one key across partitions degrades equal-ts ties to
    * partition order; if such a source must be used, carry an explicit
    * sequence column instead.
    */
  def routeBatch(batch: DataFrame, cfgs: Seq[TableConfig], outDir: String): Unit = {
    val spark = batch.sparkSession
    val (clean0, dirty) = Sources.dirtySplit(batch, "value_json", Envelopes.maxwellSchema)
    if (!dirty.isEmpty)
      dirty.write.mode(SaveMode.Append).parquet(s"$outDir/_dirty")
    val clean = clean0
      .filter(col("env.data").isNotNull &&
        col("env.type").isin("insert", "update", "bootstrap-insert"))
      // F5/F6: processing-time stamps, fixed per microbatch
      .withColumn("row_op_ts", current_timestamp())
      // deterministic within-batch arrival order: the envelope's source
      // stamp, then per-partition ingest sequence (row_op_ts alone ties for
      // every record of the same microbatch)
      .withColumn("src_ts", col("env.ts").cast("long"))
      .withColumn("src_seq", monotonically_increasing_id())
      .cache()
    try {
      for (cfg <- cfgs) {
        val cols = (cfg.sinkPk +: cfg.sinkColumns.filterNot(_ == cfg.sinkPk)).distinct
        val rows = clean
          .filter(col("env.table") === cfg.sourceTable)
          .select(cols.map(c =>
            element_at(col("env.data"), c).as(c))
            ++ Seq(col("row_op_ts"), col("src_ts"), col("src_seq")): _*)
        if (!rows.isEmpty) upsert(spark, rows, s"$outDir/${cfg.sinkTable}", cfg.sinkPk)
      }
    } finally clean.unpersist()
  }

  /** Bucket count for the pk-hash dim layout. Dims are config-listed lookup
    * tables (small), so 16 buckets bounds per-batch rewrite work without
    * producing a long tail of tiny files.
    */
  val NumBuckets = 16

  /** K4: keep-latest-by-pk MERGE into a pk-hash-bucketed parquet dim table
    * (`dir/pkb=N/` partition layout — `spark.read.parquet(dir)` sees the
    * whole dim). Only buckets containing batch keys are read, merged, and
    * atomically swapped (tmp-write + rename per bucket), so per-batch I/O is
    * O(touched buckets), not O(table) — the Delta-less incremental upsert
    * documented in SURVEY §7.1.
    *
    * Keep-latest order: row_op_ts (microbatch stamp), then the envelope's
    * source ts, then ingest sequence — two versions of a pk arriving in ONE
    * microbatch resolve by stream order, not arbitrarily (see routeBatch's
    * ordering contract for when src_seq equals stream order).
    *
    * Crash safety: all merged buckets are fully written to tmp dirs FIRST
    * (phase 1 — long-running, nothing destructive), then swapped in a tight
    * metadata-only loop (phase 2). A crash in phase 1 leaves the live table
    * untouched; the destructive window shrinks to milliseconds of renames.
    * A failed rename throws (never silently loses a bucket). Cross-bucket
    * all-or-nothing would need a table format with a commit protocol
    * (Delta/Iceberg) — out of scope for the parquet-dir substrate.
    */
  private def upsert(spark: SparkSession, rows: DataFrame, dir: String, pk: String): Unit = {
    val fs = new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val rowsB = rows.withColumn("pkb",
      pmod(xxhash64(col(pk)), lit(NumBuckets)).cast("int")).cache()
    try {
      val touched = rowsB.select("pkb").distinct().collect().map(_.getInt(0)).sorted
      // Phase 1: materialize every merged bucket into its tmp dir.
      val staged = touched.map { b =>
        val bucket = new Path(s"$dir/pkb=$b")
        val batchRows = rowsB.filter(col("pkb") === b).drop("pkb")
        val merged =
          if (fs.exists(bucket))
            spark.read.parquet(bucket.toString)
              .unionByName(batchRows, allowMissingColumns = true)
          else batchRows
        val w = Window.partitionBy(col(pk)).orderBy(
          col("row_op_ts").desc, col("src_ts").desc_nulls_last,
          col("src_seq").desc_nulls_last)
        val latest = merged
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") === 1).drop("rn")
        val tmp = new Path(s"$dir/.pkb_$b.tmp")
        latest.write.mode(SaveMode.Overwrite).parquet(tmp.toString)
        (tmp, bucket)
      }
      // Phase 2: tight delete+rename swaps; a failed rename is an error.
      for ((tmp, bucket) <- staged) {
        if (fs.exists(bucket)) fs.delete(bucket, true)
        if (!fs.rename(tmp, bucket))
          throw new java.io.IOException(
            s"dim upsert: rename $tmp -> $bucket failed; bucket left in tmp")
      }
    } finally rowsB.unpersist()
  }
}
