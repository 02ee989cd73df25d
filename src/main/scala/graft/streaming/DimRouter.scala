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
    val parsed = graft.model.Envelopes.parseDebezium(cdc)
      .select(col("env.op").as("op"),
        col("env.before.source_table").as("b_src"),
        col("env.after.source_table").as("src"),
        col("env.after.sink_table").as("sink"),
        col("env.after.sink_columns").as("cols"),
        col("env.after.sink_pk").as("pk"))
      .collect() // config stream is tiny by definition (J5 broadcast side)
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

  /** One microbatch of routing — also directly usable in batch mode. */
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
      .cache()
    try {
      for (cfg <- cfgs) {
        val cols = (cfg.sinkPk +: cfg.sinkColumns.filterNot(_ == cfg.sinkPk)).distinct
        val rows = clean
          .filter(col("env.table") === cfg.sourceTable)
          .select(cols.map(c =>
            element_at(col("env.data"), c).as(c)) :+ col("row_op_ts"): _*)
        if (!rows.isEmpty) upsert(spark, rows, s"$outDir/${cfg.sinkTable}", cfg.sinkPk)
      }
    } finally clean.unpersist()
  }

  /** K4: keep-latest-by-pk MERGE into a parquet dim table, atomic via
    * tmp-write + directory swap (the Delta-less upsert documented in
    * SURVEY §7.1).
    */
  private def upsert(spark: SparkSession, rows: DataFrame, dir: String, pk: String): Unit = {
    val fs = new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val target = new Path(dir)
    val merged =
      if (fs.exists(target)) spark.read.parquet(dir).unionByName(rows) else rows
    val w = Window.partitionBy(col(pk)).orderBy(col("row_op_ts").desc)
    val latest = merged
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1).drop("rn")
    val tmp = new Path(dir + ".tmp")
    latest.write.mode(SaveMode.Overwrite).parquet(tmp.toString)
    if (fs.exists(target)) fs.delete(target, true)
    fs.rename(tmp, target)
  }
}
