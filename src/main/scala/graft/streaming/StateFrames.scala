package graft.streaming

import org.apache.spark.sql.{DataFrame, Row, SparkSession}

/** Shared helpers for DRIVER-OWNED state frames in the incremental
  * operators (StreamingMixture's ledger/bands, StreamingContamination's
  * gram index): materialize a state frame as a lineage-severed leaf with
  * RESET statistics, and release superseded copies explicitly.
  *
  * Why not `Dataset.localCheckpoint` directly: it PRESERVES the optimized
  * plan's Catalyst stats on the checkpointed leaf
  * (`LogicalRDD.fromDataset` rewrites them on). Normally a feature; fatal
  * at stream length — each batch's new state plan joins/unions frames
  * that are themselves checkpoints, size estimates MULTIPLY through
  * joins (`SizeInBytesOnlyStatsPlanVisitor.visitJoin`), so the preserved
  * BigInt roughly SQUARES per batch: bit-length doubles, and by ~batch 12
  * the stream thread measurably sat for an hour inside
  * `BigInteger.multiplyToomCook3` computing statistics (round-13 find;
  * short specs never reach the regime). Routing through RDD[Row] +
  * `createDataFrame` resets the leaf to default stats — per-batch stats
  * work stays bounded forever. The Row round-trip is part of the
  * documented local-emulation cost (a deployment's keyed tables never
  * re-materialize the store).
  */
private[streaming] object StateFrames {

  /** Materialize `df` as a stats-reset, lineage-severed leaf; returns the
    * frame plus the checkpointed RDD backing it so a superseded copy can
    * be unpersisted explicitly (ContextCleaner only reclaims at driver
    * GC — unbounded over a long-running stream otherwise).
    */
  def materialize(spark: SparkSession, df: DataFrame)
      : (DataFrame, org.apache.spark.rdd.RDD[Row]) = {
    val rdd = df.rdd
    rdd.localCheckpoint()
    rdd.count()
    (spark.createDataFrame(rdd, df.schema), rdd)
  }

  /** Unpersist the localCheckpoint blocks behind a lineage-cut frame —
    * delegates to the one shared release helper.
    */
  def release(df: DataFrame): Unit =
    graft.operators.ConnectedComponents.releaseBlocks(df)

  /** An APPEND-ONLY store held as materialized per-batch segments — the
    * one segment-lifecycle implementation shared by StreamingMixture's
    * band index and StreamingContamination's gram index (the ordering
    * subtleties — materialize-before-commit, unpersist-after-swap,
    * re-coalesce on compaction — live here ONCE).
    *
    * Representation: each appended batch is one single-partition
    * stats-reset leaf; `frame` unions them lazily (union stats ADD — no
    * compounding); past `compactAt` segments the union compacts into one
    * leaf re-coalesced to defaultParallelism (the union RDD's partition
    * count is the SUM of its segments', so an uncoalesced compaction
    * would bake ~compactAt partitions in per cycle, growing task
    * overhead forever). Append is TWO-PHASE so callers can order the
    * fallible materialization before their commit point: `prepare`
    * materializes (throwing leaves the store untouched; the caller
    * unpersists the orphan), `commit` swaps driver state only.
    *
    * A store whose rows are superseded by later versions (e.g.
    * StreamingSpanMerge's versioned span rows) passes `fold`: applied at
    * compaction (and reset) only, it collapses the union to the rows
    * that still matter — reads stay keep-latest either way, so folding
    * never changes observable contents, it just stops dead versions
    * accumulating across compaction cycles.
    */
  final class SegmentedStore(spark: SparkSession,
      schema: org.apache.spark.sql.types.StructType, compactAt: Int,
      fold: DataFrame => DataFrame = identity) {

    type Segment = (DataFrame, org.apache.spark.rdd.RDD[Row])

    private var segments: Vector[Segment] = Vector.empty

    def frame: DataFrame =
      if (segments.isEmpty)
        spark.createDataFrame(new java.util.ArrayList[Row](), schema)
      else segments.map(_._1).reduce(_ unionByName _)

    /** Phase 1 (fallible): materialize a batch-sized frame as one
      * single-partition segment. The store is untouched; on a later
      * failure the caller releases `segment._2`.
      */
    def prepare(batch: DataFrame): Segment =
      materialize(spark, batch.coalesce(1))

    /** Phase 2 (driver-only): adopt a prepared segment; compact past the
      * threshold. Compaction failure leaves the batch fully applied with
      * the uncompacted segments intact (the next commit re-triggers it).
      */
    def commit(seg: Segment): Unit = {
      segments :+= seg
      if (segments.size > compactAt) compact()
    }

    /** Replace the whole store from a durable frame (restore path);
      * superseded segments are released after the new one materializes.
      */
    def reset(store: DataFrame): Unit = {
      val old = segments
      val seg = materialize(spark, fold(store))
      segments = Vector(seg)
      old.foreach(_._2.unpersist(blocking = false))
    }

    private def compact(): Unit = {
      val old = segments
      val par = spark.sparkContext.defaultParallelism
      segments = Vector(materialize(spark, fold(frame).coalesce(par)))
      old.foreach(_._2.unpersist(blocking = false))
    }
  }
}
