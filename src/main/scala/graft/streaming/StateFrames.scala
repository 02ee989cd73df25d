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
}
