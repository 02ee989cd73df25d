package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed connected components via alternating large-star/small-star
  * contraction (Kiveris et al., "Connected Components in MapReduce and
  * Beyond", SoCC 2014 — a published algorithm, re-expressed on DataFrames).
  *
  * Why not min-label propagation: propagation needs O(diameter) rounds, so
  * a pathological chain-shaped component (docs A~B~C~... through shared
  * LSH buckets) costs rounds proportional to the chain length. Star
  * contraction halves the effective distance to each component's minimum
  * every round, converging in O(log n) rounds on chains and O(log² n) in
  * the adversarial worst case — round count depends on component SHAPE
  * only logarithmically, never linearly, which is the property that
  * survives a 100 TB corpus with an unlucky near-dup topology.
  *
  * Scale shape per round: two shuffles (one per star, keyed by the
  * grouping endpoint), no corpus-sized side — after round 1 the edge set
  * contracts toward one (node → root) pointer per non-root node, so late
  * rounds are cheap regardless of input size. The convergence probe is a
  * single count+hash aggregate on the already-persisted round output
  * (the action that materializes it — no extra pass).
  */
object ConnectedComponents {

  /** Labels every node incident to an edge with the minimum node id of its
    * component. `edges` must have two numeric columns `u`, `v` (undirected,
    * any orientation; self-loops and duplicates tolerated). Returns
    * `(labels(node, label), rounds)` where `rounds` counts the
    * (large-star + small-star) iterations executed, including the final
    * fixpoint-confirming one. Throws if the fixpoint is not confirmed
    * within `maxRounds` — silently returning half-contracted labels would
    * be the worst possible failure mode for a dedup pipeline (documents
    * wrongly kept as "unique"); the default 25 rounds covers ~2^25-node
    * components even on a pure chain, so hitting the cap means the input
    * is far outside the design envelope and the caller should raise it
    * deliberately.
    */
  def run(edgesIn: DataFrame, maxRounds: Int = 25): (DataFrame, Int) = {
    val (labels, rounds, _) = runHandle(edgesIn, maxRounds)
    (labels, rounds)
  }

  /** As [[run]], additionally handing back the FINAL contracted round
    * frame. The returned `labels` is lazy and reads that frame's
    * checkpointed blocks, so [[run]] must keep them alive for the caller;
    * but a caller that immediately MATERIALIZES the labels (the streaming
    * ingest path, which localCheckpoints them per batch) can then release
    * the final round's blocks explicitly instead of leaving one frame per
    * invocation to driver-GC reclamation. Superseded INTERMEDIATE rounds
    * are always released in-loop, for every caller.
    */
  private[graft] def runHandle(edgesIn: DataFrame, maxRounds: Int = 25)
      : (DataFrame, Int, DataFrame) = {
    // consumed once (the final label join), so no persist — caching it
    // would only hold executor storage hostage across the loop
    val nodes = edgesIn.select(col("u").as("node"))
      .union(edgesIn.select(col("v").as("node")))
      .distinct()

    // Eager checkpoint per round: iterative DataFrame loops MUST truncate
    // lineage — each round's plan references the previous round twice (the
    // symmetrize union), so without truncation the logical plan doubles
    // per round and the optimizer itself becomes the bottleneck long
    // before the data does. With a configured checkpoint dir
    // (sparkContext.setCheckpointDir — what a cluster deployment sets)
    // rounds checkpoint RELIABLY and survive executor loss; the
    // persist-before-checkpoint keeps the reliable write from recomputing
    // the round (RDD.checkpoint otherwise re-runs the lineage in the
    // writing job). Checkpoint FILES are deleted by the context cleaner
    // only when spark.cleaner.referenceTracking.cleanCheckpoints=true —
    // a deployment that loops CC should set it (or clean the dir itself);
    // without it files persist for the app lifetime (they are per-round
    // pointer sets, small, but unbounded across many invocations).
    // Without a checkpoint dir, localCheckpoint keeps the local-mode
    // harness fast at the documented cost that lost executor blocks
    // cannot be recomputed (lineage gone); those blocks ARE reclaimed by
    // the context cleaner as round frames go out of scope.
    def truncate(df: DataFrame): DataFrame =
      if (df.sparkSession.sparkContext.getCheckpointDir.isDefined) {
        val cached = df.persist()
        val out = cached.checkpoint(true)
        cached.unpersist()
        out
      } else df.localCheckpoint(true)

    var edges = truncate(edgesIn
      .filter(col("u") =!= col("v"))
      .select(col("u"), col("v")).distinct())

    // Edge-multiset fingerprint: (count, sum of per-edge xxhash64 widened
    // to decimal — ANSI long-sum would overflow). Equal fingerprints across
    // a round ⟹ identical edge set (order-free sum; collision odds ~2^-64
    // per comparison) ⟹ both stars are at fixpoint.
    var prev: (Long, java.math.BigDecimal) = (-1L, null)
    var rounds = 0
    var converged = false
    while (!converged && rounds < maxRounds) {
      // Large-star: each node a attaches its strictly LARGER neighbors to
      // m(a) = min(Γ(a) ∪ {a}). Connectivity-preserving; never increases
      // any node's eventual label (labels only move toward the min).
      val wA = Window.partitionBy("a")
      val sym = edges.select(col("u").as("a"), col("v").as("b"))
        .union(edges.select(col("v").as("a"), col("u").as("b")))
      val ls = sym
        .withColumn("m", least(min(col("b")).over(wA), col("a")))
        .filter(col("b") > col("a"))
        .select(col("b").as("u"), col("m").as("v"))
        .filter(col("u") =!= col("v"))
        .distinct()

      // Small-star: orient each edge (max, min); each node a attaches its
      // ≤-neighbors AND itself to m(a) = min of those neighbors. Output
      // rows are always (larger, smaller), i.e. (node, parent-candidate).
      val ori = ls.select(greatest(col("u"), col("v")).as("a"),
        least(col("u"), col("v")).as("b"))
      val withM = ori.withColumn("m", min(col("b")).over(wA))
      val ss = withM.select(col("b").as("u"), col("m").as("v"))
        .union(withM.select(col("a").as("u"), col("m").as("v")))
        .filter(col("u") =!= col("v"))
        .distinct()
      val ss2 = truncate(ss)

      val probe = ss2.agg(
        count(lit(1)).as("c"),
        sum(xxhash64(col("u"), col("v")).cast("decimal(38,0)")).as("h")).head()
      val now = (probe.getLong(0), probe.getDecimal(1))
      converged = now._1 == prev._1 &&
        (now._1 == 0L || (now._2 != null && now._2 == prev._2))
      prev = now
      // ss2 is already materialized (truncate is eager), so the previous
      // round's blocks can never be read again — release them now. Without
      // this, every round of every invocation lingers in block-manager
      // storage until driver GC triggers the ContextCleaner (a
      // long-running stream ingesting many batches accumulates them
      // unboundedly).
      val superseded = edges
      edges = ss2
      releaseBlocks(superseded)
      rounds += 1
    }

    if (!converged)
      throw new IllegalStateException(
        s"ConnectedComponents did not confirm a fixpoint in $maxRounds " +
          "rounds; labels would be half-contracted. Raise maxRounds " +
          "(alternating star contraction needs O(log n) rounds in " +
          "practice, O(log^2 n) worst-case).")

    // Fixpoint edge set is a star forest oriented (child, root): each
    // non-root appears exactly once as u; roots appear only as v. The
    // defensive groupBy-min collapses any duplicate child rows.
    val parents = edges.groupBy(col("u").as("node")).agg(min(col("v")).as("p"))
    val labels = nodes.join(parents, Seq("node"), "left")
      .select(col("node"), coalesce(col("p"), col("node")).as("label"))
    (labels, rounds, edges)
  }

  /** Release the localCheckpoint blocks backing a lineage-cut frame (a
    * `localCheckpoint`'d Dataset or one built over a checkpointed
    * RDD[Row]) — the ONE shared unpersist helper for every explicit
    * release site (the CC round loop, the [[runHandle]] final frame
    * after its labels are materialized, and StreamingMixture's state
    * temps), so the pattern can never diverge between copies. No-op on
    * frames whose plan is not a leaf LogicalRDD (e.g. the
    * reliable-checkpoint path's file-backed rounds).
    */
  private[graft] def releaseBlocks(df: DataFrame): Unit =
    df.queryExecution.analyzed match {
      case l: org.apache.spark.sql.execution.LogicalRDD =>
        l.rdd.unpersist(blocking = false)
      case _ => ()
    }
}
