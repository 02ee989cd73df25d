package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VectorFns.cosine
import graft.queries.SimilarityOps

/** Streaming ingest twin for the IVF-PQ ANN arm (batch q128/q129) — the
  * missing third ingest twin beside StreamingLsh (dedup) and
  * StreamingDecon (decontamination): every ARRIVING vector is PQ-encoded
  * and routed to its IVF list entirely IN-ROW, so index ingest is a
  * stateless projection — streaming-legal on an unbounded feed, no
  * shuffle, no state; the model (16 coarse centroids + the 8×16 PQ
  * codebook) ships inside the plan, the FAISS-build shape.
  *
  * The batch pipeline assigns coarse lists with a crossJoin + window
  * argmax (fine batch-side: the window is partitioned by vector id). A
  * stream cannot run that window, so [[routeIds]] expresses the SAME
  * argmax — cosine desc, ties to the smaller cid — as an array_sort over
  * a literal centroid array: a pure projection with identical tie rules,
  * which is what makes streamed-ingest ≡ batch-index provable rather than
  * approximate (StreamingAnnSpec).
  *
  * Serving is per-micro-batch: [[serveTopK]] answers a batch of arriving
  * queries against the staged index (stream side = queries via
  * foreachBatch, static side = the index), probing 2 lists and ranking by
  * the same integer-scaled ADC as q128. Each query's top-k depends only
  * on the index, never on other queries, so per-batch serving is exact.
  */
object StreamingAnn {

  /** The model bundle: coarse centroids + PQ codebook/norms, from the
    * same memoized build as q128 (SimilarityOps.annModel).
    */
  final case class Model(
      centroids: Seq[(Long, Seq[Double])],
      cb: IndexedSeq[IndexedSeq[Seq[Double]]],
      norms: IndexedSeq[IndexedSeq[Double]])

  def model(s: org.apache.spark.sql.SparkSession, dir: String): Model = {
    val (cents, cb, norms) = SimilarityOps.annModel(s, dir)
    Model(cents, cb, norms)
  }

  /** Float→double vector column (the Tables/vecs cast, usable on a
    * streamed frame with a raw `embedding` array<float> column).
    */
  def toDouble(embedding: Column): Column =
    transform(embedding, x => x.cast("double"))

  /** Top-`keep` coarse list ids for vector column `vCol`, IN-ROW: sort a
    * literal (−cosine, cid) struct array — ascending on the negated
    * cosine then cid reproduces the batch window's ORDER BY cdist DESC,
    * cid ASC exactly, including the degenerate orders: the batch desc
    * window ranks NaN above every real double (Spark's total order), and
    * −NaN is still NaN (which would sort LAST ascending), so NaN maps to
    * −MaxValue to keep it winning; a null cosine (malformed vector —
    * cosine's zero-norm guard) maps to +MaxValue, after every real
    * score, matching desc's nulls-last. Either way the malformed
    * arrival routes deterministically and its PQ codes are null
    * (pqEncode guards), so its ADC can never outrank a real candidate.
    */
  def routeIds(vCol: Column, m: Model, keep: Int): Column = {
    if (m.centroids.isEmpty)
      // an all-malformed model (annModel drops malformed centroids) has
      // nowhere to route — empty assignment, not an analysis error
      typedLit(Seq.empty[Long])
    else {
      val arr = array(m.centroids.map { case (cid, cv) =>
        val d = cosine(vCol, typedLit(cv))
        val nd = when(isnan(d), lit(-Double.MaxValue))
          .otherwise(coalesce(-d, lit(Double.MaxValue)))
        struct(nd.as("nd"), lit(cid).as("cid"))
      }: _*)
      transform(slice(array_sort(arr), 1, keep), x => x.getField("cid"))
    }
  }

  /** Ingest projection: a (streaming or batch) frame with `idCol` and a
    * raw float `embedding` column → (idCol, cid, code_0..code_7) index
    * rows, all in-row. Appending this to the stored lists IS the index
    * ingest — at scale a partitioned-by-cid table append.
    */
  def ingest(vecsDf: DataFrame, idCol: String, m: Model): DataFrame =
    SimilarityOps.pqEncode(
      vecsDf.select(col(idCol), toDouble(col("embedding")).as("nv"))
        // get (0-based) not element_at: an empty-model routing array must
        // degrade to a null cid, and element_at(<empty>, 1) is a runtime
        // INVALID_ARRAY_INDEX error under ANSI mode (the session default)
        .withColumn("cid", get(routeIds(col("nv"), m, 1), lit(0))),
      "nv", m.cb, m.norms)
      .drop("nv")

  /** Per-batch top-`k` serving of query vectors (raw float `embedding` +
    * `idCol`) against ingested `lists` (neighbor_id, cid, code_* —
    * [[ingest]] with idCol = "neighbor_id"): probe the 2 nearest lists,
    * score by the shared integer-scaled ADC, rank with q128's exact tie
    * rules.
    */
  def serveTopK(queries: DataFrame, idCol: String, lists: DataFrame,
      m: Model, k: Int = 5): DataFrame = {
    val probes = queries
      .select(col(idCol).as("query_id"),
        toDouble(col("embedding")).as("qv"))
      .withColumn("cid", explode(routeIds(col("qv"), m, 2)))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("adc").asc_nulls_last, col("neighbor_id"))
    probes.join(lists, "cid")
      .withColumn("adc", SimilarityOps.adcDistance("qv", m.cb, m.norms))
      .withColumn("rank", row_number().over(w).cast("int"))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"), col("adc"))
  }
}
