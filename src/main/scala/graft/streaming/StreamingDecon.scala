package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.{BloomFns, BloomSizing}
import graft.functions.TextFns.{hash32, hash60, tokens, wordNgrams}

/** Ingest-time benchmark decontamination — batch q130/q132's streaming
  * twin, and the front-door shape a 100 TB crawl actually runs: every
  * arriving document is probed against the literal Bloom filter of the
  * held-out gram set AT ARRIVAL, entirely in-row (grams → hash → bit
  * probes inside higher-order functions), so the operator is a stateless
  * projection — legal on an unbounded frame, no shuffle, no state, and
  * the filter ships inside the plan at any bench size.
  *
  * Two geometries, matching BloomFns: the legacy fixed 4096-bit/hash32
  * form ([[flag]]/[[buildBloom]]) and the parametric [[BloomSizing]] form
  * over hash60 with disjoint probe windows ([[flagSized]]/
  * [[buildBloomSized]]) — the one a real (100k+-gram) held-out set needs.
  *
  * StreamingDeconSpec proves streamed flags ≡ the same projection run in
  * batch, and that the bloom flags are a superset of q63's exact-join
  * contamination (false negatives impossible).
  */
object StreamingDecon {

  /** Shared per-document probe projection: grams → per-gram membership
    * via `probe` → (doc_id, n_grams, n_flagged, contaminated). Null/short
    * texts probe zero grams and come out clean, not null.
    */
  private def flagWith(docs: DataFrame, probe: Column => Column): DataFrame = {
    val grams = coalesce(
      array_distinct(wordNgrams(tokens(col("text")), 5)),
      typedLit(Seq.empty[String]))
    docs.select(col("doc_id"), grams.as("g"))
      .select(col("doc_id"),
        size(col("g")).cast("long").as("n_grams"),
        aggregate(col("g"), lit(0L),
          (acc, gram) => acc + probe(gram).cast("long"))
          .as("n_flagged"))
      .withColumn("contaminated", (col("n_flagged") > 0).cast("int"))
  }

  /** Per-document decontamination flags for a (streaming or batch) frame
    * with `doc_id` and `text` — legacy 4096-bit/hash32 geometry.
    */
  def flag(docs: DataFrame, bloom: Array[Long]): DataFrame =
    flagWith(docs, gram => BloomFns.mightContain(bloom, hash32(gram)))

  /** Same projection in the sized geometry: `bloom` must have been built
    * with the same [[BloomSizing]] via [[buildBloomSized]].
    */
  def flagSized(docs: DataFrame, bloom: Array[Long], sz: BloomSizing): DataFrame =
    flagWith(docs, gram => BloomFns.mightContainSized(bloom, hash60(gram), sz))

  private def distinctGramHashes(benchDocs: DataFrame, hash: Column => Column): Array[Long] =
    benchDocs.select(
        explode(array_distinct(wordNgrams(tokens(col("text")), 5)))
          .as("gram"))
      .select(hash(col("gram")).as("h")).distinct()
      .collect().map(_.getLong(0))

  /** The held-out filter from a batch frame of bench documents — the
    * model-build step (driver-side, like q130 / the PQ codebook).
    */
  def buildBloom(benchDocs: DataFrame): Array[Long] =
    BloomFns.build(distinctGramHashes(benchDocs, hash32))

  /** Sized-geometry filter build from the same held-out frame. */
  def buildBloomSized(benchDocs: DataFrame, sz: BloomSizing): Array[Long] =
    BloomFns.buildSized(distinctGramHashes(benchDocs, hash60), sz)
}
