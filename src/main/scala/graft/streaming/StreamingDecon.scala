package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.BloomFns
import graft.functions.TextFns.{hash32, tokens, wordNgrams}

/** Ingest-time benchmark decontamination — batch q130's streaming twin,
  * and the front-door shape a 100 TB crawl actually runs: every arriving
  * document is probed against the literal Bloom filter of the held-out
  * gram set AT ARRIVAL, entirely in-row (grams → hash32 → 3-bit probe
  * inside higher-order functions), so the operator is a stateless
  * projection — legal on an unbounded frame, no shuffle, no state, and
  * the filter costs kilobytes per executor at any bench size.
  *
  * StreamingDeconSpec proves streamed flags ≡ the same projection run in
  * batch, and that the bloom flags are a superset of q63's exact-join
  * contamination (false negatives impossible).
  */
object StreamingDecon {

  /** Per-document decontamination flags for a (streaming or batch) frame
    * with `doc_id` and `text`: (doc_id, n_grams, n_flagged, contaminated).
    * Null/short texts probe zero grams and come out clean, not null.
    */
  def flag(docs: DataFrame, bloom: Array[Long]): DataFrame = {
    val grams = coalesce(
      array_distinct(wordNgrams(tokens(col("text")), 5)),
      typedLit(Seq.empty[String]))
    docs.select(col("doc_id"), grams.as("g"))
      .select(col("doc_id"),
        size(col("g")).cast("long").as("n_grams"),
        aggregate(col("g"), lit(0L),
          (acc, gram) => acc +
            BloomFns.mightContain(bloom, hash32(gram)).cast("long"))
          .as("n_flagged"))
      .withColumn("contaminated", (col("n_flagged") > 0).cast("int"))
  }

  /** The held-out filter from a batch frame of bench documents — the
    * model-build step (driver-side, like q130 / the PQ codebook).
    */
  def buildBloom(benchDocs: DataFrame): Array[Long] =
    BloomFns.build(
      benchDocs.select(
          explode(array_distinct(wordNgrams(tokens(col("text")), 5)))
            .as("gram"))
        .select(hash32(col("gram")).as("h")).distinct()
        .collect().map(_.getLong(0)))
}
