package graft.queries

import graft.{Q, Tables}
import graft.functions.TextFns.hash32
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-curation operators for a training-data pipeline over `documents`:
  * deterministic stratified sampling (class balancing), PII redaction, and
  * Gopher-style repetition filtering.
  *
  * Scale design (100 TB): sampling is a scan plus one windowed count per
  * stratum key (or a pre-aggregated stratum-size broadcast at real scale) —
  * keep/drop is a pure hash predicate, no shuffle of payloads; redaction is
  * scan-speed regexp projections; the repetition filter is one explode +
  * two-level aggregation shuffled on doc_id (high cardinality, naturally
  * parallel). Determinism: all sampling uses [[hash32]] (md5-prefix), never
  * rand(), so every engine — and every rerun — selects the same rows.
  */
object CorpusOps {

  private def docs(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "documents")

  /** Per-language target for the q58 balanced sample. */
  private val TargetPerLang = 50L

  // PII patterns kept in the RE2 ∩ java.util.regex common subset (character
  // classes + bounded repeats only, no lookaround/backrefs) so Spark and the
  // DuckDB oracle match byte-identically.
  private val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  private val PhoneRe = "\\+[0-9]{1,2} [0-9]{3} [0-9]{3} [0-9]{4}"

  val all: Seq[Q] = Seq(
    // ----------------------------------------------- stratified sampling
    Q(
      "q58_stratified_sample",
      (s, dir) => {
        // Deterministic hash sampling to ~TargetPerLang docs per language:
        // rate = target/|stratum|, keep iff hash32(doc_id) % 10000 falls
        // under rate*10000. At 100 TB the per-stratum counts come from a
        // pre-aggregated broadcast instead of a window, but the predicate —
        // and therefore the sample — is identical.
        val cnt = count(lit(1)).over(Window.partitionBy(col("lang")))
        docs(s, dir)
          .select(col("doc_id"), col("lang"),
            cnt.as("stratum_sz"),
            pmod(hash32(col("doc_id").cast("string")), lit(10000)).as("h"))
          .filter(col("h") < least(lit(10000L),
            floor(lit(TargetPerLang * 10000L) / col("stratum_sz"))))
          .select(col("doc_id"), col("lang"), col("stratum_sz"))
      },
      Some(s"""
        WITH sz AS (
          SELECT doc_id, lang,
                 COUNT(*) OVER (PARTITION BY lang) AS stratum_sz,
                 CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
                   % 10000 AS h
          FROM documents)
        SELECT doc_id, lang, stratum_sz
        FROM sz
        WHERE h < LEAST(10000, (${TargetPerLang * 10000L}) // stratum_sz)"""),
      "Deterministic stratified sampling: hash-gated ~N-per-language " +
        "balanced subcorpus; rerun- and engine-stable (no rand()) " +
        "(pipeline ops brief: training-data class balancing)."),

    // ------------------------------------------------------ PII redaction
    Q(
      "q59_pii_redact",
      (s, dir) => {
        // The fixture corpus carries no PII, so a deterministic footer with
        // an email + E.164-ish phone is appended per doc (same expression
        // in the oracle) — the redaction regexes then have real work whose
        // output is hash-checked end-to-end.
        val withPii = concat(col("text"),
          lit(" contact u"), col("doc_id"), lit("@example.com tel +1 555 "),
          lpad(pmod(col("doc_id"), lit(1000)).cast("string"), 3, "0"),
          lit(" 0000"))
        docs(s, dir)
          .select(col("doc_id"), withPii.as("t"))
          .select(
            col("doc_id"),
            size(regexp_extract_all(col("t"), lit(EmailRe), lit(0)))
              .cast("long").as("n_emails"),
            size(regexp_extract_all(col("t"), lit(PhoneRe), lit(0)))
              .cast("long").as("n_phones"),
            md5(regexp_replace(regexp_replace(col("t"), EmailRe, "<EMAIL>"),
              PhoneRe, "<PHONE>")).as("redacted_md5"))
      },
      Some(s"""
        WITH p AS (
          SELECT doc_id,
                 text || ' contact u' || doc_id || '@example.com tel +1 555 ' ||
                   lpad(CAST(doc_id % 1000 AS VARCHAR), 3, '0') || ' 0000' AS t
          FROM documents)
        SELECT doc_id,
               CAST(len(regexp_extract_all(t, '$EmailRe')) AS BIGINT) AS n_emails,
               CAST(len(regexp_extract_all(t, '$PhoneRe')) AS BIGINT) AS n_phones,
               md5(regexp_replace(regexp_replace(t, '$EmailRe', '<EMAIL>', 'g'),
                 '$PhoneRe', '<PHONE>', 'g')) AS redacted_md5
        FROM p"""),
      "PII redaction: email/phone detection counts + full-text redaction " +
        "(regexp in the RE2∩Java subset), verified by hashing the redacted " +
        "text cross-engine (pipeline ops brief: corpus scrubbing)."),

    // ------------------------------------------------- repetition filter
    Q(
      "q60_repetition_filter",
      (s, dir) => {
        // Gopher-style repetitiousness signals: max term-frequency ratio
        // and duplicate-token fraction; docs over threshold are flagged for
        // removal. One explode + (doc, word) count + per-doc rollup.
        val words = docs(s, dir)
          .select(col("doc_id"),
            explode(split(lower(col("text")), "[^\\p{L}\\p{Nd}]+")).as("w"))
          .filter(col("w") =!= "")
        words.groupBy(col("doc_id"), col("w")).agg(count(lit(1)).as("c"))
          .groupBy(col("doc_id"))
          .agg(sum(col("c")).as("total_words"),
            count(lit(1)).as("distinct_words"),
            max(col("c")).as("top_c"))
          .select(col("doc_id"), col("total_words"), col("distinct_words"),
            (col("top_c").cast("double") / col("total_words"))
              .as("top_word_ratio"),
            (lit(1.0) - col("distinct_words").cast("double") / col("total_words"))
              .as("dup_ratio"),
            ((col("top_c").cast("double") / col("total_words") > 0.2) ||
              (lit(1.0) - col("distinct_words").cast("double") / col("total_words") > 0.5))
              .cast("int").as("flagged"))
      },
      Some("""
        WITH w AS (
          SELECT doc_id, w
          FROM (SELECT doc_id,
                       unnest(string_split_regex(lower(text), '[^\pL\p{Nd}]+')) AS w
                FROM documents)
          WHERE w <> ''),
        wc AS (SELECT doc_id, w, COUNT(*) AS c FROM w GROUP BY 1, 2),
        agg AS (
          SELECT doc_id, CAST(SUM(c) AS BIGINT) AS total_words,
                 COUNT(*) AS distinct_words, MAX(c) AS top_c
          FROM wc GROUP BY 1)
        SELECT doc_id, total_words, distinct_words,
               CAST(top_c AS DOUBLE) / total_words AS top_word_ratio,
               1.0 - CAST(distinct_words AS DOUBLE) / total_words AS dup_ratio,
               CAST(CAST(top_c AS DOUBLE) / total_words > 0.2 OR
                 1.0 - CAST(distinct_words AS DOUBLE) / total_words > 0.5
                 AS INT) AS flagged
        FROM agg"""),
      "Repetition filter: max term-frequency ratio + duplicate-token " +
        "fraction per doc with removal flags (Gopher-style quality " +
        "heuristics; pipeline ops brief)."))
}
