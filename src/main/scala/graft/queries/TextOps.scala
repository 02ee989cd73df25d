package graft.queries

import graft.{Q, Tables}
import graft.functions.TextFns._
import org.apache.spark.sql.functions._

/** Text-analysis operators for a training-data pipeline over the `documents`
  * table: token counting, quality scoring, document fingerprinting, and
  * n-gram language ID. All are per-row projections + one aggregation-free
  * scan — they pipeline inside whole-stage codegen with no shuffle, so at
  * 100 TB they run at scan speed.
  */
object TextOps {

  val all: Seq[Q] = Seq(
    // ------------------------------------------- token/quality/fingerprint
    Q(
      "q32_text_stats",
      (s, dir) => {
        val toks = tokens(col("text"))
        Tables(s, dir, "documents")
          .select(
            col("doc_id"),
            size(toks).cast("long").as("n_tokens"),
            length(col("text")).cast("long").as("n_chars_txt"),
            // BPE-ish token estimate: ~4 chars per subword token
            ceil(length(col("text")) / 4.0).cast("long").as("est_bpe_tokens"),
            size(tokensIn(toks, StopEn)).cast("long").as("stop_ct"),
            (size(tokensIn(toks, StopEn)).cast("double") /
              size(toks).cast("double")).as("stop_ratio"),
            md5(col("text")).as("fingerprint"))
      },
      Some("""
        SELECT doc_id,
               CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
               CAST(length(text) AS BIGINT) AS n_chars_txt,
               CAST(ceil(length(text) / 4.0) AS BIGINT) AS est_bpe_tokens,
               CAST(len(list_filter(string_split(text, ' '),
                 t -> t IN ('the','a','of','and','to','is'))) AS BIGINT) AS stop_ct,
               CAST(len(list_filter(string_split(text, ' '),
                 t -> t IN ('the','a','of','and','to','is'))) AS DOUBLE)
                 / CAST(len(string_split(text, ' ')) AS DOUBLE) AS stop_ratio,
               md5(text) AS fingerprint
        FROM documents"""),
      "Text stats: whitespace+BPE-estimate token counts, stopword quality " +
        "ratio, md5 content fingerprint (X2-adjacent; pipeline ops brief)."),

    // ----------------------------------------------------------- language ID
    Q(
      "q33_langid",
      (s, dir) => {
        val toks = tokens(col("text"))
        val cEn = size(tokensIn(toks, StopEn))
        val cDe = size(tokensIn(toks, StopDe))
        val cFr = size(tokensIn(toks, StopFr))
        val cEs = size(tokensIn(toks, StopEs))
        // argmax with fixed tie order en > de > fr > es (deterministic)
        val pred = when(cEn >= cDe && cEn >= cFr && cEn >= cEs, "en")
          .when(cDe >= cFr && cDe >= cEs, "de")
          .when(cFr >= cEs, "fr")
          .otherwise("es")
        Tables(s, dir, "documents")
          .select(col("doc_id"), col("lang"), pred.as("pred_lang"))
          .withColumn("is_match", col("lang") === col("pred_lang"))
      },
      Some("""
        WITH c AS (
          SELECT doc_id, lang,
            len(list_filter(string_split(text,' '), t -> t IN ('the','a','of','and','to','is'))) AS c_en,
            len(list_filter(string_split(text,' '), t -> t IN ('der','die','und','das','ist','ein'))) AS c_de,
            len(list_filter(string_split(text,' '), t -> t IN ('le','la','les','et','est','une'))) AS c_fr,
            len(list_filter(string_split(text,' '), t -> t IN ('el','los','las','y','es','por'))) AS c_es
          FROM documents)
        SELECT doc_id, lang,
               CASE WHEN c_en >= c_de AND c_en >= c_fr AND c_en >= c_es THEN 'en'
                    WHEN c_de >= c_fr AND c_de >= c_es THEN 'de'
                    WHEN c_fr >= c_es THEN 'fr'
                    ELSE 'es' END AS pred_lang,
               lang = (CASE WHEN c_en >= c_de AND c_en >= c_fr AND c_en >= c_es THEN 'en'
                    WHEN c_de >= c_fr AND c_de >= c_es THEN 'de'
                    WHEN c_fr >= c_es THEN 'fr'
                    ELSE 'es' END) AS is_match
        FROM c"""),
      "Language ID via stopword-hit n-gram heuristic with deterministic " +
        "argmax (pipeline ops brief; X2 tokenizer-analog path)."),

    // ------------------------------------------------ BPE-ish pretokenizer
    Q(
      "q61_bpe_pretokenize",
      (s, dir) => {
        // GPT-2-style pretokenizer restricted to the RE2∩Java regex subset
        // (contraction suffixes, space-prefixed letter/number runs,
        // punctuation runs, whitespace runs; the original's trailing-space
        // lookahead is dropped — RE2 has no lookahead). Token COUNTS, not
        // merges: the pretokenize pass is the part of BPE that runs at
        // corpus scan speed and sizes a training corpus in tokens.
        val pat = "'(?:s|t|re|ve|m|ll|d)| ?\\p{L}+| ?\\p{N}+| ?[^\\s\\p{L}\\p{N}]+|\\s+"
        val wordPat = " ?\\p{L}+"
        val nTok = size(regexp_extract_all(col("text"), lit(pat), lit(0))).cast("long")
        Tables(s, dir, "documents")
          .select(col("doc_id"),
            nTok.as("n_bpe_tokens"),
            size(regexp_extract_all(col("text"), lit(wordPat), lit(0)))
              .cast("long").as("n_word_tokens"),
            when(nTok > 0, length(col("text")).cast("double") / nTok)
              .as("chars_per_token"))
      },
      {
        val sqlPat =
          "'(?:s|t|re|ve|m|ll|d)| ?\\p{L}+| ?\\p{N}+| ?[^\\s\\p{L}\\p{N}]+|\\s+"
            .replace("'", "''")
        Some(s"""
        WITH t AS (
          SELECT doc_id, length(text) AS n_chars,
                 CAST(len(regexp_extract_all(text, '$sqlPat')) AS BIGINT) AS n_bpe_tokens,
                 CAST(len(regexp_extract_all(text, ' ?\\p{L}+')) AS BIGINT) AS n_word_tokens
          FROM documents)
        SELECT doc_id, n_bpe_tokens, n_word_tokens,
               CASE WHEN n_bpe_tokens > 0
                    THEN CAST(n_chars AS DOUBLE) / n_bpe_tokens END AS chars_per_token
        FROM t""")
      },
      "BPE-ish pretokenizer counts (GPT-2 pattern in the RE2∩Java subset): " +
        "corpus sizing in subword-ish tokens at scan speed " +
        "(pipeline ops brief: token counting)."))
}
