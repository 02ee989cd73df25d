package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Shared text/hash expressions for the LLM-pipeline operators. Everything
  * here is a pure Catalyst expression (codegen'd, no UDFs) with an exact
  * DuckDB-SQL counterpart so the oracle can replay it:
  *   hash32(s)  ≡  CAST(('0x' || substr(md5(s),1,8)) AS BIGINT)
  *   tokens(s)  ≡  string_split(s, ' ')
  *   ngrams     ≡  array_to_string(tk[i:i+n-1], ' ') over generate_series
  */
object TextFns {

  /** Whitespace tokens (exact split on single space, like string_split). */
  def tokens(c: Column): Column = split(c, " ")

  /** Lowercased, whitespace-collapsed normalization for dedup. */
  def normText(c: Column): Column =
    trim(regexp_replace(lower(c), "\\s+", " "))

  /** Word n-grams as an array column ([] when fewer than n tokens). */
  def wordNgrams(toks: Column, n: Int): Column =
    when(size(toks) >= n,
      transform(sequence(lit(0), size(toks) - n),
        i => concat_ws(" ", slice(toks, i + lit(1), lit(n)))))
      .otherwise(array().cast("array<string>"))

  /** Deterministic 32-bit string hash via the first 8 hex digits of md5 —
    * chosen over Spark's murmur3 `hash()` because both engines can compute
    * it identically (the oracle contract above).
    */
  def hash32(c: Column): Column =
    conv(substring(md5(c), 1, 8), 16, 10).cast("long")

  /** Deterministic 60-bit string hash: first 15 hex digits of md5, so the
    * value fits a signed BIGINT in BOTH engines (16 digits could exceed
    * Long.MaxValue, which Spark's string→long cast nulls and DuckDB
    * errors on). 60 bits hold up to five disjoint 12-bit — or three
    * disjoint 20-bit — probe windows, which is what makes sized Bloom
    * filters with INDEPENDENT probes possible (hash32's 32 bits cannot
    * hold three disjoint 12-bit windows; see [[BloomFns]]).
    * DuckDB replay: CAST(('0x' || substr(md5(s),1,15)) AS BIGINT).
    */
  def hash60(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  /** Tokens of `c` that appear in `words`. */
  def tokensIn(toks: Column, words: Seq[String]): Column =
    filter(toks, t => array_contains(array(words.map(lit): _*), t))

  /** Stopword lists for the language-ID heuristic (q33). */
  val StopEn = Seq("the", "a", "of", "and", "to", "is")
  val StopDe = Seq("der", "die", "und", "das", "ist", "ein")
  val StopFr = Seq("le", "la", "les", "et", "est", "une")
  val StopEs = Seq("el", "los", "las", "y", "es", "por")
}
