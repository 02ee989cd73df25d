package graft.functions

import graft.functions.TextFns.{tokens, wordNgrams}
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** MinHash-LSH signature/band expressions computed IN-ROW with
  * higher-order functions — per-doc distinct 3-grams, one md5 per gram,
  * eight permutation minima via array_min(transform(...)) — a pure
  * projection with no explode and no shuffle. Being stateless, it applies
  * to a STREAMING DataFrame unchanged: this is the signature path of
  * streaming/StreamingLsh.scala. Batch (DedupOps.minhashBands) keeps its
  * explode + hash-aggregate form instead — measured FASTER (2.59 vs
  * 3.78 s cold at sf0.1: the codegen'd aggregate beats the interpreted
  * HOF chain) — and StreamingLshSpec pins the two renditions equal.
  * Parameters match the DuckDB oracle CTEs in DedupOps (8 permutations,
  * 4 bands of 2, P = 2^31-1).
  */
object MinHash {
  val Perms = 8
  val Bands = 4
  val P = 2147483647L
  def a(j: Int): Long = 1000003L * (j + 1)
  def b(j: Int): Long = 7919L * (j + 1)

  /** 32-bit md5-prefix gram hashes of the doc's distinct 3-grams ([] when
    * the doc has fewer than 3 tokens).
    */
  def gramHashes(text: Column): Column =
    transform(array_distinct(wordNgrams(tokens(text), 3)),
      g => conv(substring(md5(g), 1, 8), 16, 10).cast("long"))

  /** The doc's `(band, bkey)` LSH assignments as an array of structs —
    * NULL-free only when the doc has at least one gram; callers filter
    * `size(gramHashes) > 0` first (gram-less docs have no signature, the
    * same contract as the explode+groupBy form this replaced).
    */
  def bandArray(hvs: Column): Column = {
    val sigs = (0 until Perms).map(j =>
      array_min(transform(hvs, h => pmod(lit(a(j)) * h + lit(b(j)), lit(P)))))
    val bands = (0 until Bands).map(bi =>
      struct(lit(bi).as("band"),
        concat_ws(":", sigs(2 * bi), sigs(2 * bi + 1)).as("bkey")))
    array(bands: _*)
  }
}
