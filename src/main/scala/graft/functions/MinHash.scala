package graft.functions

import graft.functions.TextFns.{tokens, wordNgrams}
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** MinHash-LSH signature/band expressions computed IN-ROW — per-doc
  * distinct 3-grams, one md5 per gram, all permutation minima in one
  * native codegen pass ([[MinHashSig]]) — a pure projection with no
  * explode and no shuffle. Being stateless, it applies to a STREAMING
  * DataFrame unchanged: this is the signature path of
  * streaming/StreamingLsh.scala. Batch (DedupOps.minhashBands) keeps its
  * explode + hash-aggregate form instead — measured FASTER (2.59 vs
  * ~3.7 s cold at sf0.1, before AND after nativizing the minima: the
  * residual cost is md5 inside an interpreted transform() lambda vs
  * codegen'd md5 over exploded rows) — and StreamingLshSpec pins the two
  * renditions equal. Parameters match the DuckDB oracle CTEs in DedupOps
  * (8 permutations, 4 bands of 2, P = 2^31-1).
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

  /** The doc's full permutation-minima signature (array<long> of length
    * [[Perms]]) via the native [[MinHashSig]] expression: one codegen'd
    * pass over the hash array instead of eight interpreted
    * array_min(transform(...)) walks. Null for gram-less docs — callers
    * filter `size(gramHashes) > 0` first (the explode+groupBy batch
    * form's contract: no grams, no signature).
    */
  def sig(hvs: Column): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      MinHashSig(org.apache.spark.sql.graft.ColumnBridge.expression(hvs)))

  /** `(band, bkey)` LSH assignments from a materialized signature column —
    * keep `sig` in its own projection so the native expression evaluates
    * once per row, not once per element_at reference.
    */
  def bandsOfSig(sigCol: Column): Column =
    array((0 until Bands).map(bi =>
      struct(lit(bi).as("band"),
        concat_ws(":", element_at(sigCol, 2 * bi + 1),
          element_at(sigCol, 2 * bi + 2)).as("bkey"))): _*)
}
