package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.expr

/** The q138 log-histogram bucket arithmetic — ONE definition site shared
  * by the batch sketch (queries/CorpusOps q138) and its streaming twin
  * (streaming/StreamingSketch), so the two can never drift.
  *
  * Bucket id for a POSITIVE long `w`: values < 16 are exact singleton
  * buckets; otherwise id = (L−2)·8 + top-3-bits-after-MSB, with
  * L = floor(log2 w) — i.e. gamma = 2^(1/8) log-spaced buckets (≤ ~6%
  * worst-case relative error at the midpoint representative). Pure
  * integer shifts (no libm), monotone in `w`, and a pure projection —
  * streaming-legal, codegen-friendly, engine-agnostic.
  */
object LogHistogram {

  /** Bucket id of the positive long column named `w`. */
  def bid(w: String): Column = expr(
    s"CASE WHEN $w < 16 THEN $w " +
      s"ELSE (length(bin($w)) - 3) * 8 + " +
      s"shiftright($w, cast(length(bin($w)) - 4 as int)) - 8 END")

  /** Midpoint representative of bucket id column `b`: for b >= 16,
    * L = b div 8 + 2, m = b % 8, lower = (8+m)·2^(L-3),
    * upper = (9+m)·2^(L-3) − 1; smaller bids are exact singletons.
    */
  def rep(b: String): Column = expr(
    s"CASE WHEN $b < 16 THEN $b ELSE " +
      s"((8 + $b % 8) * shiftleft(cast(1 as bigint), " +
      s"cast($b div 8 - 1 as int)) + " +
      s"(9 + $b % 8) * shiftleft(cast(1 as bigint), " +
      s"cast($b div 8 - 1 as int)) - 1) div 2 END")
}

/** The linear-counting estimator (Whang, Vander-Zanden & Taylor, TODS
  * 1990) — ONE definition site for every occupancy-bitmap cardinality
  * estimate (q134 vocabulary, q140 windowed users, and q140's streaming
  * twin), so the batch queries and the streaming form cannot drift:
  * n̂ = m·ln(m/(m−k)) from occupancy k; saturation (k = m) reports null
  * rather than ln(inf). The ln() argument is confined positive and both
  * engines evaluate the identical double quotient (the q134 rationale).
  */
object LinearCounting {
  import org.apache.spark.sql.functions.{lit, log, round, when}

  def estimate(occupied: Column, m: Int): Column =
    when(occupied === m, lit(null).cast("long"))
      .otherwise(round(lit(m.toDouble) *
        log(lit(m.toDouble) / (lit(m.toDouble) - occupied)))
        .cast("long"))
}
