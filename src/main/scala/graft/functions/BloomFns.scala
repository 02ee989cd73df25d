package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Deterministic Bloom-filter expressions shared by batch q130 and the
  * streaming ingest-decontamination twin: 4096 bits as 128 × 32-bit words
  * (sign-safe BIGINT masks), 3 probes per key from 12-bit windows of the
  * 32-bit [[TextFns.hash32]] value at offsets 0/12/20 — NOTE the third
  * window overlaps the second by 4 bits (32 bits cannot hold three
  * disjoint 12-bit windows), so the probes are correlated and the
  * filter's real false-positive rate is higher than k=3
  * independent-probe math predicts. That is exactly why q130 MEASURES
  * fp_ppm against the exact join instead of quoting the formula — size
  * the filter from the measured number. Every bit position is replayable
  * by the DuckDB oracle, so the filter built here and the one the SQL
  * rebuilds relationally are bit-identical.
  *
  * The probe is a pure projection against a LITERAL word array: kilobytes
  * on every executor regardless of the indexed set's size, zero joins on
  * the probed path, streaming-legal on an unbounded frame — and a pure
  * Column function, so it composes into higher-order-function lambdas
  * (the in-row per-document form).
  */
object BloomFns {

  val Bits = 4096
  val WordBits = 32

  /** Build the word array from the indexed hash32 values (driver-side —
    * the indexed set is small by the operator's premise; the model-build
    * step, like q128's PQ codebook).
    */
  def build(hashes: Iterable[Long]): Array[Long] = {
    val words = new Array[Long](Bits / WordBits)
    hashes.foreach { h =>
      Seq(h & 4095L, (h >> 12) & 4095L, (h >> 20) & 4095L).foreach { b =>
        words(b.toInt / WordBits) |= 1L << (b.toInt % WordBits)
      }
    }
    words
  }

  /** 1 iff every probe bit of hash32 column `h` is set in the literal
    * `words` filter — the map-side membership test. The in-word mask is
    * pow(2, k) cast to long (exact for k ≤ 31 — bit-identical to
    * 1L << k), because shift functions take literal amounts only and this
    * must stay a pure Column expression.
    */
  def mightContain(words: Array[Long], h: Column): Column = {
    val bloom = typedLit(words.toSeq)
    def probe(bit: Column): Column =
      (element_at(bloom, floor(bit / WordBits).cast("int") + 1)
        .bitwiseAND(
          pow(lit(2.0), pmod(bit, lit(WordBits)).cast("double")).cast("long"))
        =!= 0L).cast("int")
    least(
      probe(h.bitwiseAND(lit(4095L))),
      probe(shiftright(h, 12).bitwiseAND(lit(4095L))),
      probe(shiftright(h, 20).bitwiseAND(lit(4095L))))
  }
}
