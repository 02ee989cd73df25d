package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Probe geometry for a sized Bloom filter over the 60-bit
  * [[TextFns.hash60]]: `bits` (a power of two) fixes the window width
  * `log2(bits)`, and the `probes` windows are taken at DISJOINT offsets
  * 0, w, 2w, … of the hash — possible because 60 bits hold e.g. three
  * 17-bit or five 12-bit windows, so the independent-probe false-positive
  * formula (1 - e^(-kn/m))^k actually applies (unlike the legacy 32-bit
  * geometry, whose overlapping windows it over-promises for). Sizing rule
  * for a real run: pick bits ≥ ~16 × |held-out grams| for fp ≈ 10³ ppm at
  * k = 3 — then MEASURE fp against the exact join (q132's in-row
  * discipline) before trusting it at 100 TB.
  */
final case class BloomSizing(bits: Int, probes: Int) {
  require(bits >= BloomFns.WordBits && Integer.bitCount(bits) == 1,
    s"bits must be a power of two >= ${BloomFns.WordBits}, got $bits")
  val window: Int = Integer.numberOfTrailingZeros(bits)
  // long multiply: an absurd probe count must hit this require, not
  // overflow Int and slip past it into a giant offsets Seq
  require(probes >= 1 && probes.toLong * window <= 60L,
    s"$probes disjoint $window-bit windows need ${probes.toLong * window} bits; hash60 has 60")
  val offsets: Seq[Int] = (0 until probes).map(_ * window)
}

/** Deterministic Bloom-filter expressions shared by batch q130/q132 and the
  * streaming ingest-decontamination twin, in two geometries:
  *
  *   - LEGACY ([[build]]/[[mightContain]]): 4096 bits, 3 probes from
  *     12-bit windows of the 32-bit [[TextFns.hash32]] at offsets 0/12/20
  *     — NOTE the third window overlaps the second by 4 bits (32 bits
  *     cannot hold three disjoint 12-bit windows), so the probes are
  *     correlated and the real false-positive rate is higher than k=3
  *     independent-probe math predicts. That is exactly why q130 MEASURES
  *     fp_ppm against the exact join instead of quoting the formula.
  *   - SIZED ([[buildSized]]/[[mightContainSized]]): bits/probes are
  *     [[BloomSizing]] parameters over the 60-bit [[TextFns.hash60]],
  *     windows disjoint — the geometry a 100k+-gram held-out set needs
  *     (the legacy 4096 bits saturate to fp ≈ 1 there). q132 keeps the
  *     same measured-fp discipline at 32× the bits.
  *
  * Every bit position is replayable by the DuckDB oracle, so the filter
  * built here and the one the SQL rebuilds relationally are bit-identical.
  *
  * The probe is a pure projection against a LITERAL word array: the filter
  * ships inside the plan to every executor regardless of the indexed set's
  * size, zero joins on the probed path, streaming-legal on an unbounded
  * frame — and a pure Column function, so it composes into
  * higher-order-function lambdas (the in-row per-document form).
  */
object BloomFns {

  val Bits = 4096
  val WordBits = 32
  /** Legacy geometry: 12-bit windows of hash32 at 0/12/20 (overlapping). */
  private val LegacyWindow = 12
  private val LegacyOffsets = Seq(0, 12, 20)

  private def setBits(words: Array[Long], h: Long, window: Int, offsets: Seq[Int]): Unit = {
    val mask = (1L << window) - 1
    offsets.foreach { off =>
      val b = ((h >>> off) & mask).toInt
      words(b / WordBits) |= 1L << (b % WordBits)
    }
  }

  /** Build the legacy 4096-bit word array from the indexed hash32 values
    * (driver-side — the indexed set is small by the operator's premise;
    * the model-build step, like q128's PQ codebook).
    */
  def build(hashes: Iterable[Long]): Array[Long] = {
    val words = new Array[Long](Bits / WordBits)
    hashes.foreach(setBits(words, _, LegacyWindow, LegacyOffsets))
    words
  }

  /** Build a [[BloomSizing]]-geometry word array from hash60 values. */
  def buildSized(hashes: Iterable[Long], sz: BloomSizing): Array[Long] = {
    val words = new Array[Long](sz.bits / WordBits)
    hashes.foreach(setBits(words, _, sz.window, sz.offsets))
    words
  }

  /** 1 iff every probe bit of hash column `h` is set in the literal
    * `words` filter — the map-side membership test. The in-word mask is
    * pow(2, k) cast to long (exact for k ≤ 31 — bit-identical to
    * 1L << k), because shift functions take literal amounts only and this
    * must stay a pure Column expression.
    */
  private def probeAll(words: Array[Long], h: Column, window: Int, offsets: Seq[Int]): Column = {
    val bloom = typedLit(words.toSeq)
    val mask = lit((1L << window) - 1)
    def probe(bit: Column): Column =
      (element_at(bloom, floor(bit / WordBits).cast("int") + 1)
        .bitwiseAND(
          pow(lit(2.0), pmod(bit, lit(WordBits)).cast("double")).cast("long"))
        =!= 0L).cast("int")
    least(offsets.map(off => probe(shiftright(h, off).bitwiseAND(mask))): _*)
  }

  /** Legacy-geometry membership test over a hash32 column. */
  def mightContain(words: Array[Long], h: Column): Column =
    probeAll(words, h, LegacyWindow, LegacyOffsets)

  /** Sized-geometry membership test over a hash60 column. */
  def mightContainSized(words: Array[Long], h: Column, sz: BloomSizing): Column =
    probeAll(words, h, sz.window, sz.offsets)
}
