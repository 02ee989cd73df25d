package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.unsafe.types.UTF8String

/** Content-defined chunking via a Rabin-Karp rolling hash (the brief's
  * "document fingerprinting (rolling hash)"): a 16-char window hash rolls
  * over the text; positions where its low 6 bits are zero cut chunk
  * boundaries (~64-char expected chunks), and each chunk is fingerprinted
  * with a polynomial hash. Insertions/deletions only perturb the chunks
  * they touch, so near-copies share most chunk fingerprints — the property
  * chunk-overlap dedup (q52) exploits.
  *
  * Exposed as a StaticInvoke expression (same pattern as the tokenizer):
  * operates on UTF8String, inlined in codegen, no UDF closures.
  */
object RollingHash {

  private final val Base = 1000003L
  private final val Window = 16
  private final val BoundaryMask = 0x3fL // avg chunk = 64 chars

  /** Chunk fingerprints of `s` as a long array (at least one chunk for
    * non-empty input).
    */
  def chunkHashes(s: UTF8String): ArrayData = {
    if (s == null) return null
    val str = s.toString
    val n = str.length
    if (n == 0) return new GenericArrayData(Array.empty[Any])
    // precomputed Base^(Window-1) for rolling removal
    var basePow = 1L
    var i = 1
    while (i < Window) { basePow *= Base; i += 1 }
    val out = Seq.newBuilder[Any]
    var winHash = 0L
    var chunkHash = 0L
    var chunkStart = 0
    i = 0
    while (i < n) {
      val c = str.charAt(i).toLong
      chunkHash = chunkHash * Base + c
      winHash = winHash * Base + c
      if (i >= Window) winHash -= basePow * Base * str.charAt(i - Window).toLong
      val boundary = i - chunkStart >= Window && (winHash & BoundaryMask) == 0L
      if (boundary || i == n - 1) {
        out += java.lang.Long.valueOf(chunkHash)
        chunkHash = 0L
        chunkStart = i + 1
      }
      i += 1
    }
    new GenericArrayData(out.result().toArray)
  }

  /** Column form: array&lt;long&gt; of chunk fingerprints. */
  def chunkFingerprints(c: Column): Column = {
    import org.apache.spark.sql.catalyst.expressions.objects.StaticInvoke
    import org.apache.spark.sql.graft.ColumnBridge
    import org.apache.spark.sql.types.{ArrayType, LongType, StringType}
    ColumnBridge.column(StaticInvoke(
      RollingHash.getClass,
      ArrayType(LongType),
      "chunkHashes",
      Seq(ColumnBridge.expression(c)),
      Seq(StringType)))
  }
}
