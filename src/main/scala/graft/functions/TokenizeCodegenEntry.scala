package graft.functions

import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.unsafe.types.UTF8String

/** Static entry point for the codegen form of the tokenizer: operates on
  * Catalyst-internal types so `StaticInvoke` can inline a direct static call
  * inside whole-stage codegen — no UDF closure serialization, no per-row
  * Row↔Scala conversion (the brief's preference order: native expression >
  * Scala UDF).
  */
object TokenizeCodegenEntry {
  def analyzeUtf8(s: UTF8String): ArrayData = {
    if (s == null) return null
    val toks = Tokenize.analyze(s.toString)
    new GenericArrayData(toks.map(t => UTF8String.fromString(t): Any).toArray)
  }
}
