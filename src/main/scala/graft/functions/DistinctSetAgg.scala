package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** A4 — the reference's exact distinct-order counting keeps a
  * `Set<String>` inside the accumulating bean and reads `set.size` at
  * window fire (ref RT/bean/TradeSkuOrderBean.java:42-44,
  * RT/app/dws/DwsTradeSkuOrderWindow.java:242-259). This is the same
  * semantics as a typed Spark `Aggregator` with a Set buffer: exact,
  * mergeable across partials, and usable as a column in both batch and
  * streaming aggregations.
  *
  * Scale note: the buffer is O(distinct values per group). That is the
  * reference's own cost; the 100 TB alternative is
  * `approx_count_distinct` (HLL sketch, O(1) per group) — asserted close
  * to this exact form in FunctionsSpec.
  */
object DistinctSetAgg extends Aggregator[String, Set[String], Long] {
  override def zero: Set[String] = Set.empty
  override def reduce(b: Set[String], a: String): Set[String] =
    if (a == null) b else b + a
  override def merge(b1: Set[String], b2: Set[String]): Set[String] = b1 union b2
  override def finish(r: Set[String]): Long = r.size.toLong
  override def bufferEncoder: Encoder[Set[String]] = Encoders.kryo[Set[String]]
  override def outputEncoder: Encoder[Long] = Encoders.scalaLong
}
