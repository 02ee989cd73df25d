package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Element-wise sum of long-array columns — the centroid-update partial
  * for the integer-lattice Lloyd refinement (q141). A typed `Aggregator`
  * rather than a posexplode→groupBy(dim) pivot because of the shuffle
  * shape: the explode form multiplies the mapper's row count by the
  * dimensionality before partial aggregation collapses it, while this
  * buffer folds each vector into one running array per (partition, group)
  * and ships exactly one `dims`-long array per partial — at 100 TB and
  * 64 dims that is the difference between touching 64× the corpus rows
  * and touching them once.
  *
  * All-integer on purpose: long addition is associative, so the merged
  * result is independent of partition count and merge order — the
  * property float k-means loses (summation-order nondeterminism across
  * 1000 executors) and the reason the whole q141 pipeline runs on a
  * quantized lattice.
  *
  * Null/ragged inputs: null and empty vectors are skipped (contribute
  * nothing, like SUM over a null) — and so is the empty ZERO buffer of an
  * all-null partition arriving at merge, or the skip contract would be
  * partition-layout-dependent; a dimension mismatch between two
  * NON-EMPTY vectors raises, because silently zip-truncating a drifted
  * embedding would corrupt every centroid it touches.
  */
object VecSumAgg extends Aggregator[Seq[Long], Array[Long], Seq[Long]] {
  override def zero: Array[Long] = Array.empty

  private def add(b: Array[Long], a: Seq[Long]): Array[Long] =
    if (a == null || a.isEmpty) b // null input, or an all-null partition's
    // empty (zero) partial arriving at merge — either is a no-op, or the
    // null-skip contract would become partition-layout-dependent
    else if (b.isEmpty) a.toArray
    else {
      require(b.length == a.length,
        s"VecSumAgg: dimension drift (${b.length} vs ${a.length})")
      var i = 0
      while (i < b.length) { b(i) += a(i); i += 1 }
      b
    }

  override def reduce(b: Array[Long], a: Seq[Long]): Array[Long] = add(b, a)
  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] =
    add(b1, b2.toSeq)
  override def finish(r: Array[Long]): Seq[Long] = r.toSeq
  override def bufferEncoder: Encoder[Array[Long]] = Encoders.kryo[Array[Long]]
  override def outputEncoder: Encoder[Seq[Long]] = ExpressionEncoder()
}
