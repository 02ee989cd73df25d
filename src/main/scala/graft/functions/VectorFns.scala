package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector expressions shared by the similarity/dedup operators: left-fold
  * double dot products (bit-identical to DuckDB's list_dot_product) and
  * deterministic random-hyperplane LSH bucketing (seeded by plane index —
  * no stored model).
  */
object VectorFns {

  /** Left-fold dot product of two double-array columns. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Component d of deterministic hyperplane p: sin(p*131 + d*7919). */
  def planeDot(v: Column, p: Int): Column =
    aggregate(
      transform(v, (x, i) => x * sin(lit(p * 131).cast("double") + i * 7919)),
      lit(0.0), (acc, x) => acc + x)

  /** L banded bucket ids over `bits` hyperplanes each (sign-bit packing).
    * Collision probability per table is (1 - θ/π)^bits — high for
    * near-duplicates, vanishing for unrelated vectors.
    */
  def buckets(v: Column, tables: Int, bits: Int): Seq[Column] =
    (0 until tables).map { t =>
      (0 until bits)
        .map(b => when(planeDot(v, t * bits + b) >= 0, lit(1L << b)).otherwise(lit(0L)))
        .reduce(_ + _).as(s"bucket$t")
    }
}
