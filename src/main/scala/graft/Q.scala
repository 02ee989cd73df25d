package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One verifiable query: a Spark rendition plus (when SQL-expressible) a
  * DuckDB oracle over the same parquet tables. The driver hash-compares the
  * two at sf0.01 (column names sorted, values hashed), so Spark column names
  * and oracle aliases MUST match, and value types must be exact
  * (decimal/long/string — no raw floats from non-deterministic summation
  * orders).
  */
final case class Q(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String],
    doc: String)

object Registry {
  def all: Seq[Q] =
    queries.Core.all ++
      queries.Stateful.all ++
      queries.Dwd.all ++
      pipelines.Pipelines.all ++
      pipelines.DwsTraffic.all ++
      queries.TextOps.all ++
      queries.Extras.all ++
      queries.DedupOps.all ++
      queries.SimilarityOps.all ++
      queries.MultimodalOps.all ++
      queries.CorpusOps.all ++
      queries.ClusterOps.all ++
      queries.BucketedOps.all ++
      queries.PartitionedOps.all
}
