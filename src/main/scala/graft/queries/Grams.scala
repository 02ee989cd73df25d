package graft.queries

import graft.Tables
import graft.functions.TextFns.{tokens, wordNgrams}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Session-staged hashed n-gram frames shared across the dedup/curation
  * family: one tokenize + explode per gram size serves every consumer
  * (n=5: q63 + the q120 funnel; n=10: q96 + q119). 16 B/row staged —
  * measured round 6 (see DedupOps.ngramSet for the string-vs-hash
  * staging history). At cluster scale this is a written gram staging
  * table, the same DWD materialization discipline as the envelope
  * staging.
  */
private[queries] object Grams {

  /** Distinct (doc_id, xxhash64(n-gram)) pairs over `documents`. Per-doc
    * distinctness is enforced in-row (array_distinct before the explode) —
    * a global .distinct() shuffles every pair for the identical result.
    */
  def hashed(s: SparkSession, dir: String, n: Int): DataFrame =
    graft.Staging.stage(s, dir, s"grams$n") {
      // parallelism-floored entry scan: a single-row-group corpus file
      // must not serialize the tokenize+explode on one core (Tables.parallel
      // is a passthrough on production multi-row-group layouts)
      Tables.parallel(s, dir, "documents").select(col("doc_id"),
          explode(array_distinct(wordNgrams(tokens(col("text")), n)))
            .as("gram"))
        .select(col("doc_id"), xxhash64(col("gram")).as("ng"))
    }
}
