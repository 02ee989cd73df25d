package graft.streaming

import graft.functions.MinHash
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One LSH band assignment of an arriving document. */
final case class BandHit(band: Int, bkey: String, docId: Long)

/** A near-dup candidate pair, canonically ordered (i < j). */
final case class NearDupPair(i: Long, j: Long)

/** Streaming MinHash-LSH near-dup detection — the ingest-time complement
  * of the batch q36/q57 family: detect that an arriving document
  * near-duplicates something ALREADY INGESTED, at arrival time, without a
  * batch pass. Signatures are the in-row [[MinHash]] expressions (pure
  * projection — legal on an unbounded frame); candidate pairs come from
  * keyed state per (band, bkey) bucket holding the members seen so far.
  *
  * At 100 TB ingest: state is per-bucket member lists, i.e. proportional
  * to documents whose signatures actually collide (the same set the batch
  * band join materializes) — capped at `maxBucket` members so a
  * degenerate bucket (a giant near-identical cluster that exact dedup
  * should have collapsed upstream) cannot grow state without bound. An
  * arrival at a FULL bucket still pairs against the stored members (it is
  * the doc most likely to be a duplicate) but is NOT stored — so the
  * miss class under the cap is exactly pairs among post-cap arrivals:
  * two docs that both land at an already-full bucket never pair with
  * each other (unless another band catches them). Streamed ≡ batch-q36
  * equivalence therefore holds only while no bucket exceeds `maxBucket`;
  * operators sizing the cap for a real ingest trade that recall loss for
  * the state bound. Per-arrival emission stays bounded by `maxBucket`
  * per band and state by `maxBucket` members per bucket.
  *
  * Emitted pairs may repeat across bands (the batch pipeline `.distinct()`s
  * the same way); consumers dedup downstream — StreamingLshSpec proves the
  * distinct streamed set equals batch q36's staged pair set exactly.
  */
object StreamingLsh {

  /** Band assignments for each document of an (optionally streaming)
    * frame with `doc_id` and `text` columns: one [[BandHit]] row per
    * (doc, band). Gram-less docs (< 3 tokens) have no signature and
    * produce no rows, the batch contract.
    */
  def bandAssignments(df: DataFrame): Dataset[BandHit] = {
    import df.sparkSession.implicits._
    df.select(col("doc_id"), MinHash.gramHashes(col("text")).as("hvs"))
      .filter(size(col("hvs")) > 0)
      .select(col("doc_id"), MinHash.sig(col("hvs")).as("sig"))
      .select(col("doc_id"), explode(MinHash.bandsOfSig(col("sig"))).as("bb"))
      .select(col("bb.band").as("band"), col("bb.bkey").as("bkey"),
        col("doc_id").as("docId"))
      .as[BandHit]
  }

  /** Candidate pair emission over keyed bucket state. Within a micro-batch
    * members process in docId order (deterministic); a pair emits once per
    * band it collides in, ordered i < j.
    */
  def pairs(ds: Dataset[BandHit], maxBucket: Int = 100): Dataset[NearDupPair] = {
    import ds.sparkSession.implicits._
    ds.groupByKey(h => (h.band, h.bkey))
      .flatMapGroupsWithState[List[Long], NearDupPair](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (_: (Int, String), hits: Iterator[BandHit], state: GroupState[List[Long]]) =>
          var members = state.getOption.getOrElse(Nil)
          val out = Seq.newBuilder[NearDupPair]
          hits.toSeq.sortBy(_.docId).foreach { h =>
            if (!members.contains(h.docId)) {
              // ALWAYS pair the arrival against the stored members (≤ cap
              // of them) — an arrival at a full bucket is the doc MOST
              // likely to be a duplicate, so the cap must bound state and
              // per-arrival emission, never silence detection
              members.foreach { m =>
                out += (if (m < h.docId) NearDupPair(m, h.docId)
                        else NearDupPair(h.docId, m))
              }
              if (members.size < maxBucket) members = h.docId :: members
            }
          }
          state.update(members)
          out.result().iterator
      }
  }
}
