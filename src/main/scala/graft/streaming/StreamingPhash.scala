package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One dHash band assignment of an arriving image (signature carried for
  * the Hamming verify at pair time).
  */
final case class PhashHit(band: Int, bv: Long, docId: Long, sig: Long)

/** A stored bucket member: doc plus its full 56-bit signature. */
final case class PhashMember(docId: Long, sig: Long)

/** A VERIFIED perceptual near-dup pair, canonically ordered (i < j). */
final case class PhashPair(i: Long, j: Long, hamming: Int)

/** Streaming perceptual near-dup detection — batch q163's ingest-time
  * twin, landing the same round as its batch op (the StreamingLsh
  * discipline applied to the pixel modality): detect that an arriving
  * image perceptually near-duplicates something ALREADY INGESTED, at
  * arrival time. The SIGNATURE SOURCE is a parameter, not a modality:
  * [[bandAssignments]] takes any (doc_id, dhash) 56-bit signature frame,
  * so q177's audio energy-contour fingerprints ride the identical
  * operator (StreamingPhashSpec's audio leg proves streamed ≡ batch
  * q177) — one twin for the whole perceptual-signature family, no
  * per-modality copies. The decode (PGM parse → 56-bit gradient
  * dHash) is stateless executor-side work, legal on an unbounded frame;
  * banding is q163's pigeonhole geometry (4 × 14-bit bands — d ≤ 3 flips
  * break at most 3 bands, so every qualifying pair shares an intact
  * band), in-row via shift/mask expressions.
  *
  * Unlike the MinHash twin, candidates VERIFY before emission: bucket
  * state stores (docId, sig) so an arrival computes bit_count(xor)
  * against each stored member and only pairs within `maxHamming` emit —
  * the streamed output is verified pairs, exactly the batch contract,
  * never raw candidates.
  *
  * State bound (100 TB ingest): per-bucket member lists capped at
  * `maxBucket` — identical-pixel floods collide on ALL bands by
  * construction, and the cap bounds that cluster's state and pairwork.
  * An arrival at a full bucket still verifies against the stored
  * members but is not stored (the StreamingLsh rule). The cap SEMANTICS
  * deliberately differ from batch q163's: batch drops an over-cap
  * bucket WHOLESALE — a rule a streaming operator cannot replay,
  * because an arrival that tips a bucket over the cap would have to
  * RETRACT already-emitted pairs. The twin's first-cap-members rule is
  * the monotone (append-only) rendition, and it strictly DOMINATES:
  * batch pairs come only from under-cap buckets, which the twin stores
  * in full, so streamed ⊇ batch ALWAYS; on a corpus where no bucket
  * exceeds the cap the two are equal; and every streamed extra is a
  * pair whose shared bands are all over-cap (pairs batch's cap
  * silenced). StreamingPhashSpec proves all three facts — the exact
  * equality on an under-cap corpus, and the dominance + confined-extra
  * contract on the full synthetic corpus, whose all-ones-gradient
  * bucket holds ~76% of docs (the cap adversary, better than any
  * planted fixture).
  *
  * Pairs may repeat across bands (batch `.distinct()`s the same way);
  * consumers dedup downstream. Emitted Hamming distances are exact, so
  * streamed rows carry the same (i, j, hamming) values as batch rows.
  *
  * Re-delivery caveat (same class as the repeat-across-bands one): a
  * STORED member's docId re-arriving is skipped by the `members.exists`
  * check, but a doc that arrived at an already-FULL bucket is verified
  * and not stored — so under at-least-once upstream delivery its
  * re-arrival re-verifies and re-emits its pairs. Emitted values are
  * identical either way (signatures are content-derived), so the
  * downstream pair-dedup that already handles cross-band repeats
  * absorbs this too; remembering seen-but-unstored ids would grow
  * state UNBOUNDED on exactly the flood the cap exists to bound.
  */
object StreamingPhash {

  /** In-row band assignments over a `(doc_id, dhash)` frame: one
    * [[PhashHit]] per (doc, band), 4 bands × 14 bits — the same
    * shift/mask split batch q163 explodes.
    */
  def bandAssignments(sigs: DataFrame): Dataset[PhashHit] = {
    import sigs.sparkSession.implicits._
    sigs
      .select(col("doc_id"), col("dhash"),
        posexplode(array((0 until 4).map(b =>
          shiftright(col("dhash"), 14 * b).bitwiseAND(16383)): _*))
          .as(Seq("band", "bv")))
      .select(col("band").cast("int").as("band"), col("bv"),
        col("doc_id").as("docId"), col("dhash").as("sig"))
      .as[PhashHit]
  }

  /** Verified pair emission over keyed bucket state. Within a micro-batch
    * members process in docId order (deterministic); a pair emits once
    * per band it collides in, ordered i < j, only if its exact Hamming
    * distance is within `maxHamming`.
    */
  def pairs(ds: Dataset[PhashHit], maxBucket: Int = 100,
      maxHamming: Int = 3): Dataset[PhashPair] = {
    import ds.sparkSession.implicits._
    ds.groupByKey(h => (h.band, h.bv))
      .flatMapGroupsWithState[List[PhashMember], PhashPair](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (_: (Int, Long), hits: Iterator[PhashHit],
            state: GroupState[List[PhashMember]]) =>
          var members = state.getOption.getOrElse(Nil)
          val out = Seq.newBuilder[PhashPair]
          hits.toSeq.sortBy(_.docId).foreach { h =>
            if (!members.exists(_.docId == h.docId)) {
              // always VERIFY the arrival against the stored members (≤
              // cap of them) — the cap bounds state and per-arrival work,
              // never silences detection (the StreamingLsh rule)
              members.foreach { m =>
                val d = java.lang.Long.bitCount(m.sig ^ h.sig)
                if (d <= maxHamming)
                  out += (if (m.docId < h.docId)
                    PhashPair(m.docId, h.docId, d)
                  else PhashPair(h.docId, m.docId, d))
              }
              if (members.size < maxBucket)
                members = PhashMember(h.docId, h.sig) :: members
            }
          }
          state.update(members)
          out.result().iterator
      }
  }
}
