package graft.queries

import graft.Q

/** Multimodal (binary-column) plumbing: opaque binary + typed metadata,
  * decode/feature-extract stubs with real Spark-side schema/partitioning.
  * Filled in wave 3.
  */
object MultimodalOps {
  val all: Seq[Q] = Seq()
}
