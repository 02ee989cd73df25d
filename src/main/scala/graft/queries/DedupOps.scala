package graft.queries

import graft.Q

/** Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard,
  * embedding-cosine near-dup. Filled in wave 3.
  */
object DedupOps {
  val all: Seq[Q] = Seq()
}
