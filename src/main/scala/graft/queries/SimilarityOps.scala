package graft.queries

import graft.Q

/** Similarity search over embeddings: brute-force cosine top-k + LSH/IVF
  * scale path. Filled in wave 3.
  */
object SimilarityOps {
  val all: Seq[Q] = Seq()
}
