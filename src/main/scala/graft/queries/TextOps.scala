package graft.queries

import graft.Q

/** Text-analysis operators for LLM training-data pipelines: language ID,
  * quality scoring, token counting, fingerprinting. Filled in wave 3.
  */
object TextOps {
  val all: Seq[Q] = Seq()
}
