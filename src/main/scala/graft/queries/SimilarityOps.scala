package graft.queries

import graft.QueryRegistry.Qf

/** Embedding similarity-search operators over `embeddings` (built out in a
  * later slice).
  */
object SimilarityOps {
  val defs: Seq[(String, Qf, Option[String])] = Seq.empty
}
