package graft.queries

import graft.QueryRegistry.Qf

/** Deduplication operators over `documents` (built out in a later slice). */
object DedupOps {
  val defs: Seq[(String, Qf, Option[String])] = Seq.empty
}
