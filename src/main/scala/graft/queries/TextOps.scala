package graft.queries

import graft.QueryRegistry.Qf

/** Text-analysis operators over `documents` (built out in a later slice). */
object TextOps {
  val defs: Seq[(String, Qf, Option[String])] = Seq.empty
}
