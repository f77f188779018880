package graft.queries

import graft.Q

object DedupOps {
  val all: Seq[Q] = Seq()
}
