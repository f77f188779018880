package graft.queries

import graft.Q

object MultimodalOps {
  val all: Seq[Q] = Seq()
}
