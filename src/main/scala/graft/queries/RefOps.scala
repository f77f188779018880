package graft.queries

import graft.Q

object RefOps {
  val all: Seq[Q] = Seq()
}
