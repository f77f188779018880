package graft.queries

import graft.Q

object TextOps {
  val all: Seq[Q] = Seq()
}
