package graft.queries

import graft.Q

object StreamingOps {
  val all: Seq[Q] = Seq()
}
