package graft.queries

import graft.Q

object Similarity {
  val all: Seq[Q] = Seq()
}
