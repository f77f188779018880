package graft.queries

import graft.Q

object Relational {
  val all: Seq[Q] = Seq()
}
