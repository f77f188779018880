package graft.queries

import graft.Q

object Windows {
  val all: Seq[Q] = Seq()
}
