package graft.queries

import graft.Q

object ScalarFns {
  val all: Seq[Q] = Seq()
}
