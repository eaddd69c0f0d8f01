package graft.queries

import graft.GQuery

/** T26–T29 (SURVEY.md §2.7): scalar function families vs the oracle. */
object FunctionQueries {
  def all: Seq[GQuery] = Seq.empty
}
