package graft.queries

import graft.GQuery

/** T1–T3 (SURVEY.md §2.1): CSV/JSONL round-trips and partitioned sinks. */
object IoQueries {
  def all: Seq[GQuery] = Seq.empty
}
