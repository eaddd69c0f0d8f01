package graft.queries

import graft.GQuery

/** T4–T25 (SURVEY.md §2.2–2.6): predicates, joins, aggregation, windows,
  * sort/limit/set ops. Filled in incrementally. */
object RelationalQueries {
  def all: Seq[GQuery] = Seq.empty
}
