package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.{broadcast, lit}

/** Size-gated join-side hints.
  *
  * An unconditional `broadcast()` hint OVERRIDES Spark's size threshold:
  * on a frame that grows with the fact tables it driver-OOMs at scale
  * instead of degrading. But dropping the hint isn't free either — the
  * frames these gates guard are usually post-join/post-filter reductions
  * whose STATIC size estimate is wildly wrong (checkpointed frames lose
  * stats entirely; multi-join reductions inherit the product estimate),
  * so Catalyst would pick a sort-merge join against the fact side. The
  * gate MEASURES instead of guessing, in bounded work. */
object JoinHints {

  // Gate decisions memoized per (canonical plan, bound) for the session:
  // repeated build()s of the same query (BenchProbe's per-phase timings,
  // plan dumps, retries) must not re-run probe jobs. The cache key is the
  // ANALYZED plan's semantic hash, so the same frame re-built from the
  // same source dir hits; a frame over data that MUTATES mid-session can
  // see a stale decision — call reset() after rewriting inputs (a wrong
  // decision degrades the plan, never the answer: both branches compute
  // identical results).
  private val decisions =
    new java.util.concurrent.ConcurrentHashMap[(Int, Long), java.lang.Boolean]()

  /** Drop every memoized gate decision (tests; mid-session data rewrites). */
  def reset(): Unit = decisions.clear()

  /** Broadcast `df` only when a bounded probe PROVES it holds at most
    * `maxRows` rows; otherwise fall back to a `shuffle_hash` hint — the
    * 100 TB-safe form: a spillable per-partition hash build on the same
    * side, no driver collect, no sort of the fact side.
    *
    * The probe is a 1-column-constant `take(maxRows + 1)`: Dataset.take
    * plans CollectLimit, whose executeTake scans partitions incrementally
    * (1, then 4×, …) and stops as soon as the bound is crossed — on a
    * frame that is huge at 100 TB the probe's RESULT stage aborts early.
    * What executeTake cannot skip is upstream exchanges: every shuffle
    * stage below `df` materializes fully before the first partition is
    * read, so when `df` is an expensive multi-join reduction the caller
    * should `localCheckpoint(false)` it first (t63 does) — the reduction
    * then runs once, the probe reads cached partitions, and the join
    * consumes the same cache. A raw-scan side (t64's customer) is cheaper
    * to recompute than to materialize; no checkpoint there. Driver cost
    * is bounded by maxRows+1 single-int rows (~tens of MB transient at
    * the 1M default — strictly less than what broadcasting the full-width
    * frame would collect). */
  def broadcastIfSmall(df: DataFrame, maxRows: Long = 1000000L): DataFrame = {
    require(maxRows > 0 && maxRows < Int.MaxValue, s"maxRows out of range: $maxRows")
    val key = (df.queryExecution.analyzed.semanticHash(), maxRows)
    val small = Option(decisions.get(key)).map(_.booleanValue).getOrElse {
      val fits = df.select(lit(1).as("__probe")).take(maxRows.toInt + 1)
        .length <= maxRows
      if (decisions.size > 1024) decisions.clear() // unbounded-session backstop
      decisions.put(key, fits)
      fits
    }
    if (small) broadcast(df) else df.hint("shuffle_hash")
  }
}
