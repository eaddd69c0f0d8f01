package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.broadcast

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

  /** Broadcast `df` only when a bounded probe PROVES it holds at most
    * `maxRows` rows; otherwise fall back to a `shuffle_hash` hint — the
    * 100 TB-safe form: a spillable per-partition hash build on the same
    * side, no driver collect, no sort of the fact side.
    *
    * The probe materializes at most `maxRows + 1` rows: CollectLimit
    * scans partitions incrementally (1, then 4×, …) and stops as soon as
    * the bound is crossed, so on a frame that is huge at 100 TB the gate
    * costs one early-aborting job — it never counts the full frame. On a
    * frame that is genuinely small the probe computes it once more than
    * strictly necessary; callers for whom that matters can checkpoint
    * upstream. The default bound (1M rows) keeps a ~40-byte-wide
    * reduction under ~40 MB on the driver — comfortably inside executor
    * broadcast budgets. */
  def broadcastIfSmall(df: DataFrame, maxRows: Long = 1000000L): DataFrame = {
    require(maxRows > 0 && maxRows < Int.MaxValue, s"maxRows out of range: $maxRows")
    val n = df.limit(maxRows.toInt + 1).count()
    if (n <= maxRows) broadcast(df) else df.hint("shuffle_hash")
  }
}
