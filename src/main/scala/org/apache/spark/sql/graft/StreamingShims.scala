package org.apache.spark.sql.graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical.LocalRelation
import org.apache.spark.sql.execution.datasources.LogicalRelation
import org.apache.spark.sql.execution.streaming.{Offset => V1Offset}
import org.apache.spark.sql.execution.streaming.runtime.LongOffset

/** The lake streaming sources' ONE internal-API touchpoint, isolated in a
  * `org.apache.spark.sql` subpackage for `private[sql]` access — the same
  * packaging move every external v1 connector makes (the open Delta
  * connector ships its source in `org.apache.spark.sql.delta`).
  *
  * Spark's v1 `Source.getBatch` contract requires the returned DataFrame's
  * plan to report `isStreaming = true` (MicroBatchExecution asserts it
  * before transplanting the plan into the micro-batch), but the flag lives
  * on leaf nodes and no public API sets it on an existing plan —
  * `FileStreamSource` builds its `LogicalRelation(..., isStreaming=true)`
  * directly. [[asStreamingBatch]] does the equivalent for an arbitrary
  * already-built batch plan.
  */
object StreamingShims {

  /** Re-tag `df` so its plan reports `isStreaming = true`.
    *
    * Exactly ONE leaf is marked (the leftmost-deepest relation — the main
    * data scan, since the lake readers keep broadcast/anti-join helpers on
    * the right). One marked leaf makes every ancestor report
    * `isStreaming`, which is all the engine asserts; marking EVERY leaf
    * would be wrong, not just unnecessary — the plan's internal joins
    * (deletion-vector anti joins, partition-value broadcasts) would then
    * look stream-stream to IncrementalExecution's join strategy and plan
    * stateful symmetric-hash joins where ordinary hash joins belong. */
  def asStreamingBatch(df: DataFrame): DataFrame = {
    var marked = false
    val plan = df.queryExecution.analyzed.transformUp {
      case lr: LogicalRelation if !marked =>
        marked = true
        lr.copy(isStreaming = true)
      case lr: LocalRelation if !marked =>
        marked = true
        lr.copy(isStreaming = true)
    }
    require(marked,
      s"no relation leaf to mark as streaming in plan:\n${df.queryExecution.analyzed}")
    org.apache.spark.sql.classic.Dataset.ofRows(
      df.sparkSession.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)
  }

  /** A v1 offset carrying a long (Delta version / Iceberg snapshot id). */
  def longOffset(v: Long): V1Offset = LongOffset(v)

  /** The long back out of any offset the engine hands us — live
    * `LongOffset`s within a run, `SerializedOffset` JSON on checkpoint
    * recovery (both serialize as the bare number). */
  def offsetValue(o: V1Offset): Long = o match {
    case LongOffset(v) => v
    case other => other.json.trim.toLong
  }
}
