package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gaps-and-islands sessionization (SURVEY.md §2.5 W4 / B9, parity oracle for
  * §2.8 ST3). Single shuffle on the key; window functions only — linear at
  * scale, no self-join.
  */
object Sessionize {

  /** Adds `__is_start` (1 when the row opens a new session) and
    * `__session_id` (1-based per key) columns.
    *
    * A row opens a new session when it is the key's first row or the gap to
    * the previous row strictly exceeds `gapMicros` microseconds. Comparison
    * is done in integer microseconds (`unix_micros`) so Spark and DuckDB
    * (`epoch_us`) agree bit-for-bit (SURVEY.md §0 rule on ns→µs).
    */
  def withSessionId(
      df: DataFrame,
      key: String,
      ts: String,
      tieBreak: String,
      gapMicros: Long,
      strictGreater: Boolean = true): DataFrame = {
    val w = Window.partitionBy(col(key)).orderBy(col(ts).asc, col(tieBreak).asc)
    // NTZ tolerance: reinterpret wall-clock as UTC for the gap arithmetic —
    // gaps are differences, so the uniform shift cancels
    val us = df.schema(ts).dataType match {
      case org.apache.spark.sql.types.TimestampNTZType =>
        unix_micros(col(ts).cast(org.apache.spark.sql.types.TimestampType))
      case _ => unix_micros(col(ts))
    }
    val prev = lag(us, 1).over(w)
    val gapCond: Column =
      if (strictGreater) us - prev > gapMicros else us - prev >= gapMicros
    val isStart = when(prev.isNull || gapCond, 1).otherwise(0)
    df.withColumn("__is_start", isStart)
      .withColumn(
        "__session_id",
        sum(col("__is_start")).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
  }

  /** Total session count across all keys. */
  def sessionCount(df: DataFrame, key: String, ts: String, tieBreak: String, gapMicros: Long): DataFrame =
    withSessionId(df, key, ts, tieBreak, gapMicros)
      .agg(sum(col("__is_start")).cast("long").as("sessions"))
}
