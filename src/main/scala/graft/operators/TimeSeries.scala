package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Regular-grid resampling for sparse time series: build the full
  * key × calendar grid, left-join observed per-bucket aggregates, zero-fill
  * the declared count columns, and forward-fill the declared measure columns
  * with the latest preceding observation (leading buckets with no prior
  * observation stay NULL — the caller decides their default).
  *
  * Scale notes: the grid is keys × buckets — tiny relative to the raw
  * input — and the observed side arrives as a map-side-combined aggregate,
  * so the join broadcasts whichever side is small. The forward fill is ONE
  * window pass partitioned BY KEY, never a global order-by: series fill in
  * parallel and window state is a single running value per frame. Skewed
  * key cardinality doesn't matter (the window input is grid-sized).
  */
object TimeSeries {
  def gapFill(
      keys: DataFrame,
      calendar: DataFrame,
      observed: DataFrame,
      keyCols: Seq[String],
      bucketCol: String,
      zeroFill: Map[String, Column],
      forwardFill: Seq[String]): DataFrame = {
    val grid = keys.crossJoin(calendar)
    val joined = grid.join(observed, keyCols :+ bucketCol, "left")
    val w = Window
      .partitionBy(keyCols.map(col): _*)
      .orderBy(col(bucketCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val zf = zeroFill.foldLeft(joined) { case (d, (c, z)) => d.withColumn(c, coalesce(col(c), z)) }
    forwardFill.foldLeft(zf) { case (d, c) =>
      d.withColumn(c, last(col(c), ignoreNulls = true).over(w))
    }
  }
}
