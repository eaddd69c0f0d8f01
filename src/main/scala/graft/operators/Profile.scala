package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** One-pass column profiling (data-quality stats) — the reference's per-file
  * metadata capture generalized to columns: for each requested numeric
  * column, non-null / null / distinct counts and rounded min/max/mean,
  * emitted one row per column.
  *
  * Scale notes: a single aggregation job regardless of column count. The
  * multiple count(DISTINCT) are handled by Catalyst's expand rewrite — one
  * shuffle with an expand factor of #cols, never #cols separate scans. At
  * 100 TB pass `approx = true`: approx_count_distinct's HLL sketches merge
  * map-side, dropping the expand entirely (profile cost becomes one narrow
  * partial-agg pass over the scan).
  */
object Profile {
  def numeric(df: DataFrame, cols: Seq[String], approx: Boolean = false): DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")
    val aggs = count(lit(1)).as("__n") +: cols.flatMap { c =>
      Seq(
        count(col(c)).as(s"__nn_$c"),
        (if (approx) approx_count_distinct(col(c)) else countDistinct(col(c))).as(s"__dc_$c"),
        round(min(col(c)).cast("double"), 2).as(s"__min_$c"),
        round(max(col(c)).cast("double"), 2).as(s"__max_$c"),
        round(avg(col(c)), 2).as(s"__avg_$c"))
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val rows = cols.map { c =>
      struct(
        lit(c).as("col_name"),
        col(s"__nn_$c").as("non_null"),
        (col("__n") - col(s"__nn_$c")).as("nulls"),
        col(s"__dc_$c").as("n_distinct"),
        col(s"__min_$c").as("min_v"),
        col(s"__max_$c").as("max_v"),
        col(s"__avg_$c").as("avg_v"))
    }
    one.select(explode(array(rows: _*)).as("p")).select(col("p.*")).orderBy(col("col_name"))
  }
}
