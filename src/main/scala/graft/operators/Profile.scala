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
    // Aliases are keyed by INDEX, not column name: a profiled column named
    // e.g. "a.b" would otherwise make col("__nn_a.b") parse as a struct-field
    // path (same index-keying Quality.check uses for its __v_$i columns).
    val aggs = count(lit(1)).as("__n") +: cols.zipWithIndex.flatMap { case (c, i) =>
      Seq(
        count(col(c)).as(s"__nn_$i"),
        (if (approx) approx_count_distinct(col(c)) else countDistinct(col(c))).as(s"__dc_$i"),
        round(min(col(c)).cast("double"), 2).as(s"__min_$i"),
        round(max(col(c)).cast("double"), 2).as(s"__max_$i"),
        round(avg(col(c)), 2).as(s"__avg_$i"))
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val rows = cols.zipWithIndex.map { case (c, i) =>
      struct(
        lit(c).as("col_name"),
        col(s"__nn_$i").as("non_null"),
        (col("__n") - col(s"__nn_$i")).as("nulls"),
        col(s"__dc_$i").as("n_distinct"),
        col(s"__min_$i").as("min_v"),
        col(s"__max_$i").as("max_v"),
        col(s"__avg_$i").as("avg_v"))
    }
    one.select(explode(array(rows: _*)).as("p")).select(col("p.*")).orderBy(col("col_name"))
  }
}
