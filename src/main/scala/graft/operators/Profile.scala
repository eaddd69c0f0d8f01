package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
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

  /** Distribution-drift monitor: per-bucket population-stability-index
    * contributions of `value` between the two slices selected by the
    * boolean `isRef` (true = reference/baseline slice, false = current).
    * Equal-width buckets over the FIXED range [lo, hi) (bounds are part of
    * the monitoring contract, pinned from the reference period — deriving
    * them per-run would make drift self-normalizing and invisible);
    * out-of-range values clamp to the edge buckets. Per bucket:
    * counts, fractions, and `(p_ref − p_cur) · ln(p_ref / p_cur)` in exact
    * integer micro-units (the l26 float-determinism contract — both engines
    * do the same IEEE double ops, then one integral rounding). Empty-on-
    * both-sides buckets are omitted; one-sided zeros are floored at `eps`
    * (the standard PSI guard). Total PSI = sum(psi_micro) / 1e6, left to
    * the caller so the per-bucket attribution stays visible.
    *
    * Scale shape: ONE hash aggregation on the bucket key (map-side
    * partials over the scan — the corpus is never shuffled, only ≤ nBuckets
    * partial rows per task), then window totals over ≤ nBuckets rows.
    * Monitoring 100 TB costs one narrow pass. */
  def psi(df: DataFrame, value: Column, isRef: Column,
      lo: Double, hi: Double, nBuckets: Int, eps: Double = 1e-6): DataFrame = {
    require(nBuckets > 0 && hi > lo, s"psi needs hi > lo and nBuckets > 0")
    val width = (hi - lo) / nBuckets
    val bucket = least(greatest(floor((value - lo) / width), lit(0.0)),
      lit((nBuckets - 1).toDouble)).cast("int")
    val counts = df.select(bucket.as("bucket"), isRef.as("__ref"))
      .groupBy(col("bucket"))
      .agg(sum(when(col("__ref"), 1L).otherwise(0L)).as("cnt_ref"),
        sum(when(!col("__ref"), 1L).otherwise(0L)).as("cnt_cur"))
    val all = Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val pRef = greatest(col("cnt_ref") / sum(col("cnt_ref")).over(all), lit(eps))
    val pCur = greatest(col("cnt_cur") / sum(col("cnt_cur")).over(all), lit(eps))
    counts.select(col("bucket"), col("cnt_ref"), col("cnt_cur"),
        round((pRef - pCur) * log(pRef / pCur) * lit(1000000.0)).cast("long").as("psi_micro"))
      .orderBy(col("bucket"))
  }

  /** Per-bucket counts of `value` over the [[psi]] bucket contract,
    * collected to the driver (≤ nBuckets longs) — the PINNED reference
    * histogram a monitor compares later slices against. */
  def bucketCounts(df: DataFrame, value: Column,
      lo: Double, hi: Double, nBuckets: Int): Seq[Long] = {
    require(nBuckets > 0 && hi > lo, "bucketCounts needs hi > lo and nBuckets > 0")
    val width = (hi - lo) / nBuckets
    val bucket = least(greatest(floor((value - lo) / width), lit(0.0)),
      lit((nBuckets - 1).toDouble)).cast("int")
    val got = df.select(bucket.as("bucket")).groupBy(col("bucket"))
      .agg(count(lit(1)).as("c")).collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    (0 until nBuckets).map(got.getOrElse(_, 0L))
  }

  /** [[psi]] of `df`'s `value` against a PINNED reference histogram
    * (`refCounts`, one count per bucket as from [[bucketCounts]]) — the
    * monitoring shape where the reference period is computed once and
    * every later slice compares against it. Unlike [[psi]], ALL buckets
    * appear in the output (a bucket the current slice abandoned still
    * contributes drift). One aggregation over `df` + a ≤ nBuckets-row
    * grid join; the reference travels as a literal array, never a join
    * side. Caller guards the empty slice (no rows → every p_cur floors at
    * eps and the PSI is meaningless). */
  def psiAgainst(df: DataFrame, value: Column, refCounts: Seq[Long],
      lo: Double, hi: Double, eps: Double = 1e-6): DataFrame = {
    val n = refCounts.size
    require(n > 0 && hi > lo, "psiAgainst needs hi > lo and a non-empty reference")
    val width = (hi - lo) / n
    val bucket = least(greatest(floor((value - lo) / width), lit(0.0)),
      lit((n - 1).toDouble)).cast("int")
    val counts = df.select(bucket.as("bucket"))
      .groupBy(col("bucket")).agg(count(lit(1)).as("cnt_cur"))
    val spark = df.sparkSession
    val grid = spark.range(n).select(col("id").cast("int").as("bucket"))
    val refArr = array(refCounts.map(lit(_)): _*)
    val refTotal = math.max(refCounts.sum, 1L).toDouble
    val all = Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val full = grid.join(counts, Seq("bucket"), "left")
      .select(col("bucket"),
        element_at(refArr, col("bucket") + 1).as("cnt_ref"),
        coalesce(col("cnt_cur"), lit(0L)).as("cnt_cur"))
    val pRef = greatest(col("cnt_ref") / lit(refTotal), lit(eps))
    val pCur = greatest(col("cnt_cur") / sum(col("cnt_cur")).over(all), lit(eps))
    full.select(col("bucket"), col("cnt_ref"), col("cnt_cur"),
        round((pRef - pCur) * log(pRef / pCur) * lit(1000000.0)).cast("long").as("psi_micro"))
      .orderBy(col("bucket"))
  }
}
