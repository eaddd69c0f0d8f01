package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Interval/range joins at scale (SURVEY.md §2.3 J10).
  *
  * The naive form `l ⋈ r ON key ∧ r.ts ∈ (l.ts, l.ts + w]` plans as a
  * broadcast nested loop (or a per-key cross product after the equi part) —
  * fine at test scale, quadratic per hot key at 100 TB. The bucketed form
  * quantizes time into w-sized buckets: a qualifying right row lands either
  * in the left row's bucket or the next one, so exploding the left side
  * into those two candidate buckets turns the range condition into an
  * EQUI-join on (key, bucket) with the exact predicate as a residual
  * filter. Output is exactly the naive join's (the bucket map is a
  * superset cover, the residual prunes it); cost is a hash shuffle where
  * rows pair only within w-sized neighborhoods.
  */
object IntervalJoin {

  /** Pairs of (left, right) rows with equal `keys` and
    * `right.tsCol ∈ (left.tsCol, left.tsCol + windowMicros]`, as an
    * equi-join on (keys, bucket). Both inputs need `tsCol` in microseconds
    * (long). Left columns come out with prefix `l_`, right with `r_`. */
  def within(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      tsCol: String,
      windowMicros: Long): DataFrame = {
    val lCols = left.columns.map(c => col(c).as(s"l_$c"))
    val rCols = right.columns.map(c => col(c).as(s"r_$c"))
    // integral `div`, NOT floor(Column./): Column./ is double division, and
    // beyond 2^53 µs its rounding can shift a bucket id by one, silently
    // dropping qualifying pairs. `div` truncates toward zero, so correct to
    // floor semantics on negative non-multiples.
    def bucket(name: String): Column = {
      val d = expr(s"`$name` div ${windowMicros}L")
      when(col(name) < 0 && pmod(col(name), lit(windowMicros)) =!= 0, d - 1)
        .otherwise(d)
    }
    val l = left.select(lCols.toSeq: _*)
      .withColumn("__b", explode(array(
        bucket(s"l_$tsCol"),
        bucket(s"l_$tsCol") + 1)))
    val r = right.select(rCols.toSeq: _*)
      .withColumn("__b", bucket(s"r_$tsCol"))
    val keyCond = keys.map(k => col(s"l_$k") === col(s"r_$k")).reduce(_ && _)
    l.join(r, keyCond && l("__b") === r("__b") &&
        col(s"r_$tsCol") > col(s"l_$tsCol") &&
        col(s"r_$tsCol") <= col(s"l_$tsCol") + windowMicros)
      .drop(l("__b")).drop(r("__b"))
  }
}
