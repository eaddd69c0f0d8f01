package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-layout operators for write-time clustering (the Delta/Iceberg
  * OPTIMIZE ZORDER idea, re-expressed over plain parquet).
  *
  * Why it matters at 100 TB: parquet scans skip files/row-groups via
  * min/max statistics. A linear sort clusters ONE column — filters on any
  * other column still touch every file. Z-ordering interleaves the bits of
  * several columns so files cover small hyper-rectangles of the combined
  * key space: a selective filter on ANY of the z-columns prunes most files.
  */
object Layout {

  /** Map a numeric column to an integer rank in [0, 2^bits) by linear
    * min/max scaling (one stats pass, computed by the caller). */
  private def scaled(c: Column, cmin: Column, cmax: Column, bits: Int): Column = {
    val span = cmax.cast("double") - cmin.cast("double")
    val unit = (c.cast("double") - cmin.cast("double")) /
      when(span === 0, lit(1.0)).otherwise(span)
    least(greatest(round(unit * ((1L << bits) - 1)).cast("long"), lit(0L)),
      lit((1L << bits) - 1))
  }

  /** Z-value (Morton code) of the given numeric columns: per-column linear
    * scale to `bits` bits, then bit interleave — column j contributes bit i
    * to z-bit `i * n + j`. Pure codegen'd bit arithmetic (an expression
    * tree of shifts/ors, no UDF). `n * bits` must be ≤ 63. */
  def zvalue(cols: Seq[Column], mins: Seq[Column], maxs: Seq[Column], bits: Int = 12): Column = {
    val n = cols.size
    require(n * bits <= 63, s"z-value needs $n*$bits bits; must fit a long")
    val ranks = cols.lazyZip(mins).lazyZip(maxs).map((c, lo, hi) => scaled(c, lo, hi, bits))
    ranks.zipWithIndex.flatMap { case (r, j) =>
      (0 until bits).map(i => shiftleft(shiftright(r, i).bitwiseAND(lit(1L)), i * n + j))
    }.reduce(_.bitwiseOR(_))
  }

  /** Compaction for scan parallelism (OPTIMIZE without a clustering key):
    * rewrite `df` as `targetFiles` parquet files. Parquet readers split work
    * at row-group granularity, so a table written as one giant row group
    * scans as ONE task no matter how many executors exist; compacting to
    * right-sized files restores scan-side parallelism. At 100 TB this is the
    * routine small-file/bad-layout maintenance job; locally it turns the
    * driver-generated single-row-group test tables into splittable inputs. */
  def compact(df: DataFrame, path: String, targetFiles: Int): Unit =
    df.repartition(targetFiles).write.mode("overwrite").parquet(path)

  /** Rewrite `df` into `targetFiles` files clustered by the z-order of
    * `zCols`: one stats pass for min/max, range-partition by z-value (equal
    * row counts per file via range partitioning on the 1-D z key), sort
    * within partitions, write. At scale this is the compaction-time layout
    * job; the stats pass and the shuffle are both single linear passes. */
  def zorderWrite(df: DataFrame, zCols: Seq[String], path: String, targetFiles: Int,
      bits: Int = 12): Unit =
    zcluster(df, zCols, targetFiles, bits).write.mode("overwrite").parquet(path)

  /** The clustering half of [[zorderWrite]] as a transform: range-partition
    * `df` into `targetFiles` z-contiguous partitions and sort within each —
    * the shape the lake writers' `compact(zorderBy = …)` stages through
    * their own commit machinery. One stats pass + one shuffle. */
  def zcluster(df: DataFrame, zCols: Seq[String], targetFiles: Int,
      bits: Int = 12): DataFrame = {
    val aggs = zCols.flatMap(c => Seq(min(col(c)), max(col(c))))
    val stats = df.agg(aggs.head, aggs.tail: _*).head()
    val mins = zCols.indices.map(i => lit(stats.get(2 * i)))
    val maxs = zCols.indices.map(i => lit(stats.get(2 * i + 1)))
    df.withColumn("__z", zvalue(zCols.map(col), mins, maxs, bits))
      .repartitionByRange(targetFiles, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
  }

  /** 2-D HILBERT index of two numeric columns (the locality-tighter
    * alternative to [[zvalue]]: consecutive Hilbert cells are always
    * grid-adjacent, where the Morton curve jumps across the key space at
    * every power-of-two boundary — so Hilbert-clustered files cover
    * tighter hyper-rectangles and range filters prune a little better on
    * the same budget). Classic bit-level construction (Hamilton's xy2d):
    * per level, the quadrant digit joins `d` and the frame rotates.
    *
    * Implementation note: the per-level rotation rewrites BOTH x and y
    * in terms of both — as one nested Column expression the tree would
    * grow 3^bits nodes, so [[withHilbertValue]] materializes each level
    * as a projection (named columns re-used, total plan size linear in
    * `bits`, all of it codegen'd arithmetic — no UDF). */
  def withHilbertValue(df: DataFrame, xCol: String, yCol: String,
      out: String, bits: Int = 12): DataFrame = {
    require(2 * bits <= 62, s"hilbert needs 2*$bits d-bits; must fit a long")
    val aggs = Seq(min(col(xCol)), max(col(xCol)), min(col(yCol)), max(col(yCol)))
    val stats = df.agg(aggs.head, aggs.tail: _*).head()
    val hx = scaled(col(xCol), lit(stats.get(0)), lit(stats.get(1)), bits)
    val hy = scaled(col(yCol), lit(stats.get(2)), lit(stats.get(3)), bits)
    val n1 = lit((1L << bits) - 1) // reflection uses the FULL grid size
    var cur = df.withColumn("__hx", hx).withColumn("__hy", hy)
      .withColumn(out, lit(0L))
    for (i <- (bits - 1) to 0 by -1) {
      val s = lit(1L << i)
      val rx = when(col("__hx").bitwiseAND(s) > 0, lit(1L)).otherwise(lit(0L))
      val ry = when(col("__hy").bitwiseAND(s) > 0, lit(1L)).otherwise(lit(0L))
      val nd = col(out) + s * s * ((lit(3L) * rx).bitwiseXOR(ry))
      val refl = rx === 1 // && ry === 0, but the rewrite is gated on ry below
      val nx = when(ry === 0, when(refl, n1 - col("__hy")).otherwise(col("__hy")))
        .otherwise(col("__hx"))
      val ny = when(ry === 0, when(refl, n1 - col("__hx")).otherwise(col("__hx")))
        .otherwise(col("__hy"))
      cur = cur.withColumn("__nx", nx).withColumn("__ny", ny).withColumn(out, nd)
        .withColumn("__hx", col("__nx")).withColumn("__hy", col("__ny"))
        .drop("__nx", "__ny")
    }
    cur.drop("__hx", "__hy")
  }

  /** N-DIMENSIONAL Hilbert index (Skilling's transpose construction —
    * "Programming the Hilbert curve", AIP Conf. Proc. 707, 2004): the
    * same strict locality as the 2-D form ([[withHilbertValue]]) for ANY
    * column count `zcluster` accepts, so the maintenance surface never
    * has to fall back to Morton for 3+ clustering columns.
    *
    * Construction, all pure codegen'd bit arithmetic (no UDF): scale each
    * column to `bits`-bit ranks, run Skilling's per-level invert/exchange
    * sweep (each (level, axis) step materialized as its own projection —
    * plan size linear in `bits * n`, same trick as the 2-D form), apply
    * the closed-form Gray encode (cumulative XOR down the axes) and the
    * trailing-axis correction mask, then bit-interleave the transposed
    * axes MSB-first into one long. `n * bits` must be ≤ 62. */
  def withHilbertValueN(df: DataFrame, cols: Seq[String], out: String,
      bits: Int = 12): DataFrame = {
    val n = cols.size
    require(n >= 2, s"hilbert needs ≥2 columns, got $cols")
    require(n * bits <= 62, s"hilbert needs $n*$bits d-bits; must fit a long")
    val aggs = cols.flatMap(c => Seq(min(col(c)), max(col(c))))
    val stats = df.agg(aggs.head, aggs.tail: _*).head()
    def ax(j: Int) = col(s"__ha$j")
    var cur = cols.zipWithIndex.foldLeft(df) { case (d, (c, j)) =>
      d.withColumn(s"__ha$j",
        scaled(col(c), lit(stats.get(2 * j)), lit(stats.get(2 * j + 1)), bits))
    }
    // inverse-undo sweep: Q = 2^(bits-1) … 2; per axis, invert axis 0 when
    // the Q-bit is set, else swap the low P bits of axis 0 and axis j
    for (lvl <- (bits - 1) to 1 by -1; j <- 0 until n) {
      val q = lit(1L << lvl)
      val p = lit((1L << lvl) - 1L)
      val cond = ax(j).bitwiseAND(q) > 0
      if (j == 0) {
        cur = cur.withColumn("__ha0",
          when(cond, ax(0).bitwiseXOR(p)).otherwise(ax(0)))
      } else {
        val t = when(cond, lit(0L))
          .otherwise(ax(0).bitwiseXOR(ax(j)).bitwiseAND(p))
        cur = cur
          .withColumn("__ht", t)
          .withColumn("__ha0",
            when(cond, ax(0).bitwiseXOR(p)).otherwise(ax(0).bitwiseXOR(col("__ht"))))
          .withColumn(s"__ha$j",
            when(cond, ax(j)).otherwise(ax(j).bitwiseXOR(col("__ht"))))
          .drop("__ht")
      }
    }
    // Gray encode: in-place X[j] ^= X[j-1] has the closed form
    // X[j]' = X[0] ^ … ^ X[j] — one projection
    val grayed = (0 until n).map(j => (0 to j).map(ax).reduce(_.bitwiseXOR(_)))
    cur = (0 until n).foldLeft(cur) { (d, j) =>
      d.withColumn(s"__hg$j", grayed(j))
    }
    def gx(j: Int) = col(s"__hg$j")
    // trailing-axis correction: t = XOR of (Q-1) for every Q-bit set in
    // the LAST grayed axis; applied to every axis
    val tMask = (1 until bits).map { lvl =>
      when(gx(n - 1).bitwiseAND(lit(1L << lvl)) > 0, lit((1L << lvl) - 1L))
        .otherwise(lit(0L))
    }.reduceOption(_.bitwiseXOR(_)).getOrElse(lit(0L))
    cur = cur.withColumn("__hm", tMask)
    // interleave the transposed axes MSB-first: bit L of axis j lands at
    // index-bit L*n + (n-1-j)
    val h = (for (lvl <- 0 until bits; j <- 0 until n) yield
      shiftleft(shiftright(gx(j).bitwiseXOR(col("__hm")), lvl).bitwiseAND(lit(1L)),
        lvl * n + (n - 1 - j))).reduce(_.bitwiseOR(_))
    cur.withColumn(out, h)
      .drop((0 until n).map(j => s"__ha$j") ++ (0 until n).map(j => s"__hg$j")
        :+ "__hm": _*)
  }

  /** [[zcluster]]'s Hilbert twin: range-partition into `targetFiles`
    * curve-contiguous partitions, sort within each. One stats pass + one
    * shuffle, identical cost shape to z-clustering. Two columns use the
    * proven 2-D construction; 3+ the N-D transpose form. */
  def hilbertCluster(df: DataFrame, hCols: Seq[String], targetFiles: Int,
      bits: Int): DataFrame = {
    val withH =
      if (hCols.size == 2) withHilbertValue(df, hCols.head, hCols(1), "__h", bits)
      else withHilbertValueN(df, hCols, "__h", bits)
    withH.repartitionByRange(targetFiles, col("__h"))
      .sortWithinPartitions(col("__h"))
      .drop("__h")
  }

  /** 2-arg compatibility form of [[hilbertCluster]]. */
  def hilbertCluster(df: DataFrame, xCol: String, yCol: String,
      targetFiles: Int, bits: Int = 12): DataFrame =
    hilbertCluster(df, Seq(xCol, yCol), targetFiles, bits)

  /** [[zorderWrite]]'s Hilbert twin. */
  def hilbertWrite(df: DataFrame, xCol: String, yCol: String, path: String,
      targetFiles: Int, bits: Int = 12): Unit =
    hilbertCluster(df, Seq(xCol, yCol), targetFiles, bits)
      .write.mode("overwrite").parquet(path)
}
