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

  /** [[zcluster]]'s Hilbert twin: range-partition into `targetFiles`
    * curve-contiguous partitions, sort within each. One stats pass + one
    * shuffle, identical cost shape to z-clustering. */
  def hilbertCluster(df: DataFrame, xCol: String, yCol: String,
      targetFiles: Int, bits: Int = 12): DataFrame =
    withHilbertValue(df, xCol, yCol, "__h", bits)
      .repartitionByRange(targetFiles, col("__h"))
      .sortWithinPartitions(col("__h"))
      .drop("__h")

  /** [[zorderWrite]]'s Hilbert twin. */
  def hilbertWrite(df: DataFrame, xCol: String, yCol: String, path: String,
      targetFiles: Int, bits: Int = 12): Unit =
    hilbertCluster(df, xCol, yCol, targetFiles, bits)
      .write.mode("overwrite").parquet(path)
}
