package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing for LLM training data: assign documents to fixed
  * token-budget context windows ("bins") in a deterministic document order.
  *
  * The assignment is the parallel-friendly running-budget rule: a document's
  * bin is the number of COMPLETE budget units filled before it
  * (`floor(prev_cumsum / budget)`). A bin may overflow by at most one
  * document — the standard streaming-packing tradeoff — but the rule is a
  * window cumsum, reproducible in any engine (the DuckDB oracle runs the
  * same arithmetic). True bin packing is sequential; don't do it on 100 TB.
  *
  * SCALE: an unpartitioned ordered window funnels everything into ONE task —
  * [[withBin]] keeps that form only as the tiny-input oracle shape.
  * [[withBinDistributed]] computes the IDENTICAL global assignment as a
  * two-pass distributed prefix sum (range-shard → per-shard totals →
  * per-shard offset + local window), so the exact semantics survive 100 TB.
  * [[withBinSharded]] is the alternative relaxation: one independent bin
  * sequence per shard key, when bins need not be globally numbered.
  */
object Packing {

  /** Global single-sequence packing (exact, single ordered window — the
    * oracle shape; use [[withBinDistributed]] beyond one-task data sizes). */
  def withBin(df: DataFrame, orderCol: String, tokenCol: Column, budget: Int): DataFrame =
    binned(df, Window.orderBy(col(orderCol)), tokenCol, budget)

  /** Distributed EXACT global packing — same output as [[withBin]], no
    * one-task window. Classic two-pass prefix sum: range-partition by
    * `orderCol` (contiguous ordered shards; RangePartitioner's ids are
    * range-ordered, so shard p holds keys strictly below shard p+1), sum
    * tokens per shard, collect the O(shards) totals to the driver, turn
    * them into per-shard running offsets, then compute each shard's local
    * ordered cumsum in parallel and add its offset. `localCheckpoint` pins
    * the shard assignment so both passes see the same partitioning. */
  def withBinDistributed(df: DataFrame, orderCol: String, tokenCol: Column,
      budget: Int, shards: Int = 0): DataFrame = {
    val n = math.max(1, if (shards > 0) shards
      else df.sparkSession.sparkContext.defaultParallelism)
    val sharded = df
      .repartitionByRange(n, col(orderCol))
      .withColumn("__tokens", tokenCol)
      .withColumn("__pid", spark_partition_id())
      .localCheckpoint()
    // coalesce: a shard whose __tokens are ALL NULL sums to NULL — it must
    // contribute a zero offset (withBin's window on the same data likewise
    // nulls those rows' cum/bin), not crash the totals collect
    val totals = sharded.groupBy(col("__pid"))
      .agg(coalesce(sum(col("__tokens")).cast("long"), lit(0L)).as("__t"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap // O(shards) rows
    val offsets = (0 until n).map { p =>
      p -> (0 until p).map(totals.getOrElse(_, 0L)).sum
    }.toMap
    val w = Window.partitionBy(col("__pid")).orderBy(col(orderCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    sharded
      .withColumn("__cum",
        sum(col("__tokens")).over(w) + element_at(typedLit(offsets), col("__pid")))
      .withColumn("bin", floor((col("__cum") - col("__tokens")) / budget).cast("long"))
      .drop("__pid")
  }

  /** Sharded packing: one independent bin sequence per `shardCols` value,
    * all shards packed in parallel. `bin` is unique within a shard; the
    * (shard, bin) pair is the global window id. */
  def withBinSharded(df: DataFrame, shardCols: Seq[String], orderCol: String,
      tokenCol: Column, budget: Int): DataFrame = {
    require(shardCols.nonEmpty, "use withBin for the global (unsharded) form")
    binned(df, Window.partitionBy(shardCols.map(col): _*).orderBy(col(orderCol)),
      tokenCol, budget)
  }

  private def binned(df: DataFrame, spec: org.apache.spark.sql.expressions.WindowSpec,
      tokenCol: Column, budget: Int): DataFrame = {
    val w = spec.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("__tokens", tokenCol)
      .withColumn("__cum", sum(col("__tokens")).over(w))
      .withColumn("bin", floor((col("__cum") - col("__tokens")) / budget).cast("long"))
  }

  /** Bin summary: docs per bin and total tokens per bin. Runs the
    * distributed exact form — output is identical to the global window. */
  def packSummary(df: DataFrame, orderCol: String, tokenCol: Column, budget: Int): DataFrame =
    withBinDistributed(df, orderCol, tokenCol, budget)
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("docs"), sum(col("__tokens")).as("tokens"))
      .orderBy(col("bin"))
}
