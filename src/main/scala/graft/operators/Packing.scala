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
  * fine for the oracle-checked global form on test data, wrong at corpus
  * scale. [[withBinSharded]] is the 100 TB path: partition the window by a
  * shard key (e.g. a hash-bucket of the id) so each shard packs its own bins
  * in parallel; packing never needs to cross shards, since any shard's bins
  * are valid context windows on their own.
  */
object Packing {

  /** Global single-sequence packing (exact, single ordered window — the
    * oracle shape; use [[withBinSharded]] beyond one-executor data sizes). */
  def withBin(df: DataFrame, orderCol: String, tokenCol: Column, budget: Int): DataFrame =
    binned(df, Window.orderBy(col(orderCol)), tokenCol, budget)

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

  /** Bin summary: docs per bin and total tokens per bin. */
  def packSummary(df: DataFrame, orderCol: String, tokenCol: Column, budget: Int): DataFrame =
    withBin(df, orderCol, tokenCol, budget)
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("docs"), sum(col("__tokens")).as("tokens"))
      .orderBy(col("bin"))
}
