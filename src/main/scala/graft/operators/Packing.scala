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
  * single window cumsum, so it scales as one shuffle and is reproducible in
  * any engine (the DuckDB oracle runs the same arithmetic). True bin
  * packing is sequential; don't do it on 100 TB.
  */
object Packing {

  def withBin(df: DataFrame, orderCol: String, tokenCol: Column, budget: Int): DataFrame = {
    val w = Window.orderBy(col(orderCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
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
