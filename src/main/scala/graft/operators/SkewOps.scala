package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation (SURVEY.md §2/§7: "skewed keys → salting or AQE skew
  * join"). AQE's runtime skew-join split handles most cases for free; these
  * utilities are the explicit form for hot keys AQE can't split (e.g. a
  * single key holding >1 executor-memory of rows in an aggregation).
  *
  * Salting is deterministic-by-content (hash of the full row), never
  * `rand()` — re-runs and retried tasks produce identical partitioning.
  */
object SkewOps {

  private def saltExpr(df: DataFrame, salts: Int): Column =
    pmod(xxhash64(df.columns.map(col).toSeq: _*), lit(salts))

  /** Two-phase salted aggregation: partial aggregate on (keys, salt), then
    * final on keys. Re-aggregation is exact for decomposable aggregates
    * (sum/count/min/max) — this wrapper does count + sum. */
  def saltedCountSum(df: DataFrame, keys: Seq[String], valueCol: String, salts: Int): DataFrame =
    df.withColumn("__salt", saltExpr(df, salts))
      .groupBy((keys.map(col) :+ col("__salt")): _*)
      .agg(count(lit(1)).as("__cnt"), sum(col(valueCol)).as("__sum"))
      .groupBy(keys.map(col): _*)
      .agg(sum(col("__cnt")).as("cnt"), sum(col("__sum")).as(s"sum_$valueCol"))

  /** Salted inner equi-join for a skewed LEFT side against a smaller right
    * side: the left adds a content-derived salt; the right is replicated
    * `salts` ways so every (key, salt) bucket finds its match. Result equals
    * the plain inner join, but the hot key's rows spread over `salts`
    * reducers. */
  def saltedJoin(left: DataFrame, right: DataFrame, keys: Seq[String], salts: Int): DataFrame = {
    val saltedLeft = left.withColumn("__salt", saltExpr(left, salts))
    val replicatedRight = right
      .withColumn("__salt", explode(sequence(lit(0L), lit(salts - 1L))))
    saltedLeft.join(replicatedRight, keys :+ "__salt").drop("__salt")
  }
}
