package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions

/** Deterministic corpus sampling / splitting (training-data pipelines).
  * Hash-bucket membership is content-derived (md5 of the key), so samples
  * are stable across runs, cluster sizes, and re-partitioning — unlike
  * `df.sample`, which is seed+partition-layout dependent. Filters are plain
  * predicates → fully pushdown/prune-friendly at 100 TB.
  */
object Sampling {

  def bucketOf(key: Column, totalBuckets: Int = 100): Column =
    TextFunctions.hashBucket(key, totalBuckets)

  /** Keep rows whose bucket < keepBuckets (≈ keepBuckets/totalBuckets of
    * the data, exactly reproducible). */
  def deterministicSample(df: DataFrame, keyCol: String, keepBuckets: Int,
      totalBuckets: Int = 100): DataFrame =
    df.where(bucketOf(col(keyCol), totalBuckets) < keepBuckets)

  /** Disjoint, exhaustive train/test split on the key hash. */
  def trainTestSplit(df: DataFrame, keyCol: String, testBuckets: Int,
      totalBuckets: Int = 100): (DataFrame, DataFrame) = {
    val b = bucketOf(col(keyCol), totalBuckets)
    (df.where(b >= testBuckets), df.where(b < testBuckets))
  }

  /** Stratified sample: a different keep-fraction per stratum (e.g. balance
    * languages in a training mix), still hash-deterministic — the
    * `df.stat.sampleBy` idea without its seed/partition-layout dependence.
    * Strata absent from `keepBucketsByStratum` are dropped. */
  def stratifiedSample(df: DataFrame, stratumCol: String, keyCol: String,
      keepBucketsByStratum: Map[String, Int], totalBuckets: Int = 100): DataFrame = {
    val b = bucketOf(col(keyCol), totalBuckets)
    val keep = keepBucketsByStratum.foldLeft(lit(-1)) { case (acc, (s, k)) =>
      when(col(stratumCol) === s, lit(k)).otherwise(acc)
    }
    df.where(b < keep)
  }
}
