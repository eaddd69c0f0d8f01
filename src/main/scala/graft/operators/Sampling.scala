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

  /** TEMPERATURE-BASED source mixing — the pretraining reweighting step:
    * sample so the kept corpus's source distribution follows
    * p_s ∝ n_s^(1/τ) (τ = 1 natural, τ → ∞ uniform across sources; the
    * multilingual/multi-source rebalancing rule popularized by the
    * XLM-R / T5 mixing recipes) at an overall `targetFraction` of the
    * corpus. Per-source keep rates are derived from one tiny per-source
    * count aggregate (driver holds #sources doubles, never rows):
    *   rate_s = min(1, c · n_s^(1/τ) / n_s),  c = targetFraction · N / Σ n_s^(1/τ)
    * — oversampled small sources cap at keeping everything (no row
    * duplication; the mix then slightly undershoots targetFraction,
    * deterministically). Membership is the same md5-bucket filter as the
    * other samplers at 1/10000 granularity: stable across runs, cluster
    * sizes, and layouts, and a plain pushdown-friendly predicate at
    * 100 TB. Returned thresholds column is the per-row keep bound, so the
    * selection is auditable. */
  def temperatureMix(df: DataFrame, sourceCol: String, keyCol: String,
      temperature: Double, targetFraction: Double): DataFrame = {
    require(temperature > 0, s"temperature must be > 0, got $temperature")
    require(targetFraction > 0 && targetFraction <= 1,
      s"targetFraction must be in (0, 1], got $targetFraction")
    val counts: Seq[(String, Long)] = df
      .groupBy(col(sourceCol).cast("string").as("__s"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("__s")) // fixed order → deterministic float sum
      .collect().map(r => r.getString(0) -> r.getLong(1)).toSeq
    val total = counts.map(_._2).sum.toDouble
    val powSum = counts.map { case (_, n) => math.pow(n.toDouble, 1.0 / temperature) }.sum
    val c = targetFraction * total / powSum
    val thresholds: Seq[(String, Long)] = counts.map { case (s, n) =>
      val rate = math.min(1.0, c * math.pow(n.toDouble, 1.0 / temperature) / n)
      s -> math.floor(rate * 10000.0).toLong
    }
    val thr = thresholds.foldLeft(lit(-1L)) { case (acc, (s, t)) =>
      when(col(sourceCol).cast("string") === s, lit(t)).otherwise(acc)
    }
    df.where(bucketOf(col(keyCol), 10000) < thr)
  }

  /** EPOCH SHUFFLE key: the training-order randomization step — a stable
    * pseudo-random global order from md5(seed ∥ key). Sorting (or
    * range-partition-writing) by this key "shuffles" the corpus
    * deterministically: the order is a pure function of (seed, key), so it
    * is identical across runs, cluster sizes, and layouts, and a new
    * epoch is just a new seed — no state, no RNG, no seed+partition
    * dependence like `df.orderBy(rand(seed))`. At 100 TB the epoch write
    * is one range-partitioned sort on this key. */
  def epochShuffleKey(key: Column, seed: String): Column =
    md5(concat(lit(s"$seed-"), key.cast("string")))

  /** WEIGHT-PROPORTIONAL sampling ("soft filtering", the DCLM-style
    * quality-weighted keep): each row survives with probability
    * `prob` (a per-row column, clamped to [0, 1]) — e.g. keep documents
    * proportionally to a quality score instead of a hard threshold.
    * Deterministic via the engine's md5-bucket device at `granularity`
    * (row kept iff bucket(key) < ⌊prob·granularity⌋, the same floor
    * convention as [[temperatureMix]]: exact keep rates undershoot by
    * < 1/granularity, deterministically). Stable across runs, cluster
    * sizes, and layouts; a plain predicate, so it pushes down and a
    * higher-probability pass always keeps a SUPERSET of a lower one
    * (same key ⇒ same bucket). */
  def weightedSample(df: DataFrame, keyCol: String, prob: Column,
      granularity: Int = 10000): DataFrame =
    df.where(bucketOf(col(keyCol), granularity) <
      floor(least(greatest(prob, lit(0.0)), lit(1.0)) * granularity))

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
