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

  /** EXACTLY-k-per-stratum sample — the balanced-evaluation-set builder
    * ("1000 docs per language", not a fraction): rank rows inside each
    * stratum by [[epochShuffleKey]]'s `md5(seed-key)` (a pure function of
    * (seed, key): identical across runs, layouts, cluster sizes, and
    * engines; ties — md5 collisions — break toward the smaller key) and
    * keep the first k.
    * Strata with fewer than k rows keep everything. A new seed is a fresh
    * independent draw, like [[epochShuffleKey]].
    *
    * Scale shape: the obvious `row_number` window would shuffle the WHOLE
    * corpus to rank it; instead a per-stratum count (one tiny agg, driver
    * holds #strata longs) sets a 16-bit hash-prefix threshold keeping
    * ~8k expected candidates, and only candidates shuffle into the
    * ranking window. The prefilter is provably lossless when ≥ k
    * candidates survive — every candidate's full hash sorts BELOW every
    * non-candidate's (the prefix dominates the lexicographic order), so
    * the top-k are always inside — and the rare stratum where fewer than
    * k survive (tiny strata, pathological skew) falls back to ranking all
    * its rows. Result is bit-identical to the naive window either way. */
  def fixedKPerStratum(df: DataFrame, stratumCol: String, keyCol: String,
      k: Int, seed: String = "k"): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    import org.apache.spark.sql.expressions.Window
    val h = epochShuffleKey(col(keyCol), seed)
    // per-stratum row counts → prefix thresholds (0..65536); 8× slack
    // makes a lossy prefilter astronomically unlikely, and the candidate
    // count CHECK below makes even that case correct, not just unlikely
    // NULL-SAFE stratum matching throughout (<=>): a NULL stratum is a
    // stratum like any other — plain === would silently drop its rows
    val counts = df.groupBy(col(stratumCol)).agg(count(lit(1)).as("__n"))
      .collect().map(r => r.get(0) -> r.getLong(1)).toMap
    val threshold = counts.foldLeft(lit(65536L)) { case (acc, (s, n)) =>
      val t = math.min(65536L, (65536L * 8L * k + n - 1) / math.max(n, 1L))
      when(col(stratumCol) <=> lit(s), lit(t)).otherwise(acc)
    }
    val prefix = conv(substring(h, 1, 4), 16, 10).cast("long")
    val cand = df.withColumn("__h", h).withColumn("__pfx", prefix)
    val candidates = cand.where(col("__pfx") < threshold)
    val enough = candidates.groupBy(col(stratumCol)).agg(count(lit(1)).as("__c"))
      .where(col("__c") >= k).select(col(stratumCol)).collect().map(_.get(0)).toSet
    val pool = cand.where(
      counts.keys.foldLeft(lit(false)) { (acc, s) =>
        when(col(stratumCol) <=> lit(s),
          if (enough(s)) col("__pfx") < threshold else lit(true)).otherwise(acc)
      })
    val w = Window.partitionBy(col(stratumCol))
      .orderBy(col("__h"), col(keyCol))
    pool.withColumn("__rk", row_number().over(w))
      .where(col("__rk") <= k)
      .drop("__h", "__pfx", "__rk")
  }
}
