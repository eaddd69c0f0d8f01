package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions

/** Repetition-based quality metrics for training-data filtering — the
  * "repetitious document" signals popularized by the Gopher/MassiveText
  * filtering rules (Rae et al. 2021, public): documents dominated by a few
  * tokens or by repeated n-grams are low-quality (boilerplate, spam,
  * generation loops) and get filtered before training.
  *
  * Scale design: each metric is explode → hash-groupBy → per-doc re-agg.
  * Both shuffles key on (doc, gram) then doc — fully partitioned, no
  * driver-side state, map-side partial aggregation throughout. The joins
  * are per-doc scalars (one row per doc) joined back on the doc key.
  */
object TextStats {

  /** Non-distinct word n-grams (repetition needs multiplicity, unlike
    * [[TextFunctions.shingles]] which dedups for Jaccard). Shares the one
    * gram builder in TextFunctions. */
  def ngrams(text: Column, n: Int): Column =
    TextFunctions.ngramsOfTokens(TextFunctions.tokens(text), n)

  /** Per-document repetition profile:
    *   n_tokens          total whitespace tokens
    *   top_token_frac    occurrences of the most frequent token / n_tokens
    *   top_bigram_frac   occurrences of the most frequent bigram / bigrams
    *   dup_trigram_frac  fraction of trigram occurrences whose trigram
    *                     appears more than once (Gopher's "duplicate
    *                     n-gram fraction")
    * Documents shorter than the n-gram width get 0.0 for that metric. */
  def repetitionStats(df0: DataFrame, idCol: String, textCol: String): DataFrame = {
    val id = col(idCol)
    // spread before the explodes (a narrow scan would pin the tokenization
    // of the whole corpus to one task), tokenize ONCE, and materialize:
    // the three metric branches below would otherwise each re-scan and
    // re-tokenize the full corpus — 3× the dominant cost
    val df = Dedup.spreadIfNarrow(df0.select(id, col(textCol)))
      .select(id, TextFunctions.tokens(col(textCol)).as("__toks"))
      .localCheckpoint()

    val tokCounts = df.select(id, explode(col("__toks")).as("tk"))
      .groupBy(id, col("tk")).agg(count(lit(1)).as("c"))
    val tokStats = tokCounts.groupBy(id).agg(
      sum(col("c")).as("n_tokens"),
      (max(col("c")).cast("double") / sum(col("c"))).as("top_token_frac"))

    val biCounts = df.select(id,
        explode(TextFunctions.ngramsOfTokens(col("__toks"), 2)).as("g"))
      .groupBy(id, col("g")).agg(count(lit(1)).as("c"))
    val biStats = biCounts.groupBy(id).agg(
      (max(col("c")).cast("double") / sum(col("c"))).as("top_bigram_frac"))

    val triCounts = df.select(id,
        explode(TextFunctions.ngramsOfTokens(col("__toks"), 3)).as("g"))
      .groupBy(id, col("g")).agg(count(lit(1)).as("c"))
    val triStats = triCounts.groupBy(id).agg(
      (sum(when(col("c") > 1, col("c")).otherwise(0L)).cast("double") / sum(col("c")))
        .as("dup_trigram_frac"))

    df0.select(id)
      .join(tokStats, Seq(idCol), "left")
      .join(biStats, Seq(idCol), "left")
      .join(triStats, Seq(idCol), "left")
      .select(id,
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        coalesce(col("top_token_frac"), lit(0.0)).as("top_token_frac"),
        coalesce(col("top_bigram_frac"), lit(0.0)).as("top_bigram_frac"),
        coalesce(col("dup_trigram_frac"), lit(0.0)).as("dup_trigram_frac"))
  }

  /** Statistical-LM quality score (the CCNet/perplexity-filter idea,
    * Wenzek et al. 2020, public — rendered engine-native): train an MLE
    * bigram model ON the corpus itself, score each document by its mean
    * log-probability ln(c(w1,w2)/c(w1)) over its bigrams. Low scores =
    * improbable token sequences (noise, mangled extraction); high = fluent,
    * common phrasing. No smoothing is needed — every scored bigram exists
    * in the training counts by construction.
    *
    * Determinism contract: each bigram's log-prob is fixed to integer
    * MICRO-units (round(ln·1e6) → BIGINT) BEFORE any aggregation, so sums
    * are exact and order-insensitive — a raw avg of doubles would be
    * partition-order-dependent and break cross-engine hash matching. The
    * readable `lm_score` divides the two exact integers afterwards.
    *
    * Scale shape: one tokenize pass; bigram counts and context counts are
    * hash aggregations on gram keys with map-side partials; scoring is two
    * equi-joins on those keys. Nothing is quadratic and nothing touches
    * the driver. */
  def bigramLmScores(df0: DataFrame, idCol: String, textCol: String): DataFrame = {
    val id = col(idCol)
    val base = Dedup.spreadIfNarrow(df0.select(id, col(textCol)))
      .select(id, TextFunctions.tokens(col(textCol)).as("w"))
      .where(size(col("w")) >= 2)
      .localCheckpoint() // pairs feed counts AND scoring — tokenize once
    val pairs = base.select(id,
        explode(zip_with(
          slice(col("w"), lit(1), size(col("w")) - 1),
          slice(col("w"), lit(2), size(col("w")) - 1),
          (a, b) => struct(a.as("w1"), b.as("w2")))).as("b"))
      .select(id, col("b.w1").as("w1"), col("b.w2").as("w2"))
    val c2 = pairs.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("n2"))
    val c1 = c2.groupBy(col("w1")).agg(sum(col("n2")).as("n1"))
    pairs.join(c2, Seq("w1", "w2")).join(c1, Seq("w1"))
      .select(id, round(log(col("n2") / col("n1")) * lit(1000000.0)).cast("long").as("micro"))
      .groupBy(id)
      .agg(count(lit(1)).as("n_bigrams"), sum(col("micro")).as("score_micro"))
      .select(id, col("n_bigrams"), col("score_micro"),
        round(col("score_micro") / col("n_bigrams") / lit(1000000.0), 4).as("lm_score"))
  }

  /** The filter built on the profile: keep documents whose repetition
    * signals stay under the given caps (defaults ≈ the published rules). */
  def dropRepetitious(df: DataFrame, idCol: String, textCol: String,
      maxTopTokenFrac: Double = 0.2, maxTopBigramFrac: Double = 0.2,
      maxDupTrigramFrac: Double = 0.3): DataFrame = {
    val stats = repetitionStats(df, idCol, textCol)
      .where(col("top_token_frac") <= maxTopTokenFrac &&
        col("top_bigram_frac") <= maxTopBigramFrac &&
        col("dup_trigram_frac") <= maxDupTrigramFrac)
      .select(col(idCol))
    df.join(stats, Seq(idCol), "left_semi")
  }
}
