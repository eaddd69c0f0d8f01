package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions

/** Train/test contamination detection and exact shared-substring discovery —
  * the n-gram-overlap decontamination rule used for LLM benchmark hygiene
  * (flag any evaluation document sharing a long word n-gram with the
  * training corpus) and the substring-level exact near-dup finder
  * (Lee et al. 2021, "Deduplicating Training Data Makes Language Models
  * Better" — public).
  *
  * Scale design: everything is an equi-join on an n-gram key — the
  * sub-quadratic alternative to pairwise comparison. The n-gram index
  * explodes ~len(doc) rows per document, hash-partitioned by gram; a
  * skew guard matters in production (stop-phrase grams are heavy hitters)
  * and is provided via `maxGramFreq`.
  */
object Contamination {

  /** Positional n-gram index: one row per (id, pos, gram), NOT distinct —
    * the span detector needs every position. pos is 0-based. */
  def positionalNgrams(df: DataFrame, idCol: String, textCol: String, n: Int): DataFrame =
    Dedup.spreadIfNarrow(df.select(col(idCol), col(textCol)))
      .select(col(idCol), posexplode(TextStats.ngrams(col(textCol), n)))
      .withColumnRenamed("col", "gram")

  /** Contamination report: for each test document, the train documents it
    * shares ≥1 distinct word n-gram with, and how many distinct grams are
    * shared. `maxGramFreq` drops grams that occur in more than that many
    * TRAIN docs before the join (heavy-hitter/stop-phrase guard — at scale
    * a ubiquitous gram would fan out quadratically and signals nothing);
    * pass Int.MaxValue to disable. */
  def report(test: DataFrame, train: DataFrame, idCol: String, textCol: String,
      n: Int, maxGramFreq: Int = Int.MaxValue): DataFrame = {
    val testG = Dedup.spreadIfNarrow(test.select(col(idCol), col(textCol)))
      .select(col(idCol).as("test_id"), explode(TextFunctions.shingles(col(textCol), n)).as("gram"))
    val trainG0raw = Dedup.spreadIfNarrow(train.select(col(idCol), col(textCol)))
      .select(col(idCol).as("train_id"), explode(TextFunctions.shingles(col(textCol), n)).as("gram"))
    val trainG =
      if (maxGramFreq == Int.MaxValue) trainG0raw
      else {
        // materialize before deriving the frequency table: the aggregation
        // and the join probe would otherwise EACH re-tokenize and re-explode
        // the whole train side (the classic self-join recompute)
        val trainG0 = trainG0raw.localCheckpoint()
        val freq = trainG0.groupBy(col("gram")).agg(count(lit(1)).as("__f"))
          .where(col("__f") <= maxGramFreq).select(col("gram"))
        trainG0.join(freq, "gram")
      }
    testG.join(trainG, "gram")
      .groupBy(col("test_id"), col("train_id"))
      .agg(count(lit(1)).as("shared_ngrams"))
  }

  /** Test documents contaminated by ANY train document (the decontamination
    * drop-list): distinct test ids with their worst single-train overlap. */
  def contaminated(test: DataFrame, train: DataFrame, idCol: String, textCol: String,
      n: Int, maxGramFreq: Int = Int.MaxValue): DataFrame =
    report(test, train, idCol, textCol, n, maxGramFreq)
      .groupBy(col("test_id"))
      .agg(count(lit(1)).as("n_train_docs"), max(col("shared_ngrams")).as("max_shared"))

  /** Exact shared token runs between document pairs: for every pair sharing
    * an n-gram, the length (in tokens) of their longest common CONSECUTIVE
    * token run, reported when ≥ `minSpanTokens`.
    *
    * Mechanics: positional n-gram equi-join; within a pair, matches on the
    * same diagonal (pos_a − pos_b) that sit at consecutive pos_a form one
    * run — classic gaps-and-islands (island key = pos_a − row_number), and
    * a run of k consecutive n-gram matches covers k+n−1 tokens. */
  def sharedSpans(df: DataFrame, idCol: String, textCol: String,
      n: Int, minSpanTokens: Int, maxGramDocFreq: Int = Int.MaxValue): DataFrame = {
    // Materialized up front: the pair join reads it twice, and the cap path
    // additionally derives the doc-frequency table from it.
    val g0 = positionalNgrams(df, idCol, textCol, n).localCheckpoint()
    // Heavy-hitter guard for scale: a gram present in d documents fans the
    // join out d² ways, and stock phrases appear in thousands. Dropping
    // grams in more than `maxGramDocFreq` docs caps the fan-out; a real
    // span survives unless EVERY one of its grams is that ubiquitous, and
    // then it can only shorten or drop, never produce a false span —
    // asserted (capped ⊆ uncapped) in the spec.
    val g =
      if (maxGramDocFreq == Int.MaxValue) g0
      else {
        val rare = g0.select(col(idCol), col("gram")).distinct()
          .groupBy(col("gram")).agg(count(lit(1)).as("__d"))
          .where(col("__d") <= maxGramDocFreq).select(col("gram"))
        g0.join(rare, "gram").localCheckpoint() // self-joined below
      }
    val a = g.select(col(idCol).as("id_a"), col("pos").as("pos_a"), col("gram"))
    val b = g.select(col(idCol).as("id_b"), col("pos").as("pos_b"), col("gram"))
    val matches = a.join(b, Seq("gram")).where(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), col("pos_a"), (col("pos_a") - col("pos_b")).as("diag"))
      .distinct() // duplicate grams at the same (pair, diag, pos_a) collapse
    val w = Window.partitionBy(col("id_a"), col("id_b"), col("diag")).orderBy(col("pos_a"))
    matches
      .withColumn("island", col("pos_a") - row_number().over(w))
      .groupBy(col("id_a"), col("id_b"), col("diag"), col("island"))
      .agg((count(lit(1)) + (n - 1)).as("span_tokens"))
      .groupBy(col("id_a"), col("id_b"))
      .agg(max(col("span_tokens")).as("max_span_tokens"))
      .where(col("max_span_tokens") >= minSpanTokens)
  }

  /** ExactSubstr-style document dedup (Lee et al. 2021, "Deduplicating
    * Training Data Makes Language Models Better" — public): any two docs
    * sharing a verbatim run of ≥ `minSpanTokens` tokens are duplicates;
    * connected components over that span graph keep the min-id
    * representative (plus every span-free doc). Candidate generation is
    * [[sharedSpans]]'s positional-gram equi-join — the fixed-n equivalent
    * of the paper's suffix array, never an all-pairs scan — and the
    * component closure is the star-contraction used by every other dedup
    * family, so the whole rule holds at corpus scale. `maxGramDocFreq`
    * caps stop-phrase fan-out exactly as in [[report]]. */
  def dropSharedSpanDocs(df: DataFrame, idCol: String, textCol: String,
      n: Int, minSpanTokens: Int, maxGramDocFreq: Int = Int.MaxValue): DataFrame = {
    val pairs = sharedSpans(df, idCol, textCol, n, minSpanTokens, maxGramDocFreq)
      .select(col("id_a"), col("id_b"))
    val comp = Dedup.connectedComponents(pairs)
    val losers = comp.where(col("id") =!= col("component")).select(col("id"))
    df.join(losers, df(idCol) === losers("id"), "left_anti")
  }
}
