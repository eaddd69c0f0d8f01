package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Lexical (Okapi BM25) and hybrid lexical+vector retrieval — the search
  * side of a RAG / training-data-curation pipeline (query-relevant corpus
  * selection, hybrid rerank before annotation).
  *
  * Scale shape (100 TB corpus): BM25 for a FIXED query never materializes
  * a postings list. Per-term frequencies for the |Q| query terms are |Q|
  * narrow codegen'd array-filter columns in ONE projection; the corpus
  * statistics BM25 needs (doc count, total token count, per-term document
  * frequencies) reduce in ONE map-side-combined aggregate to a single row
  * that is broadcast back; scoring is a second stateless scan and the
  * global top-k is a TakeOrdered — no shuffle ever carries document text.
  * RRF fusion shuffles only the k·|rankings| (id, rank) rows.
  */
object Retrieval {

  /** Okapi BM25 (Robertson/Spärck Jones idf in the Lucene `ln(1 + …)`
    * non-negative form) of every document against a fixed bag of query
    * terms; emits `(id, score)` for the documents matching at least one
    * term. Tokenization is the engine-wide whitespace contract
    * ([[TextFunctions.tokens]]); `dl` counts ALL tokens, not just query
    * terms. A term absent from the corpus contributes 0 to every score
    * (its idf is finite and its tf is 0 everywhere) rather than erroring.
    */
  def bm25Scored(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      terms: Seq[String],
      k1: Double = 1.2,
      b: Double = 0.75): DataFrame = {
    require(terms.nonEmpty, "bm25Scored needs at least one query term")
    require(terms.distinct == terms, s"bm25Scored: duplicate query terms in $terms")
    val toks = TextFunctions.tokens(col(textCol))
    // One projection: doc length + the |Q| term frequencies, all codegen'd
    // array ops over the single tokens array (no explode, no shuffle).
    val base = docs.select(
      col(idCol) +:
        size(toks).cast("double").as("dl") +:
        terms.indices.map(i =>
          size(filter(toks, x => x === lit(terms(i)))).cast("double").as(s"tf_$i")): _*)
    // One tiny aggregate → one broadcast row: N, Σdl, df per term.
    val stats = base.agg(
      count(lit(1)).cast("double").as("n"),
      sum(col("dl")).as("sumdl") +:
        terms.indices.map(i =>
          sum(when(col(s"tf_$i") > 0, 1d).otherwise(0d)).as(s"df_$i")): _*)
    val avgdl = col("sumdl") / col("n")
    // Arithmetic written in the exact shape the DuckDB oracles use
    // ((k1 + 1) / (1 - b) left unfolded) so both engines constant-fold the
    // same double literals and the 6-dp rounded scores hash-match.
    def contrib(i: Int): Column = {
      val tf = col(s"tf_$i")
      val dfq = col(s"df_$i")
      val idf = log(lit(1d) + (col("n") - dfq + lit(0.5)) / (dfq + lit(0.5)))
      idf * (tf * (lit(k1) + lit(1d))) /
        (tf + lit(k1) * (lit(1d) - lit(b) + lit(b) * col("dl") / avgdl))
    }
    base.crossJoin(broadcast(stats))
      .select(col(idCol), terms.indices.map(contrib).reduce(_ + _).as("score"))
      .where(col("score") > 0d)
  }

  /** Global BM25 top-k: `(id, rank, score)`, ranked by `(score DESC, id)`.
    * The global sort is a TakeOrdered (limit k), never a full shuffle; the
    * rank window then runs over exactly k rows. */
  def bm25TopK(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      terms: Seq[String],
      k: Int,
      k1: Double = 1.2,
      b: Double = 0.75): DataFrame = {
    val ord = Seq(col("score").desc, col(idCol).asc)
    bm25Scored(docs, idCol, textCol, terms, k1, b)
      .orderBy(ord: _*)
      .limit(k)
      .withColumn("rank", row_number().over(Window.orderBy(ord: _*)))
      .select(col(idCol), col("rank"), col("score"))
  }

  /** Reciprocal-rank fusion (Cormack/Clarke/Büttcher 2009):
    * `rrf(id) = Σ_lists 1 / (k0 + rank)` over every ranking that mentions
    * the id. Inputs are `(idCol, rankCol)` frames (extra columns ignored);
    * emits the fused top-k as `(id, rank, rrf, lists)` ranked by
    * `(rrf DESC, id)`, `lists` = how many rankings contributed. The fusion
    * is rank-only by design — RRF never compares raw scores across systems,
    * which is what makes mixing BM25 with cosine sound. Union + one
    * aggregation over ≤ Σ|rankings| rows (each already top-k-bounded). */
  def rrfFuse(
      rankings: Seq[DataFrame],
      idCol: String,
      rankCol: String,
      k: Int,
      k0: Int = 60): DataFrame = {
    require(rankings.nonEmpty, "rrfFuse needs at least one ranking")
    val contribs = rankings
      .map(_.select(col(idCol),
        (lit(1d) / (lit(k0.toDouble) + col(rankCol).cast("double"))).as("c")))
      .reduce(_ union _)
    val ord = Seq(col("rrf").desc, col(idCol).asc)
    contribs.groupBy(col(idCol))
      .agg(sum(col("c")).as("rrf"), count(lit(1)).cast("long").as("lists"))
      .orderBy(ord: _*)
      .limit(k)
      .withColumn("rank", row_number().over(Window.orderBy(ord: _*)))
      .select(col(idCol), col("rank"), col("rrf"), col("lists"))
  }
}
