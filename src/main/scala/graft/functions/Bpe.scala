package graft.functions

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, Row, SparkSession}
import org.apache.spark.sql.types.{ArrayType, StringType}

/** Byte-pair-encoding tokenizer (Sennrich et al. 2016; the greedy encoder
  * is the GPT-2 merge loop): a trained merge list turns the
  * characters-per-token regex heuristics (L4) into a REAL subword
  * tokenizer for token budgeting / packing / dedup keying.
  *
  * Scale shape: the merge table is tiny (≤ vocab growth, driver-held and
  * closure-broadcast); encoding is one narrow map over the corpus —
  * no shuffle, no state. Training is the textbook iterative algorithm:
  * each merge = one pair-count aggregation (map-side combined) + one
  * re-tokenize map, so k merges cost k bounded passes — train on a
  * deterministic sample (operators.Sampling) for big corpora, exactly as
  * production tokenizers do. */
object Bpe {

  /** Greedy BPE encode: start from characters; repeatedly merge ALL
    * left-to-right occurrences of the lowest-rank adjacent pair until no
    * ranked pair remains. Deterministic for a fixed merge list. */
  def encodeText(text: String, ranks: Map[(String, String), Int]): Array[String] = {
    if (text.isEmpty) return Array.empty
    var tokens: Array[String] = text.map(_.toString).toArray
    var done = false
    while (!done && tokens.length > 1) {
      var bestRank = Int.MaxValue
      var i = 0
      while (i < tokens.length - 1) {
        val r = ranks.getOrElse((tokens(i), tokens(i + 1)), Int.MaxValue)
        if (r < bestRank) bestRank = r
        i += 1
      }
      if (bestRank == Int.MaxValue) done = true
      else {
        val (a, b) = ranks.collectFirst { case (p, r) if r == bestRank => p }.get
        val out = Array.newBuilder[String]
        var j = 0
        while (j < tokens.length) {
          if (j < tokens.length - 1 && tokens(j) == a && tokens(j + 1) == b) {
            out += (a + b); j += 2
          } else { out += tokens(j); j += 1 }
        }
        tokens = out.result()
      }
    }
    tokens
  }

  /** `df` plus an ArrayType(String) column `out` holding the BPE tokens of
    * `textCol` (null text → empty array). One narrow map; the merge list
    * rides the closure. */
  def withTokens(df: DataFrame, textCol: String, merges: Seq[(String, String)],
      out: String = "bpe_tokens"): DataFrame = {
    val ranks = merges.zipWithIndex.toMap
    val idx = df.schema.fieldIndex(textCol)
    val outSchema = df.schema.add(out, ArrayType(StringType))
    df.map { row =>
      val text = if (row.isNullAt(idx)) "" else row.getString(idx)
      Row.fromSeq(row.toSeq :+ encodeText(text, ranks).toSeq)
    }(Encoders.row(outSchema))
  }

  /** Learn `numMerges` merges from the corpus: textbook BPE training —
    * per iteration, count adjacent token pairs (one map-side-combined
    * aggregation) and merge the most frequent everywhere (ties broken by
    * pair ordering, so training is deterministic). Returns merges in
    * priority order. */
  def learnMerges(spark: SparkSession, df: DataFrame, textCol: String,
      numMerges: Int): Seq[(String, String)] = {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    var corpus: Dataset[Seq[String]] = df
      .select(col(textCol)).na.drop()
      .as[String].map(_.map(_.toString).toSeq)
    corpus = corpus.cache()
    val merges = Seq.newBuilder[(String, String)]
    var learned = Map.empty[(String, String), Int]
    (0 until numMerges).foreach { k =>
      val top = corpus.flatMap(ts => ts.zip(ts.drop(1)))
        .groupByKey(identity).count()
        .orderBy(desc("count(1)"), asc("key"))
        .limit(1).collect()
      if (top.nonEmpty) {
        val pair = top.head._1
        merges += pair
        val rankOfNew = Map(pair -> 0) // apply just this merge everywhere
        val prev = corpus
        corpus = corpus.map(ts => encodeTokens(ts.toArray, rankOfNew).toSeq).cache()
        corpus.count() // materialize before unpersisting the parent
        prev.unpersist()
        learned += (pair -> k)
      }
    }
    corpus.unpersist()
    merges.result()
  }

  /** One ranked-merge pass over an existing token array (training's
    * re-tokenize step). */
  private def encodeTokens(tokens: Array[String],
      ranks: Map[(String, String), Int]): Array[String] = {
    if (tokens.length < 2) return tokens
    val (a, b) = ranks.keysIterator.next()
    val out = Array.newBuilder[String]
    var j = 0
    while (j < tokens.length) {
      if (j < tokens.length - 1 && tokens(j) == a && tokens(j + 1) == b) {
        out += (a + b); j += 2
      } else { out += tokens(j); j += 1 }
    }
    out.result()
  }
}
