package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Ad-hoc scaling-curve probe (not part of the suite): time the heavy
  * corpus operators at 1×/4×/16× the sf0.1 document count and report
  * seconds + growth ratios. Near-linear ratios (≈4 per step) back the
  * SCALING.md claims with measurements; a quadratic op would show ≈16.
  *
  * Corpus growth keeps duplicate DENSITY constant: each synthetic doc is
  * the concatenation of two rotated originals (Jaccard ≈ 0.5 to either
  * parent — below every dedup threshold), so candidate-pair counts scale
  * with corpus size, not its square.
  *
  * Run: sbt "Test/runMain graft.ScaleCurve"
  */
object ScaleCurve {

  private def grow(spark: SparkSession, base: DataFrame, factor: Int): DataFrame = {
    val n = base.count()
    if (factor <= 1) return base.select(col("doc_id"), col("text"))
    val copies = (1 until factor).map { k =>
      val off = (k * 31L) % n match { case 0 => 1L; case o => o }
      val a = base.select(col("doc_id"), col("text").as("ta"))
      val b = base.select(col("doc_id").as("idb"), col("text").as("tb"))
      a.join(b, ((col("doc_id") + lit(off)) % lit(n)) === col("idb"))
        .select((col("doc_id") + lit(k) * lit(n)).as("doc_id"),
          concat(col("ta"), lit(" "), col("tb")).as("text"))
    }
    copies.foldLeft(base.select(col("doc_id"), col("text")))(_ unionAll _)
  }

  // set from main's args: run only the named ops (empty = all)
  private var only: Set[String] = Set.empty

  private def time(label: String, nDocs: Long)(body: => Long): Unit = {
    if (only.nonEmpty && !only(label)) return
    val t0 = System.nanoTime()
    val rows = body
    println(f"CURVE $label%-22s n_docs=$nDocs%7d  ${(System.nanoTime() - t0) / 1e9}%7.1fs  rows=$rows")
  }

  def main(args: Array[String]): Unit = {
    only = args.toSet
    val spark = GraftSession.create()
    spark.sparkContext.setLogLevel("ERROR")
    val base = Tables(spark, "/root/testdata/sf0.1", "documents")

    Seq(1, 4, 16).foreach { f =>
      val corpus = grow(spark, base, f).localCheckpoint()
      val n = corpus.count()
      // grow()'s modular rotation assumes dense 0-based doc_ids; a silent
      // row loss here would skew every published ratio
      require(n == f * base.count(), s"grow($f) produced $n docs")

      time("minhash_lsh_pairs", n) {
        operators.Dedup.minhashNearDupPairs(corpus, "doc_id", "text", threshold = 0.8).count()
      }
      time("simhash_banded", n) {
        operators.Dedup.simhashNearDupPairsBanded(corpus, "doc_id", "text", maxHamming = 3).count()
      }
      time("line_dedup", n) {
        operators.Dedup.dropDuplicateLines(corpus, "doc_id",
          functions.TextFunctions.tokenChunks(col("text"), 10)).count()
      }
      time("contamination", n) {
        val train = corpus.where(col("doc_id") % 10 =!= 0)
        val test = corpus.where(col("doc_id") % 10 === 0)
        operators.Contamination.report(test, train, "doc_id", "text", 5).count()
      }
      time("exact_dedup_stats", n) {
        operators.Dedup.exactDupStats(corpus, "text").count()
      }
      time("heavy_hitters", n) {
        val toks = corpus.select(explode(functions.TextFunctions.tokens(col("text"))).as("term"))
        operators.FreqSketch.heavyHitters(toks, "term", k = 50).count()
      }
      time("sliding_chunks", n) {
        corpus.select(col("doc_id"),
            posexplode(functions.TextFunctions.slidingTokenChunks(col("text"), 32, 24))
              .as(Seq("chunk_idx", "chunk_text")))
          .select(md5(col("chunk_text"))).count()
      }
      time("psi_drift", n) {
        operators.Profile.psi(
          corpus.select(length(col("text")).cast("double").as("v"),
            (col("doc_id") % 2 === 0).as("ref")),
          col("v"), col("ref"), 0.0, 5000.0, 10).count()
      }
      time("bm25_scored", n) {
        operators.Retrieval.bm25Scored(corpus, "doc_id", "text",
          Seq("vector", "window", "hash")).count()
      }
      time("pagerank_4it", n) {
        // synthetic 8-regular digraph over the doc ids: edge count grows
        // linearly with the corpus, so the curve isolates the per-iteration
        // join+agg machinery
        val edges = corpus.select(col("doc_id").as("src"))
          .crossJoin(spark.range(1, 9).select(col("id").as("k")))
          .select(col("src"), ((col("src") * 31 + col("k")) % lit(n)).as("dst"))
        operators.Graph.pageRank(edges, "src", "dst", iterations = 4).count()
      }
      time("rag_assembly", n) {
        // l38's full shape: chunk fan-out → chunk-granularity BM25 (one
        // broadcast stats row) → per-doc cap + rank + token-budget windows
        // over the bounded candidate set. The corpus-side work must scale
        // linearly; the windows see ≤ top-k rows at every size.
        import org.apache.spark.sql.expressions.Window
        val chunks = corpus.select(col("doc_id"),
            posexplode(functions.TextFunctions.slidingTokenChunks(col("text"), 32, 24))
              .as(Seq("chunk_idx", "chunk_text")))
          .select((col("doc_id") * 10000 + col("chunk_idx")).as("cid"),
            col("doc_id"), col("chunk_idx"), col("chunk_text"))
        val scored = operators.Retrieval
          .bm25Scored(chunks, "cid", "chunk_text", Seq("vector", "window", "hash"),
            k1 = 1.2, b = 0.75)
          .join(chunks, "cid")
        val perDoc = Window.partitionBy(col("doc_id"))
          .orderBy(col("score").desc, col("cid"))
        val ord = Window.orderBy(col("score").desc, col("cid"))
        scored.withColumn("doc_rank", row_number().over(perDoc))
          .where(col("doc_rank") <= 2)
          .withColumn("rank", row_number().over(ord))
          .where(col("rank") <= 10)
          .withColumn("n_toks", size(functions.TextFunctions.tokens(col("chunk_text"))))
          .withColumn("cum_toks", sum(col("n_toks")).over(
            ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
          .where(col("cum_toks") <= 192)
          .count()
      }
      // token blooms: one-pass collect cost vs the prune it buys. Layout
      // (range-clustered parquet write) is prep, not the measured op.
      val tokDir = java.nio.file.Files.createTempDirectory("graft_curve_tok").toString
      if (only.isEmpty || only("token_bloom_collect") || only("token_bloom_probe"))
        corpus.repartitionByRange(64, col("doc_id"))
          .write.mode("overwrite").parquet(tokDir)
      var tokStats: DataFrame = null
      time("token_bloom_collect", n) {
        tokStats = operators.DataSkipping.collectStats(spark, tokDir, Seq("doc_id"),
          tokenBloomCols = Seq("text"), bloomItems = 200000L).localCheckpoint()
        tokStats.count()
      }
      // probe-only runs still need the stats frame; build it outside time()
      // so the probe measurement stays a probe measurement (not collect+probe)
      if (tokStats == null && (only.isEmpty || only("token_bloom_probe")))
        tokStats = operators.DataSkipping.collectStats(spark, tokDir, Seq("doc_id"),
          tokenBloomCols = Seq("text"), bloomItems = 200000L).localCheckpoint()
      time("token_bloom_probe", n) {
        // absent term: rows reported = files KEPT (false positives only) —
        // the prune benefit is total - rows, the probe cost is the wall time
        val (_, hit, _) = operators.DataSkipping.scan(spark, tokDir, tokStats,
          array_contains(split(col("text"), " "), "graftabsenttoken"))
        hit
      }
      time("fuzzy_join_d1", n) {
        // fuzzy-join the token vocabulary against itself (names-scale input:
        // the operator's domain is distinct strings, not documents)
        val vocab = corpus.select(explode(functions.TextFunctions.tokens(col("text"))).as("w"))
          .distinct()
        operators.FuzzyJoin.editDistanceJoin(vocab, "w", vocab, "w", 1)
          .where(col("a") < col("b")).count()
      }
      corpus.unpersist()
    }
    spark.stop()
  }
}
