package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** BM25 + RRF retrieval (SURVEY.md §2.14 L34/L35). The BM25 checks verify
  * the closed-form Lucene scoring against hand-computed values on a tiny
  * corpus; the RRF checks pin the exact fusion arithmetic and its
  * rank-only nature. */
class RetrievalSpec extends SparkSpec {
  import spark.implicits._

  private val corpus = Seq(
    (1L, "spark shuffles data between stages"),
    (2L, "spark spark spark shuffles nothing"),
    (3L, "a very long document about nothing in particular with many many filler words here"),
    (4L, "completely unrelated text")
  ).toDF("id", "text")

  /** Reference implementation of the exact formula the operator promises. */
  private def bm25Ref(terms: Seq[String], k1: Double = 1.2, b: Double = 0.75)
      : Map[Long, Double] = {
    val docs = corpus.collect().map(r => r.getLong(0) -> r.getString(1).split(" ").toSeq).toMap
    val n = docs.size.toDouble
    val avgdl = docs.values.map(_.size).sum.toDouble / n
    docs.map { case (id, toks) =>
      val dl = toks.size.toDouble
      id -> terms.map { t =>
        val tf = toks.count(_ == t).toDouble
        val df = docs.values.count(_.contains(t)).toDouble
        val idf = math.log(1d + (n - df + 0.5) / (df + 0.5))
        idf * (tf * (k1 + 1d)) / (tf + k1 * (1d - b + b * dl / avgdl))
      }.sum
    }.filter(_._2 > 0)
  }

  test("bm25Scored matches the closed-form Lucene BM25 on a hand corpus") {
    val got = Retrieval.bm25Scored(corpus, "id", "text", Seq("spark", "shuffles"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val want = bm25Ref(Seq("spark", "shuffles"))
    assert(got.keySet == want.keySet)
    got.foreach { case (id, s) => assert(math.abs(s - want(id)) < 1e-12, s"doc $id") }
  }

  test("bm25: higher tf wins at equal length; absent query term contributes 0") {
    // docs 1 and 2 are both 5 tokens; doc 2 has tf(spark)=3 vs 1.
    val scores = Retrieval.bm25Scored(corpus, "id", "text", Seq("spark"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(scores(2L) > scores(1L))
    assert(!scores.contains(4L), "doc without any query term must be filtered")
    // adding a term that appears nowhere must not change any score
    val withGhost = Retrieval.bm25Scored(corpus, "id", "text", Seq("spark", "zzz_absent"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(withGhost.keySet == scores.keySet)
    withGhost.foreach { case (id, s) => assert(math.abs(s - scores(id)) < 1e-12) }
  }

  test("bm25: length normalization penalizes the longer doc at equal tf") {
    // 'nothing' appears once in doc 2 (5 tokens) and once in doc 3 (14 tokens)
    val scores = Retrieval.bm25Scored(corpus, "id", "text", Seq("nothing"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(scores(2L) > scores(3L))
    // with b = 0 length normalization is off and equal tf ties exactly
    val flat = Retrieval.bm25Scored(corpus, "id", "text", Seq("nothing"), b = 0d)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(math.abs(flat(2L) - flat(3L)) < 1e-12)
  }

  test("bm25TopK ranks by (score desc, id) with deterministic ties") {
    val top = Retrieval.bm25TopK(corpus, "id", "text", Seq("spark", "shuffles"), k = 2)
      .collect().map(r => (r.getInt(1), r.getLong(0)))
    assert(top.map(_._1).toSeq == Seq(1, 2))
    val want = bm25Ref(Seq("spark", "shuffles")).toSeq
      .sortBy { case (id, s) => (-s, id) }.take(2).map(_._1)
    assert(top.sortBy(_._1).map(_._2).toSeq == want)
  }

  test("rrfFuse computes exact reciprocal-rank sums and rank-only fusion") {
    val a = Seq((10L, 1), (20L, 2), (30L, 3)).toDF("id", "rank")
    val b = Seq((20L, 1), (40L, 2)).toDF("id", "rank")
    val fused = Retrieval.rrfFuse(Seq(a, b), "id", "rank", k = 10, k0 = 60)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getDouble(2), r.getLong(3)))
    val byId = fused.map(f => f._1 -> f).toMap
    // id 20: in both lists → 1/62 + 1/61
    assert(math.abs(byId(20L)._3 - (1d / 62 + 1d / 61)) < 1e-15)
    assert(byId(20L)._4 == 2L)
    // fusion order: the doubly-ranked id beats every single-list id
    assert(byId(20L)._2 == 1)
    // id 10 (1/61) vs id 40 (1/62) vs id 30 (1/63)
    assert(fused.sortBy(_._2).map(_._1).toSeq == Seq(20L, 10L, 40L, 30L))
  }

  test("rrfFuse ties break by id ascending") {
    val a = Seq((5L, 1), (3L, 2)).toDF("id", "rank")
    val b = Seq((3L, 1), (5L, 2)).toDF("id", "rank")
    val fused = Retrieval.rrfFuse(Seq(a, b), "id", "rank", k = 10)
      .collect().map(r => (r.getLong(0), r.getInt(1)))
    // both ids sum 1/61 + 1/62 → tie → id 3 first
    assert(fused.sortBy(_._2).map(_._1).toSeq == Seq(3L, 5L))
  }

  test("bm25 plan shape: no shuffle carries document text") {
    val plan = Retrieval.bm25Scored(corpus, "id", "text", Seq("spark"))
      .queryExecution.executedPlan.toString
    // the only exchanges allowed are the single-row stats aggregate's
    // shuffle and its broadcast back — never a hashpartitioning of docs
    assert(!plan.contains("Exchange hashpartitioning"), plan.take(2000))
  }
}
