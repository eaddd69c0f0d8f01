package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

class ContaminationSpec extends SparkSpec {
  import spark.implicits._

  private val train = Seq(
    10 -> "the quick brown fox jumps over the lazy dog",
    11 -> "lorem ipsum dolor sit amet consectetur adipiscing elit",
    12 -> "completely unrelated text about spark engines and joins").toDF("id", "text")

  test("contaminated flags the test doc sharing a 5-gram, not the clean one") {
    val test = Seq(
      1 -> "i saw the quick brown fox jumps over a fence yesterday", // shares 5-gram with 10
      2 -> "nothing here overlaps with anything in training data").toDF("id", "text")
    val got = Contamination.contaminated(test, train, "id", "text", n = 5)
      .orderBy($"test_id").as[(Int, Long, Long)].collect()
    assert(got.map(_._1).toSeq === Seq(1))
    val (_, nTrain, maxShared) = got.head
    assert(nTrain === 1L)
    // shared 5-grams: "the quick brown fox jumps", "quick brown fox jumps over"
    assert(maxShared === 2L)
  }

  test("report counts distinct shared grams per (test, train) pair") {
    val test = Seq(1 -> "lorem ipsum dolor sit amet and the quick brown fox jumps").toDF("id", "text")
    val got = Contamination.report(test, train, "id", "text", n = 5)
      .orderBy($"train_id").as[(Int, Int, Long)].collect()
    assert(got.map(r => (r._2, r._3)).toSeq === Seq((10, 1L), (11, 1L)))
  }

  test("maxGramFreq drops ubiquitous grams before the join") {
    val boiler = "all rights reserved by the author"
    val tr = Seq(20 -> boiler, 21 -> boiler, 22 -> boiler).toDF("id", "text")
    val test = Seq(1 -> s"prefix text then $boiler").toDF("id", "text")
    assert(Contamination.report(test, tr, "id", "text", n = 5).count() === 3L)
    // the gram occurs in 3 train docs → freq cap 2 removes it entirely
    assert(Contamination.contaminated(test, tr, "id", "text", n = 5, maxGramFreq = 2).count() === 0L)
  }

  test("sharedSpans finds the exact longest common token run") {
    val docs = Seq(
      1 -> "aa bb cc dd ee ff gg hh xx yy",
      2 -> "zz aa bb cc dd ee ff gg qq rr", // shares run "aa bb cc dd ee ff gg" = 7 tokens
      3 -> "unrelated words only here today").toDF("id", "text")
    val got = Contamination.sharedSpans(docs, "id", "text", n = 3, minSpanTokens = 5)
      .as[(Int, Int, Long)].collect()
    assert(got.toSeq === Seq((1, 2, 7L)))
    // raising the floor above the run hides it
    assert(Contamination.sharedSpans(docs, "id", "text", n = 3, minSpanTokens = 8).count() === 0L)
  }

  test("sharedSpans gram-frequency cap only ever shortens or drops spans") {
    val docs = Tables(spark, sf001, "documents").limit(80)
    def spans(cap: Int) = Contamination
      .sharedSpans(docs, "doc_id", "text", n = 3, minSpanTokens = 6, maxGramDocFreq = cap)
      .as[(Long, Long, Long)].collect().map(r => (r._1, r._2) -> r._3).toMap
    val uncapped = spans(Int.MaxValue)
    val capped = spans(5)
    assert(capped.keySet.subsetOf(uncapped.keySet))
    capped.foreach { case (pair, len) => assert(len <= uncapped(pair)) }
  }

  test("empty test/train sides yield empty, schema-stable results") {
    val empty = train.where(lit(false))
    assert(Contamination.contaminated(empty, train, "id", "text", 5).count() === 0L)
    assert(Contamination.report(train, empty, "id", "text", 5).count() === 0L)
    assert(Contamination.sharedSpans(empty, "id", "text", 3, 5).columns.toSeq ===
      Seq("id_a", "id_b", "max_span_tokens"))
  }

  test("sharedSpans merges only consecutive matches (gap splits the run)") {
    val docs = Seq(
      1 -> "p q r s BREAK1 t u v w",
      2 -> "p q r s BREAK2 t u v w").toDF("id", "text")
    // two disjoint 4-token runs, separated by differing middle tokens
    val got = Contamination.sharedSpans(docs, "id", "text", n = 3, minSpanTokens = 4)
      .as[(Int, Int, Long)].collect()
    assert(got.toSeq === Seq((1, 2, 4L)))
  }

  test("dropSharedSpanDocs keeps min-id per span cluster, transitively") {
    // 1–2 share "a b c d e"; 2–3 share "v w x y z" (1 and 3 share nothing
    // directly — the closure must still collapse all three to doc 1)
    val docs = Seq(
      1L -> "a b c d e start of the chain here now",
      2L -> "middle a b c d e and also v w x y z",
      3L -> "v w x y z ends the chain differently today ok",
      4L -> "totally disjoint content with no overlap at all").toDF("id", "text")
    val kept = Contamination.dropSharedSpanDocs(docs, "id", "text", n = 3, minSpanTokens = 5)
      .select("id").as[Long].collect().toSet
    assert(kept === Set(1L, 4L))
    // below the span threshold nothing is dropped
    val keptAll = Contamination.dropSharedSpanDocs(docs, "id", "text", n = 3, minSpanTokens = 6)
      .select("id").as[Long].collect().toSet
    assert(keptAll === Set(1L, 2L, 3L, 4L))
  }
}
