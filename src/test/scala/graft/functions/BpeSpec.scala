package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class BpeSpec extends SparkSpec {
  import spark.implicits._

  test("encodeText: rank priority, left-to-right non-overlap, chained merges") {
    val ranks = Map(("a", "b") -> 0, ("ab", "c") -> 1)
    // ab merges first (lower rank), then (ab,c)
    assert(Bpe.encodeText("abcab", ranks).toSeq === Seq("abc", "ab"))
    // greedy left-to-right non-overlapping: aaa → [aa, a]
    assert(Bpe.encodeText("aaa", Map(("a", "a") -> 0)).toSeq === Seq("aa", "a"))
    assert(Bpe.encodeText("", ranks).toSeq === Seq.empty)
    assert(Bpe.encodeText("xyz", ranks).toSeq === Seq("x", "y", "z"))
  }

  test("learnMerges recovers the textbook merges with deterministic ties") {
    val corpus = Seq("aaab", "aab").toDF("text")
    val merges = Bpe.learnMerges(spark, corpus, "text", numMerges = 2)
    // (a,a) count 3 beats (a,b) count 2; then the count-1 tie breaks by
    // pair ordering: ("a","b") < ("aa","a") < ("aa","b")
    assert(merges === Seq(("a", "a"), ("a", "b")))
  }

  test("withTokens round-trips the text and encodes every row") {
    val docs = Seq((1L, "the merger"), (2L, "ersatz"), (3L, null: String))
      .toDF("id", "text")
    val merges = Seq(("e", "r"), ("er", "s"))
    val out = Bpe.withTokens(docs, "text", merges)
    val byId = out.select($"id", $"bpe_tokens").as[(Long, Seq[String])]
      .collect().toMap
    assert(byId(1L).mkString === "the merger") // lossless
    assert(byId(1L).contains("er"))
    assert(byId(2L).take(2) === Seq("ers", "a")) // chained merge fired
    assert(byId(3L) === Seq.empty)
    // trained merges reduce token count vs characters
    val counts = out.where($"id" === 1L)
      .select(size($"bpe_tokens"), length($"text")).head()
    assert(counts.getInt(0) < counts.getInt(1))
  }

  test("fresh-symbol replace-chain equivalence (the l30 oracle's premise)") {
    // real BPE token count == char length after per-merge placeholder
    // replaces, when merge outputs are fresh symbols
    val texts = Seq("the merger person", "ersatz servers", "no matches here", "rrssee")
    val merges = Seq(("e", "r"), ("er", "s"))
    texts.foreach { t =>
      val nBpe = Bpe.encodeText(t, merges.zipWithIndex.toMap).length
      val replaced = t.replace("er", "Ƶ").replace("Ƶs", "Ʒ")
      assert(nBpe === replaced.length, s"text '$t'")
    }
  }
}
