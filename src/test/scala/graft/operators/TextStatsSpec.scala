package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TextStatsSpec extends SparkSpec {
  import spark.implicits._

  private def statsOf(rows: (Int, String)*) = {
    val df = rows.toSeq.toDF("id", "text")
    TextStats.repetitionStats(df, "id", "text")
      .orderBy($"id")
      .as[(Int, Long, Double, Double, Double)]
      .collect()
  }

  test("hand-computed repetition profile") {
    // "a a a b": tokens a×3 b×1 → top_token 3/4; bigrams "a a"×2 "a b"×1 →
    // top_bigram 2/3; trigrams "a a a","a a b" all unique → dup 0
    val Array(r1) = statsOf(1 -> "a a a b")
    assert(r1 === ((1, 4L, 0.75, 2.0 / 3.0, 0.0)))

    // "x y x y x y": top token 3/6; bigrams x y×3, y x×2 → 3/5;
    // trigrams x y x ×2, y x y ×2 → all 4 occurrences duplicated → 1.0
    val Array(r2) = statsOf(2 -> "x y x y x y")
    assert(r2 === ((2, 6L, 0.5, 0.6, 1.0)))
  }

  test("short documents get zero for undefined metrics") {
    val Array(one, two) = statsOf(1 -> "solo", 2 -> "two words")
    assert(one === ((1, 1L, 1.0, 0.0, 0.0))) // no bigrams/trigrams → 0.0
    assert(two === ((2, 2L, 0.5, 1.0, 0.0))) // one bigram, no trigram
  }

  test("dropRepetitious keeps clean docs and drops loops") {
    val df = Seq(
      1 -> "quick brown foxes jump over lazy dogs near old river banks daily",
      2 -> "spam spam spam spam spam spam spam spam",
      3 -> "go go go go stop go go go go stop go go go go stop").toDF("id", "text")
    val kept = TextStats.dropRepetitious(df, "id", "text").select($"id").as[Int].collect().sorted
    assert(kept.toSeq === Seq(1))
  }

  test("ngrams keeps multiplicity; shingles dedups") {
    val df = Seq(1 -> "a b a b a").toDF("id", "text")
    val n = df.select(size(TextStats.ngrams($"text", 2))).as[Int].head()
    val s = df.select(size(graft.functions.TextFunctions.shingles($"text", 2))).as[Int].head()
    assert(n === 4) // a b, b a, a b, b a
    assert(s === 2)
  }
}
