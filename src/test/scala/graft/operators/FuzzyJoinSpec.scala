package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class FuzzyJoinSpec extends SparkSpec {
  import spark.implicits._

  private def brute(names: Seq[String], d: Int): Set[(String, String, Int)] = {
    def lev(a: String, b: String): Int = {
      val dp = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
        if (i == 0) j else if (j == 0) i else 0
      }
      for (i <- 1 to a.length; j <- 1 to b.length)
        dp(i)(j) = math.min(math.min(dp(i - 1)(j) + 1, dp(i)(j - 1) + 1),
          dp(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      dp(a.length)(b.length)
    }
    (for {
      a <- names.distinct; b <- names.distinct
      dist = lev(a, b) if dist <= d
    } yield (a, b, dist)).toSet
  }

  // Deterministic pseudo-random short strings over a tiny alphabet — small
  // alphabet + short length force plenty of near-miss pairs at both depths.
  private val rnd = new scala.util.Random(42)
  private val words = Seq.fill(120)(
    (0 until (1 + rnd.nextInt(6))).map(_ => "abc".charAt(rnd.nextInt(3))).mkString)

  test("editDistanceJoin equals brute-force levenshtein join at d=1 and d=2") {
    val df = words.toDF("w")
    for (d <- Seq(1, 2)) {
      val got = FuzzyJoin.editDistanceJoin(df, "w", df, "w", d)
        .as[(String, String, Int)].collect().toSet
      assert(got === brute(words, d), s"d=$d")
    }
  }

  test("deleteKeys handles empty and single-char strings") {
    val rows = Seq("", "x", "ab").toDF("w")
      .select(col("w"), FuzzyJoin.deleteKeys(col("w"), 1).as("k"))
      .as[(String, Seq[String])].collect().toMap
    assert(rows("") === Seq(""))
    assert(rows("x").toSet === Set("x", ""))
    assert(rows("ab").toSet === Set("ab", "b", "a"))
  }

  test("deleteKeys depth 2 includes two-deletion variants") {
    val k = Seq("abc").toDF("w")
      .select(FuzzyJoin.deleteKeys(col("w"), 2).as("k"))
      .as[Seq[String]].head().toSet
    assert(k === Set("abc", "ab", "ac", "bc", "a", "b", "c"))
  }

  test("null names are dropped, self-pairs carry dist 0") {
    val df = Seq(Some("aa"), None, Some("ab")).toDF("w")
    val got = FuzzyJoin.editDistanceJoin(df, "w", df, "w", 1)
      .as[(String, String, Int)].collect().toSet
    assert(got === Set(("aa", "aa", 0), ("ab", "ab", 0), ("aa", "ab", 1), ("ab", "aa", 1)))
  }
}
