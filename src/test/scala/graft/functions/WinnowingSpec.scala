package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class WinnowingSpec extends SparkSpec {
  import spark.implicits._

  private def fps(text: String, k: Int = 5, w: Int = 4): Set[Long] =
    Seq(text).toDF("text")
      .select(TextFunctions.winnowedFingerprints(
        TextFunctions.rollingKgramHashes(col("text"), k), w).as("fp"))
      .as[Seq[Long]].head().toSet

  test("winnowing guarantee: a shared run of w+k-1 tokens shares a fingerprint") {
    // k=5, w=4 → any 8-token run common to two docs must yield ≥1 common
    // fingerprint (Schleimer et al., theorem 1)
    val shared = "alpha beta gamma delta epsilon zeta eta theta" // 8 tokens
    val a = s"one two three $shared four five six"
    val b = s"seven eight $shared nine ten eleven twelve"
    assert(fps(a).intersect(fps(b)).nonEmpty)
    // and unrelated docs share nothing
    val c = "completely different words with no overlap at all whatsoever here"
    assert(fps(a).intersect(fps(c)).isEmpty)
  }

  test("degenerate sizes: short docs and few k-grams") {
    // < k tokens → no k-grams → EMPTY fingerprints (not [null]: a null
    // element would make every sub-k doc "share" a fingerprint)
    val short = Seq("a b c").toDF("text")
      .select(TextFunctions.rollingKgramHashes(col("text"), 5).as("kg"))
      .as[Seq[Long]].head()
    assert(short.isEmpty)
    assert(fps("a b c").isEmpty)
    // exactly k tokens → one k-gram → winnow emits exactly that hash
    val one = fps("alpha beta gamma delta epsilon")
    assert(one.size === 1)
  }

  test("fingerprints are position-invariant for identical content") {
    val doc = "the quick brown fox jumps over the lazy dog today again tonight"
    assert(fps(doc) === fps(doc))
    // a pure suffix shift changes positions but the shared-run guarantee
    // still forces overlap with the original
    assert(fps(s"prefix words here $doc").intersect(fps(doc)).nonEmpty)
  }
}
