package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Sequence pattern matching (Patterns.sequenceMatches): earliest-next
  * binding, overlap, guard exclusion, within bound, tie determinism. */
class PatternsSpec extends SparkSpec {
  import spark.implicits._

  private def ev(rows: (Long, String, String)*) =
    rows.zipWithIndex.map { case ((u, t, e), i) => (u, ts(t), i.toLong, e) }
      .toDF("u", "ts", "id", "e")

  private val abc = Seq(
    "a" -> (col("e") === "a"), "b" -> (col("e") === "b"), "c" -> (col("e") === "c"))

  private def run(df: org.apache.spark.sql.DataFrame,
      within: Option[Long] = None,
      guard: Option[org.apache.spark.sql.Column] = None) =
    Patterns.sequenceMatches(df, "u", "ts", "id", abc, within, guard)
      .orderBy(col("u"), col("ts_1"))
      .collect().map(r => (r.getLong(0),
        r.getTimestamp(1).toString, r.getTimestamp(2).toString, r.getTimestamp(3).toString))

  test("binds each stage to the earliest strictly-later row") {
    val df = ev(
      (1L, "2024-01-01 10:00:00", "a"),
      (1L, "2024-01-01 10:05:00", "b"),
      (1L, "2024-01-01 10:06:00", "b"), // later b ignored: earliest-next
      (1L, "2024-01-01 10:10:00", "c"))
    assert(run(df) === Seq((1L,
      "2024-01-01 10:00:00.0", "2024-01-01 10:05:00.0", "2024-01-01 10:10:00.0")))
  }

  test("overlapping matches: every stage-1 row starts its own candidate") {
    val df = ev(
      (1L, "2024-01-01 10:00:00", "a"),
      (1L, "2024-01-01 10:01:00", "a"),
      (1L, "2024-01-01 10:05:00", "b"),
      (1L, "2024-01-01 10:10:00", "c"))
    // both a's bind the SAME (b, c) — skip-to-next-row semantics
    assert(run(df).map(_._1) === Seq(1L, 1L))
  }

  test("stage order is strict: b before a does not match") {
    val df = ev(
      (1L, "2024-01-01 10:05:00", "b"),
      (1L, "2024-01-01 10:06:00", "a"),
      (1L, "2024-01-01 10:10:00", "c"))
    assert(run(df).isEmpty) // no b after the a
  }

  test("guard kills matches with an intervening row, between ANY stage pair") {
    val between_ab = ev(
      (1L, "2024-01-01 10:00:00", "a"),
      (1L, "2024-01-01 10:02:00", "x"),
      (1L, "2024-01-01 10:05:00", "b"),
      (1L, "2024-01-01 10:10:00", "c"))
    val between_bc = ev(
      (1L, "2024-01-01 10:00:00", "a"),
      (1L, "2024-01-01 10:05:00", "b"),
      (1L, "2024-01-01 10:07:00", "x"),
      (1L, "2024-01-01 10:10:00", "c"))
    val outside = ev(
      (1L, "2024-01-01 09:00:00", "x"), // before the match: harmless
      (1L, "2024-01-01 10:00:00", "a"),
      (1L, "2024-01-01 10:05:00", "b"),
      (1L, "2024-01-01 10:10:00", "c"),
      (1L, "2024-01-01 11:00:00", "x")) // after: harmless
    val g = Some(col("e") === "x")
    assert(run(between_ab, guard = g).isEmpty)
    assert(run(between_bc, guard = g).isEmpty)
    assert(run(outside, guard = g).size === 1)
  }

  test("within bound filters on total duration") {
    val df = ev(
      (1L, "2024-01-01 10:00:00", "a"),
      (1L, "2024-01-01 10:30:00", "b"),
      (1L, "2024-01-01 11:30:00", "c"))
    assert(run(df, within = Some(3600L)).isEmpty)         // 90 min > 1 h
    assert(run(df, within = Some(2 * 3600L)).size === 1)  // 90 min <= 2 h
  }

  test("equal timestamps break by tie column, strictly after means later tie") {
    val df = Seq(
      (1L, ts("2024-01-01 10:00:00"), 0L, "a"),
      (1L, ts("2024-01-01 10:00:00"), 1L, "b"), // same ts, later id: binds
      (1L, ts("2024-01-01 10:00:00"), 2L, "c"))
      .toDF("u", "ts", "id", "e")
    assert(run(df).size === 1)
    val reversed = Seq(
      (1L, ts("2024-01-01 10:00:00"), 2L, "a"),
      (1L, ts("2024-01-01 10:00:00"), 1L, "b"), // earlier id than the a: not after
      (1L, ts("2024-01-01 10:00:00"), 0L, "c"))
      .toDF("u", "ts", "id", "e")
    assert(run(reversed).isEmpty)
  }

  test("keys never mix") {
    val df = ev(
      (1L, "2024-01-01 10:00:00", "a"),
      (2L, "2024-01-01 10:05:00", "b"),
      (1L, "2024-01-01 10:10:00", "c"))
    assert(run(df).isEmpty)
  }
}
