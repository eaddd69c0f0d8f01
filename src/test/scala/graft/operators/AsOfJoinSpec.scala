package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  private def left = Seq(
    (1L, ts("2024-01-01 10:00:00"), "p1"),
    (1L, ts("2024-01-01 12:00:00"), "p2"),
    (2L, ts("2024-01-01 09:00:00"), "p3"), // before any signup for user 2
    (3L, ts("2024-01-01 10:00:00"), "p4")  // ts equal to signup ts
  ).toDF("user_id", "ts", "pid")

  private def right = Seq(
    (1L, ts("2024-01-01 09:00:00"), 100L),
    (1L, ts("2024-01-01 11:00:00"), 101L),
    (1L, ts("2024-01-01 11:00:00"), 102L), // duplicate ts — greater tiebreak wins
    (2L, ts("2024-01-01 10:00:00"), 103L),
    (3L, ts("2024-01-01 10:00:00"), 104L)
  ).toDF("user_id", "rts", "sid")

  private def result = AsOfJoin.asof(left, right, Seq("user_id"), "ts", "rts",
    rightPayload = Seq("sid"), rightTieBreak = Seq("sid"))
    .select("pid", "sid").as[(String, Long)].collect().toMap

  test("latest right row at or before left ts is matched") {
    assert(result("p1") === 100L)
  }
  test("duplicate right timestamps resolved by greatest tie-break") {
    assert(result("p2") === 102L)
  }
  test("left rows with no prior right row are dropped (inner semantics)") {
    assert(!result.contains("p3"))
  }
  test("equal timestamps match (inclusive <=)") {
    assert(result("p4") === 104L)
  }
  test("NULL timestamps never match: null right ts is no payload, null left ts is dropped") {
    val l = Seq(
      (1L, Some(ts("2024-01-01 10:00:00")), "early"), // before any VALID right ts
      (1L, Option.empty[java.sql.Timestamp], "nullts")
    ).toDF("user_id", "ts", "pid")
    val r = Seq(
      (1L, Option.empty[java.sql.Timestamp], 900L), // would sort first and match everything
      (1L, Some(ts("2024-01-01 11:00:00")), 901L)
    ).toDF("user_id", "rts", "sid")
    val m = AsOfJoin.asof(l, r, Seq("user_id"), "ts", "rts", Seq("sid"))
      .select("pid", "sid").as[(String, Long)].collect().toMap
    assert(m.isEmpty) // neither the null-payload match nor the null-left row survives
  }

  test("multi-key as-of join keeps keys separate") {
    val l = Seq((1L, "a", ts("2024-01-01 10:00:00"), "x")).toDF("k1", "k2", "ts", "pid")
    val r = Seq(
      (1L, "a", ts("2024-01-01 09:00:00"), 1L),
      (1L, "b", ts("2024-01-01 09:30:00"), 2L)).toDF("k1", "k2", "rts", "sid")
    val m = AsOfJoin.asof(l, r, Seq("k1", "k2"), "ts", "rts", Seq("sid"))
      .select("pid", "sid").as[(String, Long)].collect().toMap
    assert(m("x") === 1L) // (1,b) row must not leak into key (1,a)
  }

  test("tolerance drops matches staler than the bound, keeps fresh ones") {
    // p1 matched 09:00 (1 h old, within 90 min), p2 matched 11:00 (1 h old),
    // p4 matched 10:00 (0 old). Without tolerance all 4 rows match.
    val all = AsOfJoin.asof(left, right, Seq("user_id"), "ts", "rts",
      rightPayload = Seq("sid"), rightTieBreak = Seq("sid"))
      .select("pid").as[String].collect().toSet
    assert(all === Set("p1", "p2", "p4"))
    val tol = AsOfJoin.asof(left, right, Seq("user_id"), "ts", "rts",
      rightPayload = Seq("sid"), rightTieBreak = Seq("sid"),
      toleranceMs = Some(30L * 60 * 1000)) // 30 min
      .select("pid").as[String].collect().toSet
    assert(tol === Set("p4")) // only the zero-lag match survives
    val tol90 = AsOfJoin.asof(left, right, Seq("user_id"), "ts", "rts",
      rightPayload = Seq("sid"), rightTieBreak = Seq("sid"),
      toleranceMs = Some(90L * 60 * 1000))
      .select("pid").as[String].collect().toSet
    assert(tol90 === Set("p1", "p2", "p4")) // 1 h lags within 90 min
  }

  test("forward direction matches the earliest later right row (inclusive)") {
    val m = AsOfJoin.asof(left, right, Seq("user_id"), "ts", "rts",
      rightPayload = Seq("sid"), rightTieBreak = Seq("sid"), direction = "forward")
      .select("pid", "sid").as[(String, Long)].collect().toMap
    // p1 (10:00) → earliest later = 11:00, greatest tiebreak among equals
    assert(m("p1") === 102L)
    // p2 (12:00) has no later signup → dropped
    assert(!m.contains("p2"))
    // p3 (09:00) → 10:00 signup ahead matches in forward mode
    assert(m("p3") === 103L)
    // equal ts matches inclusively in forward too
    assert(m("p4") === 104L)
  }

  test("nearest direction picks the closer side; ties go backward") {
    val l = Seq(
      (1L, ts("2024-01-01 10:30:00"), "closerBack"), // back 09:00=90m, fwd 11:00=30m
      (1L, ts("2024-01-01 10:00:00"), "tie"),        // back 09:00=60m, fwd 11:00=60m
      (2L, ts("2024-01-01 09:00:00"), "onlyFwd"),
      (3L, ts("2024-01-01 12:00:00"), "onlyBack")
    ).toDF("user_id", "ts", "pid")
    val r = Seq(
      (1L, ts("2024-01-01 09:00:00"), 100L),
      (1L, ts("2024-01-01 11:00:00"), 101L),
      (2L, ts("2024-01-01 10:00:00"), 103L),
      (3L, ts("2024-01-01 10:00:00"), 104L)
    ).toDF("user_id", "rts", "sid")
    val m = AsOfJoin.asof(l, r, Seq("user_id"), "ts", "rts",
      rightPayload = Seq("sid"), rightTieBreak = Seq("sid"), direction = "nearest")
      .select("pid", "sid").as[(String, Long)].collect().toMap
    assert(m("closerBack") === 101L) // forward is closer here
    assert(m("tie") === 100L) // equal distance → backward
    assert(m("onlyFwd") === 103L) // falls back to the only existing side
    assert(m("onlyBack") === 104L)
    // nearest + tolerance uses ABSOLUTE distance
    val tol = AsOfJoin.asof(l, r, Seq("user_id"), "ts", "rts",
      rightPayload = Seq("sid"), rightTieBreak = Seq("sid"), direction = "nearest",
      toleranceMs = Some(45L * 60 * 1000))
      .select("pid").as[String].collect().toSet
    assert(tol === Set("closerBack")) // only the 30-min match survives
  }

  test("tolerance works on numeric (non-timestamp) event-time columns") {
    val l = Seq((1L, 1000L, "x"), (1L, 5000L, "y")).toDF("k", "ts", "pid")
    val r = Seq((1L, 900L, 7L)).toDF("k", "rts", "sid")
    val got = AsOfJoin.asof(l, r, Seq("k"), "ts", "rts", Seq("sid"),
      toleranceMs = Some(500L)) // raw units for numeric ts
      .select("pid").as[String].collect().toSet
    assert(got === Set("x")) // lag 100 ≤ 500; lag 4100 dropped
  }
}
