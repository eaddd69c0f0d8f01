package graft.operators

import graft.SparkSpec

class SessionizeSpec extends SparkSpec {
  import spark.implicits._

  private val gap30m = 1800000000L // µs

  test("gap strictly greater than threshold opens a new session") {
    val df = Seq(
      (1L, ts("2024-01-01 10:00:00"), 1L),
      (1L, ts("2024-01-01 10:30:00"), 2L), // exactly 30 min → same session (strict >)
      (1L, ts("2024-01-01 11:00:00.000001"), 3L), // 30min + 1µs → new session
      (2L, ts("2024-01-01 10:00:00"), 4L)
    ).toDF("user_id", "ts", "event_id")
    val n = Sessionize.sessionCount(df, "user_id", "ts", "event_id", gap30m)
      .as[Long].head()
    assert(n === 3L) // user1: {e1,e2}, {e3}; user2: {e4}
  }

  test("gap >= mode matches session_window boundary semantics") {
    val df = Seq(
      (1L, ts("2024-01-01 10:00:00"), 1L),
      (1L, ts("2024-01-01 10:30:00"), 2L) // exactly 30 min → NEW session in >= mode
    ).toDF("user_id", "ts", "event_id")
    val sess = Sessionize.withSessionId(df, "user_id", "ts", "event_id", gap30m,
      strictGreater = false)
    assert(sess.agg(org.apache.spark.sql.functions.sum("__is_start")).as[Long].head() === 2L)
  }

  test("session ids are contiguous per key") {
    val df = Seq(
      (1L, ts("2024-01-01 00:00:00"), 1L),
      (1L, ts("2024-01-01 02:00:00"), 2L),
      (1L, ts("2024-01-01 02:10:00"), 3L),
      (1L, ts("2024-01-01 05:00:00"), 4L)
    ).toDF("user_id", "ts", "event_id")
    val ids = Sessionize.withSessionId(df, "user_id", "ts", "event_id", gap30m)
      .orderBy("event_id").select("__session_id").as[Long].collect()
    assert(ids.toSeq === Seq(1L, 2L, 2L, 3L))
  }
}
