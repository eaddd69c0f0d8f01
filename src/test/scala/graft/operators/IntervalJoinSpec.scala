package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

class IntervalJoinSpec extends SparkSpec {
  import spark.implicits._

  test("bucketed interval join equals the naive range join, including the w boundary") {
    // crafted: pairs inside w, exactly at w (included), just over w
    // (excluded), equal ts (excluded: strict >), and cross-key (excluded)
    val rows = Seq(
      (1L, 0L), (1L, 50L), (1L, 100L), (1L, 101L),
      (2L, 0L), (2L, 100L), (3L, 10L)
    ).toDF("k", "us")
    val w = 100L
    val bucketed = IntervalJoin.within(rows, rows, Seq("k"), "us", w)
      .select(col("l_us"), col("r_us"), col("l_k")).as[(Long, Long, Long)].collect().toSet
    val e1 = rows.select(col("k").as("k1"), col("us").as("us1"))
    val e2 = rows.select(col("k").as("k2"), col("us").as("us2"))
    val naive = e1.join(e2, col("k1") === col("k2") &&
        col("us2") > col("us1") && col("us2") <= col("us1") + w)
      .select(col("us1"), col("us2"), col("k1")).as[(Long, Long, Long)].collect().toSet
    assert(bucketed === naive)
    assert(naive.contains((0L, 100L, 1L)))  // boundary r.ts = l.ts + w included
    assert(!naive.contains((0L, 101L, 1L))) // just over w excluded
  }

  test("negative and huge timestamps bucket exactly (floor-div, no double rounding)") {
    // negatives exercise the trunc-vs-floor correction; the 2^53+ values
    // would mis-bucket under double division (floor(x/w) loses ulps there)
    val big = (1L << 53) + 1L
    val rows = Seq(
      (1L, -150L), (1L, -100L), (1L, -50L), (1L, 0L),
      (2L, big), (2L, big + 100L), (2L, big + 101L)
    ).toDF("k", "us")
    val w = 100L
    val bucketed = IntervalJoin.within(rows, rows, Seq("k"), "us", w)
      .select(col("l_us"), col("r_us")).as[(Long, Long)].collect().toSet
    val e1 = rows.select(col("k").as("k1"), col("us").as("us1"))
    val e2 = rows.select(col("k").as("k2"), col("us").as("us2"))
    val naive = e1.join(e2, col("k1") === col("k2") &&
        col("us2") > col("us1") && col("us2") <= col("us1") + w)
      .select(col("us1"), col("us2")).as[(Long, Long)].collect().toSet
    assert(bucketed === naive)
    assert(naive.contains((big, big + 100L)))
    assert(!naive.contains((big, big + 101L)))
  }

  test("bucketed interval join equals the naive join on real event data") {
    val ev = Tables(spark, sf001, "events").select(col("user_id"), unix_micros(col("ts")).as("us"))
    val bucketed = IntervalJoin.within(ev, ev, Seq("user_id"), "us", 300000000L).count()
    val e1 = ev.select(col("user_id").as("u1"), col("us").as("us1"))
    val e2 = ev.select(col("user_id").as("u2"), col("us").as("us2"))
    val naive = e1.join(e2, col("u1") === col("u2") &&
        col("us2") > col("us1") && col("us2") <= col("us1") + 300000000L).count()
    assert(bucketed === naive)
    assert(naive > 0L)
  }

  test("the bucketed plan is an equi hash/merge join, not a nested loop") {
    val ev = Tables(spark, sf001, "events").select(col("user_id"), unix_micros(col("ts")).as("us"))
    val big = ev.hint("merge") // force non-broadcast path to inspect the algorithm
    val plan = IntervalJoin.within(big, big, Seq("user_id"), "us", 300000000L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan.take(2000))
  }
}
