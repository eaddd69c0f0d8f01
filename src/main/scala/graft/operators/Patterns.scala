package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Ordered event-SEQUENCE pattern matching per key — the MATCH_RECOGNIZE
  * core (`PATTERN (A B C)` with `AFTER MATCH SKIP TO NEXT ROW`) as a
  * declarative Spark plan, generalizing the funnel operator (W11): where
  * the funnel only asks "did each stage's min timestamp come in order",
  * this binds each match to CONCRETE events in strict row order, supports
  * overlapping matches, a bound on total match duration, and a
  * no-intervening-event guard.
  *
  * Semantics (earliest-next, a.k.a. skip-till-next-match greedy): every
  * row matching stage 1 starts a candidate; stage i+1 binds to the
  * EARLIEST row strictly after stage i's row (strict (ts, tie) order, so
  * equal timestamps are deterministic); a candidate survives if every
  * stage binds, no guard row falls strictly between consecutive bound
  * stages, and `ts_k - ts_1 <= withinSeconds`. One output row per
  * surviving candidate: the key plus `ts_1 .. ts_k` bind timestamps.
  * A row matching BOTH a stage and the guard predicate binds as the stage
  * (the guard only excludes rows BETWEEN bound stages).
  *
  * Plan shape (the 100 TB story): one `row_number` + all the
  * min-over-following "next stage position" columns share ONE window
  * shuffle on the key; each of the k−1 stage binds is then an equi-join
  * on (key, position) — shuffles stay on the key domain, state is one
  * row per event, and nothing ever materializes a per-key event list, so
  * hot keys cost what their row counts cost (AQE skew handling applies).
  * The windowed input is localCheckpoint'ed once and probed k−1 times
  * (the same self-join reuse move as Dedup's pair joins).
  */
object Patterns {

  /** @param stages  ordered (name, predicate) stages, ≥ 2
    * @param withinSeconds  max `ts_last − ts_first` for a match, in seconds
    * @param noIntervening  rows matching this must not occur strictly
    *                       between consecutive bound stages
    * @return one row per match: key, ts_1 .. ts_k (ascending stage order)
    */
  def sequenceMatches(df: DataFrame, keyCol: String, tsCol: String, tieCol: String,
      stages: Seq[(String, Column)],
      withinSeconds: Option[Long] = None,
      noIntervening: Option[Column] = None): DataFrame = {
    require(stages.size >= 2, s"a sequence pattern needs >= 2 stages, got ${stages.size}")
    val k = stages.size
    val key = col(keyCol)
    val ordW = Window.partitionBy(key).orderBy(col(tsCol).asc, col(tieCol).asc)
    val follW = Window.partitionBy(key).orderBy(col("_pos").asc)
      .rowsBetween(1, Window.unboundedFollowing)

    // One shuffle: dense per-key position, then every "earliest later row
    // of stage i" / guard position as sibling aggregates over one window.
    var base = df.withColumn("_pos", row_number().over(ordW))
    (1 until k).foreach { i =>
      base = base.withColumn(s"_next_$i", min(when(stages(i)._2, col("_pos"))).over(follW))
    }
    noIntervening.foreach { g =>
      base = base.withColumn("_next_g", min(when(g, col("_pos"))).over(follW))
    }
    val scanned = base.localCheckpoint()

    val guarded = noIntervening.isDefined
    // Stage-1 candidates carry their own next-stage pointer (and guard
    // pointer); each join binds the pointed-at row and inherits ITS
    // pointers for the next hop.
    var m = scanned.where(stages.head._2).select(
      key +: col(tsCol).as("ts_1") +: col("_next_1").as("_nx") +:
        (if (guarded) Seq(col("_next_g").as("_g")) else Nil): _*)

    (1 until k).foreach { i =>
      val stageNo = i + 1
      val b = scanned.select(
        col(keyCol).as("_bk") +: col("_pos").as("_bpos") +:
          col(tsCol).as(s"ts_$stageNo") +:
          ((if (stageNo < k) Seq(col(s"_next_$stageNo").as("_nx2")) else Nil) ++
            (if (guarded) Seq(col("_next_g").as("_g2")) else Nil)): _*)
      val joinCond = key === col("_bk") && col("_nx") === col("_bpos") &&
        (if (guarded) col("_g").isNull || col("_g") >= col("_bpos") else lit(true))
      m = m.join(b, joinCond).drop("_bk", "_bpos", "_nx", "_g")
      if (stageNo < k) m = m.withColumnRenamed("_nx2", "_nx")
      if (guarded && stageNo < k) m = m.withColumnRenamed("_g2", "_g")
      else if (guarded) m = m.drop("_g2")
    }

    withinSeconds.foreach { s =>
      m = m.where(
        unix_micros(col(s"ts_$k")) - unix_micros(col("ts_1")) <= s * 1000000L)
    }
    m.select(key +: (1 to k).map(i => col(s"ts_$i")): _*)
  }
}
