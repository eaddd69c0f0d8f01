package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join (SURVEY.md §2.3 J9): for each left row, attach the latest right
  * row with the same key and `right.ts <= left.ts` (inner semantics — left
  * rows with no prior right row are dropped).
  *
  * Spark has no built-in ASOF join. A naive range-join + per-left-row argmax
  * explodes row counts quadratically in skewed keys. This implementation uses
  * the union + running-`last` pattern instead: one shuffle on the key, one
  * sort per partition, zero row amplification — it scales linearly at 100 TB
  * because it is a single window over `(key ORDER BY ts, side)`.
  *
  * Tie rules (pinned so the DuckDB `ASOF JOIN` / max_by oracle agrees):
  *  - `right.ts == left.ts` matches (inclusive), because right rows sort
  *    before left rows at equal ts.
  *  - duplicate right timestamps: the one greatest by `rightTieBreak` wins
  *    (it sorts last, and the running `last` picks it up).
  */
object AsOfJoin {

  /** SQL surface: registers the table-valued function
    *
    * {{{ SELECT * FROM asof_join('left_view', 'right_view',
    *       'k1,k2', 'left_ts', 'right_ts', 'payload1,payload2'[, tol_ms]) }}}
    *
    * so SQL-only users (the DuckDB `ASOF JOIN` / pandas `merge_asof`
    * audience) can call [[asof]] without the library API — arguments are
    * literal view/column names, resolved against the session catalog at
    * analysis time; the plan produced is identical to the API call's.
    *
    * The pure-SQL rewrite (no function registration needed) is the
    * window-SQL twin shipped as `b13_asof` in SqlQueries: tag both sides,
    * UNION, running `last(CASE WHEN side = 0 THEN ts END, true)` over
    * (key ORDER BY ts, side, tiebreak), keep side = 1 rows with a match —
    * the same single-shuffle plan this object builds. */
  def registerSqlSurface(spark: org.apache.spark.sql.SparkSession): Unit = {
    import org.apache.spark.sql.catalyst.expressions.{Expression, Literal}
    import org.apache.spark.sql.graft.Bridge
    def str(e: Expression, what: String): String = e match {
      case Literal(v, org.apache.spark.sql.types.StringType) if v != null => v.toString
      case other => throw new IllegalArgumentException(
        s"asof_join: $what must be a string literal, got $other")
    }
    def csv(e: Expression, what: String): Seq[String] =
      str(e, what).split(",").map(_.trim).filter(_.nonEmpty).toSeq
    Bridge.registerTableFunction(spark, "asof_join", { args =>
      require(args.length == 6 || args.length == 7,
        "asof_join(left_view, right_view, keys_csv, left_ts, right_ts, payload_csv[, tolerance_ms])")
      val tol = args.lift(6).map {
        case Literal(v: Number, _) => v.longValue
        case other => throw new IllegalArgumentException(
          s"asof_join: tolerance_ms must be an integer literal, got $other")
      }
      Bridge.logicalPlan(asof(
        spark.table(str(args(0), "left_view")),
        spark.table(str(args(1), "right_view")),
        csv(args(2), "keys_csv"),
        str(args(3), "left_ts"),
        str(args(4), "right_ts"),
        csv(args(5), "payload_csv"),
        toleranceMs = tol))
    })
  }

  /** @param keys          equi-join key column names (present on both sides)
    * @param leftTs        event-time column on `left`
    * @param rightTs       event-time column on `right`
    * @param rightPayload  right columns to carry onto matched left rows
    *                      (emitted with their own names; must not collide
    *                      with left column names)
    * @param rightTieBreak column ordering duplicate right timestamps;
    *                      greatest value wins
    * @param toleranceMs   optional max staleness (pandas merge_asof
    *                      `tolerance`): a left row only matches if the
    *                      as-of right row is at most this many ms away.
    *                      Exact as a post-filter — the matched right row is
    *                      by construction the NEAREST in its direction, so
    *                      no other candidate could have qualified instead.
    * @param direction     `backward` (default): latest right with
    *                      rts <= lts; `forward`: earliest right with
    *                      rts >= lts; `nearest`: whichever of the two is
    *                      closer in time, ties to backward (pandas
    *                      merge_asof's direction semantics). All three run
    *                      as windows over ONE shuffle of the tagged union —
    *                      nearest costs a second sort, never a second
    *                      shuffle or a range join.
    */
  def asof(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTs: String,
      rightTs: String,
      rightPayload: Seq[String],
      rightTieBreak: Seq[String] = Nil,
      toleranceMs: Option[Long] = None,
      direction: String = "backward"): DataFrame = {
    require(Set("backward", "forward", "nearest")(direction),
      s"asof direction must be backward|forward|nearest, got '$direction'")

    val leftCols = left.columns.toSeq
    val payloadStruct = struct((rightTs +: rightPayload).distinct.map(col): _*)

    // NULL timestamps never satisfy right.ts <= left.ts: a NULL right ts
    // would sort FIRST (asc = nulls first) with a non-null payload struct
    // and wrongly match every left row; a NULL left ts row can never match.
    val rightValid = right.where(col(rightTs).isNotNull)
    val leftValid = left.where(col(leftTs).isNotNull)

    val taggedRight = rightValid.select(
      keys.map(col) ++ Seq(
        col(rightTs).as("__ts"),
        lit(0).as("__side"),
        payloadStruct.as("__rpay")) ++
        rightTieBreak.zipWithIndex.map { case (c, i) => col(c).as(s"__tie$i") }: _*)

    val tieNulls =
      rightTieBreak.indices.map(i => lit(null).cast(taggedRight.schema(s"__tie$i").dataType).as(s"__tie$i"))
    val taggedLeft = leftValid.select(
      leftCols.map(col) ++ Seq(
        col(leftTs).as("__ts"),
        lit(1).as("__side"),
        lit(null).cast(taggedRight.schema("__rpay").dataType).as("__rpay")) ++ tieNulls: _*)

    // unionByName aligns the two shapes; missing left columns on the right
    // side become NULL (never read back for right rows).
    val unioned = taggedRight.unionByName(taggedLeft, allowMissingColumns = true)

    // Right rows (side=0) sort before left rows (side=1) at equal ts in
    // BOTH traversal directions → inclusive match at equal timestamps;
    // among equal right ts the greatest tie-break is seen last and wins.
    def w(tsOrd: Column) = Window
      .partitionBy(keys.map(col): _*)
      .orderBy(tsOrd +: col("__side").asc +: rightTieBreak.indices.map(i => col(s"__tie$i").asc): _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val backwardW = w(col("__ts").asc) // running last over ascending ts = latest prior
    val forwardW = w(col("__ts").desc) // running last over descending ts = earliest later

    // signed ms distance from a match timestamp to the row's own __ts; the
    // type dispatch keeps asof's type-generic ts support: timestamps via
    // unix_millis, dates via whole-day datediff, numerics raw (caller's own
    // ms units) — date minus date would otherwise produce an INTERVAL that
    // fails analysis when compared to a Long.
    import org.apache.spark.sql.types.{DateType, NumericType, TimestampNTZType, TimestampType}
    def lagMs(matchTs: Column): Column = taggedRight.schema("__ts").dataType match {
      case TimestampType => unix_millis(col("__ts")) - unix_millis(matchTs)
      // NTZ: reinterpret the wall-clock value as a UTC instant for the
      // distance arithmetic — both sides shift identically, so signed
      // distances (and therefore tolerance/nearest picks) are unchanged.
      case TimestampNTZType =>
        unix_millis(col("__ts").cast(TimestampType)) - unix_millis(matchTs.cast(TimestampType))
      case DateType => datediff(col("__ts"), matchTs).cast("long") * lit(86400000L)
      case _: NumericType => col("__ts") - matchTs
      case other => throw new IllegalArgumentException(
        s"asof tolerance/nearest needs a timestamp, date, or numeric event-time column; got $other")
    }

    val matched = (direction match {
      case "backward" => unioned.withColumn("__match", last(col("__rpay"), ignoreNulls = true).over(backwardW))
      case "forward" => unioned.withColumn("__match", last(col("__rpay"), ignoreNulls = true).over(forwardW))
      case "nearest" =>
        // both candidates from the SAME shuffled partition (two sorts, one
        // exchange); choose the smaller absolute distance, ties backward
        val both = unioned
          .withColumn("__bm", last(col("__rpay"), ignoreNulls = true).over(backwardW))
          .withColumn("__fm", last(col("__rpay"), ignoreNulls = true).over(forwardW))
        val bLag = lagMs(col(s"__bm.$rightTs")) // >= 0 when both exist
        val fLag = -lagMs(col(s"__fm.$rightTs")) // >= 0 when both exist
        both.withColumn("__match",
          when(col("__bm").isNull, col("__fm"))
            .when(col("__fm").isNull, col("__bm"))
            .when(fLag < bLag, col("__fm"))
            .otherwise(col("__bm")))
          .drop("__bm", "__fm")
    }).where(col("__side") === 1 && col("__match").isNotNull)

    val withinTolerance = toleranceMs match {
      case None => matched
      case Some(ms) => matched.where(abs(lagMs(col(s"__match.$rightTs"))) <= ms)
    }
    val out = leftCols.map(col) ++
      (rightTs +: rightPayload).distinct.map(c => col(s"__match.$c").as(c))
    withinTolerance.select(out: _*)
  }

  /** Single-scan variant: when both sides come from the SAME table (e.g.
    * purchases as-of signups within one events table), pre-union scanning
    * reads the source twice; this overload takes the already-tagged frame
    * and runs the same running-`last` window over it — one scan, one
    * shuffle. `sideCol` must be 0 for right rows, 1 for left rows.
    */
  def asofTagged(
      tagged: DataFrame,
      keys: Seq[String],
      ts: String,
      sideCol: String,
      tieBreak: String,
      matchedTs: String): DataFrame = {
    val w = Window
      .partitionBy(keys.map(col): _*)
      .orderBy(col(ts).asc, col(sideCol).asc, col(tieBreak).asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    tagged
      .where(col(ts).isNotNull) // same NULL-ts rule as asof()
      .withColumn(matchedTs,
        last(when(col(sideCol) === 0, col(ts)), ignoreNulls = true).over(w))
      .where(col(sideCol) === 1 && col(matchedTs).isNotNull)
  }
}
