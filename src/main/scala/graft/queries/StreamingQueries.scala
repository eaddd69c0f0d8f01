package graft.queries

import graft.GQuery
import graft.streaming.StreamOps

/** ST1–ST6 (SURVEY.md §2.8): Structured Streaming queries run with
  * Trigger.AvailableNow over the static events table; the FINAL output is
  * hash-matched against the declared batch-SQL oracle (the survey's oracle
  * strategy for streams). ST4 (watermark/late data) is fixture-driven — the
  * fixture is derived deterministically from the events table, so it too
  * hash-matches a batch oracle (late half excluded, final open window
  * excluded); finer-grained semantics stay covered in WatermarkSpec. */
object StreamingQueries {

  val st1 = GQuery(
    "st1_tumbling",
    (s, dir) => StreamOps.tumblingCounts(s, dir),
    // identical semantics to the batch tumbling query
    BenchQueries.b10.oracle)

  val st2 = GQuery(
    "st2_sliding",
    (s, dir) => StreamOps.slidingCounts(s, dir),
    // every event falls in exactly 4 sliding windows: starts at
    // bucket15(ts) - k*15min for k=0..3
    Some("""WITH ev AS (SELECT CAST(ts AS TIMESTAMP) AS ts, event_type FROM events),
      x AS (SELECT time_bucket(INTERVAL '15 minutes', ts) - k * INTERVAL '15 minutes' AS wstart, event_type
            FROM ev CROSS JOIN (SELECT unnest([0, 1, 2, 3]) AS k) ks)
      SELECT wstart, event_type, count(*) AS cnt FROM x
      GROUP BY 1, 2 ORDER BY wstart, event_type LIMIT 200"""))

  val st3 = GQuery(
    "st3_session_window",
    (s, dir) => StreamOps.sessionCount(s, dir),
    // session_window opens a new session at gap >= 30 min (strict end-exclusive
    // session extent), hence >= in the lag oracle — vs B9's > convention.
    Some("""SELECT CAST(count(*) AS BIGINT) AS sessions FROM (
      SELECT epoch_us(CAST(ts AS TIMESTAMP)) AS us,
             lag(epoch_us(CAST(ts AS TIMESTAMP))) OVER (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id) AS prev_us
      FROM events) WHERE prev_us IS NULL OR us - prev_us >= 1800000000"""))

  val st4 = GQuery(
    "st4_watermark",
    (s, dir) => StreamOps.watermarkLateDrop(s, dir),
    // on-time half only (late file is entirely behind the watermark), and
    // only windows finalized by the last watermark (end <= max ts - 1 min)
    Some("""WITH ev AS (SELECT CAST(ts AS TIMESTAMP) AS ts, event_type FROM events),
      b AS (SELECT date_trunc('day', min(ts)) + INTERVAL 15 DAY AS split,
                   max(ts) - INTERVAL 1 MINUTE AS wm FROM ev)
      SELECT date_trunc('hour', ts) AS hour, event_type, count(*) AS cnt
      FROM ev, b
      WHERE ts >= split AND date_trunc('hour', ts) + INTERVAL 1 HOUR <= wm
      GROUP BY 1, 2 ORDER BY hour, event_type"""))

  val st5 = GQuery(
    "st5_stream_dedup",
    (s, dir) => StreamOps.streamingDedupCounts(s, dir),
    // doubled input deduped on event_id == single-copy batch counts
    Some("SELECT event_type, count(*) AS cnt FROM events GROUP BY event_type ORDER BY event_type"))

  val st6 = GQuery(
    "st6_stateful_totals",
    (s, dir) => StreamOps.statefulPurchaseTotals(s, dir),
    Some("""SELECT user_id, round(sum(value), 2) AS total FROM events
      WHERE event_type = 'purchase' GROUP BY user_id ORDER BY user_id LIMIT 100"""))

  val st7 = GQuery(
    "st7_stream_join",
    (s, dir) => StreamOps.purchaseSignupJoin(s, dir),
    // every (purchase, signup) pair of the same user with the signup in the
    // 7 days up to the purchase — plain join semantics, not as-of
    Some("""WITH p AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, value FROM events WHERE event_type = 'purchase'),
      s AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts FROM events WHERE event_type = 'signup')
      SELECT count(*) AS matched, round(sum(p.value), 2) AS total_value
      FROM p JOIN s ON s.user_id = p.user_id
        AND p.ts >= s.ts AND p.ts <= s.ts + INTERVAL 7 DAY"""))

  val st12 = GQuery(
    "st12_stream_outer_join",
    (s, dir) => StreamOps.purchaseSignupLeftJoin(s, dir),
    // LEFT OUTER stream-stream join: matched pairs plus null-padded
    // unmatched purchases; the 3-hour left-side cutoff (watermark-flush
    // bound for AvailableNow termination) is applied identically here
    Some("""WITH mx AS (SELECT max(CAST(ts AS TIMESTAMP)) - INTERVAL 3 HOUR AS c FROM events),
      p AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, value FROM events
            WHERE event_type = 'purchase' AND CAST(ts AS TIMESTAMP) <= (SELECT c FROM mx)),
      s AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts FROM events WHERE event_type = 'signup')
      SELECT count(*) AS rows_out, count(s.user_id) AS matched,
        count(*) - count(s.user_id) AS unmatched,
        round(sum(p.value), 2) AS total_value
      FROM p LEFT JOIN s ON s.user_id = p.user_id
        AND p.ts >= s.ts AND p.ts <= s.ts + INTERVAL 7 DAY"""))

  val st8 = GQuery(
    "st8_dedup_within_watermark",
    (s, dir) => StreamOps.streamingDedupWithinWatermark(s, dir),
    // doubled input deduped on event_id == single-copy batch counts
    st5.oracle)

  val st9 = GQuery(
    "st9_tws_totals",
    (s, dir) => StreamOps.twsPurchaseTotals(s, dir),
    // ST6 semantics re-expressed on transformWithState — same batch oracle
    st6.oracle)

  val st10 = GQuery(
    "st10_stream_static_join",
    (s, dir) => StreamOps.streamStaticSegmentRevenue(s, dir),
    // stateless stream-static join == plain batch join on the same data
    Some("""SELECT c_mktsegment, count(*) AS n_purchases, round(sum(value), 2) AS revenue
      FROM events JOIN customer ON user_id = c_custkey
      WHERE event_type = 'purchase'
      GROUP BY c_mktsegment ORDER BY c_mktsegment"""))

  /** ST7 extended: streaming file source → exactly-once Delta sink (txn
    * idempotency actions) → log-replay read back. Three landing files →
    * three micro-batches → three Delta versions; final table equals the
    * batch aggregate. */
  val st11 = GQuery(
    "st11_delta_sink",
    (s, dir) => {
      import org.apache.spark.sql.functions._
      val landing = java.nio.file.Files.createTempDirectory("graft_st11_landing").toString
      graft.Tables(s, dir, "events")
        .select(col("event_id"), col("value"), col("event_type"))
        .repartition(3).write.mode("overwrite").parquet(landing)
      val schema = s.read.parquet(landing).schema
      val table = java.nio.file.Files.createTempDirectory("graft_st11_delta").toString + "/tbl"
      StreamOps.deltaSink(s, landing, schema, table, appId = "st11")
      graft.sources.DeltaRead.snapshot(s, table)
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("cnt"), round(sum(col("value")), 2).as("sum_value"))
        .orderBy(col("event_type"))
    },
    Some("""SELECT event_type, count(*) AS cnt, round(sum(value), 2) AS sum_value
      FROM events GROUP BY event_type ORDER BY event_type"""))

  /** ST13: streaming file source → exactly-once Iceberg sink (snapshot-
    * summary high-water ledger) → spec-path read back. Three landing files
    * → three micro-batches → three Iceberg snapshots; final table equals
    * the batch aggregate — the st11 shape on the other open format. */
  val st13 = GQuery(
    "st13_iceberg_sink",
    (s, dir) => {
      import org.apache.spark.sql.functions._
      val landing = java.nio.file.Files.createTempDirectory("graft_st13_landing").toString
      graft.Tables(s, dir, "events")
        .select(col("event_id"), col("value"), col("event_type"))
        .repartition(3).write.mode("overwrite").parquet(landing)
      val schema = s.read.parquet(landing).schema
      val table = java.nio.file.Files.createTempDirectory("graft_st13_ice").toString + "/tbl"
      StreamOps.icebergSink(s, landing, schema, table, appId = "st13")
      graft.sources.IcebergRead.snapshot(s, table)
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("cnt"), round(sum(col("value")), 2).as("sum_value"))
        .orderBy(col("event_type"))
    },
    st11.oracle)

  /** ST14: streaming DELTA SOURCE (LakeSources.delta) — tail a Delta table
    * across two runs of one checkpoint (initial snapshot, then only the
    * new commits); complete-mode totals equal the batch aggregate exactly
    * when offset recovery is exactly-once. */
  val st14 = GQuery(
    "st14_delta_source",
    (s, dir) => StreamOps.tailLakeTotals(s, dir, "delta"),
    st11.oracle)

  /** ST15: streaming ICEBERG SOURCE — the st14 shape on the other open
    * format (snapshot-id offsets resolved against commit lineage). */
  val st15 = GQuery(
    "st15_iceberg_source",
    (s, dir) => StreamOps.tailLakeTotals(s, dir, "iceberg"),
    st11.oracle)

  /** ST16: continuous cross-format MV maintenance — a Delta source's
    * CHANGELOG stream (inserts AND DV-deletes) applied per micro-batch to
    * a keyed Iceberg target across two checkpointed runs; the final MV
    * equals the batch query over what survived at the source. */
  val st16 = GQuery(
    "st16_changelog_mv",
    (s, dir) => {
      import org.apache.spark.sql.functions._
      val base = java.nio.file.Files.createTempDirectory("graft_st16").toString
      val src = s"$base/src"
      val dst = s"$base/dst"
      val ckpt = s"$base/ckpt"
      val ev = graft.Tables(s, dir, "events")
        .select(col("event_id"), col("user_id"), col("value"), col("event_type"))
      graft.sources.DeltaWrite.append(s, ev.where(pmod(col("event_id"), lit(3)) === 0), src)
      StreamOps.changelogApplyStream(s, src, dst, "iceberg", Seq("event_id"), ckpt)
      graft.sources.DeltaWrite.append(s, ev.where(pmod(col("event_id"), lit(3)) === 1), src)
      graft.sources.DeltaWrite.deleteWhere(s, src, col("event_type") === "error")
      StreamOps.changelogApplyStream(s, src, dst, "iceberg", Seq("event_id"), ckpt)
      graft.sources.IcebergRead.snapshot(s, dst)
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("cnt"), round(sum(col("value")), 2).as("sum_value"))
        .orderBy(col("event_type"))
    },
    Some("""SELECT event_type, count(*) AS cnt, round(sum(value), 2) AS sum_value
      FROM events WHERE event_id % 3 <= 1 AND event_type <> 'error'
      GROUP BY event_type ORDER BY event_type"""))

  /** ST18: incremental AGGREGATE MV — per-key (count, sum) maintained from
    * a Delta source's changelog by ADDITIVE deltas across two checkpointed
    * runs (exactly-once via Delta txn marks; measures in integer cents so
    * the incremental accumulation is bit-exact regardless of batch
    * boundaries). The final view must equal the from-scratch aggregation
    * over what survived at the source. */
  val st18 = GQuery(
    "st18_aggregate_mv",
    (s, dir) => {
      import org.apache.spark.sql.functions._
      val base = java.nio.file.Files.createTempDirectory("graft_st18").toString
      val src = s"$base/src"
      val dst = s"$base/mv"
      val ckpt = s"$base/ckpt"
      val ev = graft.Tables(s, dir, "events")
        .select(col("event_id"), col("user_id"), col("value"), col("event_type"))
      def run(): Unit = StreamOps.aggregateMvStream(s, src, dst, Seq("event_type"),
        Seq("sum_cents" -> round(col("value") * 100)), appId = "st18_mv", checkpointDir = ckpt)
      graft.sources.DeltaWrite.append(s, ev.where(pmod(col("event_id"), lit(3)) === 0), src)
      run()
      graft.sources.DeltaWrite.append(s, ev.where(pmod(col("event_id"), lit(3)) === 1), src)
      graft.sources.DeltaWrite.deleteWhere(s, src, col("event_type") === "error")
      run()
      graft.sources.DeltaRead.snapshot(s, dst)
        .select(col("event_type"), col("mv_cnt").as("cnt"),
          round(col("sum_cents") / 100.0, 2).as("sum_value"))
        .orderBy(col("event_type"))
    },
    Some("""SELECT event_type, count(*) AS cnt,
      round(sum(CAST(round(value * 100) AS BIGINT)) / 100.0, 2) AS sum_value
      FROM events WHERE event_id % 3 <= 1 AND event_type <> 'error'
      GROUP BY event_type ORDER BY event_type"""))

  /** ST19: streaming geofence — the J14 grid join applied verbatim to a
    * streaming points frame (stateless stream-static equi-join on the
    * (band, cell) key + codegen'd ray cast). Oracle = the batch
    * crossing-parity SQL over the same derived sites. */

  /** ST20: streaming full MERGE — an adds-only command stream drives one
    * conditional merge per micro-batch into a keyed Delta state table
    * (delete commands retract, updates replace, unknown non-error keys
    * insert), across two checkpointed runs. Oracle = the same set algebra
    * recomputed from raw events. */
  val st20 = GQuery(
    "st20_stream_merge",
    (s, dir) => {
      import org.apache.spark.sql.functions._
      val base = java.nio.file.Files.createTempDirectory("graft_st20").toString
      val src = s"$base/cmds"
      val dst = s"$base/state"
      val ckpt = s"$base/ckpt"
      val ev = graft.Tables(s, dir, "events")
        .select(col("event_id"), col("value"), col("event_type"))
      // the maintained table seeds with the even keys; commands carry
      // DOUBLED values so every applied merge is visible in the sums
      graft.sources.DeltaWrite.append(s, ev.where(pmod(col("event_id"), lit(2)) === 0), dst)
      val cmds = ev.select(col("event_id"),
        (col("value") * 2).as("value"), col("event_type"))
      val matched = Seq(
        (Some(expr("event_type = 'error'")), graft.sources.Lake.MergeDelete),
        (Option.empty[org.apache.spark.sql.Column],
          graft.sources.Lake.MergeUpdate(Nil)))
      val notMatched = Some(Some(expr("event_type <> 'error'")))
      def run(): Unit = StreamOps.mergeStream(s, src, dst, "delta",
        Seq("event_id"), matched, notMatched, ckpt)
      graft.sources.DeltaWrite.append(s, cmds.where(pmod(col("event_id"), lit(3)) === 0), src)
      run()
      graft.sources.DeltaWrite.append(s, cmds.where(pmod(col("event_id"), lit(3)) === 1), src)
      run()
      graft.sources.Lake.read(s, dst)
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("cnt"), round(sum(col("value")), 2).as("sum_value"))
        .orderBy(col("event_type"))
    },
    Some("""WITH t0 AS (SELECT event_id, value, event_type FROM events
        WHERE event_id % 2 = 0),
      cmds AS (SELECT event_id, value * 2 AS value, event_type FROM events
        WHERE event_id % 3 <= 1),
      merged AS (
        SELECT * FROM t0 WHERE event_id NOT IN (SELECT event_id FROM cmds)
        UNION ALL
        SELECT * FROM cmds WHERE event_type <> 'error')
      SELECT event_type, count(*) AS cnt, round(sum(value), 2) AS sum_value
      FROM merged GROUP BY event_type ORDER BY event_type"""))

  /** ST21: streaming MERGE WITH SCHEMA EVOLUTION — the command stream's
    * SCHEMA evolves mid-stream (run 2's batches carry a new `tag` column
    * the state table does not have): the merge extends the target
    * (nullable), matched rows gain the tag, pre-evolution rows read NULL.
    * Oracle = the same two-step set algebra over raw events. */
  val st21 = GQuery(
    "st21_stream_merge_evolve",
    (s, dir) => {
      import org.apache.spark.sql.functions._
      val base = java.nio.file.Files.createTempDirectory("graft_st21").toString
      val (src, dst, ckpt) = (s"$base/cmds", s"$base/state", s"$base/ckpt")
      val ev = graft.Tables(s, dir, "events")
        .select(col("event_id"), col("value"), col("event_type"))
      graft.sources.DeltaWrite.append(s,
        ev.where(pmod(col("event_id"), lit(2)) === 0)
          .select(col("event_id"), col("value")), dst)
      val matched = Seq((Option.empty[org.apache.spark.sql.Column],
        graft.sources.Lake.MergeUpdate(Nil)))
      def run(): Unit = StreamOps.mergeStream(s, src, dst, "delta",
        Seq("event_id"), matched, Some(None), ckpt, evolveSchema = true)
      // run 1: commands in the state table's own 2-column shape
      graft.sources.DeltaWrite.append(s,
        ev.where(pmod(col("event_id"), lit(3)) === 0)
          .select(col("event_id"), (col("value") * 2).as("value")), src)
      run()
      // run 2: the command stream EVOLVES — a new tag column appears
      graft.sources.DeltaWrite.append(s,
        ev.where(pmod(col("event_id"), lit(3)) === 1)
          .select(col("event_id"), (col("value") * 2).as("value"),
            col("event_type").as("tag")), src, mergeSchema = true)
      run()
      graft.sources.Lake.read(s, dst)
        .groupBy(coalesce(col("tag"), lit("~none~")).as("tag"))
        .agg(count(lit(1)).as("cnt"), round(sum(col("value")), 2).as("sum_value"))
        .orderBy(col("tag"))
    },
    Some("""WITH t0 AS (SELECT event_id, value, NULL AS tag FROM events
        WHERE event_id % 2 = 0),
      c1 AS (SELECT event_id, value * 2 AS value, NULL AS tag FROM events
        WHERE event_id % 3 = 0),
      c2 AS (SELECT event_id, value * 2 AS value, event_type AS tag FROM events
        WHERE event_id % 3 = 1),
      m1 AS (
        SELECT * FROM t0 WHERE event_id NOT IN (SELECT event_id FROM c1)
        UNION ALL SELECT * FROM c1),
      m2 AS (
        SELECT * FROM m1 WHERE event_id NOT IN (SELECT event_id FROM c2)
        UNION ALL SELECT * FROM c2)
      SELECT coalesce(tag, '~none~') AS tag, count(*) AS cnt,
        round(sum(value), 2) AS sum_value
      FROM m2 GROUP BY 1 ORDER BY tag"""))

  val st19 = GQuery(
    "st19_stream_geofence",
    (s, dir) => StreamOps.streamingGeofence(s, dir),
    Some("""WITH p AS (SELECT event_id,
        (user_id*37 % 1700)/10.0 - 85.0 AS plat,
        (user_id*91 % 3600)/10.0 - 180.0 AS plon FROM events),
      g AS (SELECT n_nationkey AS poly_id,
        (n_nationkey*97 % 1400)/10.0 - 70.0 AS clat,
        (n_nationkey*139 % 3300)/10.0 - 165.0 AS clon,
        2.0 + (n_nationkey*7 % 80)/10.0 AS dy,
        2.0 + (n_nationkey*11 % 80)/10.0 AS dx FROM nation),
      v AS (SELECT poly_id, 0 AS seq, clat + dy AS lat, clon AS lon FROM g
        UNION ALL SELECT poly_id, 1, clat, clon + dx FROM g
        UNION ALL SELECT poly_id, 2, clat - dy, clon FROM g
        UNION ALL SELECT poly_id, 3, clat, clon - dx FROM g),
      e AS (SELECT a.poly_id, a.lat AS y1, a.lon AS x1, b.lat AS y2, b.lon AS x2
        FROM v a JOIN v b ON a.poly_id = b.poly_id AND b.seq = (a.seq + 1) % 4),
      hits AS (SELECT p.event_id, e.poly_id,
          sum(CASE WHEN (y1 > plat) <> (y2 > plat)
               AND plon < (x2 - x1) * (plat - y1) / (y2 - y1) + x1
              THEN 1 ELSE 0 END) AS crossings
        FROM p CROSS JOIN e GROUP BY p.event_id, e.poly_id)
      SELECT poly_id, count(*) AS n_events
      FROM hits WHERE crossings % 2 = 1
      GROUP BY poly_id ORDER BY poly_id"""))

  def all: Seq[GQuery] =
    Seq(st1, st2, st3, st4, st5, st6, st7, st8, st9, st10, st11, st12, st13, st14, st15, st16,
      st18, st19, st20, st21)
}
