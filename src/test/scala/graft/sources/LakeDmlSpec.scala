package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Latches for the in-scope replaceWhere race test (local mode: UDFs run
  * in-process, so plain JVM statics coordinate the two writers). */
object ReplaceWhereRaceGate {
  @volatile var replEvaluating = new java.util.concurrent.CountDownLatch(1)
  @volatile var appendDone = new java.util.concurrent.CountDownLatch(1)
  def reset(): Unit = {
    replEvaluating = new java.util.concurrent.CountDownLatch(1)
    appendDone = new java.util.concurrent.CountDownLatch(1)
  }
}

/** Partition-scoped overwrite (replaceWhere), positional UPDATE, and the
  * SQL DML statement surface (Lake.sql) over both lake formats. */
class LakeDmlSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  private def dayRows(day: String, ids: Seq[Long], v: Double) =
    ids.map(i => (i, day, v)).toDF("id", "day", "value")

  private def contents(path: String): Set[(Long, String, Double)] =
    Lake.read(spark, path).as[(Long, String, Double)].collect().toSet

  // ---------------------------------------------------------- replaceWhere

  test("Delta replaceWhere swaps one partition atomically; other partitions' files untouched") {
    val t = tmp("graft_dml_drw") + "/tbl"
    DeltaWrite.append(spark,
      dayRows("d1", 1L to 3L, 1.0).union(dayRows("d2", 4L to 6L, 2.0)),
      t, partitionBy = Seq("day"))
    DeltaWrite.append(spark, dayRows("d3", 7L to 8L, 3.0), t, partitionBy = Seq("day"))
    def filesOf(day: String): Set[String] = DeltaRead.snapshotInfo(spark, t).files
      .filter(_.partitionValues.get("day").contains(day)).map(_.path).toSet
    val d2Before = filesOf("d2")
    val d3Before = filesOf("d3")
    assert(d2Before.nonEmpty && d3Before.nonEmpty)

    // backfill d1: recomputed rows replace EXACTLY that partition, one commit
    val vBefore = DeltaRead.snapshotInfo(spark, t).version
    val v = DeltaWrite.replaceWhere(spark, dayRows("d1", 11L to 14L, 9.0), t,
      "day = 'd1'")
    assert(v === vBefore + 1, "replaceWhere must be ONE commit")
    assert(contents(t) ===
      ((11L to 14L).map(i => (i, "d1", 9.0)) ++ (4L to 6L).map(i => (i, "d2", 2.0)) ++
        (7L to 8L).map(i => (i, "d3", 3.0))).toSet)
    // untouched partitions keep their exact physical files
    assert(filesOf("d2") === d2Before)
    assert(filesOf("d3") === d3Before)

    // stray rows (outside the replaced scope) are refused loudly
    val ex = intercept[IllegalArgumentException] {
      DeltaWrite.replaceWhere(spark, dayRows("d2", 99L to 99L, 0.0), t, "day = 'd1'")
    }
    assert(ex.getMessage.contains("do not satisfy"))
  }

  test("Iceberg replaceWhere: overwrite snapshot, kept entries preserve lineage") {
    val t = tmp("graft_dml_irw") + "/tbl"
    IcebergWrite.append(spark,
      dayRows("d1", 1L to 3L, 1.0).union(dayRows("d2", 4L to 6L, 2.0)),
      t, partitionBy = Seq("day"))
    IcebergWrite.append(spark, dayRows("d3", 7L to 8L, 3.0), t, partitionBy = Seq("day"))
    // identity-partitioned files: min_day == the file's partition value
    def liveFiles: Map[String, Set[String]] = IcebergRead.fileStats(spark, t)
      .select("file", "min_day").as[(String, String)].collect()
      .groupBy(_._2).map { case (d, fs) => d -> fs.map(_._1).toSet }
    val before = liveFiles
    val v = IcebergWrite.replaceWhere(spark, dayRows("d2", 21L to 22L, 8.0), t,
      "day = 'd2'")
    assert(v > 0)
    assert(contents(t) ===
      ((1L to 3L).map(i => (i, "d1", 1.0)) ++ (21L to 22L).map(i => (i, "d2", 8.0)) ++
        (7L to 8L).map(i => (i, "d3", 3.0))).toSet)
    val after = liveFiles
    assert(after("d1") === before("d1"), "d1's physical files must be untouched")
    assert(after("d3") === before("d3"), "d3's physical files must be untouched")
    assert(after("d2") !== before("d2"))

    // time travel to the pre-replace snapshot still sees the old d2
    val hist = IcebergRead.history(spark, t).orderBy(col("version"))
      .select("version").as[Long].collect()
    assert(Lake.read(spark, t, hist(hist.length - 2)).where($"day" === "d2")
      .select("id").as[Long].collect().toSet === Set(4L, 5L, 6L))

    // stray rows refused; live delete files refused
    intercept[IllegalArgumentException] {
      IcebergWrite.replaceWhere(spark, dayRows("d1", 1L to 1L, 0.0), t, "day = 'd2'")
    }
    IcebergWrite.deleteWhere(spark, t, $"id" === 21L)
    val ex = intercept[IllegalArgumentException] {
      IcebergWrite.replaceWhere(spark, dayRows("d3", 7L to 7L, 0.0), t, "day = 'd3'")
    }
    assert(ex.getMessage.contains("delete files"))
  }

  // ------------------------------------------------------------ updateWhere

  test("Delta updateWhere: one commit, matched rows updated in place, no-match = no commit") {
    val t = tmp("graft_dml_dup") + "/tbl"
    DeltaWrite.append(spark,
      dayRows("d1", 1L to 3L, 1.0).union(dayRows("d2", 4L to 6L, 2.0)), t)
    val v0 = DeltaRead.snapshotInfo(spark, t).version
    val v = DeltaWrite.updateWhere(spark, t,
      Seq("value" -> ($"value" * 10), "day" -> concat($"day", lit("_u"))),
      $"id" >= 5L)
    assert(v === v0 + 1, "updateWhere must be ONE commit")
    assert(contents(t) ===
      ((1L to 3L).map(i => (i, "d1", 1.0)) :+ ((4L, "d2", 2.0)) :+
        ((5L, "d2_u", 20.0)) :+ ((6L, "d2_u", 20.0))).toSet)
    // nothing matched: same version back, no commit
    assert(DeltaWrite.updateWhere(spark, t, Seq("value" -> lit(0.0)), $"id" > 100L) === v)
    // updating an unknown column is refused
    intercept[IllegalArgumentException] {
      DeltaWrite.updateWhere(spark, t, Seq("nope" -> lit(1)), $"id" === 1L)
    }
  }

  test("Iceberg updateWhere: matched rows updated, history keeps the old image") {
    val t = tmp("graft_dml_iup") + "/tbl"
    IcebergWrite.append(spark, dayRows("d1", 1L to 4L, 1.0), t)
    val s0 = IcebergRead.currentSnapshotId(spark, t)
    val v = IcebergWrite.updateWhere(spark, t, Seq("value" -> ($"value" + 0.5)), $"id" <= 2L)
    // ONE atomic snapshot carries the position-deletes AND the updated
    // images — a crash can never observe the delete without the update
    assert(v === s0 + 1, "updateWhere must be ONE snapshot")
    assert(contents(t) ===
      ((1L to 2L).map(i => (i, "d1", 1.5)) ++ (3L to 4L).map(i => (i, "d1", 1.0))).toSet)
    // pre-update snapshot still serves the old rows
    assert(Lake.read(spark, t, s0).where($"id" === 1L)
      .select("value").as[Double].head() === 1.0)
    // no match: no commit
    val sNow = IcebergRead.currentSnapshotId(spark, t)
    assert(IcebergWrite.updateWhere(spark, t, Seq("value" -> lit(0.0)), $"id" > 99L) === sNow)
  }

  // ------------------------------------------------------------- SQL surface

  test("Lake.sql drives DELETE / UPDATE / MERGE / INSERT on Delta through statement text") {
    val t = tmp("graft_dml_sqld") + "/tbl"
    DeltaWrite.append(spark, dayRows("d1", 1L to 4L, 1.0), t)

    Lake.sql(spark, s"DELETE FROM '$t' WHERE id = 4")
    assert(contents(t).map(_._1) === Set(1L, 2L, 3L))

    Lake.sql(spark, s"UPDATE '$t' SET value = value * 2 WHERE id <= 2")
    assert(contents(t) === Set((1L, "d1", 2.0), (2L, "d1", 2.0), (3L, "d1", 1.0)))

    // MERGE: id 3 replaced, id 9 inserted (WHEN MATCHED UPDATE * / NOT MATCHED INSERT *)
    Lake.sql(spark, s"MERGE INTO '$t' USING " +
      "(SELECT * FROM VALUES (3L, 'd1', 7.0D), (9L, 'd9', 9.0D) AS s(id, day, value)) " +
      "ON (id)")
    assert(contents(t) ===
      Set((1L, "d1", 2.0), (2L, "d1", 2.0), (3L, "d1", 7.0), (9L, "d9", 9.0)))

    Lake.sql(spark, s"INSERT INTO '$t' SELECT 10L AS id, 'd9' AS day, 1.0D AS value")
    assert(contents(t).map(_._1) === Set(1L, 2L, 3L, 9L, 10L))

    // statement with trailing semicolon + unparseable text behavior
    Lake.sql(spark, s"DELETE FROM '$t' WHERE id = 10;")
    assert(contents(t).map(_._1) === Set(1L, 2L, 3L, 9L))
    intercept[IllegalArgumentException] { Lake.sql(spark, "TRUNCATE '/nope'") }
  }

  test("Lake.sql CTAS creates both formats; a partitioned CTAS lays out partition dirs") {
    val base = tmp("graft_dml_ctas")
    val dT = s"$base/d"
    Lake.sql(spark, s"CREATE TABLE '$dT' USING delta AS " +
      "SELECT * FROM VALUES (1L, 'a', 1.5D), (2L, 'b', 2.5D) AS s(id, grp, v)")
    assert(Lake.detect(spark, dT) === Lake.Delta)
    assert(Lake.read(spark, dT).as[(Long, String, Double)].collect().toSet ===
      Set((1L, "a", 1.5), (2L, "b", 2.5)))

    val iT = s"$base/i"
    Lake.sql(spark, s"CREATE TABLE '$iT' USING iceberg PARTITIONED BY (grp) AS " +
      "SELECT * FROM VALUES (3L, 'x', 0.5D), (4L, 'y', 1.0D) AS s(id, grp, v)")
    assert(Lake.detect(spark, iT) === Lake.Iceberg)
    assert(Lake.read(spark, iT).as[(Long, String, Double)].collect().toSet ===
      Set((3L, "x", 0.5), (4L, "y", 1.0)))
    // identity partitioning took: pruned metadata read sees one partition
    assert(Lake.readPruned(spark, iT, pv => pv.get("grp").contains("x"))
      .as[(Long, String, Double)].collect().toSet === Set((3L, "x", 0.5)))

    intercept[IllegalArgumentException] {
      Lake.sql(spark, s"CREATE TABLE '$base/h' USING hudi AS SELECT 1 AS x")
    }
  }

  test("Delta replaceWhere races: a concurrent append to ANOTHER partition survives") {
    // the staged adds are fixed; the REMOVE set re-derives per attempt, so
    // a commit that lands between snapshot read and claim must not be lost
    val t = tmp("graft_dml_race") + "/tbl"
    DeltaWrite.append(spark,
      dayRows("d1", 1L to 2L, 1.0).union(dayRows("d2", 3L to 4L, 2.0)),
      t, partitionBy = Seq("day"))
    val racer = new Thread(() =>
      DeltaWrite.append(spark, dayRows("d2", 5L to 6L, 2.0), t, partitionBy = Seq("day")))
    racer.start()
    DeltaWrite.replaceWhere(spark, dayRows("d1", 11L to 12L, 9.0), t, "day = 'd1'")
    racer.join()
    // whatever the interleaving: d1 is exactly the backfill, d2 holds all 4 rows
    assert(contents(t) ===
      ((11L to 12L).map(i => (i, "d1", 9.0)) ++ (3L to 6L).map(i => (i, "d2", 2.0))).toSet)
  }

  test("Iceberg replaceWhere pins the schema: extra / missing columns are refused before staging") {
    val t = tmp("graft_dml_irs") + "/tbl"
    IcebergWrite.append(spark, dayRows("d1", 1L to 2L, 1.0), t, partitionBy = Seq("day"))
    // extra column
    intercept[IllegalArgumentException] {
      IcebergWrite.replaceWhere(spark,
        dayRows("d1", 11L to 12L, 9.0).withColumn("extra", lit(1)), t, "day = 'd1'")
    }
    // missing column
    intercept[IllegalArgumentException] {
      IcebergWrite.replaceWhere(spark,
        dayRows("d1", 11L to 12L, 9.0).drop("value"), t, "day = 'd1'")
    }
    // table untouched by the refusals
    assert(contents(t) === (1L to 2L).map(i => (i, "d1", 1.0)).toSet)
  }

  test("Delta replaceWhere conflict-fails a concurrent append INTO the replaced scope") {
    val t = tmp("graft_dml_race_in") + "/tbl"
    DeltaWrite.append(spark,
      dayRows("d1", 1L to 2L, 1.0).union(dayRows("d2", 3L to 4L, 2.0)),
      t, partitionBy = Seq("day"))
    // gate the replacement's own evaluation: the racer's in-scope append
    // commits strictly between replaceWhere's staging-time snapshot and
    // its commit attempt — the exact window where silently removing the
    // racer's file would be data loss
    ReplaceWhereRaceGate.reset()
    val gated = udf { (i: Long) =>
      ReplaceWhereRaceGate.replEvaluating.countDown()
      ReplaceWhereRaceGate.appendDone.await(20, java.util.concurrent.TimeUnit.SECONDS)
      i
    }
    val repl = dayRows("d1", 11L to 12L, 9.0)
      .withColumn("id", gated($"id")).select("id", "day", "value")
    val racer = new Thread(() => {
      ReplaceWhereRaceGate.replEvaluating.await(20, java.util.concurrent.TimeUnit.SECONDS)
      DeltaWrite.append(spark, dayRows("d1", 21L to 22L, 5.0), t, partitionBy = Seq("day"))
      ReplaceWhereRaceGate.appendDone.countDown()
    })
    racer.start()
    intercept[java.util.ConcurrentModificationException] {
      DeltaWrite.replaceWhere(spark, repl, t, "day = 'd1'")
    }
    racer.join()
    // no commit happened: every pre-existing and concurrent row survives
    assert(contents(t) ===
      ((1L to 2L).map(i => (i, "d1", 1.0)) ++ (21L to 22L).map(i => (i, "d1", 5.0)) ++
        (3L to 4L).map(i => (i, "d2", 2.0))).toSet)
  }

  test("Lake.sql drives the same DML on Iceberg; INSERT OVERWRITE REPLACE WHERE backfills") {
    val t = tmp("graft_dml_sqli") + "/tbl"
    IcebergWrite.append(spark,
      dayRows("d1", 1L to 2L, 1.0).union(dayRows("d2", 3L to 4L, 2.0)),
      t, partitionBy = Seq("day"))

    Lake.sql(spark, s"DELETE FROM '$t' WHERE id = 2")
    assert(contents(t).map(_._1) === Set(1L, 3L, 4L))

    Lake.sql(spark, s"UPDATE '$t' SET value = 5.0 WHERE day = 'd1'")
    assert(contents(t) === Set((1L, "d1", 5.0), (3L, "d2", 2.0), (4L, "d2", 2.0)))

    Lake.sql(spark, s"MERGE INTO '$t' USING " +
      "(SELECT * FROM VALUES (3L, 'd2', 0.5D) AS s(id, day, value)) ON (id)")
    assert(contents(t) === Set((1L, "d1", 5.0), (3L, "d2", 0.5), (4L, "d2", 2.0)))

    // REPLACE WHERE needs a clean (delete-free) table: compact materializes
    Lake.compact(spark, t, smallFileBytes = Long.MaxValue)
    Lake.sql(spark, s"INSERT OVERWRITE '$t' REPLACE WHERE day = 'd2' " +
      "SELECT * FROM VALUES (30L, 'd2', 9.0D), (31L, 'd2', 9.0D) AS s(id, day, value)")
    assert(contents(t) === Set((1L, "d1", 5.0), (30L, "d2", 9.0), (31L, "d2", 9.0)))
  }

  test("Lake.sql migration statements: CONVERT TO DELTA, SHALLOW CLONE, EXPORT") {
    val base = tmp("graft_dml_mig")
    val pq = s"$base/pq"
    Seq((1L, "a", 1.0), (2L, "b", 2.0)).toDF("id", "day", "value")
      .write.mode("overwrite").parquet(pq)
    Lake.sql(spark, s"CONVERT TO DELTA '$pq'")
    assert(Lake.detect(spark, pq) === Lake.Delta)
    assert(contents(pq) === Set((1L, "a", 1.0), (2L, "b", 2.0)))

    Lake.sql(spark, s"CREATE TABLE '$base/cl' SHALLOW CLONE '$pq'")
    assert(Lake.detect(spark, s"$base/cl") === Lake.Delta)
    assert(contents(s"$base/cl") === contents(pq))

    Lake.sql(spark, s"EXPORT '$pq' TO iceberg '$base/ice'")
    assert(Lake.detect(spark, s"$base/ice") === Lake.Iceberg)
    assert(contents(s"$base/ice") === contents(pq))

    // clone pinned at the pre-append version sees the old state
    DeltaWrite.append(spark, Seq((3L, "c", 3.0)).toDF("id", "day", "value"), pq)
    Lake.sql(spark, s"CREATE TABLE '$base/cl0' SHALLOW CLONE '$pq' VERSION AS OF 0")
    assert(contents(s"$base/cl0") === Set((1L, "a", 1.0), (2L, "b", 2.0)))

    intercept[IllegalArgumentException] {
      Lake.sql(spark, s"EXPORT '$pq' TO hudi '$base/h'")
    }
  }

  test("Lake.sql ALTER TABLE family: rename/drop column, constraints, partition-spec evolution") {
    // Delta: rename + constraints (metadata-only; constraint then enforced)
    val dT = tmp("graft_dml_alt_d") + "/tbl"
    DeltaWrite.append(spark, Seq((1L, 2.0), (2L, 3.0)).toDF("id", "v"), dT)
    Lake.sql(spark, s"ALTER TABLE '$dT' RENAME COLUMN v TO score")
    assert(Lake.read(spark, dT).columns.toSet === Set("id", "score"))
    Lake.sql(spark, s"ALTER TABLE '$dT' ADD CONSTRAINT pos CHECK (score > 0)")
    intercept[IllegalArgumentException] {
      DeltaWrite.append(spark, Seq((3L, -1.0)).toDF("id", "score"), dT)
    }
    Lake.sql(spark, s"ALTER TABLE '$dT' DROP CONSTRAINT pos")
    DeltaWrite.append(spark, Seq((3L, -1.0)).toDF("id", "score"), dT)
    assert(Lake.read(spark, dT).count() === 3L)

    // Iceberg: drop column + partition-spec evolution (transforms with
    // nested parens must parse through the top-level splitter)
    val iT = tmp("graft_dml_alt_i") + "/tbl"
    IcebergWrite.append(spark,
      Seq((1L, "a", 1.0), (2L, "b", 2.0)).toDF("id", "grp", "v"), iT)
    Lake.sql(spark, s"ALTER TABLE '$iT' DROP COLUMN v")
    assert(Lake.read(spark, iT).columns.toSet === Set("id", "grp"))
    Lake.sql(spark, s"ALTER TABLE '$iT' SET PARTITION SPEC (grp, bucket(4, id))")
    IcebergWrite.append(spark, Seq((3L, "c")).toDF("id", "grp"), iT,
      partitionBy = Seq("grp", "bucket(4, id)"))
    assert(Lake.read(spark, iT).count() === 3L)

    // refusals: constraints are Delta-protocol, spec evolution Iceberg-only
    intercept[IllegalArgumentException] {
      Lake.sql(spark, s"ALTER TABLE '$iT' ADD CONSTRAINT c CHECK (id > 0)")
    }
    intercept[IllegalArgumentException] {
      Lake.sql(spark, s"ALTER TABLE '$dT' SET PARTITION SPEC (id)")
    }
  }

  test("Lake.sql ALTER TABLE ADD COLUMN: metadata-only evolution on both formats") {
    for (fmt <- Seq("delta", "iceberg")) {
      val t = tmp(s"graft_dml_addc_$fmt") + "/tbl"
      val seed = Seq((1L, 1.0), (2L, 2.0)).toDF("id", "v")
      val v0 = if (fmt == "delta") DeltaWrite.append(spark, seed, t)
        else IcebergWrite.append(spark, seed, t)
      val filesBefore = Lake.read(spark, t).inputFiles.toSet

      Lake.sql(spark, s"ALTER TABLE '$t' ADD COLUMN tag string")
      // metadata-only: no data file rewritten, old rows read NULL
      assert(Lake.read(spark, t).inputFiles.toSet === filesBefore,
        s"$fmt: ADD COLUMN must not rewrite data files")
      assert(Lake.read(spark, t).columns === Array("id", "v", "tag"))
      assert(Lake.read(spark, t).where(col("tag").isNull).count() === 2L)

      // appends may now carry the column; old rows stay NULL
      val late = Seq((3L, 3.0, "x")).toDF("id", "v", "tag")
      if (fmt == "delta") DeltaWrite.append(spark, late, t)
      else IcebergWrite.append(spark, late, t)
      assert(Lake.read(spark, t).where(col("tag") === "x").count() === 1L)
      assert(Lake.read(spark, t).where(col("tag").isNull).count() === 2L)

      // time travel to the pre-ALTER version shows the OLD schema
      assert(Lake.read(spark, t, v0).columns === Array("id", "v"))
      // decimal DDL types (parens/commas) parse through the grammar
      Lake.sql(spark, s"ALTER TABLE '$t' ADD COLUMN amt decimal(10,2)")
      assert(Lake.read(spark, t).columns.last === "amt")
      // duplicate column refused
      intercept[IllegalArgumentException](
        Lake.sql(spark, s"ALTER TABLE '$t' ADD COLUMN tag string"))
    }
    // plain parquet has no schema metadata to evolve
    val plain = tmp("graft_dml_addc_p") + "/tbl"
    Seq((1L, 1.0)).toDF("id", "v").write.parquet(plain)
    intercept[IllegalArgumentException](
      Lake.sql(spark, s"ALTER TABLE '$plain' ADD COLUMN tag string"))
  }

  test("Lake.sql is literal-safe: keywords inside string literals never split clauses") {
    val t = tmp("graft_dml_lit") + "/tbl"
    DeltaWrite.append(spark, Seq((1L, "x"), (2L, "y")).toDF("id", "note"), t)
    def notes: Set[(Long, String)] = Lake.read(spark, t).as[(Long, String)].collect().toSet

    // WHERE inside a SET literal stays in the assignment; the real WHERE
    // after it still scopes the update
    Lake.sql(spark, s"UPDATE '$t' SET note = 'a WHERE b' WHERE id = 1")
    assert(notes === Set((1L, "a WHERE b"), (2L, "y")))

    // literal with an unbalanced '(' and the word SET — neither confuses
    // the assignment splitter or the clause scanner
    Lake.sql(spark, s"UPDATE '$t' SET note = 'SET (x, WHERE' WHERE id = 2")
    assert(notes === Set((1L, "a WHERE b"), (2L, "SET (x, WHERE")))

    // MERGE USING source whose SELECT carries ' ON ' and ')' in a literal
    Lake.sql(spark,
      s"MERGE INTO '$t' USING (SELECT 3L AS id, 'a ON (b' AS note) ON (id)")
    assert(notes === Set((1L, "a WHERE b"), (2L, "SET (x, WHERE"), (3L, "a ON (b")))

    // DELETE predicate matching on a literal that contains WHERE
    Lake.sql(spark, s"DELETE FROM '$t' WHERE note = 'a WHERE b'")
    assert(notes.map(_._1) === Set(2L, 3L))

    // REPLACE WHERE predicate whose literal contains SELECT: the source
    // split must land on the real top-level SELECT (partition-scoped op →
    // a note-partitioned table)
    val tp = tmp("graft_dml_litp") + "/tbl"
    DeltaWrite.append(spark, Seq((1L, "keep"), (2L, "SELECT x")).toDF("id", "note"),
      tp, partitionBy = Seq("note"))
    Lake.sql(spark, s"INSERT OVERWRITE '$tp' REPLACE WHERE note = 'SELECT x' " +
      "SELECT 5L AS id, 'SELECT x' AS note")
    assert(Lake.read(spark, tp).as[(Long, String)].collect().toSet ===
      Set((1L, "keep"), (5L, "SELECT x")))
  }

  test("OPTIMIZE ... HILBERT BY re-clusters on the Hilbert curve, both formats") {
    def mk(fmt: String): String = {
      val t = tmp(s"graft_hil_$fmt") + "/tbl"
      val df = spark.range(4000).selectExpr("id",
        "CAST(id % 61 AS DOUBLE) AS x", "CAST((id * 37) % 53 AS DOUBLE) AS y",
        "CAST((id * 17) % 47 AS DOUBLE) AS z")
        .repartition(8) // several small files so the rewrite has work
      if (fmt == "delta") DeltaWrite.append(spark, df, t)
      else IcebergWrite.append(spark, df, t)
      t
    }
    for (fmt <- Seq("delta", "iceberg")) {
      val t = mk(fmt)
      val before = Lake.read(spark, t).agg(sum(col("id"))).head().getLong(0)
      // 3 clustering columns — the N-D curve the 2-D form can't serve
      Lake.sql(spark, s"OPTIMIZE '$t' HILBERT BY (x, y, z)")
      assert(Lake.read(spark, t).agg(sum(col("id"))).head().getLong(0) === before,
        s"$fmt: hilbert re-cluster must not change the data")
      assert(Lake.read(spark, t).count() === 4000L)
    }
    // refusals: both curves at once; unknown curve through the API
    val t = mk("delta")
    intercept[IllegalArgumentException](
      Lake.sql(spark, s"OPTIMIZE '$t' ZORDER BY (x) HILBERT BY (y)"))
    intercept[IllegalArgumentException](
      Lake.compact(spark, t, zorderBy = Seq("x", "y"), curve = "peano"))
  }

  test("Lake.sqlFrame SELECT: projection, version pin, literal-safe WHERE, ORDER/LIMIT, refusals") {
    val t = tmp("graft_sel") + "/tbl"
    val v0 = DeltaWrite.append(spark,
      Seq((1L, "a", 10.0), (2L, "ORDER BY x", 20.0), (3L, "c", 30.0))
        .toDF("id", "note", "value"), t)
    DeltaWrite.append(spark, Seq((4L, "d", 40.0)).toDF("id", "note", "value"), t)

    // star projection over the current head
    assert(Lake.sqlFrame(spark, s"SELECT * FROM '$t'").count() === 4L)
    // version pin: the second commit's row is invisible
    assert(Lake.sqlFrame(spark, s"SELECT id FROM '$t' VERSION AS OF $v0")
      .as[Long].collect().toSet === Set(1L, 2L, 3L))
    // WHERE whose literal contains ORDER BY — the clause scanner must not
    // split inside it; expression projection works
    assert(Lake.sqlFrame(spark,
        s"SELECT id, value * 2 AS dbl FROM '$t' WHERE note = 'ORDER BY x'")
      .as[(Long, Double)].collect().toSeq === Seq((2L, 40.0)))
    // ORDER BY DESC + LIMIT
    assert(Lake.sqlFrame(spark,
        s"SELECT id FROM '$t' ORDER BY value DESC LIMIT 2")
      .as[Long].collect().toSeq === Seq(4L, 3L))
    // all clauses together, pinned
    assert(Lake.sqlFrame(spark,
        s"SELECT id FROM '$t' VERSION AS OF $v0 WHERE value >= 20.0 " +
          "ORDER BY id ASC LIMIT 1")
      .as[Long].collect().toSeq === Seq(2L))
    // iceberg: same grammar, snapshot-id pin
    val ti = tmp("graft_sel_i") + "/tbl"
    val s0 = IcebergWrite.append(spark,
      Seq((1L, 1.0), (2L, 2.0)).toDF("id", "value"), ti)
    IcebergWrite.append(spark, Seq((3L, 3.0)).toDF("id", "value"), ti)
    assert(Lake.sqlFrame(spark,
        s"SELECT id FROM '$ti' VERSION AS OF $s0 ORDER BY id").as[Long]
      .collect().toSeq === Seq(1L, 2L))
    // refusals: SELECT through the version-returning surface; version pin
    // on plain parquet. Malformed clause shapes fall past the fast path to
    // the Spark SQL delegation, which refuses them with parse errors —
    // still loud, never a silently-dropped clause.
    intercept[IllegalArgumentException](Lake.sql(spark, s"SELECT * FROM '$t'"))
    intercept[org.apache.spark.sql.AnalysisException](
      Lake.sqlFrame(spark, s"SELECT id FROM '$t' LIMIT 2 WHERE id = 1"))
    intercept[org.apache.spark.sql.AnalysisException](
      Lake.sqlFrame(spark, s"SELECT id FROM '$t' LIMIT two"))
    val plain = tmp("graft_sel_p") + "/tbl"
    Seq((1L, 1.0)).toDF("id", "value").write.parquet(plain)
    intercept[IllegalArgumentException](
      Lake.sqlFrame(spark, s"SELECT id FROM '$plain' VERSION AS OF 0").collect())
  }

  test("Lake.sqlFrame delegates beyond the path dialect: GROUP BY, joins, subqueries") {
    val t = tmp("graft_delg") + "/tbl"
    val v0 = DeltaWrite.append(spark,
      Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "a", 30.0))
        .toDF("id", "grp", "value"), t)
    DeltaWrite.append(spark, Seq((4L, "a", 40.0)).toDF("id", "grp", "value"), t)
    val dim = tmp("graft_delg_dim") + "/tbl"
    IcebergWrite.append(spark, Seq(("a", 2.0), ("b", 3.0)).toDF("grp", "w"), dim)

    // GROUP BY + VERSION AS OF + WHERE in one statement: answers from the
    // pinned snapshot only (id=4 invisible)
    assert(Lake.sqlFrame(spark,
        s"SELECT grp, count(*) AS c, sum(value) AS s FROM '$t' VERSION AS OF $v0 " +
          "WHERE value > 5.0 GROUP BY grp ORDER BY grp")
      .as[(String, Long, Double)].collect().toSeq ===
      Seq(("a", 2L, 40.0), ("b", 1L, 20.0)))

    // lake-to-lake JOIN across FORMATS (delta fact × iceberg dim), head
    assert(Lake.sqlFrame(spark,
        s"SELECT e.grp, sum(e.value * d.w) AS ws FROM '$t' e " +
          s"JOIN '$dim' d ON e.grp = d.grp GROUP BY e.grp ORDER BY e.grp")
      .as[(String, Double)].collect().toSeq ===
      Seq(("a", 160.0), ("b", 60.0)))

    // subquery + DISTINCT delegate too; a FROM inside a string literal is
    // NOT a table reference (quote-aware scan)
    assert(Lake.sqlFrame(spark,
        s"SELECT DISTINCT grp FROM '$t' WHERE value > " +
          s"(SELECT min(value) FROM '$t') AND grp <> ' FROM bogus ' ORDER BY grp")
      .as[String].collect().toSeq === Seq("a", "b"))

    // no table reference at all → the statement speaks only session
    // objects (TVFs, temp views, literals): delegate whole to Spark
    assert(Lake.sqlFrame(spark, "SELECT 1 AS x").as[Int].head() === 1)

    // SELF-JOIN ACROSS VERSIONS of one path in one statement — the
    // time-travel diff query (what changed since v0): each reference gets
    // its own content-addressed view, so the two pins never collide
    assert(Lake.sqlFrame(spark,
        s"SELECT b.id FROM '$t' b LEFT JOIN '$t' VERSION AS OF $v0 a " +
          "ON a.id = b.id WHERE a.id IS NULL ORDER BY b.id")
      .as[Long].collect().toSeq === Seq(4L))
  }

  test("delegated single-table statements keep file-level stats pruning") {
    val t = tmp("graft_delgprune") + "/tbl"
    // two commits with DISJOINT id ranges → two files with disjoint
    // per-file stats; a WHERE hitting one range must skip the other file
    DeltaWrite.append(spark, (1L to 100L).map(i => (i, i * 1.0)).toDF("id", "v"), t)
    DeltaWrite.append(spark, (1000L to 1100L).map(i => (i, i * 1.0)).toDF("id", "v"), t)
    val all = Lake.read(spark, t).inputFiles.length
    assert(all >= 2)
    val agg = Lake.sqlFrame(spark,
      s"SELECT count(*) AS c, sum(v) AS s FROM '$t' WHERE id >= 1000 GROUP BY id >= 1000")
    assert(agg.as[(Long, Double)].collect().toSeq ===
      Seq((101L, (1000L to 1100L).map(_ * 1.0).sum)))
    assert(agg.inputFiles.length < all,
      "the delegated scan must be stats-pruned to the matching file(s)")
    // an alias-qualified WHERE can't resolve against the raw scan: the
    // pruning silently falls back to the full scan, answers unchanged
    val aliased = Lake.sqlFrame(spark,
      s"SELECT count(*) AS c FROM '$t' e WHERE e.id >= 1000 GROUP BY e.id >= 1000")
    assert(aliased.as[Long].collect().toSeq === Seq(101L))
  }

  test("Lake.sqlFrame TIMESTAMP AS OF pins both the fast path and delegated statements") {
    val t = tmp("graft_tsof") + "/tbl"
    DeltaWrite.append(spark, Seq((1L, 10.0), (2L, 20.0)).toDF("id", "v"), t)
    Thread.sleep(20)
    val tMid = System.currentTimeMillis()
    Thread.sleep(20)
    DeltaWrite.append(spark, Seq((3L, 30.0)).toDF("id", "v"), t)
    // fast path: projection + ORDER BY
    assert(Lake.sqlFrame(spark,
        s"SELECT id FROM '$t' TIMESTAMP AS OF $tMid ORDER BY id")
      .as[Long].collect().toSeq === Seq(1L, 2L))
    // delegated: GROUP BY over the pinned snapshot
    assert(Lake.sqlFrame(spark,
        s"SELECT id % 2 AS par, count(*) AS c FROM '$t' TIMESTAMP AS OF $tMid " +
          "GROUP BY id % 2 ORDER BY par")
      .as[(Long, Long)].collect().toSeq === Seq((0L, 1L), (1L, 1L)))
    // plain parquet refuses the pin loudly
    val plain = tmp("graft_tsof_p") + "/tbl"
    Seq((1L, 1.0)).toDF("id", "v").write.parquet(plain)
    intercept[IllegalArgumentException](
      Lake.sqlFrame(spark, s"SELECT id FROM '$plain' TIMESTAMP AS OF $tMid"))
  }

  test("Lake.sqlScript runs multi-statement scripts; SHOW TABLES lists a directory catalog") {
    val root = tmp("graft_script")
    val t = s"$root/sales"
    // a migration script: CTAS, two INSERTs (one with a literal ';'),
    // an ALTER, and a final SELECT as the script's result
    val out = Lake.sqlScript(spark,
      s"""CREATE TABLE '$t' USING delta AS SELECT 1L AS id, 'a;b' AS note;
          INSERT INTO '$t' (id, note) VALUES (2, 'x');
          ALTER TABLE '$t' ADD COLUMN v double;
          INSERT INTO '$t' (id, note, v) VALUES (3, 'y', 9.5);
          SELECT id, note FROM '$t' ORDER BY id;""")
    assert(out.as[(Long, String)].collect().toSeq ===
      Seq((1L, "a;b"), (2L, "x"), (3L, "y")))
    assert(Lake.read(spark, t).count() === 3L)

    // SHOW TABLES over the directory: formats + versions, metadata-only
    IcebergWrite.append(spark, Seq((1L, 1.0)).toDF("id", "v"), s"$root/ice")
    Seq((1L, 1.0)).toDF("id", "v").write.parquet(s"$root/plain")
    new java.io.File(s"$root/not_a_table").mkdirs() // excluded
    val tables = Lake.sqlFrame(spark, s"SHOW TABLES IN '$root'")
      .as[(String, String, Long)].collect().toSeq
    assert(tables.map(x => (x._1, x._2)) ===
      Seq(("ice", "iceberg"), ("plain", "parquet"), ("sales", "delta")))
    assert(tables.find(_._1 == "sales").get._3 >= 3L, "delta version after 4 commits")
    intercept[IllegalArgumentException](
      Lake.sqlFrame(spark, s"SHOW TABLES IN '$root/nope'"))
  }

  test("Lake.sqlFrame DESCRIBE and INSERT INTO with a column list") {
    val t = tmp("graft_desc") + "/tbl"
    val v0 = DeltaWrite.append(spark, Seq((1L, 1.0)).toDF("id", "v"), t)
    Lake.sql(spark, s"ALTER TABLE '$t' ADD COLUMN tag string")
    // current schema lists the evolved column; the pinned one doesn't
    assert(Lake.sqlFrame(spark, s"DESCRIBE '$t'")
      .as[(String, String, Boolean)].collect().toSeq ===
      Seq(("id", "bigint", true), ("v", "double", true), ("tag", "string", true)))
    assert(Lake.sqlFrame(spark, s"DESCRIBE '$t' VERSION AS OF $v0")
      .select("col_name").as[String].collect().toSeq === Seq("id", "v"))
    // VALUES sources become insertable via the positional column list
    Lake.sql(spark, s"INSERT INTO '$t' (id, v, tag) VALUES (2, 4.0, 'x')")
    assert(Lake.read(spark, t).where(col("tag") === "x").count() === 1L)
    // arity mismatch is loud
    intercept[IllegalArgumentException](
      Lake.sql(spark, s"INSERT INTO '$t' (id, v) VALUES (3, 5.0, 'y')"))
  }

  test("Lake.sql maintenance: OPTIMIZE / VACUUM / RESTORE / DESCRIBE HISTORY on both formats") {
    for (fmt <- Seq("delta", "iceberg")) {
      val t = tmp(s"graft_dml_mnt_$fmt") + "/tbl"
      Lake.sql(spark, s"CREATE TABLE '$t' USING $fmt AS " +
        "SELECT * FROM VALUES (1L, 1.0D), (2L, 2.0D) AS s(id, v)")
      val vGood = Lake.sql(spark, s"INSERT INTO '$t' SELECT 3L AS id, 3.0D AS v")
      Lake.sql(spark, s"INSERT INTO '$t' SELECT 99L AS id, 99.0D AS v")
      def ids: Set[Long] = Lake.read(spark, t).as[(Long, Double)].collect().map(_._1).toSet

      // RESTORE rolls the bad append back
      Lake.sql(spark, s"RESTORE '$t' TO VERSION AS OF $vGood")
      assert(ids === Set(1L, 2L, 3L), s"$fmt restore")

      // OPTIMIZE bin-packs the two small files; data unchanged
      val filesBefore = Lake.fileStats(spark, t).count()
      Lake.sql(spark, s"OPTIMIZE '$t'")
      assert(Lake.fileStats(spark, t).count() < filesBefore, s"$fmt optimize")
      assert(ids === Set(1L, 2L, 3L))

      // DESCRIBE HISTORY returns the commit frame (result-set statement);
      // checked BEFORE vacuum — retain-1 expiry prunes Iceberg's lineage
      assert(Lake.sqlFrame(spark, s"DESCRIBE HISTORY '$t'").count() >= 2L, s"$fmt history")

      // VACUUM FORCE reclaims the rolled-back + pre-compaction files
      val deleted = Lake.sql(spark, s"VACUUM '$t' RETAIN 1 VERSIONS FORCE")
      assert(deleted > 0, s"$fmt vacuum deleted")
      assert(ids === Set(1L, 2L, 3L))
      assert(Lake.sqlFrame(spark, s"DESCRIBE HISTORY '$t'").count() >= 1L, s"$fmt history post-vacuum")
      // sqlFrame on a mutation returns the version as a single row
      val vf = Lake.sqlFrame(spark, s"INSERT INTO '$t' SELECT 4L AS id, 4.0D AS v")
      assert(vf.columns.toSeq === Seq("version") && vf.count() === 1L)
    }

    // WHERE + ZORDER form parses and dispatches (partition-scoped → a
    // partitioned table)
    val z = tmp("graft_dml_mnt_z") + "/tbl"
    Lake.sql(spark, s"CREATE TABLE '$z' USING delta PARTITIONED BY (p) AS " +
      "SELECT * FROM VALUES (1L, 1.0D, 'a'), (2L, 2.0D, 'b') AS s(id, v, p)")
    Lake.sql(spark, s"INSERT INTO '$z' SELECT 9L AS id, 9.0D AS v, 'a' AS p")
    Lake.sql(spark, s"OPTIMIZE '$z' WHERE p = 'a' ZORDER BY (id, v)")
    assert(Lake.read(spark, z).count() === 3L)

    // refusals: garbage OPTIMIZE tail, maintenance over plain parquet
    intercept[IllegalArgumentException] {
      Lake.sql(spark, s"OPTIMIZE '$z' SORT BY (id)")
    }
    val p = tmp("graft_dml_mnt_p")
    Seq((1L, 1.0)).toDF("id", "v").write.mode("overwrite").parquet(p)
    intercept[IllegalArgumentException] { Lake.sql(spark, s"VACUUM '$p' FORCE") }
    intercept[IllegalArgumentException] {
      Lake.sql(spark, s"RESTORE '$p' TO VERSION AS OF 0")
    }
  }

  // ------------------------------------------- round-14 SELECT-surface work

  test("outer WHERE never pre-filters a table inside a derived table") {
    val t = tmp("graft_subqwin") + "/tbl"
    DeltaWrite.append(spark,
      Seq((1L, 10.0), (6L, 20.0), (7L, 30.0)).toDF("x", "v"), t)
    // the window total must be computed over ALL rows (60.0), with the
    // outer x > 5 applied only to the derived table's output — pushing it
    // into the scan would silently change the window result
    val out = Lake.sqlFrame(spark,
      s"SELECT x, total FROM (SELECT x, sum(v) OVER () AS total FROM '$t') t " +
        "WHERE x > 5 ORDER BY x")
    assert(out.as[(Long, Double)].collect().toSeq ===
      Seq((6L, 60.0), (7L, 60.0)))
    // same statement with an inner aggregate: the outer WHERE on the
    // aggregate's output must not shrink the aggregate's input
    val agg = Lake.sqlFrame(spark,
      s"SELECT c FROM (SELECT count(*) AS c FROM '$t') t WHERE c > 0")
    assert(agg.as[Long].collect().toSeq === Seq(3L))
  }

  test("fast-path WHERE carrying a subquery delegates instead of throwing") {
    val t = tmp("graft_fastsub") + "/tbl"
    DeltaWrite.append(spark,
      Seq(("a", 1.0), ("b", 2.0), ("c", 3.0)).toDF("grp", "v"), t)
    // shape-matches the single-table fast path, but the predicate carries
    // a subquery over a quoted path the fast path cannot express — the
    // contract is None-and-delegate, never a ParseException
    val out = Lake.sqlFrame(spark,
      s"SELECT grp FROM '$t' WHERE v > (SELECT min(v) FROM '$t') ORDER BY grp")
    assert(out.as[String].collect().toSeq === Seq("b", "c"))
  }

  test("FROM inside a function call is a literal, not a table reference") {
    val t = tmp("graft_extract") + "/tbl"
    DeltaWrite.append(spark, Seq((1L, 1.0), (2L, 2.0)).toDF("id", "v"), t)
    val out = Lake.sqlFrame(spark,
      s"SELECT EXTRACT(YEAR FROM '2026-01-01') AS y, count(*) AS c FROM '$t' GROUP BY 1")
    assert(out.as[(Int, Long)].collect().toSeq === Seq((2026, 2L)))
    // a statement whose ONLY candidate reference is a non-table literal
    // has no lake refs — it delegates whole to Spark and evaluates
    assert(Lake.sqlFrame(spark,
      "SELECT EXTRACT(YEAR FROM '2026-01-01') AS y GROUP BY 1")
      .as[Int].head() === 2026)
  }

  test("per-alias file-stats pruning reaches BOTH sides of a two-path join") {
    val a = tmp("graft_prune2a") + "/tbl"
    val b = tmp("graft_prune2b") + "/tbl"
    // two commits per table with DISJOINT key ranges -> per-file stats
    // that a range conjunct can prune against
    DeltaWrite.append(spark, (1L to 100L).map(i => (i, i * 1.0)).toDF("id", "v")
      .repartition(1), a)
    DeltaWrite.append(spark, (1000L to 1100L).map(i => (i, i * 1.0)).toDF("id", "v")
      .repartition(1), a)
    IcebergWrite.append(spark, (1L to 100L).map(i => (i, i * 2.0)).toDF("id", "w")
      .repartition(1), b)
    IcebergWrite.append(spark, (1000L to 1100L).map(i => (i, i * 2.0)).toDF("id", "w")
      .repartition(1), b)
    val fullFiles = Lake.read(spark, a).inputFiles.length +
      Lake.read(spark, b).inputFiles.length
    assert(fullFiles >= 4)
    val joined = Lake.sqlFrame(spark,
      s"SELECT count(*) AS c, sum(x.v * y.w) AS s FROM '$a' x JOIN '$b' y " +
        "ON x.id = y.id WHERE x.id >= 1000 AND y.id >= 1000 GROUP BY x.id >= 1000")
    assert(joined.as[(Long, Double)].collect().toSeq ===
      Seq((101L, (1000L to 1100L).map(i => i * 1.0 * i * 2.0).sum)))
    assert(joined.inputFiles.length <= fullFiles - 2,
      "each side's WHERE conjunct must prune that side's files")
  }

  test("join-derived pruning: a selective dim WHERE shrinks the fact's file set") {
    val fact = tmp("graft_jdp_fact") + "/tbl"
    val dim = tmp("graft_jdp_dim") + "/tbl"
    // fact: 8 range-clustered commits (disjoint id ranges -> per-file
    // stats a derived bound can prune against); ~every file >4x the dim
    (0L until 8L).foreach { b =>
      DeltaWrite.append(spark,
        (b * 1000L until (b * 1000L + 1000L))
          .map(i => (i, i * 1.0, (i * 2654435761L).toHexString * 4))
          .toDF("id", "v", "pad").repartition(1), fact)
    }
    // dim: small, with a selective filter column
    IcebergWrite.append(spark,
      (0L until 8000L by 100L).map(i => (i, if (i < 1000L) "hot" else "cold"))
        .toDF("id", "seg").repartition(1), dim)
    val factFiles = Lake.read(spark, fact).inputFiles.length
    assert(factFiles >= 8)

    // the dim's OWN WHERE is selective (ids < 1000); the fact has no
    // conjunct of its own — only the join-derived bound can prune it
    val q = Lake.sqlFrame(spark,
      s"SELECT count(*) AS c, CAST(sum(f.v) AS BIGINT) AS s FROM '$fact' f " +
        s"JOIN '$dim' d ON f.id = d.id WHERE d.seg = 'hot'")
    assert(q.as[(Long, Long)].collect().toSeq ===
      Seq((10L, (0L until 1000L by 100L).sum)))
    assert(q.inputFiles.filter(_.contains("graft_jdp_fact")).length <= 2,
      "dim bounds must prune the fact side to the matching range files")

    // soundness: a FULL OUTER join must NOT prune either side
    val fo = Lake.sqlFrame(spark,
      s"SELECT count(*) AS c FROM '$fact' f FULL OUTER JOIN " +
        s"(SELECT id FROM '$dim' WHERE seg = 'hot') d ON f.id = d.id")
    assert(fo.as[Long].collect().head === 8000L)
    assert(fo.inputFiles.filter(_.contains("graft_jdp_fact")).length === factFiles,
      "outer joins keep every file")

    // soundness: LEFT JOIN preserves the left side whole, prunes only right
    val lj = Lake.sqlFrame(spark,
      s"SELECT count(*) AS c, count(d.id) AS m FROM '$fact' f LEFT JOIN " +
        s"(SELECT id FROM '$dim' WHERE seg = 'hot') d ON f.id = d.id")
    assert(lj.as[(Long, Long)].collect().toSeq === Seq((8000L, 10L)))
    assert(lj.inputFiles.filter(_.contains("graft_jdp_fact")).length === factFiles,
      "the preserved side of a LEFT JOIN keeps every file")
  }


  test("DML matching prunes target files by stats; subquery/alias fall back whole") {
    for (fmt <- Seq("delta", "iceberg")) {
      val t = tmp(s"graft_dmlprune_$fmt") + "/tbl"
      // two commits with DISJOINT id ranges -> per-file stats
      def add(rows: Seq[(Long, Double)]): Unit = {
        val df = rows.toDF("id", "v").repartition(1)
        if (fmt == "delta") DeltaWrite.append(spark, df, t)
        else IcebergWrite.append(spark, df, t)
      }
      add((1L to 100L).map(i => (i, i * 1.0)))
      add((1000L to 1100L).map(i => (i, i * 1.0)))

      // the pruned lineage frame OPENS only the matching range's file
      import org.apache.spark.sql.functions.expr
      val pruned =
        if (fmt == "delta") DeltaRead.lineagePruned(spark, t, expr("id >= 1000"))
        else IcebergRead.lineagePruned(spark, t, expr("id >= 1000"))
      val full =
        if (fmt == "delta") DeltaRead.snapshotWithLineage(spark, t)
        else IcebergRead.snapshotWithLineage(spark, t)
      assert(full.inputFiles.length >= 2, fmt)
      assert(pruned.inputFiles.length < full.inputFiles.length,
        s"$fmt: DML matching must skip files the predicate cannot touch")

      // a predicate the empty-frame resolution can't see (subquery) falls
      // back to the FULL scan — never a silent partial match
      Seq(1020L).toDF("id").createOrReplaceTempView("graft_dmlprune_keys")
      val fb =
        if (fmt == "delta") DeltaRead.lineagePruned(spark, t,
          expr("id IN (SELECT id FROM graft_dmlprune_keys)"))
        else IcebergRead.lineagePruned(spark, t,
          expr("id IN (SELECT id FROM graft_dmlprune_keys)"))
      assert(fb.inputFiles.length === full.inputFiles.length, fmt)

      // end to end: the pruned DELETE/UPDATE produce the right rows
      Lake.sql(spark, s"DELETE FROM '$t' WHERE id >= 1050")
      assert(Lake.read(spark, t).count() === 150L, fmt)
      Lake.sql(spark, s"UPDATE '$t' SET v = 0 WHERE id >= 1000")
      assert(Lake.read(spark, t).where($"v" === 0.0).count() === 50L, fmt)
      // and the subquery shape still matches through the fallback
      Lake.sql(spark, s"DELETE FROM '$t' WHERE id IN (SELECT id FROM graft_dmlprune_keys)")
      assert(Lake.read(spark, t).count() === 149L, fmt)
    }
  }


  test("TRUNCATE, SHOW CREATE TABLE, lake_changes TVF") {
    for (fmt <- Seq("delta", "iceberg")) {
      val root = tmp(s"graft_trunc_$fmt")
      val t = s"$root/tbl"
      val seed = Seq((1L, "a", 1.0), (2L, "b", 2.0)).toDF("id", "grp", "v")
      if (fmt == "delta") DeltaWrite.append(spark, seed, t, partitionBy = Seq("grp"))
      else IcebergWrite.append(spark, seed, t, partitionBy = Seq("grp"))

      // SHOW CREATE TABLE emits the CreateSchema dialect — re-runnable DDL
      val ddl = Lake.sqlFrame(spark, s"SHOW CREATE TABLE '$t'")
        .as[String].collect().head
      assert(ddl.contains(s"USING $fmt") && ddl.contains("PARTITIONED BY (grp)")
        && ddl.contains("id BIGINT"), ddl)
      val clonePath = s"$root/clone"
      Lake.sql(spark, ddl.replace(s"'$t'", s"'$clonePath'"))
      assert(Lake.read(spark, clonePath).schema === Lake.read(spark, t).schema, fmt)

      // TRUNCATE: one commit empties the rows, schema + history survive
      Lake.sql(spark, s"TRUNCATE TABLE '$t'")
      assert(Lake.read(spark, t).count() === 0L, fmt)
      assert(Lake.read(spark, t).columns.toSeq === Seq("id", "grp", "v"), fmt)
      // an INSERT into the truncated table keeps the partition layout
      Lake.sql(spark, s"INSERT INTO '$t' SELECT 3L AS id, 'c' AS grp, 3.0D AS v")
      assert(Lake.read(spark, t).as[(Long, String, Double)].collect().toSeq ===
        Seq((3L, "c", 3.0)), fmt)
    }
    // time travel still reads pre-truncate rows (Delta version pin)
    val t2 = tmp("graft_trunc_tt") + "/tbl"
    DeltaWrite.append(spark, Seq((1L, 1.0)).toDF("id", "v"), t2)
    val v0 = DeltaRead.snapshotInfo(spark, t2).version
    Lake.sql(spark, s"TRUNCATE '$t2'")
    assert(Lake.read(spark, t2).count() === 0L)
    assert(Lake.read(spark, t2, v0).count() === 1L)

    // lake_changes TVF: the changelog between two versions from pure SQL
    Lake.sql(spark, s"INSERT INTO '$t2' SELECT 9L AS id, 9.0D AS v")
    Lake.registerSqlSurface(spark)
    val ch = spark.sql(
      s"SELECT _change_type, id FROM lake_changes('$t2', $v0) ORDER BY id")
      .as[(String, Long)].collect().toSeq
    assert(ch === Seq(("delete", 1L), ("insert", 9L)))

    // bare DELETE FROM (no WHERE) = delete every row, one commit
    Lake.sql(spark, s"DELETE FROM '$t2'")
    assert(Lake.read(spark, t2).count() === 0L)

    // VACUUM DRY RUN reports the reclaim set WITHOUT deleting a byte
    val would = Lake.sqlFrame(spark, s"VACUUM '$t2' FORCE DRY RUN")
      .as[String].collect()
    assert(would.nonEmpty) // truncated + rewritten files are unreferenced
    assert(would.forall(p => java.nio.file.Files.exists(
      java.nio.file.Paths.get(p))), "dry run must not delete")
    val reclaimed = Lake.sqlFrame(spark, s"VACUUM '$t2' FORCE")
      .as[String].collect()
    assert(reclaimed.sorted.toSeq === would.sorted.toSeq,
      "the dry-run report IS the real run's reclaim set")
    assert(would.forall(p => !java.nio.file.Files.exists(
      java.nio.file.Paths.get(p))))

    // Iceberg twin
    val t3 = tmp("graft_vac_dry_i") + "/tbl"
    IcebergWrite.append(spark, Seq((1L, 1.0)).toDF("id", "v"), t3)
    IcebergWrite.overwrite(spark, Seq((2L, 2.0)).toDF("id", "v"), t3)
    val wouldI = Lake.sqlFrame(spark, s"VACUUM '$t3' FORCE DRY RUN")
      .as[String].collect()
    assert(wouldI.nonEmpty)
    assert(wouldI.forall(p => java.nio.file.Files.exists(
      java.nio.file.Paths.get(p))), "dry run must not delete")
    assert(Lake.read(spark, t3).as[(Long, Double)].collect().toSeq ===
      Seq((2L, 2.0)))
  }


  test("COPY INTO ingests each source file exactly once, both formats") {
    for (fmt <- Seq("delta", "iceberg")) {
      val root = tmp(s"graft_copy_$fmt")
      val t = s"$root/tbl"
      val inbox = s"$root/inbox"
      java.nio.file.Files.createDirectories(java.nio.file.Paths.get(inbox))
      val seed = Seq((0L, 0.0)).toDF("id", "v")
      if (fmt == "delta") DeltaWrite.append(spark, seed, t)
      else IcebergWrite.append(spark, seed, t)

      def drop(name: String, rows: Seq[(Long, Double)]): Unit =
        rows.toDF("id", "v").coalesce(1).write.mode("overwrite")
          .json(s"$root/stage_$name") // stage then move ONE stable file in
          .ensuring { _ =>
            val part = new java.io.File(s"$root/stage_$name").listFiles()
              .find(_.getName.endsWith(".json")).get
            java.nio.file.Files.move(part.toPath,
              java.nio.file.Paths.get(s"$inbox/$name.json"))
            true
          }
      drop("a", Seq((1L, 1.0), (2L, 2.0)))
      drop("b", Seq((3L, 3.0)))
      Lake.sql(spark, s"COPY INTO '$t' FROM '$inbox' FORMAT json")
      assert(Lake.read(spark, t).count() === 4L, fmt)

      // re-run with NOTHING new: pure no-op (no duplicate rows)
      Lake.sql(spark, s"COPY INTO '$t' FROM '$inbox' FORMAT json")
      assert(Lake.read(spark, t).count() === 4L, fmt)

      // a new file lands next to the already-ingested ones: only IT loads
      drop("c", Seq((4L, 4.0)))
      Lake.sql(spark, s"COPY INTO '$t' FROM '$inbox' FORMAT json")
      assert(Lake.read(spark, t).orderBy("id").as[(Long, Double)]
        .collect().toSeq ===
        (0L to 4L).map(i => (i, i * 1.0)), fmt)

      // hidden/foreign files are never read; missing columns refuse loudly
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(s"$inbox/_hidden.json"), """{"id":9,"v":9.0}""")
      Lake.sql(spark, s"COPY INTO '$t' FROM '$inbox' FORMAT json")
      assert(Lake.read(spark, t).count() === 5L, fmt)
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(s"$inbox/bad.json"), """{"id":10}""")
      val ex = intercept[IllegalArgumentException](
        Lake.sql(spark, s"COPY INTO '$t' FROM '$inbox' FORMAT json"))
      assert(ex.getMessage.contains("miss table columns"), fmt)
    }
    // the ledger survives a Delta checkpoint (txn actions are carried)
    val root = tmp("graft_copy_cp")
    val t = s"$root/tbl"
    DeltaWrite.append(spark, Seq((0L, 0.0)).toDF("id", "v"), t)
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(s"$root/in"))
    Seq((1L, 1.0)).toDF("id", "v").coalesce(1).write.json(s"$root/stage")
    val part = new java.io.File(s"$root/stage").listFiles()
      .find(_.getName.endsWith(".json")).get
    java.nio.file.Files.move(part.toPath,
      java.nio.file.Paths.get(s"$root/in/x.json"))
    Lake.sql(spark, s"COPY INTO '$t' FROM '$root/in' FORMAT json")
    DeltaWrite.checkpoint(spark, t)
    Lake.sql(spark, s"COPY INTO '$t' FROM '$root/in' FORMAT json")
    assert(Lake.read(spark, t).count() === 2L)
  }


  test("COPY INTO honors LEGACY path-only ledger ids (no one-time re-ingest)") {
    // a ledger written before the path@mtime@len scheme recorded
    // md5(path) alone — a file whose LEGACY id is in the ledger must not
    // re-ingest after the upgrade
    def legacyId(p: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(p.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(16)
    for (fmt <- Seq("delta", "iceberg")) {
      val root = tmp(s"graft_copy_legacy_$fmt")
      val t = s"$root/tbl"
      val inbox = s"$root/inbox"
      java.nio.file.Files.createDirectories(java.nio.file.Paths.get(inbox))
      Seq((1L, 1.0)).toDF("id", "v").coalesce(1).write.json(s"$root/stage")
      val part = new java.io.File(s"$root/stage").listFiles()
        .find(_.getName.endsWith(".json")).get
      val dest = java.nio.file.Paths.get(s"$inbox/old.json")
      java.nio.file.Files.move(part.toPath, dest)
      val lid = legacyId(new org.apache.hadoop.fs.Path(dest.toString).toUri.getPath)
      // seed the table WITH the legacy ledger entry, as an old version would have
      val seed = Seq((0L, 0.0)).toDF("id", "v")
      if (fmt == "delta")
        DeltaWrite.append(spark, seed, t, txns = Seq((s"graft-copy:$lid", 1L)))
      else
        IcebergWrite.append(spark, seed, t,
          summaryProps = Map("graft.copied" -> lid))
      Lake.sql(spark, s"COPY INTO '$t' FROM '$inbox' FORMAT json")
      assert(Lake.read(spark, t).count() === 1L,
        s"$fmt: legacy-ledgered file re-ingested")
      // a genuinely NEW file still loads
      Seq((2L, 2.0)).toDF("id", "v").coalesce(1).write.json(s"$root/stage2")
      val p2 = new java.io.File(s"$root/stage2").listFiles()
        .find(_.getName.endsWith(".json")).get
      java.nio.file.Files.move(p2.toPath, java.nio.file.Paths.get(s"$inbox/new.json"))
      Lake.sql(spark, s"COPY INTO '$t' FROM '$inbox' FORMAT json")
      assert(Lake.read(spark, t).count() === 2L, fmt)
    }
  }

  test("EXPLAIN FILES reports opened-vs-total per referenced table") {
    val t = tmp("graft_explain_files") + "/tbl"
    // two commits with disjoint ranges -> a range WHERE prunes one file
    DeltaWrite.append(spark, (1L to 100L).map(i => (i, i * 1.0)).toDF("id", "v")
      .repartition(1), t)
    DeltaWrite.append(spark, (1000L to 1100L).map(i => (i, i * 1.0)).toDF("id", "v")
      .repartition(1), t)
    val r = Lake.sqlFrame(spark,
      s"EXPLAIN FILES SELECT sum(v) AS s FROM '$t' WHERE id >= 1000")
      .as[(String, Long, Long)].collect().head
    assert(r._3 >= 2L && r._2 < r._3,
      s"pruned scan must open fewer files: $r")
    // the statement was planned, not executed — and a mutation is refused
    intercept[IllegalArgumentException](Lake.sqlFrame(spark,
      s"EXPLAIN FILES DELETE FROM '$t' WHERE id = 1"))
    assert(Lake.read(spark, t).count() === 201L)
  }


  test("WHERE conjuncts are NOT pushed below an outer join's nullable side") {
    val a = tmp("graft_ojsafe_a") + "/tbl"
    val b = tmp("graft_ojsafe_b") + "/tbl"
    DeltaWrite.append(spark, Seq((1L, 1.0), (2L, 2.0)).toDF("id", "v"), a)
    DeltaWrite.append(spark, Seq((2L, 20.0)).toDF("id", "w"), b)
    // the anti-join-via-LEFT idiom: pre-filtering b with `w IS NULL`
    // (null-TOLERANT) would empty b and wrongly return BOTH ids
    val out = Lake.sqlFrame(spark,
      s"SELECT x.id FROM '$a' x LEFT JOIN '$b' y ON x.id = y.id " +
        "WHERE y.w IS NULL ORDER BY x.id")
    assert(out.as[Long].collect().toSeq === Seq(1L))
  }

  test("TIMESTAMP AS OF accepts timestamp literals everywhere versions pin") {
    // the literal parser: ISO-8601, space-separated, date-only - all UTC
    assert(Lake.parseTsLiteral("1700000000123") === 1700000000123L)
    assert(Lake.parseTsLiteral("2026-08-15 10:00:00") ===
      java.time.LocalDateTime.of(2026, 8, 15, 10, 0, 0)
        .toInstant(java.time.ZoneOffset.UTC).toEpochMilli)
    assert(Lake.parseTsLiteral("2026-08-15") ===
      java.time.LocalDate.of(2026, 8, 15).atStartOfDay
        .toInstant(java.time.ZoneOffset.UTC).toEpochMilli)
    assert(Lake.parseTsLiteral("2026-08-15T10:00:00Z") ===
      Lake.parseTsLiteral("2026-08-15 10:00:00"))

    val t = tmp("graft_tslit") + "/tbl"
    val v0 = DeltaWrite.append(spark, Seq((1L, 10.0), (2L, 20.0)).toDF("id", "v"), t)
    Thread.sleep(20)
    val mid = java.time.Instant.ofEpochMilli(System.currentTimeMillis()).toString
    Thread.sleep(20)
    DeltaWrite.append(spark, Seq((3L, 30.0)).toDF("id", "v"), t)

    // fast path + delegated statements take the string pin
    assert(Lake.sqlFrame(spark,
        s"SELECT id FROM '$t' TIMESTAMP AS OF '$mid' ORDER BY id")
      .as[Long].collect().toSeq === Seq(1L, 2L))
    assert(Lake.sqlFrame(spark,
        s"SELECT id % 2 AS par, count(*) AS c FROM '$t' TIMESTAMP AS OF '$mid' " +
          "GROUP BY id % 2 ORDER BY par")
      .as[(Long, Long)].collect().toSeq === Seq((0L, 1L), (1L, 1L)))
    // DESCRIBE, SHALLOW CLONE, RESTORE take it too
    assert(Lake.sqlFrame(spark, s"DESCRIBE '$t' TIMESTAMP AS OF '$mid'").count() === 2L)
    val c = tmp("graft_tslit_c") + "/tbl"
    Lake.sql(spark, s"CREATE TABLE '$c' SHALLOW CLONE '$t' TIMESTAMP AS OF '$mid'")
    assert(Lake.read(spark, c).count() === 2L)
    Lake.sql(spark, s"RESTORE '$t' TIMESTAMP AS OF '$mid'")
    assert(Lake.read(spark, t).count() === 2L)
    assert(Lake.read(spark, t, v0).count() === 2L)
  }

  test("CREATE TABLE with a column schema creates an empty insertable table") {
    for (fmt <- Seq("delta", "iceberg")) {
      val t = tmp(s"graft_ddl_$fmt") + "/tbl"
      Lake.sql(spark,
        s"CREATE TABLE '$t' (id BIGINT, note STRING, v DECIMAL(10,2)) " +
          s"USING $fmt PARTITIONED BY (note)")
      // empty but fully described: schema (incl. the parenthesized
      // decimal) and zero rows
      assert(Lake.sqlFrame(spark, s"DESCRIBE '$t'")
        .as[(String, String, Boolean)].collect().toSeq ===
        Seq(("id", "bigint", true), ("note", "string", true),
          ("v", "decimal(10,2)", true)), fmt)
      assert(Lake.read(spark, t).count() === 0L, fmt)
      // INSERT inherits the declared partitioning; round trip reads back
      Lake.sql(spark, s"INSERT INTO '$t' SELECT CAST(1 AS BIGINT) AS id, " +
        "'x' AS note, CAST(9.5 AS DECIMAL(10,2)) AS v")
      assert(Lake.sqlFrame(spark, s"SELECT id, note FROM '$t'")
        .as[(Long, String)].collect().toSeq === Seq((1L, "x")), fmt)
      // re-creating over a non-empty table is refused
      intercept[IllegalArgumentException](Lake.sql(spark,
        s"CREATE TABLE '$t' (id BIGINT) USING $fmt"))
      // a partition column outside the schema is refused
      intercept[IllegalArgumentException](Lake.sql(spark,
        s"CREATE TABLE '${t}_bad' (id BIGINT) USING $fmt PARTITIONED BY (nope)"))
    }
  }

  test("USE directory catalog: bare FROM/JOIN identifiers resolve to tables") {
    val root = tmp("graft_use")
    DeltaWrite.append(spark,
      Seq(("a", 10.0), ("a", 30.0), ("b", 20.0)).toDF("grp", "v"), s"$root/ev")
    IcebergWrite.append(spark, Seq(("a", 2.0), ("b", 3.0)).toDF("grp", "w"),
      s"$root/dims")
    Lake.sql(spark, s"USE '$root'")
    try {
      // bare names with aliases, cross-format join through the catalog
      assert(Lake.sqlFrame(spark,
          "SELECT e.grp, sum(e.v * d.w) AS s FROM ev e JOIN dims d " +
            "ON e.grp = d.grp GROUP BY e.grp ORDER BY e.grp")
        .as[(String, Double)].collect().toSeq ===
        Seq(("a", 80.0), ("b", 60.0)))
      // a bare name WITHOUT an alias keeps working as its own qualifier
      assert(Lake.sqlFrame(spark,
          "SELECT ev.grp FROM ev WHERE ev.v > 15 ORDER BY ev.grp")
        .as[String].collect().toSeq === Seq("a", "b"))
      // scripts mix USE, quoted paths, and bare names
      val out = Lake.sqlScript(spark,
        s"""CREATE TABLE '$root/tot' USING delta AS
              SELECT grp, sum(v) AS tv FROM ev GROUP BY grp;
            SELECT t.grp, t.tv, d.w FROM tot t JOIN '$root/dims' d
              ON t.grp = d.grp ORDER BY t.grp;""")
      assert(out.as[(String, Double, Double)].collect().toSeq ===
        Seq(("a", 40.0, 2.0), ("b", 20.0, 3.0)))
      // an identifier that is NOT a catalog table is left for Spark (temp view)
      Seq((1L, 1.0)).toDF("id", "x").createOrReplaceTempView("graft_use_tv")
      assert(Lake.sqlFrame(spark,
          "SELECT count(*) AS c FROM ev JOIN graft_use_tv ON 1 = 1")
        .as[Long].collect().toSeq === Seq(3L))
    } finally Lake.sql(spark, "USE DEFAULT")
    // the catalog is cleared: the bare name no longer resolves — the
    // statement now reaches Spark whole and fails ITS name resolution
    intercept[org.apache.spark.sql.AnalysisException](
      Lake.sqlFrame(spark, "SELECT grp FROM ev GROUP BY grp"))
    // USE of a missing directory is loud
    intercept[IllegalArgumentException](Lake.sql(spark, s"USE '$root/nope'"))
  }

  test("sqlScript plans but never materializes interior result-set statements") {
    val t = tmp("graft_script_lazy") + "/tbl"
    DeltaWrite.append(spark, Seq((1L, 1.0), (2L, 2.0)).toDF("id", "v"), t)
    // raise_error would fire on ANY execution of the interior SELECT -
    // the script must plan it, discard the frame, and move on
    val out = Lake.sqlScript(spark,
      s"""SELECT raise_error('interior SELECT must not execute') AS boom FROM '$t';
          SELECT count(*) AS c FROM '$t';""")
    assert(out.as[Long].collect().toSeq === Seq(2L))
  }

  test("script literals with doubled-quote escapes never split statements") {
    val t = tmp("graft_script_esc") + "/tbl"
    val out = Lake.sqlScript(spark,
      s"""CREATE TABLE '$t' USING delta AS SELECT 1L AS id, 'it''s; fine' AS note;
          SELECT id, note FROM '$t' ORDER BY id;""")
    assert(out.as[(Long, String)].collect().toSeq === Seq((1L, "it's; fine")))
  }


  test("bare-name DML under USE: full statement lifecycle plus DROP TABLE") {
    val root = tmp("graft_use_dml")
    Lake.sql(spark, s"USE '$root'")
    try {
      // CREATE resolves a bare target unconditionally (it does not exist yet)
      Lake.sql(spark, "CREATE TABLE sales (id BIGINT, v DOUBLE) USING delta")
      Lake.sql(spark, "INSERT INTO sales (id, v) VALUES (1, 1.5), (2, 2.5), (9, 99.0)")
      Lake.sql(spark, "UPDATE sales SET v = v + 0.5 WHERE id = 2")
      Lake.sql(spark, "DELETE FROM sales WHERE id = 9")
      assert(Lake.sqlFrame(spark, "SELECT id, v FROM sales ORDER BY id")
        .as[(Long, Double)].collect().toSeq === Seq((1L, 1.5), (2L, 3.0)))
      // result-set heads resolve bare names too
      assert(Lake.sqlFrame(spark, "DESCRIBE sales")
        .select("col_name").as[String].collect().toSeq === Seq("id", "v"))
      assert(Lake.sqlFrame(spark, "DESCRIBE HISTORY sales").count() >= 3L)
      Lake.sql(spark, "OPTIMIZE sales")
      // IF NOT EXISTS over the occupied table is a no-op, never a clobber
      Lake.sql(spark, "CREATE TABLE IF NOT EXISTS sales (id BIGINT) USING delta")
      assert(Lake.read(spark, s"$root/sales").count() === 2L)
      // bare SHOW TABLES lists the USE'd catalog
      assert(Lake.sqlFrame(spark, "SHOW TABLES")
        .select("table").as[String].collect().toSeq === Seq("sales"))
      // bare COUNT(*) reaches the metadata-only count like its quoted twin
      assert(Lake.sqlFrame(spark, "SELECT COUNT(*) FROM sales")
        .as[(Long, Boolean)].collect().toSeq === Seq((2L, true)))
      // round-15 heads resolve bare names too
      assert(Lake.sqlFrame(spark, "DESCRIBE DETAIL sales")
        .select("format").as[String].collect().head === "delta")
      assert(Lake.sqlFrame(spark, "SHOW CREATE TABLE sales")
        .as[String].collect().head.contains("USING delta"))
      val inbox = s"$root/inbox"
      java.nio.file.Files.createDirectories(java.nio.file.Paths.get(inbox))
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(s"$inbox/d.json"), """{"id":7,"v":7.0}""")
      Lake.sql(spark, s"COPY INTO sales FROM '$inbox' FORMAT json")
      assert(Lake.read(spark, s"$root/sales").count() === 3L)
      Lake.sql(spark, "TRUNCATE TABLE sales")
      assert(Lake.read(spark, s"$root/sales").count() === 0L)
      Lake.sql(spark, "INSERT INTO sales (id, v) VALUES (1, 1.5), (2, 3.0)")
      // DROP TABLE removes it from the catalog; IF EXISTS tolerates absence
      Lake.sql(spark, "DROP TABLE sales")
      assert(Lake.sqlFrame(spark, s"SHOW TABLES IN '$root'").count() === 0L)
      Lake.sql(spark, "DROP TABLE IF EXISTS sales")
      intercept[IllegalArgumentException](Lake.sql(spark, "DROP TABLE sales"))
      // DROP TABLE refuses a directory that is not a table
      new java.io.File(s"$root/not_a_table/keep.txt").getParentFile.mkdirs()
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(s"$root/not_a_table/keep.txt"), "x")
      intercept[IllegalArgumentException](Lake.sql(spark, "DROP TABLE not_a_table"))
      assert(new java.io.File(s"$root/not_a_table/keep.txt").exists())
    } finally Lake.sql(spark, "USE DEFAULT")
    // without USE, a bare head no longer resolves, and bare SHOW TABLES
    // has no catalog to list
    intercept[IllegalArgumentException](Lake.sql(spark, "DELETE FROM sales WHERE id = 1"))
    intercept[IllegalArgumentException](Lake.sqlFrame(spark, "SHOW TABLES"))
  }


  test("Delta append refuses a same-named column of another type") {
    val t = tmp("graft_typepin") + "/tbl"
    DeltaWrite.append(spark, Seq((1L, 1.0)).toDF("id", "v"), t)
    // decimal staged into a double column would be MISREAD (unscaled longs
    // as doubles) — the writer must refuse, not stage
    val ex = intercept[IllegalArgumentException] {
      DeltaWrite.append(spark,
        Seq((2, BigDecimal("2.5"))).toDF("id", "v"), t)
    }
    assert(ex.getMessage.contains("cast before appending"))
    // the SQL surface conforms automatically: VALUES literals land typed
    Lake.sql(spark, s"INSERT INTO '$t' (id, v) VALUES (2, 2.5)")
    assert(Lake.read(spark, t).orderBy("id").as[(Long, Double)].collect().toSeq ===
      Seq((1L, 1.0), (2L, 2.5)))
  }


  test("full MERGE: ordered WHEN clauses, conditional update/delete/insert, one commit") {
    for (fmt <- Seq("delta", "iceberg")) {
      val t = tmp(s"graft_merge_$fmt") + "/tbl"
      val seed = Seq((1L, 10.0, "keep"), (2L, 20.0, "bump"),
        (3L, 30.0, "drop"), (4L, 40.0, "stay")).toDF("id", "v", "note")
      if (fmt == "delta") DeltaWrite.append(spark, seed, t)
      else IcebergWrite.append(spark, seed, t)
      val vBefore = if (fmt == "delta") DeltaRead.snapshotInfo(spark, t).version
        else IcebergRead.history(spark, t).count()
      // source: id=2 (bump), id=3 (drop), id=5 (new), id=6 (new but filtered)
      Seq((2L, 5.0, "bump"), (3L, 0.0, "drop"), (5L, 50.0, "new"), (6L, -1.0, "new"))
        .toDF("id", "v", "note").createOrReplaceTempView("graft_merge_src")
      Lake.sql(spark,
        s"""MERGE INTO '$t' USING (SELECT * FROM graft_merge_src) ON (id)
            WHEN MATCHED AND note = 'drop' THEN DELETE
            WHEN MATCHED THEN UPDATE SET v = v + src_v
            WHEN NOT MATCHED AND v > 0 THEN INSERT *""")
      // id=1,4 untouched (matched nothing? 1 and 4 not in source), id=2
      // updated 20+5, id=3 deleted, id=5 inserted, id=6 filtered out
      assert(Lake.read(spark, t).orderBy("id").as[(Long, Double, String)]
        .collect().toSeq ===
        Seq((1L, 10.0, "keep"), (2L, 25.0, "bump"),
          (4L, 40.0, "stay"), (5L, 50.0, "new")), fmt)
      // ONE commit carried the whole merge
      if (fmt == "delta")
        assert(DeltaRead.snapshotInfo(spark, t).version === vBefore + 1, fmt)
      else assert(IcebergRead.history(spark, t).count() === vBefore + 1, fmt)
    }

    // clause ORDER decides: delete-first vs update-first on the same rows
    val t2 = tmp("graft_merge_order") + "/tbl"
    DeltaWrite.append(spark, Seq((1L, 1.0), (2L, 2.0)).toDF("id", "v"), t2)
    Seq((1L, 100.0), (2L, 100.0)).toDF("id", "v")
      .createOrReplaceTempView("graft_merge_src2")
    Lake.sql(spark,
      s"""MERGE INTO '$t2' USING (SELECT * FROM graft_merge_src2) ON (id)
          WHEN MATCHED AND id = 1 THEN UPDATE SET *
          WHEN MATCHED THEN DELETE""")
    assert(Lake.read(spark, t2).orderBy("id").as[(Long, Double)].collect().toSeq ===
      Seq((1L, 100.0)))

    // duplicate source keys are refused loudly (ambiguous merge)
    Seq((1L, 1.0), (1L, 2.0)).toDF("id", "v")
      .createOrReplaceTempView("graft_merge_dup")
    val ex = intercept[IllegalArgumentException](Lake.sql(spark,
      s"""MERGE INTO '$t2' USING (SELECT * FROM graft_merge_dup) ON (id)
          WHEN MATCHED THEN DELETE"""))
    assert(ex.getMessage.contains("duplicate key"))

    // the no-WHEN form is still the CDC upsert
    Seq((1L, 7.0), (9L, 9.0)).toDF("id", "v")
      .createOrReplaceTempView("graft_merge_cdc")
    Lake.sql(spark,
      s"MERGE INTO '$t2' USING (SELECT * FROM graft_merge_cdc) ON (id)")
    assert(Lake.read(spark, t2).orderBy("id").as[(Long, Double)].collect().toSeq ===
      Seq((1L, 7.0), (9L, 9.0)))
  }


  test("MERGE WITH SCHEMA EVOLUTION: new columns extend, missing keep/NULL") {
    for (fmt <- Seq("delta", "iceberg")) {
      val t = tmp(s"graft_merge_evo_$fmt") + "/tbl"
      val seed = Seq((1L, 10.0), (2L, 20.0)).toDF("id", "v")
      if (fmt == "delta") DeltaWrite.append(spark, seed, t)
      else IcebergWrite.append(spark, seed, t)
      val vBefore =
        if (fmt == "delta") DeltaRead.snapshotInfo(spark, t).version
        else -1L

      // source carries a NEW column `tag` and MISSES `v`
      Seq((2L, "hot"), (3L, "new")).toDF("id", "tag")
        .createOrReplaceTempView(s"graft_evo_src_$fmt")
      // plain MERGE refuses the shape loudly
      val ex = intercept[IllegalArgumentException](Lake.sql(spark,
        s"""MERGE INTO '$t' USING (SELECT * FROM graft_evo_src_$fmt) ON (id)
            WHEN MATCHED THEN UPDATE SET *"""))
      assert(ex.getMessage.contains("SCHEMA EVOLUTION"), fmt)

      Lake.sql(spark,
        s"""MERGE WITH SCHEMA EVOLUTION INTO '$t'
            USING (SELECT * FROM graft_evo_src_$fmt) ON (id)
            WHEN MATCHED THEN UPDATE SET *
            WHEN NOT MATCHED THEN INSERT *""")
      // id=1 untouched (NULL tag); id=2 updated — keeps v (source misses
      // it), gains tag; id=3 inserted with NULL v
      assert(Lake.read(spark, t).orderBy("id")
        .as[(Long, Option[Double], Option[String])].collect().toSeq ===
        Seq((1L, Some(10.0), None), (2L, Some(20.0), Some("hot")),
          (3L, None, Some("new"))), fmt)

      // time travel: the PRE-evolution version still reads the old schema
      if (fmt == "delta")
        assert(Lake.read(spark, t, vBefore).columns.toSeq === Seq("id", "v"), fmt)
      else {
        // history rows are in commit order; the first snapshot pre-dates
        // the evolving merge
        val firstSnap = IcebergRead.history(spark, t)
          .select("version").as[Long].collect().head
        assert(IcebergRead.snapshot(spark, t, firstSnap).columns.toSeq ===
          Seq("id", "v"), fmt)
      }
    }

    // the no-WHEN evolving form is the evolving CDC upsert
    val t2 = tmp("graft_merge_evo_cdc") + "/tbl"
    DeltaWrite.append(spark, Seq((1L, 1.0)).toDF("id", "v"), t2)
    Seq((1L, 9.9, "x"), (2L, 2.0, "y")).toDF("id", "v", "w")
      .createOrReplaceTempView("graft_evo_cdc_src")
    Lake.sql(spark,
      s"MERGE WITH SCHEMA EVOLUTION INTO '$t2' " +
        "USING (SELECT * FROM graft_evo_cdc_src) ON (id)")
    assert(Lake.read(spark, t2).orderBy("id")
      .as[(Long, Double, String)].collect().toSeq ===
      Seq((1L, 9.9, "x"), (2L, 2.0, "y")))
  }

  test("MERGE WITH SCHEMA EVOLUTION: a refused merge never evolves the schema") {
    for (fmt <- Seq("delta", "iceberg")) {
      val t = tmp(s"graft_merge_evo_guard_$fmt") + "/tbl"
      val seed = Seq((1L, 10.0)).toDF("id", "v")
      if (fmt == "delta") DeltaWrite.append(spark, seed, t)
      else IcebergWrite.append(spark, seed, t)
      // duplicate source keys → the merge refuses; the NEW column `tag`
      // must NOT have been committed to the target schema
      Seq((1L, "a"), (1L, "b")).toDF("id", "tag")
        .createOrReplaceTempView(s"graft_evo_guard_src_$fmt")
      val ex = intercept[IllegalArgumentException](Lake.sql(spark,
        s"""MERGE WITH SCHEMA EVOLUTION INTO '$t'
            USING (SELECT * FROM graft_evo_guard_src_$fmt) ON (id)
            WHEN MATCHED THEN UPDATE SET *"""))
      assert(ex.getMessage.contains("duplicate key"), fmt)
      assert(Lake.read(spark, t).columns.toSeq === Seq("id", "v"), fmt)
      // same for a bad SET-column reference under evolution
      Seq((1L, "a")).toDF("id", "tag")
        .createOrReplaceTempView(s"graft_evo_guard_src2_$fmt")
      val ex2 = intercept[IllegalArgumentException](Lake.sql(spark,
        s"""MERGE WITH SCHEMA EVOLUTION INTO '$t'
            USING (SELECT * FROM graft_evo_guard_src2_$fmt) ON (id)
            WHEN MATCHED THEN UPDATE SET nope = 1"""))
      assert(ex2.getMessage.contains("unknown columns"), fmt)
      assert(Lake.read(spark, t).columns.toSeq === Seq("id", "v"), fmt)
    }
  }

  test("COPY INTO: overwritten source file re-ingests as a new version") {
    val root = tmp("graft_copy_mtime")
    val t = s"$root/tbl"
    val inbox = s"$root/in"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(inbox))
    DeltaWrite.append(spark, Seq((0L, 0.0)).toDF("id", "v"), t)
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$inbox/a.json"), """{"id":1,"v":1.0}""")
    Lake.sql(spark, s"COPY INTO '$t' FROM '$inbox' FORMAT json")
    assert(Lake.read(spark, t).count() === 2L)
    // same path, same bytes: no-op
    Lake.sql(spark, s"COPY INTO '$t' FROM '$inbox' FORMAT json")
    assert(Lake.read(spark, t).count() === 2L)
    // overwrite IN PLACE with new content (different length ⇒ different
    // fid even within mtime granularity): the new version re-ingests;
    // previously loaded rows remain (COPY INTO appends, never retracts)
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$inbox/a.json"), """{"id":22,"v":22.0}""")
    Lake.sql(spark, s"COPY INTO '$t' FROM '$inbox' FORMAT json")
    assert(Lake.read(spark, t).orderBy("id").as[(Long, Double)]
      .collect().toSeq === Seq((0L, 0.0), (1L, 1.0), (22L, 22.0)))
  }

  test("COPY INTO WITH SCHEMA EVOLUTION extends the table; plain refuses") {
    val root = tmp("graft_copy_evo")
    val t = s"$root/tbl"
    val inbox = s"$root/in"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(inbox))
    DeltaWrite.append(spark, Seq((0L, 0.0)).toDF("id", "v"), t)
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$inbox/a.json"),
      """{"id":1,"v":1.0,"tag":"x"}""")
    // plain COPY INTO refuses extra columns loudly — and the refusal must
    // not have evolved the schema
    val ex = intercept[IllegalArgumentException](
      Lake.sql(spark, s"COPY INTO '$t' FROM '$inbox' FORMAT json"))
    assert(ex.getMessage.contains("extra columns"))
    assert(Lake.read(spark, t).columns.toSeq === Seq("id", "v"))
    Lake.sql(spark,
      s"COPY INTO '$t' FROM '$inbox' FORMAT json WITH SCHEMA EVOLUTION")
    assert(Lake.read(spark, t).orderBy("id")
      .as[(Long, Double, Option[String])].collect().toSeq ===
      Seq((0L, 0.0, None), (1L, 1.0, Some("x"))))
    // exactly-once still holds for the evolved file
    Lake.sql(spark,
      s"COPY INTO '$t' FROM '$inbox' FORMAT json WITH SCHEMA EVOLUTION")
    assert(Lake.read(spark, t).count() === 2L)
  }

  test("COPY INTO FORMAT avro ingests container files exactly once") {
    val root = tmp("graft_copy_avro")
    val t = s"$root/tbl"
    val inbox = s"$root/in"
    IcebergWrite.append(spark, Seq((0L, 0.0)).toDF("id", "v"), t)
    AvroIo.write(Seq((1L, 1.0), (2L, 2.0)).toDF("id", "v"), inbox)
    Lake.sql(spark, s"COPY INTO '$t' FROM '$inbox' FORMAT avro")
    assert(Lake.read(spark, t).orderBy("id").as[(Long, Double)]
      .collect().toSeq === Seq((0L, 0.0), (1L, 1.0), (2L, 2.0)))
    Lake.sql(spark, s"COPY INTO '$t' FROM '$inbox' FORMAT avro") // no-op
    assert(Lake.read(spark, t).count() === 3L)
  }


  test("quoted-path views: CREATE/read/DROP by path, no USE catalog") {
    val root = tmp("graft_view_path")
    DeltaWrite.append(spark,
      Seq((1L, 5.0), (2L, 25.0), (3L, 50.0)).toDF("id", "v"), s"$root/base")
    Lake.sql(spark,
      s"CREATE VIEW '$root/big' AS SELECT id, v FROM '$root/base' WHERE v >= 20.0")
    // read by quoted path — the .view.sql twin resolves the reference
    assert(Lake.sqlFrame(spark,
      s"SELECT id FROM '$root/big' ORDER BY id").as[Long].collect().toSeq ===
      Seq(2L, 3L))
    // composes inside joins and pins are irrelevant to the literal filter
    assert(Lake.sqlFrame(spark,
      s"SELECT count(*) AS n FROM '$root/base' b JOIN '$root/big' g ON b.id = g.id")
      .as[Long].collect().toSeq === Seq(2L))
    // OR REPLACE by path; duplicate refused without it
    intercept[IllegalArgumentException](Lake.sql(spark,
      s"CREATE VIEW '$root/big' AS SELECT 1 AS one"))
    Lake.sql(spark,
      s"CREATE OR REPLACE VIEW '$root/big' AS SELECT id FROM '$root/base' WHERE v < 20.0")
    assert(Lake.sqlFrame(spark, s"SELECT id FROM '$root/big'").as[Long]
      .collect().toSeq === Seq(1L))
    Lake.sql(spark, s"DROP VIEW '$root/big'")
    intercept[Exception](Lake.sqlFrame(spark, s"SELECT id FROM '$root/big'"))
    Lake.sql(spark, s"DROP VIEW IF EXISTS '$root/big'") // tolerated
  }


  test("pinned COUNT(*) folds from that snapshot's metadata") {
    val t = tmp("graft_count_pin") + "/tbl"
    DeltaWrite.append(spark, (1L to 10L).toDF("id"), t)
    DeltaWrite.append(spark, (11L to 15L).toDF("id"), t)
    Lake.sql(spark, s"DELETE FROM '$t' WHERE id <= 2")
    def count(sqlText: String): (Long, Boolean) =
      Lake.sqlFrame(spark, sqlText).as[(Long, Boolean)].collect().head
    assert(count(s"SELECT COUNT(*) FROM '$t'") === ((13L, true)))
    assert(count(s"SELECT COUNT(*) FROM '$t' VERSION AS OF 0") === ((10L, true)))
    assert(count(s"SELECT COUNT(*) FROM '$t' VERSION AS OF 1") === ((15L, true)))

    val ti = tmp("graft_count_pin_i") + "/tbl"
    IcebergWrite.append(spark, (1L to 7L).toDF("id"), ti)
    IcebergWrite.append(spark, (8L to 9L).toDF("id"), ti)
    val firstSnap = IcebergRead.history(spark, ti)
      .select("version").as[Long].collect().head
    assert(count(s"SELECT COUNT(*) FROM '$ti' VERSION AS OF $firstSnap") ===
      ((7L, true)))
    assert(count(s"SELECT COUNT(*) FROM '$ti'") === ((9L, true)))
  }


  test("INSERT refuses an uncastable value loudly instead of landing NULL") {
    val t = tmp("graft_loud_cast") + "/tbl"
    DeltaWrite.append(spark, Seq((1L, 1.0)).toDF("id", "v"), t)
    // under ANSI (the session default) Spark's own cast throws; with ANSI
    // off the conformTo raise_error guard fires — loud either way, never a
    // silent NULL
    val ex = intercept[Exception](Lake.sql(spark,
      s"INSERT INTO '$t' SELECT 'abc' AS id, 2.0D AS v"))
    val all = (Iterator.iterate(ex: Throwable)(_.getCause).takeWhile(_ != null)
      .map(e => String.valueOf(e.getMessage)).mkString("\n"))
    assert(all.contains("cannot cast column id") ||
      all.contains("CAST_INVALID_INPUT"))
    // castable values still conform silently
    Lake.sql(spark, s"INSERT INTO '$t' SELECT '7' AS id, 2.0D AS v")
    assert(Lake.read(spark, t).orderBy("id").as[(Long, Double)].collect().toSeq ===
      Seq((1L, 1.0), (7L, 2.0)))
  }


  test("Iceberg overwrite pins column TYPES, not just names") {
    val t = tmp("graft_ice_ovw_pin") + "/tbl"
    IcebergWrite.append(spark, Seq((1L, 1.0)).toDF("id", "v"), t)
    val ex = intercept[IllegalArgumentException](IcebergWrite.overwrite(spark,
      Seq((2L, java.math.BigDecimal.valueOf(2.5))).toDF("id", "v"), t))
    assert(ex.getMessage.contains("cast before writing"))
    IcebergWrite.overwrite(spark, Seq((2L, 2.5)).toDF("id", "v"), t)
    assert(Lake.read(spark, t).as[(Long, Double)].collect().toSeq === Seq((2L, 2.5)))
  }


  test("DML WHERE subqueries: IN/EXISTS/NOT IN over temp views, lake paths, USE names") {
    for (fmt <- Seq("delta", "iceberg")) {
      val root = tmp(s"graft_dml_subq_$fmt")
      val fact = s"$root/fact"
      val seed = Seq((1L, 10.0), (2L, 20.0), (3L, 30.0), (5L, 50.0)).toDF("id", "v")
      if (fmt == "delta") DeltaWrite.append(spark, seed, fact)
      else IcebergWrite.append(spark, seed, fact)
      // dim lives as the OTHER format — the subquery scan is format-detected
      val dim = s"$root/dim"
      val dimDf = Seq((1L, "a"), (3L, "c"), (9L, "z")).toDF("id", "s")
      if (fmt == "delta") IcebergWrite.append(spark, dimDf, dim)
      else DeltaWrite.append(spark, dimDf, dim)

      // IN over a quoted lake path
      Lake.sql(spark, s"DELETE FROM '$fact' WHERE id IN (SELECT id FROM '$dim' WHERE s = 'a')")
      assert(Lake.read(spark, fact).orderBy("id").as[(Long, Double)].collect().toSeq ===
        Seq((2L, 20.0), (3L, 30.0), (5L, 50.0)), fmt)

      // correlated EXISTS with a target alias (DELETE FROM '<p>' t WHERE …)
      Lake.sql(spark,
        s"DELETE FROM '$fact' t WHERE EXISTS (SELECT 1 FROM '$dim' d WHERE d.id = t.id)")
      assert(Lake.read(spark, fact).orderBy("id").as[(Long, Double)].collect().toSeq ===
        Seq((2L, 20.0), (5L, 50.0)), fmt)

      // NOT IN over a temp view, through UPDATE … AS t
      Seq(2L).toDF("id").createOrReplaceTempView("graft_subq_keep")
      Lake.sql(spark,
        s"UPDATE '$fact' AS t SET v = 0 WHERE t.id NOT IN (SELECT id FROM graft_subq_keep)")
      assert(Lake.read(spark, fact).orderBy("id").as[(Long, Double)].collect().toSeq ===
        Seq((2L, 20.0), (5L, 0.0)), fmt)

      // bare USE-catalog name inside the subquery
      Lake.sql(spark, s"USE '$root'")
      try {
        Lake.sql(spark, s"UPDATE '$fact' SET v = 1 WHERE id IN (SELECT id FROM dim)")
        // dim has ids {1,3,9}; fact has {2,5} — nothing matches, no change
        assert(Lake.read(spark, fact).orderBy("id").as[(Long, Double)].collect().toSeq ===
          Seq((2L, 20.0), (5L, 0.0)), fmt)
        Lake.sql(spark, s"DELETE FROM '$fact' WHERE id NOT IN (SELECT id FROM dim)")
        assert(Lake.read(spark, fact).count() === 0L, fmt)
      } finally Lake.sql(spark, "USE DEFAULT")
    }

    // a scalar subquery in a MERGE WHEN condition resolves lake refs too
    val root = tmp("graft_merge_subq")
    DeltaWrite.append(spark, Seq((1L, 1.0), (2L, 2.0)).toDF("id", "v"), s"$root/t")
    DeltaWrite.append(spark, Seq((1L, 1.5)).toDF("id", "cut"), s"$root/cuts")
    Seq((1L, 100.0), (2L, 200.0)).toDF("id", "v")
      .createOrReplaceTempView("graft_merge_subq_src")
    Lake.sql(spark,
      s"""MERGE INTO '$root/t' USING (SELECT * FROM graft_merge_subq_src) ON (id)
          WHEN MATCHED AND v > (SELECT max(cut) FROM '$root/cuts') THEN DELETE
          WHEN MATCHED THEN UPDATE SET v = src_v""")
    assert(Lake.read(spark, s"$root/t").orderBy("id").as[(Long, Double)]
      .collect().toSeq === Seq((1L, 100.0)))
  }


  test("MERGE INSERT (cols) VALUES, SET-value subqueries, DESCRIBE DETAIL") {
    val root = tmp("graft_misc15")
    val t = s"$root/t"
    DeltaWrite.append(spark,
      Seq((1L, 1.0, "a"), (2L, 2.0, "b")).toDF("id", "v", "note"), t)

    // MERGE INSERT column list: unassigned columns land NULL, expressions
    // see the source row
    Seq((2L, 20.0, "x"), (5L, 50.0, "y")).toDF("id", "v", "note")
      .createOrReplaceTempView("graft_misc_src")
    Lake.sql(spark,
      s"""MERGE INTO '$t' USING (SELECT * FROM graft_misc_src) ON (id)
          WHEN MATCHED THEN UPDATE SET v = src_v
          WHEN NOT MATCHED THEN INSERT (id, v) VALUES (id, v * 2)""")
    assert(Lake.read(spark, t).orderBy("id")
      .as[(Long, Double, Option[String])].collect().toSeq ===
      Seq((1L, 1.0, Some("a")), (2L, 20.0, Some("b")), (5L, 100.0, None)))
    // a column list that misses the merge key is refused
    val exk = intercept[IllegalArgumentException](Lake.sql(spark,
      s"""MERGE INTO '$t' USING (SELECT * FROM graft_misc_src) ON (id)
          WHEN NOT MATCHED THEN INSERT (v) VALUES (v)"""))
    assert(exk.getMessage.contains("every merge key"))

    // UPDATE SET value from a scalar subquery over a lake path
    DeltaWrite.append(spark, Seq((1L, 7.5)).toDF("id", "cut"), s"$root/cuts")
    Lake.sql(spark,
      s"UPDATE '$t' SET v = (SELECT max(cut) FROM '$root/cuts') WHERE id = 1")
    assert(Lake.read(spark, t).where($"id" === 1L).as[(Long, Double, Option[String])]
      .collect().head._2 === 7.5)

    // DESCRIBE DETAIL: one metadata row per format
    val d = Lake.sqlFrame(spark, s"DESCRIBE DETAIL '$t'")
      .as[(String, String, Long, Long, Long, String, Int)].collect().head
    assert(d._1 === "delta" && d._3 >= 2L && d._4 >= 1L && d._5 > 0L &&
      d._7 === 3)
    val ti = s"$root/ti"
    IcebergWrite.append(spark, Seq((1L, "a")).toDF("id", "s"), ti,
      partitionBy = Seq("s"))
    val di = Lake.sqlFrame(spark, s"DESCRIBE DETAIL '$ti'")
      .as[(String, String, Long, Long, Long, String, Int)].collect().head
    assert(di._1 === "iceberg" && di._4 === 1L && di._5 > 0L && di._6 === "s")
    val tp = s"$root/tp"
    Seq((1L, 2L)).toDF("a", "b").write.parquet(tp)
    val dp = Lake.sqlFrame(spark, s"DESCRIBE DETAIL '$tp'")
      .as[(String, String, Long, Long, Long, String, Int)].collect().head
    assert(dp._1 === "parquet" && dp._3 === -1L && dp._4 >= 1L && dp._7 === 2)
  }


  test("MERGE 3VL: a NULL-evaluating WHEN condition falls through, not exempts") {
    // Rows whose first clause condition evaluates NULL (note IS NULL, so
    // `note = 'drop'` is NULL) must be caught by the later unconditional
    // UPDATE — the first-match-wins accumulator may not poison to NULL.
    for (fmt <- Seq("delta", "iceberg")) {
      val t = tmp(s"graft_merge_3vl_$fmt") + "/tbl"
      val seed = Seq((1L, 10.0, Some("keep")), (2L, 20.0, None),
        (3L, 30.0, Some("drop")), (4L, 40.0, None))
        .toDF("id", "v", "note")
      if (fmt == "delta") DeltaWrite.append(spark, seed, t)
      else IcebergWrite.append(spark, seed, t)
      Seq((1L, 1.0, Some("keep")), (2L, 2.0, None), (3L, 3.0, None),
        (5L, 50.0, None)).toDF("id", "v", "note")
        .createOrReplaceTempView("graft_merge_3vl_src")
      Lake.sql(spark,
        s"""MERGE INTO '$t' USING (SELECT * FROM graft_merge_3vl_src) ON (id)
            WHEN MATCHED AND note = 'drop' THEN DELETE
            WHEN MATCHED THEN UPDATE SET v = v + src_v
            WHEN NOT MATCHED THEN INSERT *""")
      // id=2 (target note NULL → cond NULL → falls through to UPDATE): 22.0
      // id=3 (target note 'drop' → cond TRUE): deleted
      // id=1 updated, id=4 untouched, id=5 inserted
      assert(Lake.read(spark, t).orderBy("id")
        .as[(Long, Double, Option[String])].collect().toSeq ===
        Seq((1L, 11.0, Some("keep")), (2L, 22.0, None),
          (4L, 40.0, None), (5L, 50.0, None)), fmt)
    }

    // same 3VL rule on the NOT MATCHED BY SOURCE chain: an orphan whose
    // first clause condition is NULL still reaches the later clause
    val t2 = tmp("graft_merge_3vl_nmbs") + "/tbl"
    DeltaWrite.append(spark,
      Seq((1L, 1.0, Some("a")), (2L, 2.0, None), (3L, 3.0, Some("stale")))
        .toDF("id", "v", "note"), t2)
    Seq((1L, 10.0, Some("a"))).toDF("id", "v", "note")
      .createOrReplaceTempView("graft_merge_3vl_nmbs_src")
    Lake.sql(spark,
      s"""MERGE INTO '$t2' USING (SELECT * FROM graft_merge_3vl_nmbs_src) ON (id)
          WHEN MATCHED THEN UPDATE SET *
          WHEN NOT MATCHED BY SOURCE AND note = 'stale' THEN DELETE
          WHEN NOT MATCHED BY SOURCE THEN UPDATE SET note = 'orphan'""")
    assert(Lake.read(spark, t2).orderBy("id")
      .as[(Long, Double, Option[String])].collect().toSeq ===
      Seq((1L, 10.0, Some("a")), (2L, 2.0, Some("orphan"))))
  }


  test("MERGE WHEN NOT MATCHED BY SOURCE: deletion-sync and orphan updates") {
    val t = tmp("graft_merge_nmbs") + "/tbl"
    DeltaWrite.append(spark,
      Seq((1L, 1.0, "a"), (2L, 2.0, "b"), (3L, 3.0, "b"), (4L, 4.0, "stale"))
        .toDF("id", "v", "note"), t)
    Seq((1L, 10.0, "a")).toDF("id", "v", "note")
      .createOrReplaceTempView("graft_nmbs_src")
    // sync: matched replaces, orphans with note='stale' delete, other
    // orphans get flagged — one statement, one commit
    val vBefore = DeltaRead.snapshotInfo(spark, t).version
    Lake.sql(spark,
      s"""MERGE INTO '$t' USING (SELECT * FROM graft_nmbs_src) ON (id)
          WHEN MATCHED THEN UPDATE SET *
          WHEN NOT MATCHED BY SOURCE AND note = 'stale' THEN DELETE
          WHEN NOT MATCHED BY SOURCE THEN UPDATE SET note = 'orphan'""")
    assert(DeltaRead.snapshotInfo(spark, t).version === vBefore + 1)
    assert(Lake.read(spark, t).orderBy("id").as[(Long, Double, String)]
      .collect().toSeq ===
      Seq((1L, 10.0, "a"), (2L, 2.0, "orphan"), (3L, 3.0, "orphan")))
    // SET * is meaningless without a source row
    intercept[IllegalArgumentException](Lake.sql(spark,
      s"""MERGE INTO '$t' USING (SELECT * FROM graft_nmbs_src) ON (id)
          WHEN NOT MATCHED BY SOURCE THEN UPDATE SET *"""))
  }


  test("block-local pruning: a derived table's own WHERE prunes its scan") {
    val t = tmp("graft_blockprune") + "/tbl"
    DeltaWrite.append(spark, (1L to 100L).map(i => (i, i * 1.0)).toDF("id", "v")
      .repartition(1), t)
    DeltaWrite.append(spark, (1000L to 1100L).map(i => (i, i * 1.0)).toDF("id", "v")
      .repartition(1), t)
    val all = Lake.read(spark, t).inputFiles.length
    assert(all >= 2)
    // the WHERE lives INSIDE the derived table — its file pruning must
    // still engage (the block's own filter, applied one tier earlier)
    val out = Lake.sqlFrame(spark,
      s"SELECT mx FROM (SELECT max(v) AS mx FROM '$t' WHERE id >= 1000) x")
    assert(out.as[Double].collect().toSeq === Seq(1100.0))
    assert(out.inputFiles.length < all,
      "the derived table's own WHERE must prune its files")
    // and a CTE body prunes the same way
    val cte = Lake.sqlFrame(spark,
      s"WITH big AS (SELECT id, v FROM '$t' WHERE id >= 1000) " +
        "SELECT count(*) AS c FROM big WHERE v > 0")
    assert(cte.as[Long].collect().toSeq === Seq(101L))
    assert(cte.inputFiles.length < all)
  }


  test("INSERT OVERWRITE replaces an Iceberg table whole; EXPLAIN shows plans") {
    val t = tmp("graft_iow") + "/tbl"
    IcebergWrite.append(spark, Seq((1L, 1.0), (2L, 2.0)).toDF("id", "v"), t)
    val v0 = IcebergRead.currentSnapshotId(spark, t)
    Lake.sql(spark,
      s"INSERT OVERWRITE '$t' SELECT * FROM VALUES (7L, 7.5D), (8L, 8.5D) AS s(id, v)")
    assert(Lake.read(spark, t).orderBy("id").as[(Long, Double)].collect().toSeq ===
      Seq((7L, 7.5), (8L, 8.5)))
    // prior snapshot still time-travelable
    assert(Lake.read(spark, t, v0).orderBy("id").as[(Long, Double)].collect().toSeq ===
      Seq((1L, 1.0), (2L, 2.0)))
    // schema pinning holds
    intercept[IllegalArgumentException](Lake.sql(spark,
      s"INSERT OVERWRITE '$t' SELECT 1L AS id"))

    // EXPLAIN returns the plan as rows and never executes the statement
    val plan = Lake.sqlFrame(spark, s"EXPLAIN FORMATTED SELECT id FROM '$t' WHERE v > 8")
      .as[String].collect().mkString("\n")
    assert(plan.contains("Scan") || plan.contains("Filter"), plan.take(500))
    // explaining a mutation is refused (it would execute)
    intercept[IllegalArgumentException](
      Lake.sqlFrame(spark, s"EXPLAIN DELETE FROM '$t' WHERE id = 7"))
    assert(Lake.read(spark, t).count() === 2L)
  }

  test("EXPLAIN never runs joinDerivedPrune's dim-bounds probe; execution does") {
    // the probe is a real Spark job — EXPLAIN (plans only) must suppress
    // it, while the executed twin of the same statement pays it and prunes
    val root = tmp("graft_explain_nojob")
    // many fact files keyed apart so the probe passes its size gates
    (0L until 8L).foreach { k =>
      DeltaWrite.append(spark,
        (1L to 2000L).map(i => (k * 10000 + i, k, i * 1.0)).toDF("id", "k", "v"),
        s"$root/fact")
    }
    DeltaWrite.append(spark, Seq((3L, "three")).toDF("k", "name"), s"$root/dim")
    val stmt = s"""SELECT f.id, d.name FROM '$root/fact' f
        JOIN '$root/dim' d ON f.k = d.k WHERE d.name = 'three'"""
    val before = Lake.jdpProbeCount.get()
    val plan = Lake.sqlFrame(spark, s"EXPLAIN $stmt")
      .collect().map(_.getString(0)).mkString("\n")
    assert(plan.nonEmpty)
    assert(Lake.jdpProbeCount.get() === before,
      "EXPLAIN executed the join-derived-prune bounds probe")
    // the executed statement DOES probe (same shape, jobs allowed)
    assert(Lake.sqlFrame(spark, stmt).count() === 2000L)
    assert(Lake.jdpProbeCount.get() > before,
      "executed join SELECT never reached the bounds probe (gate drift?)")
  }


  test("catalog VIEWs: stored statements expand by bare name at query time") {
    val root = tmp("graft_views")
    DeltaWrite.append(spark,
      Seq(("a", 10.0), ("a", 30.0), ("b", 20.0)).toDF("grp", "v"), s"$root/ev")
    Lake.sql(spark, s"USE '$root'")
    try {
      // a view over a bare table name, then a view over THAT view
      Lake.sql(spark, "CREATE VIEW totals AS SELECT grp, sum(v) AS s FROM ev GROUP BY grp")
      Lake.sql(spark, "CREATE VIEW big_totals AS SELECT grp, s FROM totals WHERE s > 25")
      assert(Lake.sqlFrame(spark, "SELECT grp, s FROM big_totals ORDER BY grp")
        .as[(String, Double)].collect().toSeq === Seq(("a", 40.0)))
      // views join with tables; SHOW TABLES lists both kinds
      assert(Lake.sqlFrame(spark,
          "SELECT t.grp, count(*) AS c FROM ev e JOIN totals t ON e.grp = t.grp " +
            "GROUP BY t.grp ORDER BY t.grp")
        .as[(String, Long)].collect().toSeq === Seq(("a", 2L), ("b", 1L)))
      assert(Lake.sqlFrame(spark, "SHOW TABLES")
        .as[(String, String, Long)].collect().toSeq.map(x => (x._1, x._2)).sorted ===
        Seq(("big_totals", "view"), ("ev", "delta"), ("totals", "view")))
      // OR REPLACE re-points; plain CREATE over an existing view refuses
      intercept[IllegalArgumentException](Lake.sql(spark,
        "CREATE VIEW totals AS SELECT grp FROM ev"))
      Lake.sql(spark, "CREATE OR REPLACE VIEW big_totals AS " +
        "SELECT grp, s FROM totals WHERE s > 5")
      assert(Lake.sqlFrame(spark, "SELECT count(*) AS c FROM big_totals")
        .as[Long].collect().toSeq === Seq(2L))
      // a body that does not plan fails its AUTHOR, loudly
      intercept[IllegalArgumentException](Lake.sql(spark,
        "CREATE VIEW broken AS SELECT nope FROM ev"))
      // cycles die at the depth cap, not by stack overflow: re-point
      // big_totals at a self-reference (valid at CREATE: it plans against
      // the OLD stored text)
      Lake.sql(spark, "CREATE OR REPLACE VIEW big_totals AS SELECT grp, s FROM big_totals")
      val ex = intercept[Exception](
        Lake.sqlFrame(spark, "SELECT * FROM big_totals").collect())
      assert(ex.getMessage.contains("view expansion"))
      // DESCRIBE reaches stored views (schema from planning the text)
      Lake.sql(spark, "CREATE OR REPLACE VIEW big_totals AS " +
        "SELECT grp, s FROM totals WHERE s > 5")
      assert(Lake.sqlFrame(spark, "DESCRIBE big_totals")
        .select("col_name").as[String].collect().toSeq === Seq("grp", "s"))
      // DROP VIEW removes it from the catalog
      Lake.sql(spark, "DROP VIEW big_totals")
      Lake.sql(spark, "DROP VIEW IF EXISTS big_totals")
      intercept[IllegalArgumentException](Lake.sql(spark, "DROP VIEW big_totals"))
      assert(Lake.sqlFrame(spark, "SHOW TABLES").count() === 2L)
    } finally Lake.sql(spark, "USE DEFAULT")
  }


  test("comma FROM lists: implicit joins over quoted and catalog names, pruned per side") {
    val a = tmp("graft_comma_a") + "/tbl"
    val b = tmp("graft_comma_b") + "/tbl"
    DeltaWrite.append(spark, (1L to 100L).map(i => (i, i * 1.0)).toDF("id", "v")
      .repartition(1), a)
    DeltaWrite.append(spark, (1000L to 1100L).map(i => (i, i * 1.0)).toDF("id", "v")
      .repartition(1), a)
    IcebergWrite.append(spark, (1L to 100L).map(i => (i, i * 2.0)).toDF("id", "w")
      .repartition(1), b)
    IcebergWrite.append(spark, (1000L to 1100L).map(i => (i, i * 2.0)).toDF("id", "w")
      .repartition(1), b)
    val fullFiles = Lake.read(spark, a).inputFiles.length +
      Lake.read(spark, b).inputFiles.length
    val joined = Lake.sqlFrame(spark,
      s"SELECT count(*) AS c FROM '$a' x, '$b' y " +
        "WHERE x.id = y.id AND x.id >= 1000 AND y.id >= 1000")
    assert(joined.as[Long].collect().toSeq === Seq(101L))
    assert(joined.inputFiles.length <= fullFiles - 2,
      "comma-join sides must each prune on their own conjunct")
    // a comma list inside a SELECT projection is NOT a continuation
    assert(Lake.sqlFrame(spark,
        s"SELECT id, v FROM '$a' WHERE id <= 2 ORDER BY id")
      .as[(Long, Double)].collect().toSeq === Seq((1L, 1.0), (2L, 2.0)))
    // IN-lists and function args after the ref never conjure a reference
    assert(Lake.sqlFrame(spark,
        s"SELECT count(*) AS c FROM '$a' t WHERE t.id IN (1, 2, 3)")
      .as[Long].collect().toSeq === Seq(3L))
  }

  test("SHOW TABLES classifies hive-partitioned plain parquet as a table") {
    val root = tmp("graft_show_hive")
    Seq((1L, "a", 1.0), (2L, "b", 2.0)).toDF("id", "p", "v")
      .write.partitionBy("p").parquet(s"$root/hive_tbl")
    new java.io.File(s"$root/not_a_table/sub").mkdirs() // still excluded
    val tables = Lake.sqlFrame(spark, s"SHOW TABLES IN '$root'")
      .as[(String, String, Long)].collect().toSeq
    assert(tables.map(x => (x._1, x._2)) === Seq(("hive_tbl", "parquet")))
  }
}
