package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

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
    IcebergWrite.updateWhere(spark, t, Seq("value" -> ($"value" + 0.5)), $"id" <= 2L)
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
}
