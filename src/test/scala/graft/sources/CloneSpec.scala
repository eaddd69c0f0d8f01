package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Shallow clone (Lake.clone): zero-copy snapshot into a new table,
  * independent writability, and no shared-fate on the clone's own
  * maintenance. */
class CloneSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  private def rows(df: org.apache.spark.sql.DataFrame): Set[(Long, String)] =
    df.select(col("id"), col("name")).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet

  test("delta clone: zero-copy snapshot, DV carried, time travel, independent writes") {
    val src = tmp("clone_dsrc") + "/tbl"
    val dst = tmp("clone_ddst") + "/tbl"
    DeltaWrite.append(spark, Seq((1L, "a"), (2L, "b")).toDF("id", "name"), src)
    DeltaWrite.append(spark, Seq((3L, "c"), (4L, "d")).toDF("id", "name"), src)
    DeltaWrite.deleteWhere(spark, src, col("id") === 2L) // DV, not rewrite

    assert(Lake.clone(spark, src, dst) === 0L)
    // no data files under the clone root — truly zero-copy
    def dataFiles(root: String): Seq[String] = {
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) Option(f.listFiles()).getOrElse(Array.empty).toSeq.flatMap(walk)
        else Seq(f)
      walk(new java.io.File(root)).map(_.getName)
        .filter(n => n.endsWith(".parquet") && !n.startsWith("_"))
        .filterNot(_.contains("checkpoint"))
    }
    assert(dataFiles(s"$dst/../").forall(n => n.endsWith(".json")) ||
      dataFiles(dst).isEmpty)
    assert(rows(DeltaRead.snapshot(spark, dst)) === Set((1L, "a"), (3L, "c"), (4L, "d")))

    // clone pinned at an EARLIER source version: pre-delete state
    val dst0 = tmp("clone_ddst0") + "/tbl"
    DeltaWrite.cloneShallow(spark, src, dst0, version = 1L)
    assert(rows(DeltaRead.snapshot(spark, dst0)) ===
      Set((1L, "a"), (2L, "b"), (3L, "c"), (4L, "d")))

    // clone writes do not touch the source; source writes not the clone
    DeltaWrite.append(spark, Seq((9L, "z")).toDF("id", "name"), dst)
    assert(rows(DeltaRead.snapshot(spark, dst)) ===
      Set((1L, "a"), (3L, "c"), (4L, "d"), (9L, "z")))
    assert(rows(DeltaRead.snapshot(spark, src)) === Set((1L, "a"), (3L, "c"), (4L, "d")))

    // deleting a CLONED row from the clone drops only the clone's view
    DeltaWrite.deleteWhere(spark, dst, col("id") === 1L)
    assert(rows(DeltaRead.snapshot(spark, dst)) === Set((3L, "c"), (4L, "d"), (9L, "z")))
    assert(rows(DeltaRead.snapshot(spark, src)) === Set((1L, "a"), (3L, "c"), (4L, "d")))

    // vacuum on the clone walks the clone's root only — source intact
    DeltaWrite.vacuum(spark, dst, retainLastVersions = 1, minFileAgeMs = 0L)
    assert(rows(DeltaRead.snapshot(spark, src)) === Set((1L, "a"), (3L, "c"), (4L, "d")))
    assert(rows(DeltaRead.snapshot(spark, dst)) === Set((3L, "c"), (4L, "d"), (9L, "z")))
  }

  test("iceberg clone: verbatim snapshot reference, independent appends, MOR deletes carried") {
    val src = tmp("clone_isrc") + "/tbl"
    val dst = tmp("clone_idst") + "/tbl"
    IcebergWrite.append(spark, Seq((1L, "a"), (2L, "b")).toDF("id", "name"), src)
    IcebergWrite.append(spark, Seq((3L, "c")).toDF("id", "name"), src)
    IcebergWrite.deleteWhere(spark, src, col("id") === 2L) // position delete

    val cloned = Lake.clone(spark, src, dst)
    assert(cloned === IcebergRead.currentSnapshotId(spark, src))
    assert(rows(IcebergRead.snapshot(spark, dst)) === Set((1L, "a"), (3L, "c")))
    // zero-copy: the clone has no data dir of its own yet
    assert(!new java.io.File(s"${dst.stripSuffix("/")}/data").exists())

    // clone pinned at the FIRST snapshot
    val dst0 = tmp("clone_idst0") + "/tbl"
    val firstId = IcebergRead.history(spark, src)
      .select(col("version")).collect().map(_.getLong(0)).head
    IcebergWrite.cloneShallow(spark, src, dst0, snapshotId = firstId)
    assert(rows(IcebergRead.snapshot(spark, dst0)) === Set((1L, "a"), (2L, "b")))

    // independent append on the clone (no snapshot-id collision with the
    // cloned lineage); source unchanged
    IcebergWrite.append(spark, Seq((9L, "z")).toDF("id", "name"), dst)
    assert(rows(IcebergRead.snapshot(spark, dst)) === Set((1L, "a"), (3L, "c"), (9L, "z")))
    assert(rows(IcebergRead.snapshot(spark, src)) === Set((1L, "a"), (3L, "c")))

    // incremental read over the clone's own lineage still works
    val adds = IcebergRead.addsBetween(spark, dst, cloned)
    assert(rows(adds) === Set((9L, "z")))
  }

  test("uniform export: Iceberg metadata over a Delta table's files, zero copy") {
    val src = tmp("uni_src") + "/tbl"
    val dst = tmp("uni_dst") + "/tbl"
    DeltaWrite.append(spark, Seq((1L, "a"), (2L, "b")).toDF("id", "name"), src)
    DeltaWrite.append(spark, Seq((3L, "c")).toDF("id", "name"), src)

    val snapId = IcebergWrite.exportDeltaAsIceberg(spark, src, dst)
    assert(snapId > 0)
    // the export reads the DELTA data through ICEBERG metadata
    assert(rows(IcebergRead.snapshot(spark, dst)) ===
      Set((1L, "a"), (2L, "b"), (3L, "c")))
    // zero-copy: no data dir of its own
    assert(!new java.io.File(s"${dst.stripSuffix("/")}/data").exists())
    // record counts in the manifests are real (stats-derived)
    val stats = IcebergRead.fileStats(spark, dst)
      .select(col("rows")).collect().map(_.getLong(0))
    assert(stats.sum === 3L && stats.forall(_ > 0))

    // the export is a REAL Iceberg table: appends/deletes work on it
    IcebergWrite.append(spark, Seq((9L, "z")).toDF("id", "name"), dst)
    IcebergWrite.deleteWhere(spark, dst, col("id") === 2L)
    assert(rows(IcebergRead.snapshot(spark, dst)) ===
      Set((1L, "a"), (3L, "c"), (9L, "z")))
    // the Delta source never noticed
    assert(rows(DeltaRead.snapshot(spark, src)) ===
      Set((1L, "a"), (2L, "b"), (3L, "c")))

    // refusal: DV-bearing source
    val dvSrc = tmp("uni_dv") + "/tbl"
    DeltaWrite.append(spark, Seq((1L, "a"), (2L, "b")).toDF("id", "name"), dvSrc)
    DeltaWrite.deleteWhere(spark, dvSrc, col("id") === 1L)
    intercept[IllegalArgumentException] {
      IcebergWrite.exportDeltaAsIceberg(spark, dvSrc, tmp("uni_dv_dst") + "/tbl")
    }
  }

  test("uniform export of a PARTITIONED Delta table: identity values injected from manifests") {
    val pSrc = tmp("uni_part") + "/tbl"
    val pDst = tmp("uni_part_dst") + "/tbl"
    DeltaWrite.append(spark,
      Seq((1L, "a", "g1"), (2L, "b", "g2"), (3L, "c", "g1")).toDF("id", "name", "grp"),
      pSrc, partitionBy = Seq("grp"))
    IcebergWrite.exportDeltaAsIceberg(spark, pSrc, pDst)
    // Delta data files LACK grp in-file; the Iceberg read must inject it
    // from the manifests' identity partition records
    val got = IcebergRead.snapshot(spark, pDst)
      .select(col("id"), col("name"), col("grp")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
    assert(got === Set((1L, "a", "g1"), (2L, "b", "g2"), (3L, "c", "g1")))
    // partition-pruned scan through the Iceberg side matches
    assert(IcebergRead.snapshot(spark, pDst).where(col("grp") === "g1").count() === 2L)
  }

  test("uniform export reverse: Delta log over an Iceberg table's files") {
    val src = tmp("unir_src") + "/tbl"
    val dst = tmp("unir_dst") + "/tbl"
    // PARTITIONED Iceberg source: files carry all columns, so the export
    // works (as an unpartitioned Delta table)
    IcebergWrite.append(spark,
      Seq((1L, "a", "g1"), (2L, "b", "g2")).toDF("id", "name", "grp"),
      src, partitionBy = Seq("grp"))
    IcebergWrite.append(spark,
      Seq((3L, "c", "g1")).toDF("id", "name", "grp"), src, partitionBy = Seq("grp"))

    assert(DeltaWrite.exportIcebergAsDelta(spark, src, dst) === 0L)
    assert(DeltaRead.snapshot(spark, dst).select(col("id"), col("name"), col("grp"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet ===
      Set((1L, "a", "g1"), (2L, "b", "g2"), (3L, "c", "g1")))
    // record counts ride the adds' stats
    assert(DeltaRead.fileStats(spark, dst).select(col("rows"))
      .collect().map(_.getLong(0)).sum === 3L)
    // the export is a live Delta table: DV delete works, source untouched
    DeltaWrite.deleteWhere(spark, dst, col("id") === 2L)
    assert(DeltaRead.snapshot(spark, dst).count() === 2L)
    assert(IcebergRead.snapshot(spark, src).count() === 3L)

    // MOR source with live deletes refused
    val morSrc = tmp("unir_mor") + "/tbl"
    IcebergWrite.append(spark, Seq((1L, "a"), (2L, "b")).toDF("id", "name"), morSrc)
    IcebergWrite.deleteWhere(spark, morSrc, col("id") === 1L)
    intercept[IllegalArgumentException] {
      DeltaWrite.exportIcebergAsDelta(spark, morSrc, tmp("unir_mor_dst") + "/tbl")
    }
  }

  test("convert to delta in place, then the full zero-copy chain to Iceberg") {
    val dir = tmp("convert_pq") + "/tbl"
    Seq((1L, "a", "g1"), (2L, "b", "g2"), (3L, "c", "g1")).toDF("id", "name", "grp")
      .write.partitionBy("grp").parquet(dir)

    assert(DeltaWrite.convertParquet(spark, dir, partitionBy = Seq("grp")) === 0L)
    val got = DeltaRead.snapshot(spark, dir)
      .select(col("id"), col("name"), col("grp")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
    assert(got === Set((1L, "a", "g1"), (2L, "b", "g2"), (3L, "c", "g1")))
    // per-file record counts landed in stats
    assert(DeltaRead.fileStats(spark, dir).select(col("rows"))
      .collect().map(_.getLong(0)).sum === 3L)
    // the directory IS a Delta table now: DV delete + append work
    DeltaWrite.deleteWhere(spark, dir, col("id") === 2L)
    DeltaWrite.append(spark, Seq((4L, "d", "g2")).toDF("id", "name", "grp"),
      dir, partitionBy = Seq("grp"))
    assert(DeltaRead.snapshot(spark, dir).count() === 3L)

    // converting twice refuses
    intercept[IllegalArgumentException] {
      DeltaWrite.convertParquet(spark, dir, partitionBy = Seq("grp"))
    }

    // FULL CHAIN: plain parquet → Delta (in place) → Iceberg (zero copy).
    // The DV from the delete blocks the export — compact materializes it.
    DeltaWrite.compact(spark, dir, smallFileBytes = Long.MaxValue)
    val ice = tmp("convert_ice") + "/tbl"
    IcebergWrite.exportDeltaAsIceberg(spark, dir, ice)
    assert(IcebergRead.snapshot(spark, ice)
      .select(col("id"), col("name"), col("grp")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet ===
      Set((1L, "a", "g1"), (3L, "c", "g1"), (4L, "d", "g2")))
  }

  test("convert unpartitioned parquet; null partition value handling") {
    val dir = tmp("convert_flat") + "/tbl"
    Seq((1L, "a"), (2L, "b")).toDF("id", "name").write.parquet(dir)
    DeltaWrite.convertParquet(spark, dir)
    assert(rows(DeltaRead.snapshot(spark, dir)) === Set((1L, "a"), (2L, "b")))

    val dirN = tmp("convert_null") + "/tbl"
    Seq((1L, "a", Some("g1")), (2L, "b", Option.empty[String]))
      .toDF("id", "name", "grp").write.partitionBy("grp").parquet(dirN)
    DeltaWrite.convertParquet(spark, dirN, partitionBy = Seq("grp"))
    val got = DeltaRead.snapshot(spark, dirN)
      .select(col("id"), col("grp")).collect()
      .map(r => (r.getLong(0), Option(r.getString(1)))).toSet
    assert(got === Set((1L, Some("g1")), (2L, None)))
  }

  test("clone refuses plain parquet and existing targets") {
    val pq = tmp("clone_pq") + "/tbl"
    Seq((1L, "a")).toDF("id", "name").write.parquet(pq)
    intercept[IllegalArgumentException] {
      Lake.clone(spark, pq, tmp("clone_pq_dst") + "/tbl")
    }
    val src = tmp("clone_ex_src") + "/tbl"
    val dst = tmp("clone_ex_dst") + "/tbl"
    DeltaWrite.append(spark, Seq((1L, "a")).toDF("id", "name"), src)
    DeltaWrite.append(spark, Seq((2L, "b")).toDF("id", "name"), dst)
    intercept[IllegalArgumentException] {
      DeltaWrite.cloneShallow(spark, src, dst)
    }
  }
}
