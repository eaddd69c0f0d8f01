package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Column rename/drop via Delta column mapping (mode = name): metadata-only
  * schema surgery — no data file rewritten — with reads, appends, DVs, and
  * time travel staying correct across the boot into mapped mode. */
class ColumnMappingSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  test("rename: metadata-only, old files re-read under the new name, appends work") {
    val t = tmp("cmap_ren") + "/tbl"
    DeltaWrite.append(spark, Seq((1L, "a"), (2L, "b")).toDF("id", "name"), t)
    val dataFilesBefore = DeltaRead.snapshotInfo(spark, t).files.map(_.path).toSet

    DeltaWrite.renameColumn(spark, t, "name", "title")
    val snap = DeltaRead.snapshotInfo(spark, t)
    assert(snap.columnMappingMode === "name")
    assert(snap.schema.fieldNames.toSeq === Seq("id", "title"))
    assert(snap.physicalName("title") === "name") // physical survives
    // NO data file was rewritten
    assert(snap.files.map(_.path).toSet === dataFilesBefore)
    assert(DeltaRead.snapshot(spark, t).select(col("id"), col("title"))
      .as[(Long, String)].collect().toSet === Set((1L, "a"), (2L, "b")))

    // append AFTER the rename: caller uses logical names, files get physical
    DeltaWrite.append(spark, Seq((3L, "c")).toDF("id", "title"), t)
    assert(DeltaRead.snapshot(spark, t).select(col("id"), col("title"))
      .as[(Long, String)].collect().toSet === Set((1L, "a"), (2L, "b"), (3L, "c")))

    // DV delete still works on the mapped table
    DeltaWrite.deleteWhere(spark, t, col("id") === 2L)
    assert(DeltaRead.snapshot(spark, t).select(col("id"), col("title"))
      .as[(Long, String)].collect().toSet === Set((1L, "a"), (3L, "c")))

    // time travel to the pre-rename version shows the OLD logical name
    assert(DeltaRead.snapshot(spark, t, 0L).schema.fieldNames.toSeq === Seq("id", "name"))

    // second rename on the already-mapped table
    DeltaWrite.renameColumn(spark, t, "title", "label")
    assert(DeltaRead.snapshot(spark, t).select(col("id"), col("label"))
      .as[(Long, String)].collect().toSet === Set((1L, "a"), (3L, "c")))
  }

  test("rename of a PARTITION column keeps layout and pruning working") {
    val t = tmp("cmap_part") + "/tbl"
    DeltaWrite.append(spark, Seq((1L, "x", "g1"), (2L, "y", "g2")).toDF("id", "v", "grp"),
      t, partitionBy = Seq("grp"))
    DeltaWrite.renameColumn(spark, t, "grp", "segment")
    val out = DeltaRead.snapshot(spark, t).where(col("segment") === "g2")
      .select(col("id")).as[Long].collect().toSeq
    assert(out === Seq(2L))
    // append with the new logical partition name lands in the same layout
    DeltaWrite.append(spark, Seq((3L, "z", "g2")).toDF("id", "v", "segment"),
      t, partitionBy = Seq("segment"))
    assert(DeltaRead.snapshot(spark, t).where(col("segment") === "g2")
      .select(col("id")).as[Long].collect().toSet === Set(2L, 3L))
  }

  test("drop: column leaves the schema; files keep the bytes unread; guards hold") {
    val t = tmp("cmap_drop") + "/tbl"
    DeltaWrite.append(spark, Seq((1L, "a", 1.5), (2L, "b", 2.5)).toDF("id", "name", "score"), t)
    DeltaWrite.dropColumn(spark, t, "score")
    val snap = DeltaRead.snapshot(spark, t)
    assert(snap.schema.fieldNames.toSeq === Seq("id", "name"))
    assert(snap.as[(Long, String)].collect().toSet === Set((1L, "a"), (2L, "b")))
    // appends no longer carry the dropped column
    DeltaWrite.append(spark, Seq((3L, "c")).toDF("id", "name"), t)
    assert(DeltaRead.snapshot(spark, t).count() === 3)

    intercept[IllegalArgumentException] {
      DeltaWrite.dropColumn(spark, t, "nope")
    }
    val tp = tmp("cmap_dropp") + "/tbl"
    DeltaWrite.append(spark, Seq((1L, "g")).toDF("id", "grp"), tp, partitionBy = Seq("grp"))
    intercept[IllegalArgumentException] {
      DeltaWrite.dropColumn(spark, tp, "grp")
    }
  }

  test("iceberg rename: field-id evolution, old files resolve by id, history reports rename") {
    val t = tmp("imap_ren") + "/tbl"
    IcebergWrite.append(spark, Seq((1L, "a"), (2L, "b")).toDF("id", "name"), t)
    IcebergWrite.renameColumn(spark, t, "name", "title")
    // the pre-rename data file resolves the renamed column BY FIELD ID
    assert(IcebergRead.snapshot(spark, t).select(col("id"), col("title"))
      .as[(Long, String)].collect().toSet === Set((1L, "a"), (2L, "b")))
    // appends use the new logical name; both file generations read together
    IcebergWrite.append(spark, Seq((3L, "c")).toDF("id", "title"), t)
    assert(IcebergRead.snapshot(spark, t).select(col("id"), col("title"))
      .as[(Long, String)].collect().toSet === Set((1L, "a"), (2L, "b"), (3L, "c")))
    // position delete on the renamed table
    IcebergWrite.deleteWhere(spark, t, col("id") === 2L)
    assert(IcebergRead.snapshot(spark, t).select(col("id"), col("title"))
      .as[(Long, String)].collect().toSet === Set((1L, "a"), (3L, "c")))
    // schema history: field-id keying reports a RENAME, not drop+add
    val h = IcebergRead.schemaHistory(spark, t).collect()
      .map(r => (r.getString(1), r.getString(2)))
    assert(h.contains(("rename_column", "name -> title")))
  }

  test("iceberg drop: guards on partition-spec and equality-delete references") {
    val t = tmp("imap_drop") + "/tbl"
    IcebergWrite.append(spark,
      Seq((1L, "a", "g1"), (2L, "b", "g2")).toDF("id", "name", "grp"),
      t, partitionBy = Seq("grp"))
    intercept[IllegalArgumentException] {
      IcebergWrite.dropColumn(spark, t, "grp") // partition source
    }
    IcebergWrite.deleteWhereEquals(spark, t, Seq(Tuple1("a")).toDF("name"))
    intercept[IllegalArgumentException] {
      IcebergWrite.dropColumn(spark, t, "name") // live equality delete
    }
    IcebergWrite.dropColumn(spark, t, "id") // unreferenced: fine
    val snap = IcebergRead.snapshot(spark, t)
    assert(snap.schema.fieldNames.toSeq === Seq("name", "grp"))
    assert(snap.as[(String, String)].collect().toSet === Set(("b", "g2")))
  }

  test("post-rename DML: upsert/overwrite/updateWhere/compact on a mapped table") {
    val t = tmp("cmap_dml") + "/tbl"
    DeltaWrite.append(spark, Seq((1L, "a"), (2L, "b")).toDF("id", "name"), t)
    DeltaWrite.renameColumn(spark, t, "name", "title")

    // upsert speaks LOGICAL names; staged files carry physical ones
    DeltaWrite.upsert(spark, Seq((2L, "B!"), (3L, "c")).toDF("id", "title"),
      t, Seq("id"))
    assert(DeltaRead.snapshot(spark, t).orderBy("id")
      .as[(Long, String)].collect().toSeq ===
      Seq((1L, "a"), (2L, "B!"), (3L, "c")))

    // positional UPDATE stages updated images physically
    DeltaWrite.updateWhere(spark, t,
      Seq("title" -> upper(col("title"))), col("id") === 1L)
    assert(DeltaRead.snapshot(spark, t).where(col("id") === 1L)
      .select(col("title")).as[String].head() === "A")

    // compaction rewrites mapped files without breaking resolution
    DeltaWrite.compact(spark, t, smallFileBytes = Long.MaxValue)
    assert(DeltaRead.snapshot(spark, t).orderBy("id")
      .as[(Long, String)].collect().toSeq ===
      Seq((1L, "A"), (2L, "B!"), (3L, "c")))
    // second rename AFTER physical-named rewrites still resolves
    DeltaWrite.renameColumn(spark, t, "title", "label")
    assert(DeltaRead.snapshot(spark, t).columns.toSeq === Seq("id", "label"))

    // same-shape overwrite keeps the mapping; schema-changing one refuses
    DeltaWrite.overwrite(spark, Seq((9L, "z")).toDF("id", "label"), t)
    assert(DeltaRead.snapshot(spark, t).as[(Long, String)].collect().toSeq ===
      Seq((9L, "z")))
    assert(DeltaRead.snapshotInfo(spark, t).columnMappingMode === "name")
    intercept[IllegalArgumentException] {
      DeltaWrite.overwrite(spark, Seq((9L, "z", 1.0)).toDF("id", "label", "x"), t)
    }
  }

  test("post-rename replaceWhere on a renamed PARTITION column") {
    val t = tmp("cmap_rw") + "/tbl"
    DeltaWrite.append(spark,
      Seq((1L, 1.0, "g1"), (2L, 2.0, "g2"), (3L, 3.0, "g2")).toDF("id", "v", "grp"),
      t, partitionBy = Seq("grp"))
    DeltaWrite.renameColumn(spark, t, "grp", "segment")
    val before = DeltaRead.snapshotInfo(spark, t).files
      .filterNot(_.partitionValues.values.exists(_ == "g2")).map(_.path).toSet
    DeltaWrite.replaceWhere(spark,
      Seq((20L, 20.0, "g2")).toDF("id", "v", "segment"), t, "segment = 'g2'")
    val snap = DeltaRead.snapshotInfo(spark, t)
    // untouched partition's files survive verbatim; scope swapped whole
    assert(before.subsetOf(snap.files.map(_.path).toSet))
    assert(DeltaRead.snapshot(spark, t).orderBy("id")
      .as[(Long, Double, String)].collect().toSeq ===
      Seq((1L, 1.0, "g1"), (20L, 20.0, "g2")))
  }

  test("shallow clone carries the column mapping whole") {
    val src = tmp("cmap_clone_src") + "/tbl"
    val dst = tmp("cmap_clone_dst") + "/tbl"
    DeltaWrite.append(spark, Seq((1L, "a"), (2L, "b")).toDF("id", "name"), src)
    DeltaWrite.renameColumn(spark, src, "name", "title")
    DeltaWrite.deleteWhere(spark, src, col("id") === 2L) // DV travels too
    DeltaWrite.cloneShallow(spark, src, dst)
    val snap = DeltaRead.snapshotInfo(spark, dst)
    assert(snap.columnMappingMode === "name")
    assert(DeltaRead.snapshot(spark, dst).select(col("id"), col("title"))
      .as[(Long, String)].collect().toSeq === Seq((1L, "a")))
    // clone evolves independently: rename in the clone, source untouched
    DeltaWrite.renameColumn(spark, dst, "title", "label")
    assert(DeltaRead.snapshot(spark, dst).columns.toSeq === Seq("id", "label"))
    assert(DeltaRead.snapshot(spark, src).columns.toSeq === Seq("id", "title"))
  }

  test("post-rename MERGE through statement text") {
    val t = tmp("cmap_merge") + "/tbl"
    DeltaWrite.append(spark, Seq((1L, 10.0), (2L, 20.0)).toDF("id", "v"), t)
    DeltaWrite.renameColumn(spark, t, "v", "amount")
    Seq((2L, 99.0), (3L, 30.0)).toDF("id", "amount")
      .createOrReplaceTempView("cmap_merge_src")
    Lake.sql(spark,
      s"""MERGE INTO '$t' USING (SELECT * FROM cmap_merge_src) ON (id)
          WHEN MATCHED THEN UPDATE SET *
          WHEN NOT MATCHED THEN INSERT *""")
    assert(Lake.read(spark, t).orderBy("id")
      .as[(Long, Double)].collect().toSeq ===
      Seq((1L, 10.0), (2L, 99.0), (3L, 30.0)))
  }
}
