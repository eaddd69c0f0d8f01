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

  test("mapped tables refuse the unwired writers loudly") {
    val t = tmp("cmap_guard") + "/tbl"
    DeltaWrite.append(spark, Seq((1L, "a")).toDF("id", "name"), t)
    DeltaWrite.renameColumn(spark, t, "name", "title")
    intercept[IllegalArgumentException] {
      DeltaWrite.overwrite(spark, Seq((9L, "z")).toDF("id", "title"), t)
    }
    intercept[IllegalArgumentException] {
      DeltaWrite.upsert(spark, Seq((9L, "z")).toDF("id", "title"), t, Seq("id"))
    }
    intercept[IllegalArgumentException] {
      DeltaWrite.cloneShallow(spark, t, tmp("cmap_guard_dst") + "/tbl")
    }
  }
}
