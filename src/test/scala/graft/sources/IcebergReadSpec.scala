package graft.sources

import graft.SparkSpec
import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

/** External-Iceberg interop: fixtures are authored in the OPEN spec's own
  * formats — metadata JSON + Avro manifest-list/manifest files written with
  * the Avro core API (what another engine's Iceberg writer produces). */
class IcebergReadSpec extends SparkSpec {
  import spark.implicits._

  private val manifestEntrySchema = new org.apache.avro.Schema.Parser().parse(
    """{"type":"record","name":"manifest_entry","fields":[
      {"name":"status","type":"int"},
      {"name":"data_file","type":{"type":"record","name":"data_file","fields":[
        {"name":"content","type":"int","default":0},
        {"name":"file_path","type":"string"},
        {"name":"file_format","type":"string"},
        {"name":"record_count","type":"long"}]}}]}""")

  private val manifestListSchema = new org.apache.avro.Schema.Parser().parse(
    """{"type":"record","name":"manifest_file","fields":[
      {"name":"manifest_path","type":"string"},
      {"name":"content","type":"int","default":0}]}""")

  private def writeAvro(path: String, schema: org.apache.avro.Schema,
      rows: Seq[org.apache.avro.generic.GenericRecord]): Unit = {
    val w = new org.apache.avro.file.DataFileWriter(
      new org.apache.avro.generic.GenericDatumWriter[org.apache.avro.generic.GenericRecord](schema))
    Files.createDirectories(Paths.get(path).getParent)
    w.create(schema, new java.io.File(path))
    try rows.foreach(w.append) finally w.close()
  }

  private def manifestEntry(status: Int, filePath: String,
      format: String = "PARQUET", content: Int = 0): org.apache.avro.generic.GenericRecord = {
    val df = new org.apache.avro.generic.GenericData.Record(
      manifestEntrySchema.getField("data_file").schema())
    df.put("content", content); df.put("file_path", filePath)
    df.put("file_format", format); df.put("record_count", 1L)
    val e = new org.apache.avro.generic.GenericData.Record(manifestEntrySchema)
    e.put("status", status); e.put("data_file", df)
    e
  }

  /** A position delete file: the v2 spec's (file_path, pos) parquet. */
  private def writeDeleteFile(table: String, name: String,
      tuples: Seq[(String, Long)]): String = {
    val tmp = Files.createTempDirectory("graft_ice_del")
    tuples.toDF("file_path", "pos").coalesce(1).write.mode("overwrite").parquet(tmp.toString)
    val part = new java.io.File(tmp.toString).listFiles().find(_.getName.endsWith(".parquet")).get
    val dest = Paths.get(table, "data", name)
    Files.createDirectories(dest.getParent)
    Files.move(part.toPath, dest)
    dest.toString
  }

  private def manifestRef(path: String, content: Int = 0): org.apache.avro.generic.GenericRecord = {
    val r = new org.apache.avro.generic.GenericData.Record(manifestListSchema)
    r.put("manifest_path", path); r.put("content", content)
    r
  }

  private def writePart(table: String, name: String, rows: Seq[(Long, String)]): String = {
    val tmp = Files.createTempDirectory("graft_ice_part")
    rows.toDF("id", "name").coalesce(1).write.mode("overwrite").parquet(tmp.toString)
    val part = new java.io.File(tmp.toString).listFiles().find(_.getName.endsWith(".parquet")).get
    val dest = Paths.get(table, "data", name)
    Files.createDirectories(dest.getParent)
    Files.move(part.toPath, dest)
    dest.toString
  }

  private val schemaFieldsJson =
    """[{"id":1,"name":"id","required":false,"type":"long"},
       {"id":2,"name":"name","required":false,"type":"string"}]""".replaceAll("\n\\s*", "")

  private def metadataJson(current: Long, snaps: Seq[(Long, String)]): String = {
    val snapJson = snaps.map { case (id, ml) =>
      s"""{"snapshot-id":$id,"manifest-list":"$ml"}"""
    }.mkString("[", ",", "]")
    s"""{"format-version":2,"table-uuid":"fixture","location":"unused",
      "current-snapshot-id":$current,
      "schemas":[{"schema-id":0,"type":"struct","fields":$schemaFieldsJson}],
      "current-schema-id":0,"snapshots":$snapJson}""".replaceAll("\n\\s*", "")
  }

  test("snapshot resolves manifests to live parquet files; time travel works") {
    val table = Files.createTempDirectory("graft_ice_tbl").toString
    val p1 = writePart(table, "p1.parquet", Seq((1L, "a"), (2L, "b")))
    val p2 = writePart(table, "p2.parquet", Seq((3L, "c")))
    // snapshot 10: p1 + p2 · snapshot 11: p2 deleted, p1 carried as EXISTING
    writeAvro(s"$table/metadata/m0.avro", manifestEntrySchema,
      Seq(manifestEntry(1, s"file://$p1"), manifestEntry(1, s"file://$p2")))
    writeAvro(s"$table/metadata/ml10.avro", manifestListSchema,
      Seq(manifestRef(s"$table/metadata/m0.avro")))
    writeAvro(s"$table/metadata/m1.avro", manifestEntrySchema,
      Seq(manifestEntry(0, s"file://$p1"), manifestEntry(2, s"file://$p2")))
    writeAvro(s"$table/metadata/ml11.avro", manifestListSchema,
      Seq(manifestRef(s"$table/metadata/m1.avro")))
    Files.createDirectories(Paths.get(table, "metadata"))
    Files.writeString(Paths.get(table, "metadata", "v2.metadata.json"),
      metadataJson(11L, Seq(10L -> s"$table/metadata/ml10.avro", 11L -> s"$table/metadata/ml11.avro")))
    Files.writeString(Paths.get(table, "metadata", "version-hint.text"), "2")

    assert(IcebergRead.snapshot(spark, table).orderBy("id")
      .as[(Long, String)].collect().toSeq === Seq((1L, "a"), (2L, "b")))
    assert(IcebergRead.snapshot(spark, table, snapshotId = 10L).orderBy("id")
      .as[(Long, String)].collect().toSeq === Seq((1L, "a"), (2L, "b"), (3L, "c")))
  }

  test("position deletes from another engine's delete manifest are applied") {
    val table = Files.createTempDirectory("graft_ice_mor").toString
    val p1 = writePart(table, "p1.parquet", Seq((1L, "a"), (2L, "b"), (3L, "c")))
    val p2 = writePart(table, "p2.parquet", Seq((4L, "d")))
    // delete rows 0 and 2 of p1 — note the delete file spells the path as a
    // file:// URI while the data manifest uses file:// too, but the pos
    // tuples reference the URI form a real engine writes
    val d1 = writeDeleteFile(table, "d1.parquet", Seq((s"file://$p1", 0L), (s"file://$p1", 2L)))
    writeAvro(s"$table/metadata/m0.avro", manifestEntrySchema,
      Seq(manifestEntry(1, s"file://$p1"), manifestEntry(1, s"file://$p2")))
    writeAvro(s"$table/metadata/md.avro", manifestEntrySchema,
      Seq(manifestEntry(1, s"file://$d1", content = 1)))
    writeAvro(s"$table/metadata/ml20.avro", manifestListSchema,
      Seq(manifestRef(s"$table/metadata/m0.avro")))
    writeAvro(s"$table/metadata/ml21.avro", manifestListSchema,
      Seq(manifestRef(s"$table/metadata/m0.avro"),
        manifestRef(s"$table/metadata/md.avro", content = 1)))
    Files.writeString(Paths.get(table, "metadata", "v2.metadata.json"),
      metadataJson(21L, Seq(20L -> s"$table/metadata/ml20.avro", 21L -> s"$table/metadata/ml21.avro")))
    Files.writeString(Paths.get(table, "metadata", "version-hint.text"), "2")

    assert(IcebergRead.snapshot(spark, table).orderBy("id")
      .as[(Long, String)].collect().toSeq === Seq((2L, "b"), (4L, "d")))
    // pre-delete snapshot still sees all rows
    assert(IcebergRead.snapshot(spark, table, snapshotId = 20L).count() === 4L)
  }

  test("malformed equality deletes and non-parquet formats are refused loudly") {
    val table = Files.createTempDirectory("graft_ice_ref").toString
    val p1 = writePart(table, "p1.parquet", Seq((1L, "a")))
    writeAvro(s"$table/metadata/m0.avro", manifestEntrySchema,
      Seq(manifestEntry(1, s"file://$p1")))
    writeAvro(s"$table/metadata/meq.avro", manifestEntrySchema,
      Seq(manifestEntry(1, s"file://$p1", content = 2)))
    writeAvro(s"$table/metadata/ml.avro", manifestListSchema,
      Seq(manifestRef(s"$table/metadata/m0.avro"), manifestRef(s"$table/metadata/meq.avro", content = 1)))
    Files.writeString(Paths.get(table, "metadata", "v1.metadata.json"),
      metadataJson(5L, Seq(5L -> s"$table/metadata/ml.avro")))
    Files.writeString(Paths.get(table, "metadata", "version-hint.text"), "1")
    val e = intercept[IllegalArgumentException](IcebergRead.snapshot(spark, table))
    // an equality delete whose manifest lacks equality_ids cannot be
    // applied soundly — refused rather than guessed
    assert(e.getMessage.contains("equality_ids"))

    val table2 = Files.createTempDirectory("graft_ice_orc").toString
    val p = writePart(table2, "p1.parquet", Seq((1L, "a")))
    writeAvro(s"$table2/metadata/m0.avro", manifestEntrySchema,
      Seq(manifestEntry(1, s"file://$p", format = "ORC")))
    writeAvro(s"$table2/metadata/ml.avro", manifestListSchema,
      Seq(manifestRef(s"$table2/metadata/m0.avro")))
    Files.writeString(Paths.get(table2, "metadata", "v1.metadata.json"),
      metadataJson(5L, Seq(5L -> s"$table2/metadata/ml.avro")))
    Files.writeString(Paths.get(table2, "metadata", "version-hint.text"), "1")
    val e2 = intercept[IllegalArgumentException](IcebergRead.snapshot(spark, table2))
    assert(e2.getMessage.contains("file format"))
  }

  test("field-id resolution: renamed columns read correctly from id-carrying files") {
    import org.apache.spark.sql.functions.col
    import org.apache.spark.sql.types.MetadataBuilder
    val table = Files.createTempDirectory("graft_ice_fid").toString
    // a real engine's data file: parquet columns carry field ids, and the
    // physical names are the PRE-rename ones
    spark.conf.set("spark.sql.parquet.fieldId.write.enabled", "true")
    val mdId = new MetadataBuilder().putLong("parquet.field.id", 1L).build()
    val mdNm = new MetadataBuilder().putLong("parquet.field.id", 2L).build()
    val tmp = Files.createTempDirectory("graft_ice_fid_part")
    Seq((7L, "z")).toDF("id", "name")
      .select(col("id").as("old_id", mdId), col("name").as("old_name", mdNm))
      .coalesce(1).write.mode("overwrite").parquet(tmp.toString)
    val part = new java.io.File(tmp.toString).listFiles().find(_.getName.endsWith(".parquet")).get
    val dest = Paths.get(table, "data", "p1.parquet")
    Files.createDirectories(dest.getParent)
    Files.move(part.toPath, dest)
    // table metadata declares the POST-rename names under the same ids
    writeAvro(s"$table/metadata/m0.avro", manifestEntrySchema,
      Seq(manifestEntry(1, s"file://$dest")))
    writeAvro(s"$table/metadata/ml.avro", manifestListSchema,
      Seq(manifestRef(s"$table/metadata/ml0.avro".replace("ml0", "m0"))))
    Files.writeString(Paths.get(table, "metadata", "v1.metadata.json"),
      metadataJson(5L, Seq(5L -> s"$table/metadata/ml.avro")))
    Files.writeString(Paths.get(table, "metadata", "version-hint.text"), "1")
    val out = IcebergRead.snapshot(spark, table)
    assert(out.columns.toSeq === Seq("id", "name"))
    assert(out.as[(Long, String)].collect().toSeq === Seq((7L, "z")))
  }

  test("metadata-only rename: pruned and plain current reads resolve the SAME (current) schema") {
    // round-20 consistency fix: a rename is a metadata-only commit — no new
    // snapshot — so the head snapshot still cites the pre-rename schema-id.
    // scanPruned/fileStats used to resolve THAT schema for current reads
    // while snapshot()/snapshotSchema resolved current-schema-id, so the
    // two disagreed on the column set of the same table.
    import org.apache.spark.sql.functions.col
    import org.apache.spark.sql.types.MetadataBuilder
    val table = Files.createTempDirectory("graft_ice_renmeta").toString
    // id-carrying data file under the PRE-rename physical names
    spark.conf.set("spark.sql.parquet.fieldId.write.enabled", "true")
    val md1 = new MetadataBuilder().putLong("parquet.field.id", 1L).build()
    val md2 = new MetadataBuilder().putLong("parquet.field.id", 2L).build()
    val tmp = Files.createTempDirectory("graft_ice_renmeta_part")
    Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "name")
      .select(col("id").as("id", md1), col("name").as("old_label", md2))
      .coalesce(1).write.mode("overwrite").parquet(tmp.toString)
    val part = new java.io.File(tmp.toString).listFiles().find(_.getName.endsWith(".parquet")).get
    val dest = Paths.get(table, "data", "p1.parquet")
    Files.createDirectories(dest.getParent)
    Files.move(part.toPath, dest)
    writeAvro(s"$table/metadata/m0.avro", manifestEntrySchema,
      Seq(manifestEntry(1, s"file://$dest")))
    writeAvro(s"$table/metadata/ml.avro", manifestListSchema,
      Seq(manifestRef(s"$table/metadata/m0.avro")))
    // snapshot 7 records schema-id 0 (pre-rename); the rename made
    // schema-id 1 current WITHOUT a new snapshot
    Files.writeString(Paths.get(table, "metadata", "v2.metadata.json"),
      s"""{"format-version":2,"table-uuid":"fixture","location":"unused",
        "current-snapshot-id":7,
        "schemas":[
          {"schema-id":0,"type":"struct","fields":[
            {"id":1,"name":"id","required":false,"type":"long"},
            {"id":2,"name":"old_label","required":false,"type":"string"}]},
          {"schema-id":1,"type":"struct","fields":[
            {"id":1,"name":"id","required":false,"type":"long"},
            {"id":2,"name":"label","required":false,"type":"string"}]}],
        "current-schema-id":1,
        "snapshots":[{"snapshot-id":7,"schema-id":0,"manifest-list":"$table/metadata/ml.avro"}]}"""
        .replaceAll("\n\\s*", ""))
    Files.writeString(Paths.get(table, "metadata", "version-hint.text"), "2")

    val plain = IcebergRead.snapshot(spark, table)
    assert(plain.columns.toSeq === Seq("id", "label"))
    assert(IcebergRead.snapshotSchema(table).fieldNames.toSeq === Seq("id", "label"))
    // pruned current read: SAME columns, SAME rows as the plain read
    val (pruned, kept, total) = IcebergRead.scanPruned(spark, table, col("id") >= 2L)
    assert(pruned.columns.toSeq === Seq("id", "label"),
      s"pruned read resolved ${pruned.columns.mkString(",")}")
    assert(pruned.orderBy("id").as[(Long, String)].collect().toSeq ===
      Seq((2L, "b"), (3L, "c")))
    assert(total === 1L && kept <= total)
    // the stats frame names its columns under the CURRENT schema too
    val statCols = IcebergRead.fileStats(spark, table).columns.toSeq
    assert(statCols.exists(_.endsWith("_label")) || !statCols.exists(_.endsWith("_old_label")),
      s"stats columns: ${statCols.mkString(",")}")
    // an explicit TIME TRAVEL to snapshot 7 keeps ITS recorded schema
    assert(IcebergRead.snapshot(spark, table, 7L).columns.toSeq === Seq("id", "old_label"))
  }

  test("v1 metadata with inline schema parses; unknown column types refused") {
    val table = Files.createTempDirectory("graft_ice_v1").toString
    val p1 = writePart(table, "p1.parquet", Seq((7L, "z")))
    writeAvro(s"$table/metadata/m0.avro", manifestEntrySchema,
      Seq(manifestEntry(1, s"file://$p1")))
    writeAvro(s"$table/metadata/ml.avro", manifestListSchema,
      Seq(manifestRef(s"$table/metadata/m0.avro")))
    Files.createDirectories(Paths.get(table, "metadata"))
    Files.writeString(Paths.get(table, "metadata", "v1.metadata.json"),
      s"""{"format-version":1,"current-snapshot-id":3,
        "schema":{"type":"struct","fields":$schemaFieldsJson},
        "snapshots":[{"snapshot-id":3,"manifest-list":"$table/metadata/ml.avro"}]}"""
        .replaceAll("\n\\s*", ""))
    Files.writeString(Paths.get(table, "metadata", "version-hint.text"), "1")
    assert(IcebergRead.snapshot(spark, table).as[(Long, String)].collect().toSeq ===
      Seq((7L, "z")))
    assert(Lake.detect(spark, table) === Lake.Iceberg)
    assert(Lake.read(spark, table).count() === 1L)

    // nested type → loud refusal
    Files.writeString(Paths.get(table, "metadata", "v1.metadata.json"),
      s"""{"format-version":1,"current-snapshot-id":3,
        "schema":{"type":"struct","fields":[{"id":1,"name":"m","required":false,
          "type":"map<string,string>"}]},
        "snapshots":[{"snapshot-id":3,"manifest-list":"$table/metadata/ml.avro"}]}"""
        .replaceAll("\n\\s*", ""))
    val e = intercept[IllegalArgumentException](IcebergRead.snapshot(spark, table))
    assert(e.getMessage.contains("unsupported Iceberg column type"))
  }
}
