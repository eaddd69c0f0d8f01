package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths}

/** External-Delta interop: log fixtures are hand-authored in the OPEN
  * `_delta_log` JSON/checkpoint format (Delta PROTOCOL.md) — exactly what
  * another engine would have written. */
class DeltaReadSpec extends SparkSpec {
  import spark.implicits._

  private val schemaJson =
    """{"type":"struct","fields":[
      {"name":"id","type":"long","nullable":true,"metadata":{}},
      {"name":"name","type":"string","nullable":true,"metadata":{}},
      {"name":"grp","type":"string","nullable":true,"metadata":{}}]}"""
      .replaceAll("\n\\s*", "")

  private def metaAction(partitionCols: Seq[String]): String = {
    val parts = partitionCols.map(c => s""""$c"""").mkString("[", ",", "]")
    s"""{"metaData":{"id":"fixture","format":{"provider":"parquet","options":{}},""" +
      s""""schemaString":"${schemaJson.replace("\"", "\\\"")}",""" +
      s""""partitionColumns":$parts,"configuration":{},"createdTime":0}}"""
  }
  private val protocolAction = """{"protocol":{"minReaderVersion":1,"minWriterVersion":2}}"""

  /** Write rows as a single parquet part under the table dir; returns the
    * RELATIVE path a Delta writer would record. */
  private def writePart(table: String, name: String, rows: Seq[(Long, String)]): String = {
    val tmp = Files.createTempDirectory("graft_delta_part")
    rows.toDF("id", "name").coalesce(1).write.mode("overwrite").parquet(tmp.toString)
    val part = new java.io.File(tmp.toString).listFiles()
      .find(f => f.getName.endsWith(".parquet")).get
    val dest = Paths.get(table, name)
    Files.createDirectories(dest.getParent)
    Files.move(part.toPath, dest)
    name
  }

  private def commit(table: String, v: Long, lines: Seq[String]): Unit = {
    val dir = Paths.get(table, "_delta_log")
    Files.createDirectories(dir)
    Files.writeString(dir.resolve(f"$v%020d.json"), lines.mkString("", "\n", "\n"))
  }

  private def addAction(path: String, pv: Map[String, String]): String = {
    val pvJson = pv.map { case (k, v) => s""""$k":"$v"""" }.mkString("{", ",", "}")
    s"""{"add":{"path":"$path","partitionValues":$pvJson,"size":1,""" +
      s""""modificationTime":0,"dataChange":true}}"""
  }

  test("a lying recorded size on a NON-head file self-heals at task time") {
    // round-20 hardening: the manifest-backed scan's plan-time probe stats
    // only the FIRST file. A wrong-but-positive size on a LATER file used
    // to silently change split coverage ([0, recordedLen)) and drop that
    // file's tail row groups; VerifiedParquetFileFormat stats each file in
    // its own task and self-heals the split instead.
    val table = Files.createTempDirectory("graft_delta_lie").toString
    val p1 = writePart(table, "part-1.parquet", Seq((1L, "a"), (2L, "b")))
    val p2 = writePart(table, "part-2.parquet",
      (3L to 40L).map(i => (i, s"row$i")))
    val len1 = Files.size(Paths.get(table, p1))
    val len2 = Files.size(Paths.get(table, p2))
    def add(path: String, size: Long) =
      s"""{"add":{"path":"$path","partitionValues":{},"size":$size,""" +
        s""""modificationTime":0,"dataChange":true}}"""
    // head file EXACT (the plan-time probe passes → recorded sizes are
    // trusted); file 2 records a quarter of its real length — its single
    // row group's midpoint falls OUTSIDE [0, len2/4)
    commit(table, 0L, Seq(protocolAction, metaAction(Nil),
      add(p1, len1), add(p2, math.max(1L, len2 / 4))))
    val ids = DeltaRead.snapshot(spark, table)
      .select("id").as[Long].collect().sorted.toSeq
    assert(ids === (1L to 40L), s"got ${ids.length} rows")
    // and the OVER-recorded direction: file 2 claims twice its length;
    // splits past the real end return empty, coverage unchanged
    val table2 = Files.createTempDirectory("graft_delta_lie2").toString
    val q1 = writePart(table2, "part-1.parquet", Seq((1L, "a")))
    val q2 = writePart(table2, "part-2.parquet", Seq((2L, "b"), (3L, "c")))
    commit(table2, 0L, Seq(protocolAction, metaAction(Nil),
      add(q1, Files.size(Paths.get(table2, q1))),
      add(q2, 2L * Files.size(Paths.get(table2, q2)))))
    assert(DeltaRead.snapshot(spark, table2)
      .select("id").as[Long].collect().sorted.toSeq === Seq(1L, 2L, 3L))
  }
  private def removeAction(path: String): String =
    s"""{"remove":{"path":"$path","deletionTimestamp":0,"dataChange":true}}"""

  test("snapshot replays adds/removes with partition injection and time travel") {
    val table = Files.createTempDirectory("graft_delta_tbl").toString
    val p1 = writePart(table, "grp=x/part-1.parquet", Seq((1L, "alpha"), (2L, "beta")))
    val p2 = writePart(table, "grp=y/part-2.parquet", Seq((3L, "gamma")))
    val p3 = writePart(table, "grp=x/part-3.parquet", Seq((4L, "delta")))
    commit(table, 0L, Seq(protocolAction, metaAction(Seq("grp")),
      addAction("grp%3Dx/part-1.parquet", Map("grp" -> "x")), // percent-encoded path
      addAction(p2, Map("grp" -> "y"))))
    // v1 rewrites part-2's partition: remove + add in one commit
    commit(table, 1L, Seq(removeAction(p2), addAction(p3, Map("grp" -> "x"))))

    val v0 = DeltaRead.snapshot(spark, table, 0L)
    assert(v0.columns.toSeq === Seq("id", "name", "grp"))
    assert(v0.orderBy("id").as[(Long, String, String)].collect().toSeq ===
      Seq((1L, "alpha", "x"), (2L, "beta", "x"), (3L, "gamma", "y")))

    val latest = DeltaRead.snapshot(spark, table)
    assert(latest.orderBy("id").as[(Long, String, String)].collect().toSeq ===
      Seq((1L, "alpha", "x"), (2L, "beta", "x"), (4L, "delta", "x")))
    // partition predicate never touches removed files' rows
    assert(latest.where($"grp" === "y").count() === 0L)

    // Lake façade: detection + versioned dispatch
    assert(Lake.detect(spark, table) === Lake.Delta)
    assert(Lake.read(spark, table, 0L).count() === 3L)
    val plain = Files.createTempDirectory("graft_lake_plain").toString
    Seq((1L, "a")).toDF("id", "name").write.mode("overwrite").parquet(plain)
    assert(Lake.detect(spark, plain) === Lake.Parquet)
    assert(Lake.read(spark, plain).count() === 1L)
    intercept[IllegalArgumentException](Lake.read(spark, plain, 3L))
  }

  test("remove+add of the SAME path in one commit leaves the file live") {
    val table = Files.createTempDirectory("graft_delta_rw").toString
    val p = writePart(table, "part-a.parquet", Seq((1L, "x")))
    commit(table, 0L, Seq(protocolAction, metaAction(Seq.empty), addAction(p, Map.empty)))
    commit(table, 1L, Seq(removeAction(p), addAction(p, Map.empty)))
    assert(DeltaRead.snapshot(spark, table).count() === 1L)
  }

  test("checkpoint parquet + later commits replay together") {
    val table = Files.createTempDirectory("graft_delta_cp").toString
    val p1 = writePart(table, "part-1.parquet", Seq((1L, "a"), (2L, "b")))
    val p2 = writePart(table, "part-2.parquet", Seq((3L, "c")))
    commit(table, 0L, Seq(protocolAction, metaAction(Seq.empty), addAction(p1, Map.empty)))
    commit(table, 1L, Seq(addAction(p2, Map.empty)))
    // checkpoint at v1 consolidating the state; then delete the JSON
    // commits at/below it to prove the reader starts from the checkpoint
    val cpRows = Seq(
      (Some(("fixture", schemaJson, Seq.empty[String], "parquet")), None: Option[(String, Map[String, String])], Some(1)),
      (None, Some((p1, Map.empty[String, String])), None),
      (None, Some((p2, Map.empty[String, String])), None))
      .toDF("m", "a", "mrv")
      .select(
        struct($"m._1".as("id"), $"m._2".as("schemaString"),
          $"m._3".as("partitionColumns"),
          struct(lit("parquet").as("provider")).as("format")).as("metaData"),
        struct($"a._1".as("path"), $"a._2".as("partitionValues")).as("add"),
        when($"mrv".isNotNull, struct($"mrv".as("minReaderVersion"))).as("protocol"))
      .withColumn("metaData", when(col("metaData.id").isNotNull, col("metaData")))
      .withColumn("add", when(col("add.path").isNotNull, col("add")))
    cpRows.coalesce(1).write.mode("overwrite")
      .parquet(s"$table/_delta_log_cp_tmp")
    val cpPart = new java.io.File(s"$table/_delta_log_cp_tmp").listFiles()
      .find(_.getName.endsWith(".parquet")).get
    Files.move(cpPart.toPath,
      Paths.get(table, "_delta_log", f"${1L}%020d.checkpoint.parquet"))
    Files.delete(Paths.get(table, "_delta_log", f"${0L}%020d.json"))
    Files.writeString(Paths.get(table, "_delta_log", "_last_checkpoint"),
      """{"version":1,"size":3}""")
    // v2 removes p1 after the checkpoint
    val p3 = writePart(table, "part-3.parquet", Seq((4L, "d")))
    commit(table, 2L, Seq(removeAction(p1), addAction(p3, Map.empty)))

    assert(DeltaRead.snapshot(spark, table, 1L).orderBy("id")
      .as[(Long, String, String)].collect().map(_._1).toSeq === Seq(1L, 2L, 3L))
    assert(DeltaRead.snapshot(spark, table).orderBy("id")
      .as[(Long, String, String)].collect().map(_._1).toSeq === Seq(3L, 4L))
  }

  test("retention-cleaned log without a covering checkpoint is refused") {
    val table = Files.createTempDirectory("graft_delta_gap").toString
    val p1 = writePart(table, "part-1.parquet", Seq((1L, "a")))
    val p2 = writePart(table, "part-2.parquet", Seq((2L, "b")))
    commit(table, 0L, Seq(protocolAction, metaAction(Seq.empty), addAction(p1, Map.empty)))
    commit(table, 1L, Seq(addAction(p2, Map.empty)))
    Files.delete(Paths.get(table, "_delta_log", f"${0L}%020d.json"))
    val e = intercept[IllegalArgumentException](DeltaRead.snapshot(spark, table))
    assert(e.getMessage.contains("missing"))
  }

  private val mappedSchemaJson =
    """{"type":"struct","fields":[
      {"name":"id","type":"long","nullable":true,
       "metadata":{"delta.columnMapping.id":1,"delta.columnMapping.physicalName":"col-aaa111"}},
      {"name":"name","type":"string","nullable":true,
       "metadata":{"delta.columnMapping.id":2,"delta.columnMapping.physicalName":"col-bbb222"}},
      {"name":"grp","type":"string","nullable":true,
       "metadata":{"delta.columnMapping.id":3,"delta.columnMapping.physicalName":"col-ccc333"}}]}"""
      .replaceAll("\n\\s*", "")

  private def mappedMetaAction(partitionCols: Seq[String], mode: String): String = {
    val parts = partitionCols.map(c => s""""$c"""").mkString("[", ",", "]")
    s"""{"metaData":{"id":"fixture-cm","format":{"provider":"parquet","options":{}},""" +
      s""""schemaString":"${mappedSchemaJson.replace("\"", "\\\"")}",""" +
      s""""partitionColumns":$parts,""" +
      s""""configuration":{"delta.columnMapping.mode":"$mode","delta.columnMapping.maxColumnId":"3"},""" +
      s""""createdTime":0}}"""
  }

  test("column mapping (name mode): physical file/partition names map to logical schema") {
    val table = Files.createTempDirectory("graft_delta_cm").toString
    // data files carry PHYSICAL names; partition column grp is physical-keyed
    val tmp = Files.createTempDirectory("graft_delta_cm_part")
    Seq((1L, "a"), (2L, "b")).toDF("col-aaa111", "col-bbb222")
      .coalesce(1).write.mode("overwrite").parquet(tmp.toString)
    val part = new java.io.File(tmp.toString).listFiles()
      .find(_.getName.endsWith(".parquet")).get
    Files.move(part.toPath, Paths.get(table, "part-cm.parquet"))
    commit(table, 0L, Seq(
      """{"protocol":{"minReaderVersion":2,"minWriterVersion":5}}""",
      mappedMetaAction(Seq("grp"), "name"),
      addAction("part-cm.parquet", Map("col-ccc333" -> "g1"))))

    val out = DeltaRead.snapshot(spark, table)
    assert(out.columns.toSeq === Seq("id", "name", "grp"))
    assert(out.orderBy("id").as[(Long, String, String)].collect().toSeq ===
      Seq((1L, "a", "g1"), (2L, "b", "g1")))

    // protocol v3 declaring the columnMapping feature reads the same table
    commit(table, 1L, Seq(
      """{"protocol":{"minReaderVersion":3,"minWriterVersion":7,"readerFeatures":["columnMapping"],"writerFeatures":["columnMapping"]}}"""))
    assert(DeltaRead.snapshot(spark, table).count() === 2L)
  }

  test("column mapping id mode and unknown v3 reader features are refused") {
    val table = Files.createTempDirectory("graft_delta_cmid").toString
    writePart(table, "part-1.parquet", Seq((1L, "a")))
    commit(table, 0L, Seq(
      """{"protocol":{"minReaderVersion":2,"minWriterVersion":5}}""",
      mappedMetaAction(Seq.empty, "id"), addAction("part-1.parquet", Map.empty)))
    val e = intercept[IllegalArgumentException](DeltaRead.snapshot(spark, table))
    assert(e.getMessage.contains("columnMapping.mode"))

    val table2 = Files.createTempDirectory("graft_delta_v2cp").toString
    writePart(table2, "part-1.parquet", Seq((1L, "a")))
    commit(table2, 0L, Seq(
      """{"protocol":{"minReaderVersion":3,"minWriterVersion":7,"readerFeatures":["v2Checkpoint"]}}""",
      metaAction(Seq.empty), addAction("part-1.parquet", Map.empty)))
    val e2 = intercept[IllegalArgumentException](DeltaRead.snapshot(spark, table2))
    assert(e2.getMessage.contains("v2Checkpoint"))
  }

  test("deletion vectors from a hand-authored log are applied; time travel ignores them") {
    val table = Files.createTempDirectory("graft_delta_dvr").toString
    val rel = writePart(table, "part-1.parquet", Seq((1L, "a"), (2L, "b"), (3L, "c"), (4L, "d")))
    commit(table, 0L, Seq(protocolAction, metaAction(Seq.empty), addAction(rel, Map.empty)))
    // another engine deletes positions 1 and 3 via an INLINE DV
    val blob = DeletionVectors.toBlob(Array(1L, 3L))
    val inline = Z85.encode(blob)
    commit(table, 1L, Seq(
      """{"protocol":{"minReaderVersion":3,"minWriterVersion":7,"readerFeatures":["deletionVectors"],"writerFeatures":["deletionVectors"]}}""",
      removeAction(rel),
      s"""{"add":{"path":"$rel","partitionValues":{},"size":1,"modificationTime":0,""" +
        s""""dataChange":true,"deletionVector":{"storageType":"i","pathOrInlineDv":"$inline",""" +
        s""""sizeInBytes":${blob.length},"cardinality":2}}}"""))
    assert(DeltaRead.snapshot(spark, table).orderBy("id")
      .select("id").as[Long].collect().toSeq === Seq(1L, 3L))
    assert(DeltaRead.snapshot(spark, table, 0L).count() === 4L)
  }

  test("newer reader protocol and non-parquet formats are refused loudly") {
    val table = Files.createTempDirectory("graft_delta_proto").toString
    val p = writePart(table, "part-1.parquet", Seq((1L, "a")))
    commit(table, 0L, Seq(
      """{"protocol":{"minReaderVersion":3,"minWriterVersion":7}}""",
      metaAction(Seq.empty), addAction(p, Map.empty)))
    val e = intercept[IllegalArgumentException](DeltaRead.snapshot(spark, table))
    assert(e.getMessage.contains("reader protocol"))
    val table2 = Files.createTempDirectory("graft_delta_fmt").toString
    writePart(table2, "part-1.parquet", Seq((1L, "a")))
    commit(table2, 0L, Seq(protocolAction,
      metaAction(Seq.empty).replace("\"provider\":\"parquet\"", "\"provider\":\"orc\""),
      addAction("part-1.parquet", Map.empty)))
    val e2 = intercept[IllegalArgumentException](DeltaRead.snapshot(spark, table2))
    assert(e2.getMessage.contains("format"))
  }

  test("external layout with literal '+' in a partition dir keeps its values") {
    // Hive-style external writers leave '+' unescaped in dir names; the
    // input_file_name normalization must not decode it to a space
    val table = Files.createTempDirectory("graft_delta_plus").toString
    val p = writePart(table, "grp=a+b/part-1.parquet", Seq((1L, "alpha")))
    commit(table, 0L, Seq(protocolAction, metaAction(Seq("grp")),
      addAction("grp=a%2Bb/part-1.parquet", Map("grp" -> "a+b"))))
    val got = DeltaRead.snapshot(spark, table)
      .select("id", "grp").as[(Long, String)].collect().toSet
    assert(got === Set((1L, "a+b")))
  }
}
