package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types._
import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

/** Writer for EXTERNAL Apache Iceberg tables — the outbound half of the S9
  * interop story ([[IcebergRead]] is inbound), mirroring what
  * [[DeltaWrite]] is to [[DeltaRead]]. Emits the open spec's full chain:
  * `vN.metadata.json` (+ `version-hint.text`) → snapshot → Avro
  * manifest-list → Avro manifest → parquet data files, with Iceberg
  * field-ids carried in the Avro schemas.
  *
  * Declared subset: format-version 2, UNPARTITIONED tables, parquet data,
  * primitive column types (the same subset [[IcebergRead]] reads; a
  * partitioned writer needs typed partition structs in every manifest —
  * out of scope). Appends only create new snapshots; previous snapshots
  * stay readable (time travel by snapshot id).
  *
  * Commit protocol: the same put-if-absent hard-link claim as the Delta
  * writer and the engine catalog — exactly one concurrent committer wins
  * `vN.metadata.json`; the loser re-reads and re-claims N+1 (appends
  * commute). `version-hint.text` is advisory (last writer wins) — readers
  * fall back to the highest-numbered metadata file, per the spec's
  * filesystem-table convention. */
object IcebergWrite {

  private def mapper = new com.fasterxml.jackson.databind.ObjectMapper()

  private def icebergType(dt: DataType): String = dt match {
    case BooleanType => "boolean"
    case IntegerType => "int"
    case LongType => "long"
    case FloatType => "float"
    case DoubleType => "double"
    case StringType => "string"
    case DateType => "date"
    case TimestampType => "timestamp"
    case BinaryType => "binary"
    case d: DecimalType => s"decimal(${d.precision}, ${d.scale})"
    case other => throw new IllegalArgumentException(
      s"unsupported column type for Iceberg write: $other (primitive-type subset)")
  }

  private def metaDir(table: String) = Paths.get(table.stripSuffix("/"), "metadata")
  private def dataDir(table: String) = Paths.get(table.stripSuffix("/"), "data")

  /** Highest committed metadata version, 0 if none. */
  private def currentVersion(table: String): Int = {
    val dir = metaDir(table)
    if (!Files.isDirectory(dir)) return 0
    val s = Files.list(dir)
    try s.iterator().asScala.map(_.getFileName.toString)
      .collect { case n if n.matches("v\\d+\\.metadata\\.json") =>
        n.stripPrefix("v").stripSuffix(".metadata.json").toInt }
      .foldLeft(0)(math.max)
    finally s.close()
  }

  // --- Avro schemas, field-ids per the Iceberg spec's manifest tables ---

  private val manifestListSchema = new org.apache.avro.Schema.Parser().parse(
    """{"type":"record","name":"manifest_file","fields":[
      {"name":"manifest_path","type":"string","field-id":500},
      {"name":"manifest_length","type":"long","field-id":501},
      {"name":"partition_spec_id","type":"int","field-id":502},
      {"name":"content","type":"int","field-id":517},
      {"name":"sequence_number","type":"long","field-id":515},
      {"name":"min_sequence_number","type":"long","field-id":516},
      {"name":"added_snapshot_id","type":"long","field-id":503},
      {"name":"added_files_count","type":"int","field-id":504},
      {"name":"existing_files_count","type":"int","field-id":505},
      {"name":"deleted_files_count","type":"int","field-id":506},
      {"name":"added_rows_count","type":"long","field-id":512},
      {"name":"existing_rows_count","type":"long","field-id":513},
      {"name":"deleted_rows_count","type":"long","field-id":514}]}""")

  private val manifestEntrySchema = new org.apache.avro.Schema.Parser().parse(
    """{"type":"record","name":"manifest_entry","fields":[
      {"name":"status","type":"int","field-id":0},
      {"name":"snapshot_id","type":["null","long"],"default":null,"field-id":1},
      {"name":"sequence_number","type":["null","long"],"default":null,"field-id":3},
      {"name":"file_sequence_number","type":["null","long"],"default":null,"field-id":4},
      {"name":"data_file","field-id":2,"type":{"type":"record","name":"r2","fields":[
        {"name":"content","type":"int","field-id":134},
        {"name":"file_path","type":"string","field-id":100},
        {"name":"file_format","type":"string","field-id":101},
        {"name":"partition","field-id":102,"type":{"type":"record","name":"r102","fields":[]}},
        {"name":"record_count","type":"long","field-id":103},
        {"name":"file_size_in_bytes","type":"long","field-id":104}]}}]}""")

  private def writeAvro(path: java.nio.file.Path, schema: org.apache.avro.Schema,
      records: Seq[org.apache.avro.generic.GenericRecord]): Long = {
    val w = new org.apache.avro.file.DataFileWriter(
      new org.apache.avro.generic.GenericDatumWriter[org.apache.avro.generic.GenericRecord](schema))
    w.create(schema, path.toFile)
    try records.foreach(w.append) finally w.close()
    Files.size(path)
  }

  /** Append `df` as a new snapshot; creates the table if absent. Returns
    * the snapshot id (== the committed metadata version). */
  def append(spark: SparkSession, df: DataFrame, table: String): Long = {
    require(!df.schema.exists(f => f.dataType match {
      case _: StructType | _: ArrayType | _: MapType => true; case _ => false
    }), "nested column types are outside the Iceberg writer's subset")

    def readPrior(): Option[com.fasterxml.jackson.databind.JsonNode] = {
      val v = currentVersion(table)
      if (v == 0) None
      else Some(mapper.readTree(metaDir(table).resolve(s"v$v.metadata.json").toFile))
    }
    // schema pinning against an existing table (same rule as DeltaWrite)
    readPrior().foreach { meta =>
      val cur = meta.path("schemas").elements().asScala
        .find(_.path("schema-id").asInt(-1) == meta.path("current-schema-id").asInt(0))
        .getOrElse(sys.error(s"malformed metadata in $table"))
      val names = cur.path("fields").elements().asScala.map(_.path("name").asText()).toSeq
      require(names.sorted == df.schema.fieldNames.toSeq.sorted,
        s"append schema ${df.schema.fieldNames.mkString(",")} does not match table schema ${names.mkString(",")}")
    }

    // 1. stage data files (spark parquet write → move under data/). Exact
    //    per-file record counts in ONE job — a real Iceberg reader trusts
    //    record_count for scan planning, so a wrong value would corrupt it.
    val stage = Files.createTempDirectory("graft_iceberg_write")
    df.write.mode("overwrite").parquet(stage.toString)
    Files.createDirectories(dataDir(table))
    import org.apache.spark.sql.functions.{count => fcount, input_file_name, lit => flit}
    val perFile: Map[String, Long] = spark.read.parquet(stage.toString)
      .groupBy(input_file_name().as("f")).agg(fcount(flit(1)).as("n"))
      .collect()
      .map(r => (new org.apache.hadoop.fs.Path(r.getString(0)).getName, r.getLong(1)))
      .toMap
    val dataFiles: Seq[(java.nio.file.Path, Long)] =
      Option(stage.toFile.listFiles()).getOrElse(Array.empty)
        .filter(_.getName.endsWith(".parquet")).toSeq.map { f =>
          val dest = dataDir(table).resolve(s"${java.util.UUID.randomUUID()}-${f.getName}")
          Files.move(f.toPath, dest)
          (dest, perFile.getOrElse(f.getName, 0L))
        }
    val rowCount = dataFiles.map(_._2).sum
    def rmr(f: java.io.File): Unit = {
      Option(f.listFiles()).getOrElse(Array.empty).foreach(rmr); f.delete()
    }
    rmr(stage.toFile)

    // optimistic claim loop: manifests/metadata are cheap to re-author, and
    // the prior state is RE-READ each attempt so a lost race carries the
    // winner's snapshots forward instead of silently dropping them
    while (true) {
      val prior = readPrior()
      val base = currentVersion(table)
      val version = base + 1
      val snapshotId = version.toLong
      Files.createDirectories(metaDir(table))

      // 2. one manifest for this append's files (status 1 = ADDED)
      import org.apache.avro.generic.GenericData
      val dataFileSchema = manifestEntrySchema.getField("data_file").schema()
      val partitionSchema = dataFileSchema.getField("partition").schema()
      val entries = dataFiles.map { case (p, nRows) =>
        val dfr = new GenericData.Record(dataFileSchema)
        dfr.put("content", 0)
        dfr.put("file_path", p.toString)
        dfr.put("file_format", "PARQUET")
        dfr.put("partition", new GenericData.Record(partitionSchema))
        dfr.put("record_count", nRows)
        dfr.put("file_size_in_bytes", Files.size(p))
        val e = new GenericData.Record(manifestEntrySchema)
        e.put("status", 1)
        e.put("snapshot_id", snapshotId)
        e.put("sequence_number", snapshotId)
        e.put("file_sequence_number", snapshotId)
        e.put("data_file", dfr)
        e
      }
      val manifestPath = metaDir(table).resolve(s"m-$snapshotId-${java.util.UUID.randomUUID()}.avro")
      val manifestLen = writeAvro(manifestPath, manifestEntrySchema, entries)

      // 3. manifest list = prior snapshot's manifests (carried forward
      //    as-is, the spec's reuse pattern) + this one
      val priorManifests: Seq[(String, Long)] = prior.toSeq.flatMap { meta =>
        val curSnap = meta.path("current-snapshot-id").asLong(-1L)
        meta.path("snapshots").elements().asScala
          .find(_.path("snapshot-id").asLong(-2L) == curSnap)
          .map(_.path("manifest-list").asText()).toSeq
          .flatMap { ml =>
            val reader = new org.apache.avro.file.DataFileReader(
              new java.io.File(ml),
              new org.apache.avro.generic.GenericDatumReader[org.apache.avro.generic.GenericRecord]())
            try reader.iterator().asScala.toList.map(r =>
              (r.get("manifest_path").toString, r.get("manifest_length").toString.toLong))
            finally reader.close()
          }
      }
      val mlRecords = (priorManifests :+ (manifestPath.toString, manifestLen)).map { case (mp, len) =>
        val r = new GenericData.Record(manifestListSchema)
        r.put("manifest_path", mp)
        r.put("manifest_length", len)
        r.put("partition_spec_id", 0)
        r.put("content", 0)
        r.put("sequence_number", snapshotId)
        r.put("min_sequence_number", 1L)
        r.put("added_snapshot_id", snapshotId)
        r.put("added_files_count", dataFiles.size)
        r.put("existing_files_count", 0)
        r.put("deleted_files_count", 0)
        r.put("added_rows_count", rowCount)
        r.put("existing_rows_count", 0L)
        r.put("deleted_rows_count", 0L)
        r
      }
      val mlPath = metaDir(table).resolve(s"snap-$snapshotId-${java.util.UUID.randomUUID()}.avro")
      writeAvro(mlPath, manifestListSchema, mlRecords)

      // 4. metadata JSON: prior snapshots stay for time travel
      def jstr(s: String) = mapper.writeValueAsString(s)
      val fields = df.schema.fields.zipWithIndex.map { case (f, i) =>
        s"""{"id":${i + 1},"name":${jstr(f.name)},"required":false,"type":${jstr(icebergType(f.dataType))}}"""
      }.mkString(",")
      val priorSnaps = prior.toSeq.flatMap(_.path("snapshots").elements().asScala.map(_.toString))
      val now = System.currentTimeMillis()
      val snapJson =
        s"""{"snapshot-id":$snapshotId,"timestamp-ms":$now,"sequence-number":$snapshotId,
           |"summary":{"operation":"append"},"manifest-list":${jstr(mlPath.toString)},"schema-id":0}"""
          .stripMargin.replaceAll("\n", "")
      val metaJson =
        s"""{"format-version":2,"table-uuid":"graft-${java.util.UUID.randomUUID()}",
           |"location":${jstr(table)},"last-sequence-number":$snapshotId,
           |"last-updated-ms":$now,"last-column-id":${df.schema.size},
           |"current-schema-id":0,
           |"schemas":[{"type":"struct","schema-id":0,"fields":[$fields]}],
           |"default-spec-id":0,"partition-specs":[{"spec-id":0,"fields":[]}],
           |"default-sort-order-id":0,"sort-orders":[{"order-id":0,"fields":[]}],
           |"properties":{},
           |"current-snapshot-id":$snapshotId,
           |"snapshots":[${(priorSnaps :+ snapJson).mkString(",")}]}"""
          .stripMargin.replaceAll("\n", "")

      // 5. put-if-absent claim of vN.metadata.json
      val tmp = Files.createTempFile(metaDir(table), "meta", ".tmp")
      val won =
        try {
          Files.writeString(tmp, metaJson)
          Files.createLink(metaDir(table).resolve(s"v$version.metadata.json"), tmp)
          true
        } catch {
          case _: java.nio.file.FileAlreadyExistsException => false
        } finally Files.delete(tmp)
      if (won) {
        Files.writeString(metaDir(table).resolve("version-hint.text"), version.toString)
        return snapshotId
      }
      // lost the race: drop this attempt's manifest/list and re-author
      // against the winner's state (data files stay — they are re-added)
      Files.deleteIfExists(manifestPath)
      Files.deleteIfExists(mlPath)
    }
    -1L // unreachable
  }
}
