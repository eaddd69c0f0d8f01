package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types._
import scala.jdk.CollectionConverters._

/** Reader for EXTERNAL Apache Iceberg tables — the open table-format spec
  * (iceberg.apache.org/spec): the `vN.metadata.json` files under
  * `metadata/` → snapshot → manifest-list (Avro) → manifests (Avro) →
  * live parquet data files.
  * Complements [[DeltaRead]] for the lakehouse-interop story.
  *
  * Supported: format-version 1 and 2 metadata, parquet data files,
  * time travel by snapshot id, primitive column types (Iceberg data files
  * carry ALL columns — unlike Delta, partition values need no injection).
  * Refused loudly rather than misread: row-level deletes (v2 delete
  * manifests / non-data content), non-parquet file formats, and nested or
  * unknown column types. Columns resolve by NAME (a rename via field-id
  * mapping is not supported — documented subset).
  *
  * Scale notes: metadata JSON and manifests are read on the DRIVER with
  * the Avro core API — they are metadata, O(manifests + files) small
  * records by Iceberg's own design (the same contract as Delta log
  * replay / data skipping). Data is one parquet scan. */
object IcebergRead {

  private def mapper = new com.fasterxml.jackson.databind.ObjectMapper()

  private def localPath(uri: String): String = {
    // percent-only decode ('+' is literal in URI paths — see DeltaRead.pctDecode)
    val decoded = DeltaRead.pctDecode(uri)
    decoded.replaceFirst("^[a-zA-Z0-9+.-]+:(//)?", "")
  }

  /** Latest metadata JSON: `version-hint.text` if present, else the
    * highest-numbered `*.metadata.json` in `metadata/`. */
  private def metadataFile(table: String): java.io.File = {
    val dir = new java.io.File(s"${table.stripSuffix("/")}/metadata")
    require(dir.isDirectory, s"not an Iceberg table (no metadata dir): $table")
    val hint = new java.io.File(dir, "version-hint.text")
    if (hint.isFile) {
      val v = java.nio.file.Files.readString(hint.toPath).trim
      val f = new java.io.File(dir, s"v$v.metadata.json")
      require(f.isFile, s"version-hint points at missing $f")
      f
    } else {
      val candidates = Option(dir.listFiles()).getOrElse(Array.empty)
        .filter(_.getName.endsWith(".metadata.json"))
      require(candidates.nonEmpty, s"no *.metadata.json under $dir")
      candidates.maxBy(f => "\\d+".r.findFirstIn(f.getName).map(_.toLong).getOrElse(-1L))
    }
  }

  private def avroRecords(path: String): Seq[org.apache.avro.generic.GenericRecord] = {
    val reader = new org.apache.avro.file.DataFileReader(
      new java.io.File(localPath(path)),
      new org.apache.avro.generic.GenericDatumReader[org.apache.avro.generic.GenericRecord]())
    try reader.iterator().asScala.toList finally reader.close()
  }

  private def fieldType(t: String, name: String): DataType = t match {
    case "boolean" => BooleanType
    case "int" => IntegerType
    case "long" => LongType
    case "float" => FloatType
    case "double" => DoubleType
    case "string" => StringType
    case "date" => DateType
    case "timestamp" | "timestamptz" => TimestampType
    case "binary" => BinaryType
    case dec if dec.startsWith("decimal(") =>
      val Array(p, s) = dec.stripPrefix("decimal(").stripSuffix(")").split(",").map(_.trim.toInt)
      DecimalType(p, s)
    case other => throw new IllegalArgumentException(
      s"unsupported Iceberg column type '$other' for field '$name' " +
        "(nested/complex types are outside this reader's subset)")
  }

  /** The Iceberg table as a DataFrame at `snapshotId` (-1 = current). */
  def snapshot(spark: SparkSession, table: String, snapshotId: Long = -1L): DataFrame = {
    val meta = mapper.readTree(metadataFile(table))
    val formatVersion = meta.path("format-version").asInt(1)
    require(formatVersion <= 2, s"unsupported Iceberg format-version $formatVersion")

    // schema: v2 `schemas` + current-schema-id; v1 inline `schema`
    val schemaNode =
      if (meta.has("schemas")) {
        val cur = meta.path("current-schema-id").asInt(0)
        meta.path("schemas").elements().asScala
          .find(_.path("schema-id").asInt(-1) == cur)
          .getOrElse(throw new IllegalArgumentException(s"current-schema-id $cur not in schemas"))
      } else meta.path("schema")
    val schema = StructType(schemaNode.path("fields").elements().asScala.map { f =>
      StructField(f.path("name").asText(),
        fieldType(f.path("type").asText(), f.path("name").asText()),
        nullable = !f.path("required").asBoolean(false))
    }.toSeq)

    val snapshots = meta.path("snapshots").elements().asScala.toSeq
    require(snapshots.nonEmpty, s"Iceberg table has no snapshots: $table")
    val targetId =
      if (snapshotId >= 0) snapshotId else meta.path("current-snapshot-id").asLong(-1L)
    val snap = snapshots.find(_.path("snapshot-id").asLong(-2L) == targetId)
      .getOrElse(throw new IllegalArgumentException(
        s"snapshot $targetId not found (have ${snapshots.map(_.path("snapshot-id").asLong(0)).mkString(",")})"))

    // manifest list (standard) or inline v1 `manifests` fallback
    val manifestPaths: Seq[String] =
      if (snap.has("manifest-list")) {
        avroRecords(snap.path("manifest-list").asText()).map { r =>
          val content = Option(r.get("content")).map(_.toString.toInt).getOrElse(0)
          require(content == 0,
            "Iceberg DELETE manifests present — row-level deletes are not supported; refusing")
          r.get("manifest_path").toString
        }
      } else snap.path("manifests").elements().asScala.map(_.asText()).toSeq

    val liveFiles = manifestPaths.flatMap { mp =>
      avroRecords(mp).flatMap { entry =>
        val status = Option(entry.get("status")).map(_.toString.toInt).getOrElse(1)
        if (status == 2) None // DELETED entry: not part of this snapshot
        else {
          val df = entry.get("data_file").asInstanceOf[org.apache.avro.generic.GenericRecord]
          val content = Option(df.get("content")).map(_.toString.toInt).getOrElse(0)
          require(content == 0,
            "Iceberg delete file in a data manifest — row-level deletes are not supported")
          val fmt = df.get("file_format").toString
          require(fmt.equalsIgnoreCase("parquet"), s"unsupported Iceberg file format: $fmt")
          Some(localPath(df.get("file_path").toString))
        }
      }
    }
    if (liveFiles.isEmpty)
      spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    else
      spark.read.schema(schema).parquet(liveFiles: _*)
        .select(schema.map(f => org.apache.spark.sql.functions.col(f.name)): _*)
  }
}
