package graft.sources

import org.apache.avro.{LogicalType, LogicalTypes, Schema}
import org.apache.avro.file.{DataFileStream, DataFileWriter}
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

import scala.jdk.CollectionConverters._

/** Avro OCF (object container file) batch source + sink, built directly
  * on the Avro core API (the spark-avro datasource module is not on this
  * classpath; the same API already authors Iceberg manifests).
  *
  * Scale shape mirrors every other file source here: [[write]] emits one
  * container file per NON-EMPTY partition from the executors (hadoop FS
  * streams — scheme-agnostic, the session conf rides a broadcast so s3a
  * credentials work), [[read]] lists files driver-side (O(files)
  * metadata), reads the schema from one file, and decodes file-granular
  * on the executors — one task per container file, the same parallelism
  * contract as `binaryFile`/parquet-without-splits. Avro OCF is
  * block-compressed row-major and NOT splittable mid-file by this
  * reader, so at 100 TB the layout lever is file count (what
  * [[Layout.compact]]-style sizing already governs), not split size.
  *
  * Type surface (both directions, refused loudly otherwise):
  * boolean/int/long/float/double/string/bytes, timestamp-micros ↔
  * TimestampType, date ↔ DateType, arrays of those; nullable fields as
  * the standard `union(null, T)` with a null default. */
object AvroIo {

  /** Write `df` as `part-NNNNN-<uuid>.avro` container files under `dir`
    * (created if absent; existing files are not touched — pair with an
    * empty/fresh dir for overwrite semantics). Partition 0 always writes
    * (possibly rows-free) so the schema survives an empty frame. Returns
    * the row count written. */
  def write(df: DataFrame, dir: String): Long = {
    val spark = df.sparkSession
    val avroJson = recordSchema(df.schema, "row").toString
    val out = new Path(dir)
    val fs = out.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.mkdirs(out)
    val hconf = spark.sparkContext.broadcast(
      new graft.ingest.SerializableHadoopConf(spark.sparkContext.hadoopConfiguration))
    val fieldTypes = df.schema.fields.map(_.dataType)
    val uuid = java.util.UUID.randomUUID().toString
    val counts = df.rdd.mapPartitionsWithIndex { (part, rows) =>
      if (rows.isEmpty && part != 0) Iterator.single(0L)
      else {
        val schema = new Schema.Parser().parse(avroJson)
        // Write-to-temp + rename: the FINAL name is deterministic per
        // (partition, job-uuid) so a retried task converges, but the bytes
        // land under an ATTEMPT-unique temp name first. Two concurrent
        // attempts of the same task (speculation, a zombie executor after
        // repartition) must never share an output stream — Avro OCF embeds
        // a per-writer random 16-byte sync marker, so interleaved writes
        // would corrupt the file unreadably. Each attempt writes its own
        // temp file in full, then renames over the final name; the rename
        // is a single FS metadata op, so the final path only ever holds one
        // attempt's complete bytes, and a late zombie rename re-installs an
        // equivalent complete file rather than tearing a live one.
        val attempt = Option(org.apache.spark.TaskContext.get())
          .map(_.taskAttemptId()).getOrElse(0L)
        val fsx = new Path(dir).getFileSystem(hconf.value.value)
        val file = new Path(dir, f"part-$part%05d-$uuid.avro")
        val tmp = new Path(dir, f".part-$part%05d-$uuid-attempt$attempt.avro.tmp")
        val w = new DataFileWriter(new GenericDatumWriter[GenericRecord](schema))
        w.create(schema, fsx.create(tmp, true)) // DataFileWriter closes the stream
        var n = 0L
        try rows.foreach { row =>
          val rec = new GenericData.Record(schema)
          var i = 0
          while (i < fieldTypes.length) {
            rec.put(i, toAvroValue(row.get(i), fieldTypes(i)))
            i += 1
          }
          w.append(rec)
          n += 1
        } finally w.close()
        // Install without a pre-delete: the final name only ever receives
        // COMPLETE files (every attempt writes its temp in full first), so
        // an existing final is a prior attempt's equivalent output — adopt
        // it. A delete-then-rename pair here would race two live attempts
        // of the same task: A's delete after B's successful rename leaves
        // a window where the reported-committed file is gone. Rename
        // failure is likewise tolerated iff the destination exists (the
        // loser of the race is already satisfied, not a retry).
        if (fsx.exists(file)) fsx.delete(tmp, false)
        else if (!fsx.rename(tmp, file)) {
          fsx.delete(tmp, false)
          if (!fsx.exists(file))
            throw new java.io.IOException(s"AvroIo: rename $tmp -> $file failed")
        }
        Iterator.single(n)
      }
    }.collect() // O(partitions) longs — driver-side metadata only
    // a frame with ZERO partitions ran no tasks: author the schema-only
    // file driver-side so the directory always reads back
    if (!fs.listStatus(out).exists(_.getPath.getName.endsWith(".avro"))) {
      val schema = new Schema.Parser().parse(avroJson)
      val w = new DataFileWriter(new GenericDatumWriter[GenericRecord](schema))
      w.create(schema, fs.create(new Path(out, f"part-${0}%05d-$uuid.avro"), false))
      w.close()
    }
    counts.sum
  }

  /** Read every `*.avro` container file under `dir` (schema from the
    * first file in path order; all files must share it — standard
    * single-schema directory contract). */
  def read(spark: SparkSession, dir: String): DataFrame = {
    val root = new Path(dir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val files = fs.listStatus(root).map(_.getPath)
      .filter(_.getName.endsWith(".avro")).map(_.toString).sorted
    require(files.nonEmpty, s"no .avro files under $dir")
    readFiles(spark, files.toSeq)
  }

  /** Read an explicit list of `.avro` container files (schema from the
    * first; all must share it) — the COPY INTO per-file ingest path. */
  def readFiles(spark: SparkSession, fileList: Seq[String]): DataFrame = {
    require(fileList.nonEmpty, "readFiles: empty file list")
    val files = fileList.sorted
    val fs = new Path(files.head).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val avroSchema = {
      val in = fs.open(new Path(files.head))
      val s = new DataFileStream(in, new GenericDatumReader[GenericRecord]())
      try s.getSchema finally s.close()
    }
    require(avroSchema.getType == Schema.Type.RECORD,
      s"top-level avro schema must be a record, got ${avroSchema.getType}")
    val structType = StructType(avroSchema.getFields.asScala.toSeq.map { f =>
      val (dt, nullable) = fromAvroType(unwrapUnion(f.schema()), isNullableUnion(f.schema()))
      StructField(f.name(), dt, nullable)
    })
    val avroJson = avroSchema.toString
    val hconf = spark.sparkContext.broadcast(
      new graft.ingest.SerializableHadoopConf(spark.sparkContext.hadoopConfiguration))
    val rows = spark.sparkContext.parallelize(files.toSeq, files.length)
      .flatMap { path =>
        val expected = new Schema.Parser().parse(avroJson)
        val p = new Path(path)
        val in = p.getFileSystem(hconf.value.value).open(p)
        val stream = new DataFileStream(in,
          new GenericDatumReader[GenericRecord](expected))
        // close on task end, not iterator exhaustion — a LIMIT that stops
        // mid-file must not leak the FS stream
        Option(org.apache.spark.TaskContext.get())
          .foreach(_.addTaskCompletionListener[Unit](_ => stream.close()))
        val fields = expected.getFields.asScala.toArray
        new Iterator[Row] {
          def hasNext: Boolean = stream.hasNext
          def next(): Row = {
            val rec = stream.next()
            Row.fromSeq(fields.indices.map(i =>
              fromAvroValue(rec.get(i), unwrapUnion(fields(i).schema()))))
          }
        }
      }
    spark.createDataFrame(rows, structType)
  }

  // ---- schema mapping --------------------------------------------------

  private def recordSchema(st: StructType, name: String): Schema = {
    val fields = st.fields.map { f =>
      val base = toAvroType(f.dataType)
      if (f.nullable)
        new Schema.Field(f.name,
          Schema.createUnion(Schema.create(Schema.Type.NULL), base),
          null, Schema.Field.NULL_DEFAULT_VALUE)
      else new Schema.Field(f.name, base, null)
    }
    Schema.createRecord(name, null, "graft.avro", false, fields.toList.asJava)
  }

  private def toAvroType(dt: DataType): Schema = dt match {
    case BooleanType => Schema.create(Schema.Type.BOOLEAN)
    case IntegerType => Schema.create(Schema.Type.INT)
    case LongType => Schema.create(Schema.Type.LONG)
    case FloatType => Schema.create(Schema.Type.FLOAT)
    case DoubleType => Schema.create(Schema.Type.DOUBLE)
    case StringType => Schema.create(Schema.Type.STRING)
    case BinaryType => Schema.create(Schema.Type.BYTES)
    case TimestampType =>
      LogicalTypes.timestampMicros().addToSchema(Schema.create(Schema.Type.LONG))
    case DateType => LogicalTypes.date().addToSchema(Schema.create(Schema.Type.INT))
    case ArrayType(elem, containsNull) =>
      val e = toAvroType(elem)
      Schema.createArray(
        if (containsNull) Schema.createUnion(Schema.create(Schema.Type.NULL), e) else e)
    case other => throw new IllegalArgumentException(
      s"AvroIo does not map Spark type $other (supported: boolean/int/long/float/" +
        "double/string/binary/timestamp/date and arrays of those)")
  }

  private def isNullableUnion(s: Schema): Boolean =
    s.getType == Schema.Type.UNION &&
      s.getTypes.asScala.exists(_.getType == Schema.Type.NULL)

  private def unwrapUnion(s: Schema): Schema =
    if (s.getType == Schema.Type.UNION) {
      val branches = s.getTypes.asScala.filter(_.getType != Schema.Type.NULL)
      require(branches.size == 1,
        s"only union(null, T) is supported, got $s")
      branches.head
    } else s

  private def fromAvroType(s: Schema, nullable: Boolean): (DataType, Boolean) = {
    val dt = (s.getType, Option(s.getLogicalType)) match {
      case (Schema.Type.BOOLEAN, _) => BooleanType
      case (Schema.Type.INT, Some(_: LogicalTypes.Date)) => DateType
      case (Schema.Type.INT, _) => IntegerType
      case (Schema.Type.LONG, Some(_: LogicalTypes.TimestampMicros)) => TimestampType
      case (Schema.Type.LONG, _) => LongType
      case (Schema.Type.FLOAT, _) => FloatType
      case (Schema.Type.DOUBLE, _) => DoubleType
      case (Schema.Type.STRING, _) => StringType
      case (Schema.Type.BYTES, _) => BinaryType
      case (Schema.Type.ARRAY, _) =>
        val (e, en) = fromAvroType(unwrapUnion(s.getElementType),
          isNullableUnion(s.getElementType))
        ArrayType(e, en)
      case (t, lt) => throw new IllegalArgumentException(
        s"AvroIo does not map avro type $t (logical $lt)")
    }
    (dt, nullable)
  }

  // ---- value mapping ---------------------------------------------------

  private def toAvroValue(v: Any, dt: DataType): Any = (v, dt) match {
    case (null, _) => null
    case (ts: java.sql.Timestamp, TimestampType) =>
      ts.getTime * 1000L + (ts.getNanos % 1000000) / 1000L
    case (d: java.sql.Date, DateType) => d.toLocalDate.toEpochDay.toInt
    case (b: Array[Byte], BinaryType) => java.nio.ByteBuffer.wrap(b)
    case (seq: scala.collection.Seq[_], ArrayType(elem, _)) =>
      seq.map(toAvroValue(_, elem)).asJava
    case (other, _) => other
  }

  private def fromAvroValue(v: Any, s: Schema): Any = v match {
    case null => null
    case u: org.apache.avro.util.Utf8 => u.toString
    case cs: CharSequence => cs.toString
    case l: java.lang.Long if s.getLogicalType.isInstanceOf[LogicalTypes.TimestampMicros] =>
      val us = l.longValue()
      java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(
        Math.floorDiv(us, 1000000L), Math.floorMod(us, 1000000L) * 1000L))
    case i: java.lang.Integer if s.getLogicalType.isInstanceOf[LogicalTypes.Date] =>
      java.sql.Date.valueOf(java.time.LocalDate.ofEpochDay(i.longValue()))
    case bb: java.nio.ByteBuffer =>
      val a = new Array[Byte](bb.remaining()); bb.duplicate().get(a); a
    case arr: java.util.Collection[_] =>
      arr.asScala.map(fromAvroValue(_, unwrapUnion(s.getElementType))).toSeq
    case other => other
  }
}
