package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, StructType}

/** Reader for EXTERNAL Delta Lake tables — the open `_delta_log` format
  * (Delta Lake PROTOCOL.md; Armbrust et al., VLDB 2020 — see PAPERS.md).
  * The engine's own catalog (graft.ingest.Catalog) is Delta-STYLE by
  * design; this reads actual Delta tables written by other engines, the
  * first interop ask of a lakehouse user.
  *
  * Supported: reader protocol version 1 (plain parquet data files),
  * partitioned tables (partition values injected from the log — Delta data
  * files do NOT contain partition columns), checkpoint parquet files +
  * `_last_checkpoint` pointer, time travel to any log version. Refused
  * loudly rather than misread: minReaderVersion > 1 (column mapping,
  * deletion vectors) and non-parquet formats.
  *
  * Scale notes: log replay reads O(commits-since-checkpoint) small JSON
  * files plus one checkpoint parquet — bounded by Delta's own checkpoint
  * cadence, independent of data size. The file list is O(live files) on
  * the driver (same contract as data skipping / Delta's own kernel). Data
  * is read in ONE parquet scan; partition values attach via a broadcast
  * map on `input_file_name()`, so partition-predicate pushdown happens in
  * the engine (filter the broadcast side / the injected column) without
  * per-partition scans. */
object DeltaRead {

  /** One live data file in a snapshot: absolute path + log-carried
    * partition values (column name → string value, null for NULL) + the
    * log-carried size/modificationTime (0 when the source action omitted
    * them — used when re-emitting checkpoint add rows, where the Delta spec
    * makes them required). */
  case class LiveFile(path: String, partitionValues: Map[String, String],
      size: Long = 0L, modificationTime: Long = 0L)

  case class Snapshot(
      version: Long,
      schema: StructType,
      partitionColumns: Seq[String],
      files: Seq[LiveFile])

  private val actionsDdl =
    """add STRUCT<path: STRING, partitionValues: MAP<STRING, STRING>, size: BIGINT,
                  modificationTime: BIGINT, dataChange: BOOLEAN>,
       remove STRUCT<path: STRING>,
       metaData STRUCT<id: STRING, schemaString: STRING,
                       partitionColumns: ARRAY<STRING>,
                       format: STRUCT<provider: STRING>>,
       protocol STRUCT<minReaderVersion: INT>"""

  private def logPath(table: String) = s"${table.stripSuffix("/")}/_delta_log"

  private def fs(spark: SparkSession, p: org.apache.hadoop.fs.Path) =
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Percent-only decode (RFC 3986): log paths encode special chars as %XX
    * but a literal '+' is just '+' — URLDecoder alone would corrupt it to a
    * space (form-urlencoded rules), so protect it first. */
  private[sources] def pctDecode(s: String): String =
    java.net.URLDecoder.decode(s.replace("+", "%2B"), "UTF-8")

  /** Absolute data-file path: log paths are table-root-relative and
    * percent-encoded; already-absolute URIs pass through. */
  private def resolve(table: String, p: String): String = {
    val decoded = pctDecode(p)
    if (decoded.contains("://") || decoded.startsWith("/")) decoded
    else s"${table.stripSuffix("/")}/$decoded"
  }

  /** Log replay to `version` (-1 = latest): checkpoint state (if one at or
    * before the target exists) + JSON commits after it, in version order. */
  def snapshotInfo(spark: SparkSession, table: String, version: Long = -1L): Snapshot = {
    import scala.jdk.CollectionConverters._
    val dir = new org.apache.hadoop.fs.Path(logPath(table))
    val hfs = fs(spark, dir)
    require(hfs.exists(dir), s"not a Delta table (no _delta_log): $table")
    val names = hfs.listStatus(dir).map(_.getPath.getName).toSeq

    val commitVersions = names.collect {
      case n if n.length == 25 && n.endsWith(".json") && n.take(20).forall(_.isDigit) =>
        n.take(20).toLong
    }.sorted
    require(commitVersions.nonEmpty, s"empty _delta_log in $table")
    val latest = commitVersions.max
    val target = if (version < 0) latest else version
    require(commitVersions.contains(target),
      s"version $target not in log (have ${commitVersions.min}..$latest)")

    val checkpointVersions = names.collect {
      case n if n.endsWith(".checkpoint.parquet") && n.take(20).forall(_.isDigit) =>
        n.take(20).toLong
    }.filter(_ <= target)
    val fromCheckpoint = checkpointVersions.sorted.lastOption

    // A retention-cleaned log may have dropped early JSON commits; without a
    // checkpoint at/after the gap the replay would silently MISS adds. Every
    // commit in (checkpoint, target] must be present, and with no checkpoint
    // the commits must start at version 0.
    val replayFrom = fromCheckpoint.getOrElse(-1L)
    val needed = (replayFrom + 1) to target
    val present = commitVersions.toSet
    val missing = needed.filterNot(present)
    require(missing.isEmpty,
      s"cannot reconstruct version $target: log versions ${missing.mkString(",")} are " +
        s"missing and no checkpoint covers them (log retention cleaned them?)")

    // Mutable replay state, keyed by resolved path (driver-side, O(files)).
    val live = scala.collection.mutable.LinkedHashMap[String, LiveFile]()
    var schemaString: String = null
    var partitionCols: Seq[String] = Seq.empty
    var minReader = 1

    def applyMeta(schemaStr: String, parts: Seq[String], provider: String): Unit = {
      if (provider != null)
        require(provider == "parquet", s"unsupported Delta data format: $provider")
      if (schemaStr != null) { schemaString = schemaStr; partitionCols = parts }
    }

    fromCheckpoint.foreach { cv =>
      val cp = spark.read.parquet(s"${logPath(table)}/${f"$cv%020d"}.checkpoint.parquet")
      val cols = cp.columns.toSet
      if (cols.contains("protocol"))
        cp.where(col("protocol").isNotNull).select(col("protocol.minReaderVersion"))
          .collect().foreach(r => if (!r.isNullAt(0)) minReader = math.max(minReader, r.getInt(0)))
      if (cols.contains("metaData"))
        cp.where(col("metaData").isNotNull)
          .select(col("metaData.schemaString"), col("metaData.partitionColumns"),
            col("metaData.format.provider"))
          .collect().foreach { r =>
            applyMeta(r.getString(0),
              Option(r.getSeq[String](1)).map(_.toSeq).getOrElse(Seq.empty), r.getString(2))
          }
      // size/modificationTime are spec-required in checkpoints but tolerate
      // their absence (older graft-written checkpoints omitted them)
      val addFields = cp.schema.collectFirst {
        case f if f.name == "add" => f.dataType match {
          case s: StructType => s.fieldNames.toSet
          case _ => Set.empty[String]
        }
      }.getOrElse(Set.empty)
      def optLong(n: String) =
        if (addFields.contains(n)) coalesce(col(s"add.$n"), lit(0L)) else lit(0L)
      cp.where(col("add").isNotNull)
        .select(col("add.path"), col("add.partitionValues"),
          optLong("size"), optLong("modificationTime"))
        .collect().foreach { r =>
          val p = resolve(table, r.getString(0))
          live(p) = LiveFile(p,
            Option(r.getMap[String, String](1)).map(_.toMap).getOrElse(Map.empty),
            r.getLong(2), r.getLong(3))
        }
    }

    val pending = commitVersions.filter(v => v > fromCheckpoint.getOrElse(-1L) && v <= target)
    pending.foreach { v =>
      val commit = spark.read.schema(StructType.fromDDL(actionsDdl))
        .json(s"${logPath(table)}/${f"$v%020d"}.json")
        .select(col("add.path").as("ap"), col("add.partitionValues").as("pv"),
          col("remove.path").as("rp"),
          col("metaData.schemaString").as("ss"), col("metaData.partitionColumns").as("pc"),
          col("metaData.format.provider").as("fp"),
          col("protocol.minReaderVersion").as("mrv"),
          coalesce(col("add.size"), lit(0L)).as("sz"),
          coalesce(col("add.modificationTime"), lit(0L)).as("mt"))
        .collect()
      commit.foreach { r =>
        if (!r.isNullAt(6)) minReader = math.max(minReader, r.getInt(6))
        if (!r.isNullAt(3) || !r.isNullAt(5))
          applyMeta(if (r.isNullAt(3)) null else r.getString(3),
            if (r.isNullAt(4)) Seq.empty else r.getSeq[String](4).toSeq,
            if (r.isNullAt(5)) null else r.getString(5))
      }
      // removes first, then adds: a commit that rewrites a file (remove+add
      // of the same path) must leave it live
      commit.foreach(r => if (!r.isNullAt(2)) live.remove(resolve(table, r.getString(2))))
      commit.foreach { r =>
        if (!r.isNullAt(0)) {
          val p = resolve(table, r.getString(0))
          live(p) = LiveFile(p,
            Option(r.getMap[String, String](1)).map(_.toMap).getOrElse(Map.empty),
            r.getLong(7), r.getLong(8))
        }
      }
    }

    require(minReader <= 1,
      s"Delta reader protocol $minReader not supported (column mapping / deletion " +
        "vectors need a newer reader) — refusing rather than misreading")
    require(schemaString != null, s"no metaData action found in log of $table")
    Snapshot(target, DataType.fromJson(schemaString).asInstanceOf[StructType],
      partitionCols, live.values.toSeq)
  }

  /** Latest recorded `txn` version per appId at the head of the log —
    * Delta's idempotent-writer high-water marks (checkpoint txn rows plus
    * commits after it). A streaming sink consults this to skip replayed
    * batches. */
  def txnVersions(spark: SparkSession, table: String): Map[String, Long] = {
    val dir = new org.apache.hadoop.fs.Path(logPath(table))
    val hfs = fs(spark, dir)
    if (!hfs.exists(dir)) return Map.empty
    val names = hfs.listStatus(dir).map(_.getPath.getName).toSeq
    val commitVersions = names.collect {
      case n if n.length == 25 && n.endsWith(".json") && n.take(20).forall(_.isDigit) =>
        n.take(20).toLong
    }.sorted
    if (commitVersions.isEmpty) return Map.empty
    val latest = commitVersions.max
    val fromCheckpoint = names.collect {
      case n if n.endsWith(".checkpoint.parquet") && n.take(20).forall(_.isDigit) =>
        n.take(20).toLong
    }.filter(_ <= latest).sorted.lastOption
    val marks = scala.collection.mutable.HashMap[String, Long]()
    fromCheckpoint.foreach { cv =>
      val cp = spark.read.parquet(s"${logPath(table)}/${f"$cv%020d"}.checkpoint.parquet")
      if (cp.columns.contains("txn"))
        cp.where(col("txn").isNotNull).select(col("txn.appId"), col("txn.version"))
          .collect().foreach(r => marks(r.getString(0)) = r.getLong(1))
    }
    commitVersions.filter(_ > fromCheckpoint.getOrElse(-1L)).foreach { v =>
      spark.read.schema(StructType.fromDDL("txn STRUCT<appId: STRING, version: BIGINT>"))
        .json(s"${logPath(table)}/${f"$v%020d"}.json")
        .where(col("txn").isNotNull).select(col("txn.appId"), col("txn.version"))
        .collect().foreach { r =>
          val prev = marks.getOrElse(r.getString(0), Long.MinValue)
          marks(r.getString(0)) = math.max(prev, r.getLong(1))
        }
    }
    marks.toMap
  }

  /** The Delta table as a DataFrame at `version` (-1 = latest). Partition
    * columns are injected from the log's partitionValues and cast to their
    * declared types; column order follows the table schema. */
  def snapshot(spark: SparkSession, table: String, version: Long = -1L): DataFrame = {
    val snap = snapshotInfo(spark, table, version)
    val dataSchema = StructType(snap.schema.filterNot(f => snap.partitionColumns.contains(f.name)))
    if (snap.files.isEmpty)
      return spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], snap.schema)
    val data = spark.read.schema(dataSchema).parquet(snap.files.map(_.path): _*)
    if (snap.partitionColumns.isEmpty) data.select(snap.schema.map(f => col(f.name)): _*)
    else {
      // one scan for all files; per-file partition values attach via a
      // broadcast (normalized-path → values) join on input_file_name()
      import spark.implicits._
      val mapping = snap.files.map { f =>
        val norm = new org.apache.hadoop.fs.Path(f.path).toUri.getPath
        (norm, snap.partitionColumns.map(c => f.partitionValues.getOrElse(c, null)))
      }.toDF("__file", "__pvals")
      // normalize scheme+authority off the URI with codegen'd string ops
      // (no scalar UDF): "file:///a/b" and "file:/a/b" both → "/a/b".
      // Protect literal '+' (valid unencoded in URI paths, e.g. Hive-style
      // partition dirs from external writers) before url_decode, whose
      // form-urlencoded rules would corrupt it to a space and silently null
      // the partition values via the left join below.
      val keyed = data.withColumn("__file",
        url_decode(regexp_replace(
          regexp_replace(input_file_name(), "^[a-zA-Z0-9+.-]+:(//)?", ""),
          "\\+", "%2B")))
      val withParts = keyed.join(broadcast(mapping), Seq("__file"), "left")
      val cols = snap.schema.map { f =>
        if (snap.partitionColumns.contains(f.name))
          element_at(col("__pvals"), snap.partitionColumns.indexOf(f.name) + 1)
            .cast(f.dataType).as(f.name)
        else col(f.name)
      }
      withParts.select(cols: _*)
    }
  }
}
