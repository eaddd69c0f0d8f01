package graft.streaming

import graft.sources.{DeltaRead, IcebergRead}
import org.apache.spark.sql.{DataFrame, SQLContext, SparkSession}
import org.apache.spark.sql.connector.read.streaming.{Offset => V2Offset, ReadLimit, SupportsTriggerAvailableNow}
import org.apache.spark.sql.execution.streaming.{Offset => V1Offset, Source}
import org.apache.spark.sql.graft.StreamingShims
import org.apache.spark.sql.sources.{DataSourceRegister, StreamSourceProvider}
import org.apache.spark.sql.types.{StructField, StructType}

/** STREAMING SOURCES over the open lake formats — the read-side twin of
  * [[StreamOps.deltaSink]]/[[StreamOps.icebergSink]]: a Structured
  * Streaming query can now TAIL a Delta or Iceberg table that any engine
  * (including our own sinks) is writing, with offsets checkpointed by the
  * streaming engine itself.
  *
  * Semantics (the same contract as stock Delta's streaming source):
  *   - batch 0 (fresh checkpoint) emits the table's CURRENT SNAPSHOT —
  *     one scan of the live files at the pinned version;
  *   - every later batch emits `addsBetween(lastVersion, newVersion)` —
  *     one scan of ONLY the newly-added files, O(increment) not O(table);
  *   - commits that REMOVE data (overwrite, delete) make adds-only
  *     tailing ambiguous and fail the stream unless `ignoreChanges=true`
  *     (re-added rows may then re-surface; dedup downstream) — layout-only
  *     compaction commits are skipped silently, so table maintenance never
  *     disturbs consumers;
  *   - offsets are LONGS in the engine's checkpoint (Delta: the version;
  *     Iceberg: the snapshot id, whose ORDER is resolved against the
  *     table's commit lineage at read time, never by id arithmetic) —
  *     restart recovery replays or resumes exactly, no rows lost or
  *     doubled (exactly-once up to the sink's own guarantees).
  *
  * Scale: `getOffset` is a driver-side metadata poll (O(log tail /
  *  snapshot list)); per-batch cost is the files the batch admits. At
  * 100 TB a day's tail is a day's files — the table's size never enters.
  *
  * Wiring: v1 `StreamSourceProvider` (the stable public extension point
  * for driver-planned file sources; registered in
  * META-INF/services/...DataSourceRegister as `graft-delta` /
  * `graft-iceberg`) + one `private[sql]` shim
  * ([[StreamingShims.asStreamingBatch]]) to satisfy `getBatch`'s
  * isStreaming contract. Use via
  * `spark.readStream.format("graft-delta").load(path)` or the
  * [[LakeSources.delta]]/[[LakeSources.iceberg]] helpers.
  */
object LakeSources {

  /** Tail a Delta table: `spark.readStream.format("graft-delta")`.
    * `maxVersionsPerBatch` bounds how many commits one micro-batch may
    * admit (admission control — see [[LakeSourceBase]]). */
  def delta(spark: SparkSession, table: String,
      ignoreChanges: Boolean = false,
      maxVersionsPerBatch: Option[Int] = None): DataFrame = {
    val r = spark.readStream.format(classOf[DeltaStreamSourceProvider].getName)
      .option("ignoreChanges", ignoreChanges.toString)
    maxVersionsPerBatch.foreach(m => r.option("maxVersionsPerBatch", m.toString))
    r.load(table)
  }

  /** Tail an Iceberg table: `spark.readStream.format("graft-iceberg")`. */
  def iceberg(spark: SparkSession, table: String,
      ignoreChanges: Boolean = false,
      maxVersionsPerBatch: Option[Int] = None): DataFrame = {
    val r = spark.readStream.format(classOf[IcebergStreamSourceProvider].getName)
      .option("ignoreChanges", ignoreChanges.toString)
    maxVersionsPerBatch.foreach(m => r.option("maxVersionsPerBatch", m.toString))
    r.load(table)
  }

  /** Tail a Delta table as a CHANGELOG stream: every micro-batch carries
    * the table's columns plus `_change_type` ('insert' | 'delete') from
    * [[graft.sources.DeltaRead.changesBetween]] — so ANY commit mix
    * (appends, DV deletes, overwrites, upserts) streams through where the
    * adds-only tail refuses. Batch 0 emits the current snapshot as
    * inserts (the same seed convention as `Lake.sync`). Feed it to
    * `foreachBatch(Lake.applyChanges(...))` for a continuously-maintained
    * downstream materialized view, in either lake format. */
  def deltaChangelog(spark: SparkSession, table: String): DataFrame =
    spark.readStream.format(classOf[DeltaStreamSourceProvider].getName)
      .option("changelog", "true")
      .load(table)

  /** Iceberg twin of [[deltaChangelog]]. */
  def icebergChangelog(spark: SparkSession, table: String): DataFrame =
    spark.readStream.format(classOf[IcebergStreamSourceProvider].getName)
      .option("changelog", "true")
      .load(table)

  private[streaming] def path(parameters: Map[String, String]): String =
    parameters.getOrElse("path", throw new IllegalArgumentException(
      "lake streaming source needs a table path: .load(path) or .option(\"path\", ...)"))

  private[streaming] def ignore(parameters: Map[String, String]): Boolean =
    parameters.get("ignorechanges").orElse(parameters.get("ignoreChanges"))
      .exists(_.equalsIgnoreCase("true"))

  private[streaming] def changelog(parameters: Map[String, String]): Boolean =
    parameters.get("changelog").exists(_.equalsIgnoreCase("true"))

  private[streaming] def maxVersions(parameters: Map[String, String]): Option[Int] =
    parameters.get("maxversionsperbatch").orElse(parameters.get("maxVersionsPerBatch"))
      .map { v =>
        val n = v.toInt
        require(n > 0, s"maxVersionsPerBatch must be > 0, got $n")
        n
      }

  private[streaming] val ChangeTypeField =
    StructField("_change_type", org.apache.spark.sql.types.StringType)
}

/** Offset plumbing shared by the two lake sources: a metadata-poll
  * `latestAvailable` drives both the v1 `getOffset` and the
  * admission-control `latestOffset`, and [[SupportsTriggerAvailableNow]]
  * pins the poll at trigger start so `Trigger.AvailableNow` drains exactly
  * the commits that existed when the trigger fired (without this the
  * engine falls back to single-batch execution with a warning).
  *
  * ADMISSION CONTROL (`maxVersionsPerBatch`): a stream restarting far
  * behind the table head would otherwise plan ONE batch over the whole
  * backlog — at 100 TB that is a week of commits in a single shuffle,
  * exactly the state-blowup stock sources bound with maxFilesPerTrigger.
  * With a cap, each planned batch admits at most n commits past the last
  * planned end; the engine keeps planning batches until the head (or the
  * AvailableNow pin) is reached. The v1 `getOffset` carries no start, so
  * the source persists its last PLANNED end in its engine-assigned
  * `metadataPath` (that dir exists precisely for source-private state) —
  * the cap survives restarts. The file is best-effort: a torn/missing read
  * degrades to one uncapped batch (deliver, never stall), and because the
  * recorded end is at most one cap ahead of the checkpointed start, a
  * crash between planning and commit bounds the catch-up batch at 2×cap.
  * Batch 0's snapshot seed is one scan of the live files and is not
  * version-cappable (it has no version range); it is planned uncapped. */
private[streaming] trait LakeSourceBase extends Source with SupportsTriggerAvailableNow {
  protected def spark: SparkSession
  protected def metadataPath: String
  protected def maxPerBatch: Option[Int]
  /** Newest committed offset value, or None before the first commit. */
  protected def latestAvailable(): Option[Long]
  /** Offset at most `n` commits after `from` in commit order, clamped to
    * `to` (format-specific: version arithmetic vs snapshot lineage). */
  protected def advance(from: Long, n: Int, to: Long): Long
  /** The batch over (start, end] — start None = initial snapshot seed. */
  protected def buildBatch(start: Option[Long], end: Long): DataFrame

  @volatile private var pinned: Option[Long] = None
  @volatile private var lastPlannedEnd: Option[Long] = None

  private lazy val posFile = new org.apache.hadoop.fs.Path(metadataPath, "graft-last-end")
  private lazy val posFs = posFile.getFileSystem(spark.sessionState.newHadoopConf())
  private def readPos(): Option[Long] =
    try {
      if (metadataPath.isEmpty || !posFs.exists(posFile)) None
      else { val in = posFs.open(posFile); try Some(in.readLong()) finally in.close() }
    } catch { case _: Throwable => None }
  private def writePos(v: Long): Unit =
    if (metadataPath.nonEmpty)
      try { val out = posFs.create(posFile, true); try out.writeLong(v) finally out.close() }
      catch { case _: Throwable => () } // best-effort; cap degrades, stream lives

  private def cappedEnd(latest: Long, start: Option[Long]): Long =
    (maxPerBatch, start.orElse(lastPlannedEnd).orElse(readPos())) match {
      case (Some(n), Some(from)) => advance(from, n, latest)
      case _ => latest // uncapped, or batch 0's snapshot seed
    }

  override def prepareForTriggerAvailableNow(): Unit = pinned = latestAvailable()

  override def getOffset: Option[V1Offset] =
    latestAvailable().map(l => StreamingShims.longOffset(cappedEnd(l, None)))

  override def latestOffset(start: V2Offset, limit: ReadLimit): V2Offset = {
    val s = Option(start).collect { case o: V1Offset => StreamingShims.offsetValue(o) }
    pinned.orElse(latestAvailable())
      .map(l => StreamingShims.longOffset(cappedEnd(l, s))).orNull
  }

  final override def getBatch(start: Option[V1Offset], end: V1Offset): DataFrame = {
    val endV = StreamingShims.offsetValue(end)
    if (maxPerBatch.isDefined && !lastPlannedEnd.contains(endV)) {
      lastPlannedEnd = Some(endV)
      writePos(endV)
    }
    StreamingShims.asStreamingBatch(buildBatch(start.map(StreamingShims.offsetValue), endV))
  }

  override def stop(): Unit = ()
}

class DeltaStreamSourceProvider extends StreamSourceProvider with DataSourceRegister {
  override def shortName(): String = "graft-delta"

  override def sourceSchema(sqlContext: SQLContext, schema: Option[StructType],
      providerName: String, parameters: Map[String, String]): (String, StructType) =
    (shortName(), schema.getOrElse {
      val base = DeltaRead.snapshot(sqlContext.sparkSession, LakeSources.path(parameters)).schema
      if (LakeSources.changelog(parameters)) StructType(base :+ LakeSources.ChangeTypeField)
      else base
    })

  override def createSource(sqlContext: SQLContext, metadataPath: String,
      schema: Option[StructType], providerName: String,
      parameters: Map[String, String]): Source =
    new DeltaStreamSource(sqlContext.sparkSession,
      LakeSources.path(parameters), LakeSources.ignore(parameters),
      LakeSources.changelog(parameters), metadataPath,
      LakeSources.maxVersions(parameters))
}

/** v1 Source tailing a Delta table; offset = log version. In `changelog`
  * mode batches are [[DeltaRead.changesBetween]] rows (+ `_change_type`),
  * so any commit mix streams through. */
class DeltaStreamSource(protected val spark: SparkSession, table: String,
    ignoreChanges: Boolean, changelog: Boolean = false,
    protected val metadataPath: String = "",
    protected val maxPerBatch: Option[Int] = None) extends LakeSourceBase {

  override val schema: StructType = {
    val base = DeltaRead.snapshot(spark, table).schema
    if (changelog) StructType(base :+ LakeSources.ChangeTypeField) else base
  }

  // Metadata-only poll; None before the table's first commit exists.
  override protected def latestAvailable(): Option[Long] =
    scala.util.Try(DeltaRead.snapshotInfo(spark, table).version).toOption

  // Delta versions are consecutive longs: plain arithmetic.
  override protected def advance(from: Long, n: Int, to: Long): Long =
    math.min(from + n, to)

  override protected def buildBatch(start: Option[Long], end: Long): DataFrame = {
    import org.apache.spark.sql.functions.lit
    start match {
      case None if changelog =>
        DeltaRead.snapshot(spark, table, end).withColumn("_change_type", lit("insert"))
      case None => DeltaRead.snapshot(spark, table, end)
      case Some(startV) if startV == end =>
        spark.createDataFrame(java.util.Collections.emptyList[org.apache.spark.sql.Row](),
          schema)
      case Some(startV) if changelog =>
        DeltaRead.changesBetween(spark, table, startV, end)
      case Some(startV) =>
        DeltaRead.addsBetween(spark, table, startV, end, ignoreChanges)
    }
  }
}

class IcebergStreamSourceProvider extends StreamSourceProvider with DataSourceRegister {
  override def shortName(): String = "graft-iceberg"

  override def sourceSchema(sqlContext: SQLContext, schema: Option[StructType],
      providerName: String, parameters: Map[String, String]): (String, StructType) =
    (shortName(), schema.getOrElse {
      val base = IcebergRead.snapshot(sqlContext.sparkSession, LakeSources.path(parameters)).schema
      if (LakeSources.changelog(parameters)) StructType(base :+ LakeSources.ChangeTypeField)
      else base
    })

  override def createSource(sqlContext: SQLContext, metadataPath: String,
      schema: Option[StructType], providerName: String,
      parameters: Map[String, String]): Source =
    new IcebergStreamSource(sqlContext.sparkSession,
      LakeSources.path(parameters), LakeSources.ignore(parameters),
      LakeSources.changelog(parameters), metadataPath,
      LakeSources.maxVersions(parameters))
}

/** v1 Source tailing an Iceberg table; offset = snapshot id (stable across
  * snapshot expiration, unlike a log index — the engine only compares
  * offsets for equality, and [[IcebergRead.addsBetween]] resolves the
  * (from, to] range against the table's commit lineage). */
class IcebergStreamSource(protected val spark: SparkSession, table: String,
    ignoreChanges: Boolean, changelog: Boolean = false,
    protected val metadataPath: String = "",
    protected val maxPerBatch: Option[Int] = None) extends LakeSourceBase {

  override val schema: StructType = {
    val base = IcebergRead.snapshot(spark, table).schema
    if (changelog) StructType(base :+ LakeSources.ChangeTypeField) else base
  }

  override protected def latestAvailable(): Option[Long] =
    scala.util.Try(IcebergRead.currentSnapshotId(spark, table)).toOption
      .filter(_ >= 0)

  // Snapshot ids are not ordered — resolve "n commits later" in lineage.
  override protected def advance(from: Long, n: Int, to: Long): Long =
    IcebergRead.advanceSnapshot(spark, table, from, n, to)

  override protected def buildBatch(start: Option[Long], end: Long): DataFrame = {
    import org.apache.spark.sql.functions.lit
    start match {
      case None if changelog =>
        IcebergRead.snapshot(spark, table, end).withColumn("_change_type", lit("insert"))
      case None => IcebergRead.snapshot(spark, table, end)
      case Some(startId) if startId == end =>
        spark.createDataFrame(java.util.Collections.emptyList[org.apache.spark.sql.Row](),
          schema)
      case Some(startId) if changelog =>
        IcebergRead.changesBetween(spark, table, startId, end)
      case Some(startId) =>
        IcebergRead.addsBetween(spark, table, startId, end, ignoreChanges)
    }
  }
}
