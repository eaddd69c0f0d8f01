package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.execution.datasources.PartitionedFile
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.types.StructType

/** [[ParquetFileFormat]] over MANIFEST-RECORDED file sizes with a PER-FILE
  * task-time verification (round-20 hardening of the round-19
  * trust-but-verify probe, guide §6).
  *
  * [[Bridge.parquetScanDf]] builds its FileIndex from the table format's
  * recorded (path, size) pairs — zero plan-time filesystem calls. Splits
  * are carved from the RECORDED length, and a parquet split only emits row
  * groups whose midpoint falls inside it: a file whose real length exceeds
  * its recorded length would silently lose its tail row groups. The plan-
  * time probe stats ONE file per scan (catching writers that lie
  * uniformly); this class closes the rest of the gap — each task stats ITS
  * OWN file (executor-side, parallel, one `getFileStatus` per split — the
  * driver still makes zero calls and no listing job exists) and, on a
  * mismatch, SELF-HEALS the split instead of truncating or failing:
  *
  *   - real > recorded: the tail split (the one ending at the recorded
  *     length) extends to the real end, so the previously uncovered row
  *     groups are emitted by exactly one task;
  *   - real < recorded: every split clamps to the real end (row-group
  *     midpoints all precede it, so coverage is unchanged) and splits
  *     lying entirely past it return empty;
  *   - either way the corrected `fileSize` is what the footer reader sees,
  *     so footer location never works off the lie.
  *
  * Boundaries of non-tail splits never move, so each row group keeps
  * exactly one owner — no duplication, no loss. A mismatch logs loudly.
  *
  * `conf` is a PER-CONTEXT broadcast (Bridge memoizes it): a raw
  * SerializableConfiguration captured in the reader closure would ship —
  * and deserialize — the full Hadoop Configuration with EVERY task binary
  * (measured 3–6× wall on the chunked routed scans). */
class VerifiedParquetFileFormat(
    conf: org.apache.spark.broadcast.Broadcast[org.apache.spark.util.SerializableConfiguration])
    extends ParquetFileFormat {

  override def buildReaderWithPartitionValues(
      sparkSession: org.apache.spark.sql.SparkSession,
      dataSchema: StructType,
      partitionSchema: StructType,
      requiredSchema: StructType,
      filters: Seq[org.apache.spark.sql.sources.Filter],
      options: Map[String, String],
      hadoopConf: org.apache.hadoop.conf.Configuration)
      : PartitionedFile => Iterator[InternalRow] = {
    val inner = super.buildReaderWithPartitionValues(sparkSession, dataSchema,
      partitionSchema, requiredSchema, filters, options, hadoopConf)
    file => {
      val recorded = file.fileSize
      val real = scala.util.Try {
        val p = file.toPath
        p.getFileSystem(conf.value.value).getFileStatus(p).getLen
      }.getOrElse(recorded) // stat failure: proceed as recorded (the read
      //                       itself will surface a genuinely missing file)
      if (real == recorded) inner(file)
      else {
        logWarning(s"recorded size of ${file.filePath} is $recorded but the " +
          s"file is $real bytes — correcting this task's split " +
          s"[${file.start}, ${file.start + file.length})")
        if (file.start >= real) Iterator.empty
        else {
          val isTail = file.start + file.length >= recorded
          val end =
            if (real > recorded) { if (isTail) real else file.start + file.length }
            else math.min(file.start + file.length, real)
          inner(file.copy(length = end - file.start, fileSize = real))
        }
      }
    }
  }
}
