package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    // args: sfDir outDir [queryName...] — names filter to a subset for fast
    // local iteration; the driver's two-arg call runs everything.
    val (sfDir, outDir) = (args(0), args(1))
    val filter = args.drop(2).toSet
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = GraftSession.builder(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      // NOTE: keep the INT96 default for written timestamps — DuckDB reads
      // INT96 as naive (session-local) TIMESTAMP, matching the oracle's
      // TIMESTAMP type; TIMESTAMP_MICROS is flagged UTC-adjusted and would
      // surface as TIMESTAMPTZ ("+00:00") in the compare.
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    val selected =
      if (filter.isEmpty) SparkEntry.queries
      else SparkEntry.queries.view.filterKeys(filter).toMap
    selected.foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .filter { case (k, _) => filter.isEmpty || filter(k) }
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    // Input-data fingerprint (per-table post-load schema + row count + the
    // run's wall-clock): round 7 shipped a CORRECTNESS artifact that was a
    // byte-copy of round 6's, measured against data that no longer existed.
    // Any two verify outputs over different fixture drops now differ
    // visibly, and a re-run over identical data still differs by run_at.
    val fp = Tables.names.map { n =>
      val (schemaStr, cnt) =
        try { val df = Tables(spark, sfDir, n); (df.schema.simpleString, df.count()) }
        catch { case e: Throwable => (s"UNREADABLE: ${e.getMessage}", -1L) }
      s"${q(n)}: {${q("schema")}: ${q(schemaStr)}, ${q("rows")}: $cnt}"
    }.mkString(
      s"""{${q("sf_dir")}: ${q(sfDir)}, ${q("run_at")}: ${q(java.time.Instant.now.toString)}, ${q("tables")}: {""",
      ",", "}}")
    Files.writeString(Paths.get(s"$outDir/data_fingerprint.json"), fp)
    spark.stop()
  }
}
