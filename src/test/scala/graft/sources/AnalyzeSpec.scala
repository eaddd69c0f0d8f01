package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** ANALYZE TABLE: one-pass persisted table/column statistics (rows, bytes,
  * NDV, null counts) riding each format's own metadata, and the
  * delegated-SQL broadcast gate they make principled — a big table with a
  * selective equality filter broadcasts where the raw file-size threshold
  * says shuffle. */
class AnalyzeSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  test("ANALYZE persists rows/bytes/NDV per format and survives later commits") {
    for (fmt <- Seq("delta", "iceberg")) {
      val t = tmp(s"graft_analyze_$fmt") + "/tbl"
      val df = (1L to 1000L).map(i => (i, i % 10, s"s${i % 97}")).toDF("id", "m", "s")
      if (fmt == "delta") DeltaWrite.append(spark, df, t)
      else IcebergWrite.append(spark, df, t)
      Lake.sql(spark, s"ANALYZE TABLE '$t' COMPUTE STATISTICS")
      val st = Lake.tableStats(spark, t).getOrElse(fail(s"$fmt: no stats"))
      assert(st.rows === 1000L, fmt)
      assert(st.bytes > 0L, fmt)
      assert(st.ndv("id") > 900L && st.ndv("id") < 1100L, s"$fmt: ${st.ndv}")
      assert(st.ndv("m") === 10L, fmt)
      assert(st.nulls("id") === 0L, fmt)
      // stats survive a later data commit (properties/config carry), but
      // are version-stale — the consumer checks the stamped version
      val head = st.version
      if (fmt == "delta") DeltaWrite.append(spark, df, t)
      else IcebergWrite.append(spark, df, t)
      val st2 = Lake.tableStats(spark, t).getOrElse(fail(s"$fmt: stats dropped"))
      assert(st2.rows === 1000L && st2.version === head, fmt)
      // observability TVF: table-level '*' row + one row per column
      Lake.registerSqlSurface(spark)
      val rows = spark.sql(s"SELECT * FROM lake_table_stats('$t')").collect()
      assert(rows.exists(r => r.getString(0) == "*" && r.getLong(1) == 1000L), fmt)
      assert(rows.exists(r => r.getString(0) == "m" && r.getLong(1) == 10L), fmt)
    }
  }

  test("ANALYZE TABLE resolves a bare name under USE") {
    val root = tmp("graft_analyze_use")
    DeltaWrite.append(spark, Seq((1L, 2.0)).toDF("id", "v"), s"$root/ev")
    Lake.sql(spark, s"USE '$root'")
    try {
      Lake.sql(spark, "ANALYZE TABLE ev COMPUTE STATISTICS")
      assert(Lake.tableStats(spark, s"$root/ev").exists(_.rows == 1L))
    } finally Lake.sql(spark, "USE DEFAULT")
  }

  test("stats flip a delegated join to broadcast where file size says shuffle") {
    val root = tmp("graft_analyze_bhj")
    // both sides bigger than the 4 MB session autoBroadcast threshold,
    // incompressible (hashed keys + random doubles) so file size ≈ data
    def big(path: String): Unit =
      DeltaWrite.append(spark,
        spark.range(700000).select(xxhash64(col("id")).as("k"),
          rand(7).as("v")),
        path)
    big(s"$root/fact")
    big(s"$root/dim")
    val hconf = spark.sparkContext.hadoopConfiguration
    def bytesOf(p: String): Long = Lake.read(spark, p).inputFiles.map { f =>
      val hp = new org.apache.hadoop.fs.Path(f)
      hp.getFileSystem(hconf).getFileStatus(hp).getLen
    }.sum
    assert(bytesOf(s"$root/dim") > 4L * 1024 * 1024, "fixture too small for the test")
    val someKey = Lake.read(spark, s"$root/dim").select("k").head().getLong(0)
    val stmt = s"""SELECT count(*) AS c, round(sum(f.v + d.v), 2) AS s
        FROM '$root/fact' f JOIN '$root/dim' d ON f.k = d.k
        WHERE d.k = ${someKey}L"""

    // BEFORE: both scans exceed the threshold, no NDV knowledge → shuffle
    val before = Lake.sqlFrame(spark, stmt)
    val planBefore = before.queryExecution.executedPlan.toString
    assert(!planBefore.contains("BroadcastHashJoin"), planBefore.take(2000))
    val rowBefore = before.collect().head

    // AFTER: dim's equality conjunct × NDV(k) estimates ~1 row → broadcast
    Lake.sql(spark, s"ANALYZE TABLE '$root/dim'")
    val after = Lake.sqlFrame(spark, stmt)
    val rowAfter = after.collect().head // finalize the AQE plan first
    val planAfter = after.queryExecution.executedPlan.toString
    assert(planAfter.contains("BroadcastHashJoin"), planAfter.take(2000))
    assert(rowAfter === rowBefore) // a hint never changes results

    // staleness guard: a write after ANALYZE withdraws the hint
    DeltaWrite.append(spark,
      spark.range(5).select(xxhash64(col("id") + 999).as("k"), rand(3).as("v")),
      s"$root/dim")
    val stale = Lake.sqlFrame(spark, stmt)
    assert(!stale.queryExecution.executedPlan.toString.contains("BroadcastHashJoin"))
  }
}
