package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Delta per-file stats (add.stats JSON) + DeltaRead.fileStats/scanPruned:
  * write-side collection, decode, pruned scans, DV interplay, checkpoint
  * survival. */
class DeltaStatsSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(p: String) = java.nio.file.Files.createTempDirectory(p).toString + "/tbl"

  test("append records stats; fileStats decodes them per file") {
    val table = tmp("delta_stats")
    val df = (1L to 400L).map(i => (i, s"n$i", i * 1.5)).toDF("id", "name", "x")
      .repartitionByRange(4, col("id")).sortWithinPartitions(col("id"))
    DeltaWrite.append(spark, df, table)

    val st = DeltaRead.fileStats(spark, table).orderBy(col("min_id"))
    assert(st.count() === 4L)
    assert(st.agg(sum(col("rows"))).head().getLong(0) === 400L)
    assert(st.head().getAs[Long]("min_id") === 1L)
    assert(st.head().getAs[Long]("nulls_id") === 0L)
    val ranges = st.select(col("min_id"), col("max_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(ranges.sliding(2).forall { case Array((_, h1), (l2, _)) => h1 < l2; case _ => true })
  }

  test("timestamp stats keep full microseconds (ISO round trip)") {
    val table = tmp("delta_stats_ts")
    val t0 = java.sql.Timestamp.valueOf("2024-01-15 10:30:00.123456")
    DeltaWrite.append(spark, Seq((1L, t0)).toDF("id", "ts"), table)
    val st = DeltaRead.fileStats(spark, table)
    assert(st.head().getAs[java.sql.Timestamp]("max_ts") === t0)
  }

  test("scanPruned reads only surviving files, exact parity") {
    val table = tmp("delta_prune")
    val df = (1L to 1000L).map(i => (i, i * 2.0)).toDF("id", "v")
      .repartitionByRange(8, col("id")).sortWithinPartitions(col("id"))
    DeltaWrite.append(spark, df, table)

    val (top, hit, total) = DeltaRead.scanPruned(spark, table, col("id") > 875L)
    assert(total === 8L)
    assert(hit <= 2L, s"top-eighth range should touch ≤2 of $total files, hit $hit")
    assert(top.count() === 125L)

    val (point, hitP, _) = DeltaRead.scanPruned(spark, table, col("id") === 500L)
    assert(hitP === 1L)
    assert(point.select(col("v")).head().getDouble(0) === 1000.0)
  }

  test("stats-pruned scan still applies deletion vectors") {
    val table = tmp("delta_prune_dv")
    val df = (1L to 100L).map(i => (i, s"r$i")).toDF("id", "s")
      .repartitionByRange(4, col("id")).sortWithinPartitions(col("id"))
    DeltaWrite.append(spark, df, table)
    DeltaWrite.deleteWhere(spark, table, col("id") % 10L === 0L)

    val (pruned, hit, total) = DeltaRead.scanPruned(spark, table, col("id") > 50L)
    assert(hit < total)
    assert(pruned.count() === 45L) // 51..100 minus 60,70,80,90,100
  }

  test("partition values prune as degenerate intervals") {
    val table = tmp("delta_part_stats")
    DeltaWrite.append(spark,
      ((1L to 40L).map(i => ("x", i)) ++ (41L to 80L).map(i => ("y", i)))
        .toDF("grp", "id"), table, Seq("grp"))
    val (df, hit, total) = DeltaRead.scanPruned(spark, table, col("grp") === "y")
    assert(hit < total, s"partition predicate should prune ($hit of $total)")
    assert(df.count() === 40L)
    // combined partition + data-column predicate prunes on both
    val (df2, hit2, _) = DeltaRead.scanPruned(spark, table,
      col("grp") === "y" && col("id") > 100L)
    assert(hit2 === 0L && df2.count() === 0L)
  }

  test("stats survive a checkpoint replay") {
    val table = tmp("delta_stats_cp")
    DeltaWrite.append(spark,
      (1L to 200L).map(i => (i, i)).toDF("id", "v")
        .repartitionByRange(2, col("id")).sortWithinPartitions(col("id")), table)
    DeltaWrite.checkpoint(spark, table)
    DeltaWrite.append(spark,
      (201L to 300L).map(i => (i, i)).toDF("id", "v"), table)

    // checkpoint-era files AND post-checkpoint files both carry bounds
    val st = DeltaRead.fileStats(spark, table)
    assert(st.where(col("min_id").isNull).count() === 0L)
    val (df, hit, total) = DeltaRead.scanPruned(spark, table, col("id") <= 100L)
    assert(hit < total)
    assert(df.count() === 100L)
  }
}
