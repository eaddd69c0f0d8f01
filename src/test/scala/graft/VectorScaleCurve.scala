package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._

import graft.operators.VectorIndex

/** Ad-hoc persisted-vector-index scaling probe (not part of the suite):
  * the lifecycle treatment the lake layer got in LakeScaleCurve. Axes,
  * each backing a SCALING.md claim with a measurement:
  *
  *   - CORPUS axis (2k → 80k vectors, d=64, nCells=16): `build` should
  *     grow linearly (k-means passes + one clustered write), `add` of a
  *     FIXED 1k batch should stay flat (append-only ingest never reads
  *     the existing store), and a fixed query panel's cost should track
  *     the probed fraction of the corpus, not all of it.
  *   - PROBE axis (nProbe 1 → nCells): for a SINGLE query the store
  *     files actually opened by the probe job — read from the executed
  *     plan's scan metrics (`numFiles`), not inferred — should be
  *     ≈ (nProbe/nCells) × total store files; a 64-query panel's union
  *     legitimately approaches the full store (batch amortization: the
  *     pruned scan reads the UNION of every query's cells once).
  *
  * Corpus growth rotates each base embedding by k positions per copy —
  * norm-preserving, so cell populations stay balanced and the timing
  * axis is size, not skew.
  *
  * Run: sbt "Test/runMain graft.VectorScaleCurve [parquet|delta]"
  */
object VectorScaleCurve {

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString + "/idx"

  private def time[A](label: String, fmt: String, n: Long)(body: => A): A = {
    val t0 = System.nanoTime()
    val r = body
    println(f"VECCURVE $label%-24s fmt=$fmt%-7s n=$n%6d  " +
      f"${(System.nanoTime() - t0) / 1e9}%7.2fs")
    r
  }

  /** Files the executed plan's parquet scans actually read (post-run
    * `numFiles` metric), summed over every scan in the plan — the
    * centroids file rides along (+1), the store scan dominates. */
  private def filesRead(df: DataFrame): Long = {
    def scans(p: org.apache.spark.sql.execution.SparkPlan): Seq[FileSourceScanExec] =
      p match {
        case a: AdaptiveSparkPlanExec => scans(a.executedPlan)
        // AQE wraps materialized stages as LEAVES — children is Nil, the
        // real subtree hangs off .plan
        case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => scans(q.plan)
        case r: org.apache.spark.sql.execution.exchange.ReusedExchangeExec => scans(r.child)
        case f: FileSourceScanExec => Seq(f)
        case other =>
          other.children.flatMap(scans) ++
            other.subqueries.flatMap(scans)
      }
    scans(df.queryExecution.executedPlan)
      .map(s => s.metrics.get("numFiles").map(_.value).getOrElse(0L)).sum
  }

  /** k rotated copies of the base corpus (ids offset per copy). */
  private def grow(base: DataFrame, factor: Int, n: Long): DataFrame = {
    if (factor <= 1) return base
    val copies = (1 until factor).map { k =>
      val r = (k % 63) + 1 // rotation, never 0 → every copy is distinct
      base.select((col("vec_id") + lit(k.toLong * n)).as("vec_id"),
        concat(slice(col("embedding"), r + 1, 64 - r),
          slice(col("embedding"), 1, r)).as("embedding"))
    }
    copies.foldLeft(base)(_ unionAll _)
  }

  /** Per-top-level-column COMPRESSED bytes across every parquet file of
    * the store, summed from the footers' column-chunk metadata — the
    * exact, static measure of what a column-pruned scan reads (task
    * inputMetrics under-report on the local-FS scheme and would only
    * muddy the claim). Nested paths (codes.list.element) roll up to
    * their root column. */
  private def columnBytes(spark: SparkSession, dir: String): Map[String, Long] = {
    val root = new org.apache.hadoop.fs.Path(dir)
    val conf = spark.sparkContext.hadoopConfiguration
    val fs = root.getFileSystem(conf)
    val files = scala.collection.mutable.ArrayBuffer.empty[org.apache.hadoop.fs.Path]
    val it = fs.listFiles(root, true)
    while (it.hasNext) {
      val f = it.next().getPath
      if (f.getName.endsWith(".parquet") && !f.toString.contains("_delta_log"))
        files += f
    }
    import scala.jdk.CollectionConverters._
    files.flatMap { f =>
      val r = org.apache.parquet.hadoop.ParquetFileReader.open(
        org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(f, conf))
      try r.getFooter.getBlocks.asScala.flatMap(_.getColumns.asScala.map { c =>
        c.getPath.toDotString.split('.').head -> c.getTotalSize
      }).toList
      finally r.close()
    }.groupBy(_._1).map { case (k, v) => k -> v.map(_._2).sum }
  }

  def main(args: Array[String]): Unit = {
    val formats = if (args.nonEmpty) args.toSeq else Seq("parquet", "delta")
    val spark = GraftSession.create()
    spark.sparkContext.setLogLevel("ERROR")
    val nCells = 16
    val base = Tables(spark, "/root/testdata/sf0.1", "embeddings")
      .select(col("vec_id"), col("embedding"))
    val nBase = base.count()
    val panel = base.where(col("vec_id") % 31 === 0).limit(64)
      .localCheckpoint() // fixed 64-query panel at every tier
    val one = panel.limit(1).localCheckpoint()

    for (fmt <- formats; factor <- Seq(1, 4, 16, 40)) {
      val n = nBase * factor
      val corpus = grow(base, factor, nBase).localCheckpoint()
      val dir = tmp(s"graft_veccurve_${fmt}_$n")

      time("build", fmt, n) {
        VectorIndex.build(corpus, "vec_id", "embedding", dir,
          nCells = nCells, format = fmt)
      }
      time("add_1k_batch", fmt, n) {
        val batch = base.limit(1000)
          .select((col("vec_id") + lit(10000000L)).as("vec_id"), col("embedding"))
        VectorIndex.add(spark, dir, batch, "vec_id", "embedding")
      }
      val storeFiles = {
        val p = new org.apache.hadoop.fs.Path(s"$dir/vectors")
        val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
        val it = fs.listFiles(p, true)
        var c = 0
        while (it.hasNext) {
          val f = it.next().getPath.toString
          if (f.endsWith(".parquet") && !f.contains("_delta_log")) c += 1
        }
        c
      }
      for (nProbe <- Seq(1, 4, nCells)) {
        val q1 = VectorIndex.query(spark, dir, one, "vec_id", "embedding",
          k = 10, nProbe = nProbe)
        // execute q1's OWN QueryExecution: count() would plan a separate
        // aggregate and leave this plan's scan metrics at zero
        q1.collect()
        println(f"VECCURVE files_1q_np$nProbe%02d          fmt=$fmt%-7s n=$n%6d  " +
          f"${filesRead(q1)}%4d of $storeFiles%4d store files")
      }
      for (nProbe <- Seq(1, 4, nCells)) {
        time(f"query64_nprobe_$nProbe%02d", fmt, n) {
          VectorIndex.query(spark, dir, panel, "vec_id", "embedding",
            k = 10, nProbe = nProbe).count()
        }
      }

      // PQ axis (delta tiers only — one format suffices for the IO claim):
      // probe BYTES for the same 64-query panel at nProbe=4, float path vs
      // the codes-only ADC phase, plus end-to-end queryPq wall time. The
      // ADC phase is measured alone (adcShortlist) because that is the
      // part whose IO the codes cut; queryPq's re-rank adds the shortlist
      // vector fetch on top.
      if (fmt == "delta") {
        val pdir = tmp(s"graft_veccurve_pq_$n")
        time("build_pq_m16", fmt, n) {
          VectorIndex.build(corpus, "vec_id", "embedding", pdir,
            nCells = nCells, format = fmt, pqM = 16, pqCodes = 16)
        }
        // probe-IO claim from the STORE LAYOUT itself: per-cell, an ADC
        // probe reads the (id, codes) column chunks where the float path
        // reads (id, embedding) — the footers say exactly how many bytes
        // each is (same files, same probed cells, so the per-cell ratio
        // IS the probe-IO ratio)
        val cb = columnBytes(spark, s"$pdir/vectors")
        val idB = cb.getOrElse("vec_id", 0L)
        val adcBytes = idB + cb.getOrElse("codes", 0L)
        val floatBytes = idB + cb.getOrElse("embedding", 0L)
        println(f"VECCURVE pq_probe_bytes       fmt=$fmt%-7s n=$n%6d  " +
          f"adc=${adcBytes / 1024}%8dKiB float=${floatBytes / 1024}%8dKiB " +
          f"ratio=${floatBytes.toDouble / math.max(1, adcBytes)}%5.1fx")
        time("querypq64_nprobe_04", fmt, n) {
          VectorIndex.queryPq(spark, pdir, panel, "vec_id", "embedding",
            k = 10, nProbe = 4, shortlist = 50).count()
        }
      }
    }
    spark.stop()
  }
}
