package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VectorOps

/** PERSISTED IVF vector index — the ANN lifecycle the in-memory tiers in
  * [[Similarity]] deliberately skip: train the coarse quantizer ONCE,
  * lay the corpus out on disk clustered by cell, then serve every future
  * query (and ingest every future batch) without touching the trained
  * structure. At 100 TB the index build is a multi-hour job; queries are
  * not allowed to repeat it, and a probe must read nProbe/nCells of the
  * data, not all of it.
  *
  * On-disk layout (plain parquet — readable by any engine):
  *   dir/centroids/    (cell INT, centroid ARRAY<DOUBLE>) — one tiny file
  *   dir/vectors/      cell=<c>/part-*.parquet (id, vec) — PARTITIONED
  *                     by cell, so a probe's cell subset prunes at the
  *                     DIRECTORY level (Spark partition pruning; no file
  *                     of an unprobed cell is ever opened)
  *
  * Scale shape: [[build]] is one k-means training (sample-able upstream),
  * one broadcast-centroid assignment pass, one shuffle by cell for the
  * clustered write. [[query]] broadcasts the O(nCells) centroid frame,
  * ranks cells per query map-side, collects only the probed CELL IDS to
  * the driver (≤ nCells ints — the surviving-file-list pattern), scans
  * the pruned partitions once, and bounds the shuffle to k rows per
  * query via the top-k window. [[add]] assigns new vectors with the
  * FROZEN quantizer and appends to the cell dirs — no rebuild, no
  * rewrite of existing data. */
object VectorIndex {

  /** Train nCells k-means centroids (deterministic seeded init, see
    * [[Similarity.kmeansCentroids]]), assign every corpus vector, write
    * the cell-clustered layout. Overwrites any index at `dir`.
    *
    * `format = "delta"` backs the vector store with a Delta table
    * instead of plain parquet: every [[add]] becomes an ATOMIC commit
    * (a crash mid-ingest can never leave a reader seeing half a batch),
    * concurrent adds serialize through optimistic commits, and the index
    * is VERSIONED — [[query]]'s `version` parameter answers from any
    * past state of the corpus (point-in-time ANN). Probe pruning is the
    * same: Delta's log-level partition pruning replaces the directory
    * skip. */
  def build(corpus: DataFrame, idCol: String, vecCol: String, dir: String,
      nCells: Int = 16, iters: Int = 5, format: String = "parquet"): Unit = {
    require(format == "parquet" || format == "delta",
      s"unsupported index format '$format' (parquet | delta)")
    val cents = Similarity.kmeansCentroids(corpus, idCol, vecCol, nCells, iters)
      .localCheckpoint()
    cents.coalesce(1).write.mode("overwrite").parquet(s"$dir/centroids")
    // a rebuild replaces the store outright (writeAssigned appends).
    // Hadoop-FS delete, NOT java.io.File: on HDFS/S3 a local-FS rm
    // silently no-ops and the rebuild would append fresh cells over the
    // stale store — a correctness hazard, not a perf one.
    val store = new org.apache.hadoop.fs.Path(s"$dir/vectors")
    val fs = store.getFileSystem(corpus.sparkSession.sparkContext.hadoopConfiguration)
    if (fs.exists(store)) fs.delete(store, true)
    writeAssigned(corpus.select(col(idCol), col(vecCol)), idCol, vecCol,
      cents, dir, format)
  }

  /** Incremental ingest: assign `batch` with the index's FROZEN
    * quantizer and append into the cell layout. Cheap by construction —
    * one broadcast assignment pass + an append-only clustered write;
    * nothing existing is read or rewritten. One atomic commit per batch
    * on a Delta-backed index. (Re-[[build]] when drift makes the frozen
    * centroids a bad fit.) */
  def add(spark: SparkSession, dir: String, batch: DataFrame,
      idCol: String, vecCol: String): Unit = {
    val format = graft.sources.Lake.detect(spark, s"$dir/vectors") match {
      case graft.sources.Lake.Delta => "delta"
      case _ => "parquet"
    }
    writeAssigned(batch.select(col(idCol), col(vecCol)), idCol, vecCol,
      spark.read.parquet(s"$dir/centroids"), dir, format)
  }

  /** Remove every indexed vector matching `pred` in ONE atomic commit —
    * the other half of the ingest lifecycle (revoked documents, GDPR
    * erasure, re-embedding a corpus slice before re-[[add]]). Dispatches
    * to the Delta store's MoR delete ([[graft.sources.DeltaWrite
    * .deleteWhere]]): matched rows get deletion-vector bitmaps, no data
    * file is rewritten, and probe pruning is untouched — the cell layout
    * never changes. Refused on a plain-parquet index (no transactional
    * delete exists there; rebuild instead, or build with
    * format="delta"). Returns the committed Delta version. */
  def removeWhere(spark: SparkSession, dir: String,
      pred: org.apache.spark.sql.Column): Long = {
    requireDelta(spark, dir, "removeWhere")
    graft.sources.DeltaWrite.deleteWhere(spark, s"$dir/vectors", pred)
  }

  /** [[removeWhere]] sugar for the common case: delete these vector ids. */
  def remove(spark: SparkSession, dir: String, ids: Seq[Long],
      idCol: String): Long =
    removeWhere(spark, dir, col(idCol).isin(ids.map(Long.box): _*))

  /** Idempotent ingest: assign `batch` with the FROZEN quantizer and
    * MERGE it into the Delta-backed store keyed on `idCol` — an id that
    * already exists is REPLACED (its old row DV-deleted and the new row
    * appended, one atomic commit — even when the new embedding lands in
    * a different cell), a new id is a plain insert. This is what makes
    * re-ingest safe: [[add]] is append-only and would silently duplicate
    * a re-embedded id inside its cell. Refused on plain parquet (no
    * keyed merge without a log). Returns the committed Delta version. */
  def upsert(spark: SparkSession, dir: String, batch: DataFrame,
      idCol: String, vecCol: String): Long = {
    requireDelta(spark, dir, "upsert")
    val cents = spark.read.parquet(s"$dir/centroids")
    val assigned = Similarity.assignCells(
        batch.select(col(idCol), col(vecCol)), vecCol, cents)
      .select(col(idCol), col(vecCol), col("__cell").as("cell"))
      .repartition(col("cell"))
    graft.sources.DeltaWrite.upsert(spark, assigned, s"$dir/vectors", Seq(idCol))
  }

  /** Pay down the small-file debt a stream of [[add]] batches accrues:
    * every ingest appends a few files per cell, so after N batches a
    * probe opens O(N) files per probed cell. Dispatches to the Delta
    * store's per-partition bin-pack ([[graft.sources.DeltaWrite
    * .compact]]): files merge only WITHIN their cell (the clustered
    * layout — and therefore probe pruning — is untouched), deletion
    * vectors from [[removeWhere]]/[[upsert]] are materialized away, the
    * rewrite is one atomic layout-only commit (dataChange=false, so
    * streaming readers skip it), and time travel still reaches
    * pre-compaction versions. Refused on plain parquet: a staged
    * directory swap has a torn-reader window no log can close there —
    * re-[[build]] instead (same IO, and the quantizer refresh is free).
    * Returns the committed Delta version. */
  def compact(spark: SparkSession, dir: String): Long = {
    requireDelta(spark, dir, "compact")
    graft.sources.DeltaWrite.compact(spark, s"$dir/vectors")
  }

  private def requireDelta(spark: SparkSession, dir: String, op: String): Unit =
    require(graft.sources.Lake.detect(spark, s"$dir/vectors") == graft.sources.Lake.Delta,
      s"$op needs a Delta-backed index (transactional keyed delete/merge); " +
        s"the index at $dir is plain parquet — rebuild with format=\"delta\"")

  private def writeAssigned(vecs: DataFrame, idCol: String, vecCol: String,
      cents: DataFrame, dir: String, format: String): Unit = {
    val assigned = Similarity.assignCells(vecs, vecCol, cents)
      .select(col(idCol), col(vecCol), col("__cell").as("cell"))
      .repartition(col("cell")) // few files per cell, not one per task
    if (format == "delta")
      graft.sources.DeltaWrite.append(vecs.sparkSession, assigned,
        s"$dir/vectors", partitionBy = Seq("cell"))
    else assigned.write.mode("append").partitionBy("cell").parquet(s"$dir/vectors")
  }

  /** Top-k cosine neighbors from the persisted index: per query the
    * nProbe closest cells by centroid cosine (ties toward the lower cell
    * id), then exact scoring INSIDE the probed cells only. Self-matches
    * (same id) excluded, matching [[Similarity.bruteForceTopK]]. With
    * nProbe ≥ nCells the result is exactly brute force. Output:
    * (vec_id, rank, nn_id, cosine). On a Delta-backed index `version`
    * time-travels the corpus (point-in-time ANN — "what were the
    * neighbors before yesterday's ingest"); refused on plain parquet. */
  def query(spark: SparkSession, dir: String, queries: DataFrame,
      idCol: String, vecCol: String, k: Int, nProbe: Int = 2,
      version: Long = -1L): DataFrame = {
    val cents = spark.read.parquet(s"$dir/centroids")
      .withColumn("cent_n", VectorOps.norm(col("centroid")))
    val q = queries
      .select(col(idCol).as("q_id"), VectorOps.asDouble(col(vecCol)).as("qv"))
      .withColumn("qn", VectorOps.norm(col("qv")))
      .repartition(spark.sparkContext.defaultParallelism)
    val wCell = Window.partitionBy(col("q_id"))
      .orderBy(col("cell_cos").desc, col("cell").asc)
    val probes = q.crossJoin(broadcast(cents))
      .select(col("q_id"), col("qv"), col("qn"), col("cell"),
        (VectorOps.dot(col("qv"), col("centroid")) / (col("qn") * col("cent_n")))
          .as("cell_cos"))
      .withColumn("cr", row_number().over(wCell))
      .where(col("cr") <= nProbe)
      .select(col("q_id"), col("qv"), col("qn"), col("cell"))
      .localCheckpoint() // consumed twice: probed-cell list + the join
    // driver-side metadata only: the union of probed cell ids (≤ nCells
    // ints) — the IN-list below is what Spark's partition pruning turns
    // into a directory-level skip of every unprobed cell
    val probedCells = probes.select(col("cell")).distinct()
      .collect().map(_.getInt(0)).sorted
    val probedSet = probedCells.map(_.toString).toSet
    val store = s"$dir/vectors"
    val scan = graft.sources.Lake.detect(spark, store) match {
      case graft.sources.Lake.Delta =>
        // log-level partition pruning (the keep callback sees the log's
        // partitionValues strings) — unprobed cells' files never listed
        graft.sources.DeltaRead.snapshotPruned(spark, store,
          pv => pv.get("cell").exists(probedSet), version)
      case _ =>
        require(version < 0,
          s"a plain-parquet index at $dir has no versions (asked for $version) — " +
            "build with format=\"delta\" for point-in-time queries")
        spark.read.parquet(store)
    }
    val members = scan
      .where(col("cell").isin(probedCells.map(Int.box): _*))
      .select(col("cell"), col(idCol).as("c_id"),
        VectorOps.asDouble(col(vecCol)).as("cv"))
      .withColumn("cn", VectorOps.norm(col("cv")))
    val w = Window.partitionBy(col("q_id")).orderBy(col("cosine").desc, col("c_id").asc)
    probes.join(members, Seq("cell"))
      .where(col("q_id") =!= col("c_id"))
      .select(col("q_id"), col("c_id"),
        (VectorOps.dot(col("qv"), col("cv")) / (col("qn") * col("cn"))).as("cosine"))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("q_id").as("vec_id"), col("rank"), col("c_id").as("nn_id"), col("cosine"))
  }
}
