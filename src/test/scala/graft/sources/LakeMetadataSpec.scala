package graft.sources

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Metadata-only row counts and partition summaries (SURVEY.md §2.15
  * S12m): exactness against the data, DV subtraction, fallback and
  * refusal edges the oracled query can't reach. */
class LakeMetadataSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(p: String) = java.nio.file.Files.createTempDirectory(p).toString + "/tbl"

  private def sample = (0L until 300L)
    .map(i => (i, i % 3, s"r$i")).toDF("id", "p", "s")

  test("fileSkipRejects memoization rolls with the table version") {
    // round-19 optimization: the reject set caches on (path, version,
    // predicate). A commit must produce a NEW key — the cache can never
    // serve a reject set that misses files a later append made prunable.
    val t = tmp("lm_skiprej")
    IcebergWrite.append(spark,
      (0L until 100L).map(i => (i, s"r$i")).toDF("id", "s").coalesce(1), t)
    val pred = col("id") >= 1000L
    val before = Lake.fileSkipRejects(spark, t, pred)
    assert(before.size === 1, "the only file (ids 0..99) must be rejected for id >= 1000")
    assert(Lake.fileSkipRejects(spark, t, pred) === before, "same version: stable")
    // new commit, file with matching ids: its file must NOT be rejected,
    // and the pre-commit cache entry must not be served
    IcebergWrite.append(spark,
      (2000L until 2100L).map(i => (i, s"r$i")).toDF("id", "s").coalesce(1), t)
    val after = Lake.fileSkipRejects(spark, t, pred)
    assert(after === before,
      s"after the append exactly the old file still rejects: $after")
    assert(IcebergRead.fileStats(spark, t).count() === 2L)
  }

  test("DV expansion memoizes per descriptor; a new DELETE commit rolls the key") {
    // round-20 optimization: routed queries on a DV-carrying table used to
    // re-read + re-decode the same immutable blobs once per masked chunk
    // per execution. The memo keys on the descriptor (immutable content
    // address), so a second query re-reads nothing and a commit that
    // changes a mask necessarily changes its key.
    val t = tmp("lm_dvmemo")
    DeltaWrite.append(spark,
      (0L until 200L).map(i => (i, i % 7, s"r$i")).toDF("id", "p", "s"),
      t, partitionBy = Seq("bucket(4, id)"))
    DeltaWrite.deleteWhere(spark, t, col("id") % 10 === 0)
    def descs = Lake.bucketLayoutMoR(spark, t, "id").get._3
      .asInstanceOf[LayoutDeletes.Dv].byPath
    val d1 = descs
    assert(d1.nonEmpty)
    val (p0, desc0) = d1.head
    val first = DeletionVectors.expandedPositions(t, desc0)
    // same descriptor: the SAME array instance comes back — no blob
    // re-read, no re-decode
    assert(DeletionVectors.expandedPositions(t, desc0) eq first)
    // routed results stay correct across repeated executions (chunks all
    // hit the memo)
    val stmt = s"SELECT count(*) AS n FROM '$t'"
    val n1 = Lake.sqlFrame(spark, stmt).head.getLong(0)
    assert(n1 === Lake.sqlFrame(spark, stmt).head.getLong(0))
    assert(n1 === 180L)
    // a NEW DELETE on the same file merges masks under a NEW descriptor —
    // the stale entry is unreachable by key construction
    DeltaWrite.deleteWhere(spark, t, col("id") % 10 === 1)
    val d2 = descs
    assert(d2(p0) !== desc0, "a changed mask must carry a new descriptor")
    val merged = DeletionVectors.expandedPositions(t, d2(p0))
    assert(merged.length > first.length)
    assert(Lake.sqlFrame(spark, stmt).head.getLong(0) === 160L)
  }

  test("rowCount from metadata matches the data on both formats; DVs subtract") {
    val d = tmp("lm_delta")
    DeltaWrite.append(spark, sample, d, partitionBy = Seq("p"))
    assert(Lake.rowCount(spark, d) === ((300L, true)))
    DeltaWrite.deleteWhere(spark, d, col("id") % 10 === 0L)
    assert(Lake.rowCount(spark, d) === ((270L, true)),
      "DV cardinalities must subtract without a scan")
    assert(DeltaRead.snapshot(spark, d).count() === 270L)

    val i = tmp("lm_ice")
    IcebergWrite.append(spark, sample, i, Seq("p"))
    assert(Lake.rowCount(spark, i) === ((300L, true)))
    // live position deletes make metadata inexact → counting-scan fallback
    IcebergWrite.deleteWhere(spark, i, col("id") < 30L)
    assert(Lake.rowCount(spark, i) === ((270L, false)),
      "Iceberg with live deletes must fall back to a scan")
    // compaction materializes the deletes → metadata is exact again
    IcebergWrite.compact(spark, i, smallFileBytes = Long.MaxValue)
    assert(Lake.rowCount(spark, i) === ((270L, true)))
  }

  test("partitionSummary matches a data group-by; refusals where inexact") {
    val d = tmp("lm_psum_delta")
    DeltaWrite.append(spark, sample, d, partitionBy = Seq("p"))
    DeltaWrite.deleteWhere(spark, d, col("p") === 1L && col("id") < 100L)
    val got = Lake.partitionSummary(spark, d)
      .select(col("partition"), col("n_rows"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val want = DeltaRead.snapshot(spark, d).groupBy(col("p")).count()
      .collect().map(r => s"p=${r.getLong(0)}" -> r.getLong(1)).toMap
    assert(got === want)
    assert(got.values.sum === Lake.rowCount(spark, d)._1)

    val i = tmp("lm_psum_ice")
    IcebergWrite.append(spark, sample, i, Seq("p"))
    IcebergWrite.deleteWhere(spark, i, col("id") < 30L)
    intercept[IllegalArgumentException](Lake.partitionSummary(spark, i))

    val pq = tmp("lm_psum_parquet")
    sample.write.parquet(pq)
    intercept[IllegalArgumentException](Lake.partitionSummary(spark, pq))
    assert(Lake.rowCount(spark, pq) === ((300L, false)),
      "plain parquet counts by scanning")
  }

  test("SQL surface: SHOW PARTITIONS and SELECT COUNT(*) dispatch to metadata") {
    val d = tmp("lm_sql")
    DeltaWrite.append(spark, sample, d, partitionBy = Seq("p"))
    DeltaWrite.deleteWhere(spark, d, col("id") % 10 === 0L)
    val parts = Lake.sqlFrame(spark, s"SHOW PARTITIONS '$d'")
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(parts.keySet === Set("p=0", "p=1", "p=2") && parts.values.sum === 270L)
    val cnt = Lake.sqlFrame(spark, s"SELECT COUNT(*) FROM '$d'").head()
    assert(cnt.getLong(0) === 270L && cnt.getBoolean(1) === true)
  }

  test("unpartitioned tables summarize as one '' partition") {
    val d = tmp("lm_unpart")
    DeltaWrite.append(spark, sample, d)
    val rows = Lake.partitionSummary(spark, d).collect()
    assert(rows.length === 1 && rows.head.getString(0) === "" &&
      rows.head.getLong(2) === 300L)
    val i = tmp("lm_unpart_ice")
    IcebergWrite.append(spark, sample, i)
    val irows = Lake.partitionSummary(spark, i).collect()
    assert(irows.length === 1 && irows.head.getString(0) === "" &&
      irows.head.getLong(2) === 300L)
  }
}
