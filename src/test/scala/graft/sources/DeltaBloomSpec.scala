package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Persisted per-file bloom sketches in Delta add.stats (the extended
  * `graftBloom` key): opt-in via ALTER TABLE … SET BLOOM FILTER, written by
  * every staging path, probed by scanPruned for =/IN where a hash layout
  * makes [min,max] useless. */
class DeltaBloomSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  test("blooms persist in the log and prune point/IN probes on a hash layout") {
    val t = tmp("graft_dbloom") + "/tbl"
    val src = (1L to 4000L).map(i => (i, s"K$i", i * 1.5)).toDF("id", "ks", "v")
      .repartition(8, col("id")) // hash layout: every file spans the domain
    DeltaWrite.append(spark, src.limit(0), t)
    Lake.sql(spark, s"ALTER TABLE '$t' SET BLOOM FILTER (ks)")
    DeltaWrite.append(spark, src, t)

    // the sketches are IN the add actions' stats JSON
    val withBloom = DeltaRead.snapshotInfo(spark, t).files
      .count(_.stats.exists(_.contains("graftBloom")))
    assert(withBloom === 8, "every staged file carries a sketch")

    // point probe: interval pruning alone keeps all 8 (min≤v≤max in every
    // file); the bloom cuts to the 1 file actually holding the key
    val (df, kept, total) = DeltaRead.scanPruned(spark, t, col("ks") === "K1234")
    assert(total === 8L)
    assert(kept < total, s"bloom did not prune: kept $kept of $total")
    assert(df.select("id").as[Long].collect().toSeq === Seq(1234L))

    // absent key: typically 0 files survive (false positives allowed)
    val (dfa, keptA, _) = DeltaRead.scanPruned(spark, t, col("ks") === "K-nope")
    assert(keptA <= 1L)
    assert(dfa.count() === 0L)

    // IN over present + absent keys stays exact
    val (dfi, keptI, _) = DeltaRead.scanPruned(spark, t,
      col("ks").isin("K7", "K3999", "K-ghost"))
    assert(keptI < 8L)
    assert(dfi.select("id").as[Long].collect().sorted.toSeq === Seq(7L, 3999L))

    // EXPLAIN FILES reports the cut for statement-text consumers
    Lake.registerSqlSurface(spark)
    val ef = Lake.sqlFrame(spark,
      s"EXPLAIN FILES SELECT id FROM '$t' WHERE ks = 'K1234'").collect().head
    assert(ef.getLong(1) < ef.getLong(2),
      s"EXPLAIN FILES shows no prune: ${ef.mkString(",")}")

    // pre-opt-in files keep NULL sketches → conservative keep, never wrong
    val t2 = tmp("graft_dbloom2") + "/tbl"
    DeltaWrite.append(spark, src, t2) // data BEFORE the opt-in
    Lake.sql(spark, s"ALTER TABLE '$t2' SET BLOOM FILTER (ks)")
    DeltaWrite.append(spark, Seq((9999L, "K9999", 1.0)).toDF("id", "ks", "v"), t2)
    val (df2, kept2, total2) = DeltaRead.scanPruned(spark, t2, col("ks") === "K42")
    assert(total2 === 9L && kept2 >= 8L, "old sketch-less files must survive")
    assert(df2.select("id").as[Long].collect().toSeq === Seq(42L))

    // OPTIMIZE rewrites old files WITH sketches (the backfill path)
    Lake.sql(spark, s"OPTIMIZE '$t2'")
    val rewritten = DeltaRead.snapshotInfo(spark, t2).files
    assert(rewritten.forall(_.stats.exists(_.contains("graftBloom"))),
      "compaction must backfill sketches on rewritten files")
  }

  test("iceberg: sidecar blooms prune point/IN probes on a hash layout") {
    val t = tmp("graft_ibloom") + "/tbl"
    val src = (1L to 4000L).map(i => (i, s"K$i", i * 1.5)).toDF("id", "ks", "v")
      .repartition(8, col("id"))
    IcebergWrite.append(spark, src.limit(0), t) // schema-only seed
    Lake.sql(spark, s"ALTER TABLE '$t' SET BLOOM FILTER (ks)")
    IcebergWrite.append(spark, src, t)
    assert(IcebergRead.bloomSidecars(t).size === 8,
      "every staged file needs a sidecar sketch")
    val (df, kept, total) = IcebergRead.scanPruned(spark, t, col("ks") === "K1234")
    assert(total === 8L)
    assert(kept < total, s"sidecar bloom did not prune: kept $kept of $total")
    assert(df.select("id").as[Long].collect().toSeq === Seq(1234L))
    // absent key ~0 files; IN stays exact
    val (dfi, keptI, _) = IcebergRead.scanPruned(spark, t,
      col("ks").isin("K7", "K3999", "K-ghost"))
    assert(keptI < 8L)
    assert(dfi.select("id").as[Long].collect().sorted.toSeq === Seq(7L, 3999L))
    // the property survives data commits (carried verbatim)
    IcebergWrite.append(spark, Seq((9999L, "K9999", 0.0)).toDF("id", "ks", "v"), t)
    assert(IcebergRead.tableProperties(spark, t)
      .get("graft.bloom.columns").contains("ks"))

    // sidecar GC: an overwrite orphans every old file; expiring the old
    // snapshots (FORCE = no age grace) reclaims them AND their sketches
    IcebergWrite.overwrite(spark,
      Seq((1L, "K1", 1.0)).toDF("id", "ks", "v"), t)
    val entriesBefore = IcebergRead.bloomSidecars(t).size
    IcebergWrite.expireSnapshots(spark, t, retainLast = 1, minFileAgeMs = 0L)
    val after = IcebergRead.bloomSidecars(t)
    assert(after.size < entriesBefore,
      s"sidecar GC dropped nothing ($entriesBefore -> ${after.size})")
    // the surviving entries all reference live files
    assert(after.keys.forall(p => new java.io.File(p).exists()))
    // and the live table still prunes through what remains
    val (df2, kept2, total2) = IcebergRead.scanPruned(spark, t, col("ks") === "K1")
    assert(df2.count() === 1L && kept2 <= total2)
  }

  test("join-derived pruning probes blooms through a small dim key SET") {
    // hash layout: every fact file's [min,max] on ks spans the domain, so
    // the old BETWEEN probe keeps all 8 — the dim's ≤256-key IN probe
    // engages the per-file sketches and cuts to the matching files
    val root = tmp("graft_dbloom_jdp")
    val fact = (1L to 4000L).map(i => (i, s"K$i", i * 1.5)).toDF("id", "ks", "v")
      .repartition(8, col("id"))
    DeltaWrite.append(spark, fact.limit(0), s"$root/fact")
    Lake.sql(spark, s"ALTER TABLE '$root/fact' SET BLOOM FILTER (ks)")
    DeltaWrite.append(spark, fact, s"$root/fact")
    DeltaWrite.append(spark,
      Seq(("K7", "a"), ("K3999", "b")).toDF("ks", "tag"), s"$root/dim")
    val stmt = s"""SELECT f.id, d.tag FROM '$root/fact' f
        JOIN '$root/dim' d ON f.ks = d.ks"""
    val ef = Lake.sqlFrame(spark, s"EXPLAIN FILES $stmt").collect()
      .map(r => r.getString(0).split('/').last -> ((r.getLong(1), r.getLong(2))))
      .toMap
    val (opened, total) = ef("fact")
    assert(total === 8L)
    assert(opened <= 2L, s"join-derived bloom prune did not fire: $opened/8")
    // results identical to the plain API join
    val got = Lake.sqlFrame(spark, stmt).orderBy("id")
      .as[(Long, String)].collect().toSeq
    assert(got === Seq((7L, "a"), (3999L, "b")))
  }
}
