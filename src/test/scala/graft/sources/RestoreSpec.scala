package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** RESTORE / rollback (Lake.restore): recovery to a prior version after a
  * bad write, with history preserved (Delta) / lineage truncated at the
  * target (Iceberg). */
class RestoreSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  private def rows(df: org.apache.spark.sql.DataFrame): Set[(Long, String)] =
    df.select(col("id"), col("name")).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet

  test("delta restore: undo bad append + DV delete; history preserved; re-add reclaimed files") {
    val t = tmp("restore_d") + "/tbl"
    DeltaWrite.append(spark, Seq((1L, "a"), (2L, "b")).toDF("id", "name"), t)
    val good = DeltaWrite.append(spark, Seq((3L, "c")).toDF("id", "name"), t)
    DeltaWrite.append(spark, Seq((666L, "bad")).toDF("id", "name"), t)
    DeltaWrite.deleteWhere(spark, t, col("id") === 1L) // bad DV delete too

    val v = DeltaWrite.restore(spark, t, good)
    assert(v === good + 3) // restore is a NEW commit on top
    assert(rows(DeltaRead.snapshot(spark, t)) === Set((1L, "a"), (2L, "b"), (3L, "c")))
    // time travel to the undone state still works (history preserved)
    assert(rows(DeltaRead.snapshot(spark, t, good + 1)) ===
      Set((1L, "a"), (2L, "b"), (3L, "c"), (666L, "bad")))
    // restoring to where we already are is a no-op
    assert(DeltaWrite.restore(spark, t, v) === v)
    // the table keeps working after restore
    DeltaWrite.append(spark, Seq((4L, "d")).toDF("id", "name"), t)
    assert(rows(DeltaRead.snapshot(spark, t)) ===
      Set((1L, "a"), (2L, "b"), (3L, "c"), (4L, "d")))
  }

  test("delta restore undoes schema evolution (metaData swapped back)") {
    val t = tmp("restore_ds") + "/tbl"
    val v0 = DeltaWrite.append(spark, Seq((1L, "a")).toDF("id", "name"), t)
    DeltaWrite.append(spark, Seq((2L, "b", 9.5)).toDF("id", "name", "score"), t,
      mergeSchema = true)
    DeltaWrite.restore(spark, t, v0)
    val snap = DeltaRead.snapshot(spark, t)
    assert(snap.schema.fieldNames.toSeq === Seq("id", "name"))
    assert(rows(snap) === Set((1L, "a")))
  }

  test("iceberg refs: tags pin snapshots, survive rollback, and block expiration") {
    val t = tmp("refs_i") + "/tbl"
    IcebergWrite.append(spark, Seq((1L, "a")).toDF("id", "name"), t)
    val v2 = IcebergWrite.append(spark, Seq((2L, "b")).toDF("id", "name"), t)
    val v3 = IcebergWrite.append(spark, Seq((3L, "c")).toDF("id", "name"), t)

    assert(IcebergWrite.setRef(spark, t, "train-run-1", v3) === v3)
    IcebergWrite.setRef(spark, t, "head", refType = "branch") // current = v3
    assert(IcebergRead.refs(spark, t) ===
      Map("train-run-1" -> ((v3, "tag")), "head" -> ((v3, "branch"))))
    assert(rows(IcebergRead.snapshotAtRef(spark, t, "train-run-1")) ===
      Set((1L, "a"), (2L, "b"), (3L, "c")))

    // rollback to v2: the tagged v3 stays in the metadata (still readable
    // by ref) even though the live head moved back
    IcebergWrite.rollback(spark, t, v2)
    assert(rows(IcebergRead.snapshot(spark, t)) === Set((1L, "a"), (2L, "b")))
    assert(rows(IcebergRead.snapshotAtRef(spark, t, "train-run-1")) ===
      Set((1L, "a"), (2L, "b"), (3L, "c")))

    // expiration keeps the tagged snapshot's files
    IcebergWrite.expireSnapshots(spark, t, retainLast = 1, minFileAgeMs = 0L)
    assert(rows(IcebergRead.snapshotAtRef(spark, t, "train-run-1")) ===
      Set((1L, "a"), (2L, "b"), (3L, "c")))

    // dropping the ref releases it: expiration can now reclaim
    IcebergWrite.dropRef(spark, t, "train-run-1")
    assert(!IcebergRead.refs(spark, t).contains("train-run-1"))
    IcebergWrite.expireSnapshots(spark, t, retainLast = 1, minFileAgeMs = 0L)
    intercept[Exception] { IcebergRead.snapshotAtRef(spark, t, "train-run-1") }
    // the live head is untouched throughout
    assert(rows(IcebergRead.snapshot(spark, t)) === Set((1L, "a"), (2L, "b")))
  }

  test("iceberg refs survive snapshot commits (append, delete, upsert, compact)") {
    // regression: the snapshot-commit metadata template once omitted the
    // refs map, so the first append after setRef silently dropped every pin
    val t = tmp("refs_surv") + "/tbl"
    IcebergWrite.append(spark, Seq((1L, "a")).toDF("id", "name"), t)
    val v1 = IcebergRead.refs(spark, t) // no refs yet
    assert(v1.isEmpty)
    IcebergWrite.setRef(spark, t, "pin", refType = "tag")
    IcebergWrite.append(spark, Seq((2L, "b")).toDF("id", "name"), t)
    assert(IcebergRead.refs(spark, t).contains("pin"), "append dropped refs")
    IcebergWrite.deleteWhere(spark, t, col("id") === 2L)
    assert(IcebergRead.refs(spark, t).contains("pin"), "deleteWhere dropped refs")
    IcebergWrite.upsert(spark, Seq((1L, "a2")).toDF("id", "name"), t, Seq("id"))
    assert(IcebergRead.refs(spark, t).contains("pin"), "upsert dropped refs")
    assert(rows(IcebergRead.snapshotAtRef(spark, t, "pin")) === Set((1L, "a")))
  }

  test("iceberg write-audit-publish: staged snapshot invisible until fastForward") {
    val t = tmp("wap_i") + "/tbl"
    IcebergWrite.append(spark, Seq((1L, "a")).toDF("id", "name"), t)
    val v1adds = IcebergRead.changesBetween(spark, t, 0L, 1L).count()

    // WRITE: stage on an audit branch — head, log, incremental all unmoved
    val staged = IcebergWrite.appendStaged(spark,
      Seq((2L, "b"), (3L, "c")).toDF("id", "name"), t, branch = "audit")
    assert(rows(IcebergRead.snapshot(spark, t)) === Set((1L, "a")),
      "staged write must not move the head")
    assert(IcebergRead.changesBetween(spark, t, 0L).count() === v1adds,
      "incremental consumers must not see the stage")

    // AUDIT: the branch read sees main + the staged rows
    assert(rows(IcebergRead.snapshotAtRef(spark, t, "audit")) ===
      Set((1L, "a"), (2L, "b"), (3L, "c")))
    // the branch ref protects the staged files from expiration mid-audit
    IcebergWrite.expireSnapshots(spark, t, retainLast = 1, minFileAgeMs = 0L)
    assert(rows(IcebergRead.snapshotAtRef(spark, t, "audit")) ===
      Set((1L, "a"), (2L, "b"), (3L, "c")))

    // PUBLISH: head fast-forwards, exactly one new commit appears
    assert(IcebergWrite.fastForward(spark, t, "audit") === staged)
    assert(rows(IcebergRead.snapshot(spark, t)) === Set((1L, "a"), (2L, "b"), (3L, "c")))
    assert(!IcebergRead.refs(spark, t).contains("audit"), "publish drops the branch")
    // post-publish appends continue normally
    IcebergWrite.append(spark, Seq((4L, "d")).toDF("id", "name"), t)
    assert(rows(IcebergRead.snapshot(spark, t)).size === 4)

    // STALE STAGE: main advances during the audit → publish refused
    IcebergWrite.appendStaged(spark, Seq((5L, "e")).toDF("id", "name"), t, "audit2")
    IcebergWrite.append(spark, Seq((6L, "f")).toDF("id", "name"), t)
    val ex = intercept[IllegalArgumentException](
      IcebergWrite.fastForward(spark, t, "audit2"))
    assert(ex.getMessage.contains("re-stage"))
    // abandoned stage: drop the branch, expiration reclaims it
    IcebergWrite.dropRef(spark, t, "audit2")
    assert(rows(IcebergRead.snapshot(spark, t)) ===
      Set((1L, "a"), (2L, "b"), (3L, "c"), (4L, "d"), (6L, "f")))

    // Lake dispatch: Iceberg passes through; Delta is refused loudly
    Lake.appendStaged(spark, Seq((7L, "g")).toDF("id", "name"), t, "audit3")
    assert(Lake.fastForward(spark, t, "audit3") > 0)
    assert(rows(IcebergRead.snapshot(spark, t)).size === 6)
    val d = tmp("wap_d") + "/tbl"
    DeltaWrite.append(spark, Seq((1L, "a")).toDF("id", "name"), d)
    intercept[IllegalArgumentException](
      Lake.appendStaged(spark, Seq((2L, "b")).toDF("id", "name"), d, "x"))
  }

  test("iceberg rollback: lineage truncated at target; appends continue; incremental reads consistent") {
    val t = tmp("restore_i") + "/tbl"
    IcebergWrite.append(spark, Seq((1L, "a")).toDF("id", "name"), t)
    val good = IcebergWrite.append(spark, Seq((2L, "b")).toDF("id", "name"), t)
    IcebergWrite.append(spark, Seq((666L, "bad")).toDF("id", "name"), t)

    assert(Lake.restore(spark, t, good) === good)
    assert(IcebergRead.currentSnapshotId(spark, t) === good)
    assert(rows(IcebergRead.snapshot(spark, t)) === Set((1L, "a"), (2L, "b")))
    // the dropped snapshot is gone from the lineage
    val hist = IcebergRead.history(spark, t).select(col("version"))
      .collect().map(_.getLong(0)).toSeq
    assert(!hist.contains(good + 1) && hist.last === good)

    // appends continue on the rolled-back lineage with fresh ids
    val next = IcebergWrite.append(spark, Seq((4L, "d")).toDF("id", "name"), t)
    assert(next > good)
    assert(rows(IcebergRead.snapshot(spark, t)) === Set((1L, "a"), (2L, "b"), (4L, "d")))
    // incremental range over the rollback boundary: only the new append
    assert(rows(IcebergRead.addsBetween(spark, t, good)) === Set((4L, "d")))
  }
}
