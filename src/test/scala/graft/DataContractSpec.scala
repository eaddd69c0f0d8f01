package graft

import org.apache.spark.sql.types._

/** DATA-CONTRACT CANARY. The graded fixtures under /root/testdata have been
  * regenerated mid-build before (round 7: every timestamp column flipped
  * from its old physical type to `timestamp[us] isAdjustedToUTC=false`,
  * which Spark 4 infers as TIMESTAMP_NTZ), silently breaking 21 queries.
  * This spec pins the engine's POST-LOAD invariants — what every operator
  * downstream of [[Tables]] is allowed to assume — so any future drift
  * fails loudly here within the hour, not as 21 scattered analysis errors:
  *
  *   - every event-time column surfaces as `TimestampType` (never NTZ,
  *     never a raw long), per [[Tables.normalizeTimestamps]];
  *   - row counts per SF match TESTDATA.md (a content regen would also
  *     invalidate pinned constants, e.g. the l3 ANN recall gates).
  */
class DataContractSpec extends SparkSpec {

  private val expectedRows = Map(
    // sf0.001
    (sf001, "region") -> 5L, (sf001, "nation") -> 25L,
    (sf001, "customer") -> 150L, (sf001, "supplier") -> 10L,
    (sf001, "part") -> 200L, (sf001, "orders") -> 1500L,
    (sf001, "lineitem") -> 6000L, (sf001, "events") -> 1000L,
    (sf001, "documents") -> 500L, (sf001, "embeddings") -> 500L,
    // sf0.01 (the driver's verify SF)
    (sf01, "region") -> 5L, (sf01, "nation") -> 25L,
    (sf01, "customer") -> 1500L, (sf01, "supplier") -> 100L,
    (sf01, "part") -> 2000L, (sf01, "orders") -> 15000L,
    (sf01, "lineitem") -> 60000L, (sf01, "events") -> 10000L,
    (sf01, "documents") -> 500L, (sf01, "embeddings") -> 500L)

  test("post-load timestamp contract: TimestampType everywhere, no NTZ, no raw-long ts") {
    for (dir <- Seq(sf001, sf01); name <- Tables.names) {
      val schema = Tables(spark, dir, name).schema
      schema.fields.foreach { f =>
        assert(f.dataType != TimestampNTZType,
          s"$dir/$name.${f.name} surfaced as TIMESTAMP_NTZ — Tables.normalizeTimestamps regressed")
        assert(!(f.dataType == LongType && f.name == "ts"),
          s"$dir/$name.ts surfaced as raw long — ns→µs conversion regressed")
      }
    }
    val ev = Tables(spark, sf001, "events").schema
    assert(ev("ts").dataType == TimestampType)
    assert(Tables(spark, sf001, "orders").schema("o_orderdate").dataType == TimestampType)
    assert(Tables(spark, sf001, "lineitem").schema("l_shipdate").dataType == TimestampType)
  }

  test("fixture row counts match TESTDATA.md at sf0.001 and sf0.01") {
    expectedRows.foreach { case ((dir, name), n) =>
      val got = Tables(spark, dir, name).count()
      assert(got == n, s"$dir/$name: expected $n rows, got $got — fixtures regenerated?")
    }
  }

  test("streaming events source surfaces ts as TimestampType") {
    val s = streaming.StreamOps.eventsStream(spark, sf001).schema
    assert(s("ts").dataType == TimestampType,
      s"streaming ts is ${s("ts").dataType} — stream-side normalization regressed")
  }
}
