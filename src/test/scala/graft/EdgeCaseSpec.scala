package graft

import org.apache.spark.sql.functions._
import graft.operators.{AsOfJoin, Dedup, Sessionize}

/** NULL-key and empty-input semantics (FIXTURES.md fixture 1 / SURVEY.md
  * §5.2 #2): the cases 100 TB pipelines hit constantly — null join keys,
  * NOT IN vs NOT EXISTS null-hostility, null ordering, empty partitions. */
class EdgeCaseSpec extends SparkSpec {
  import spark.implicits._

  private def left = Seq((Some(1), "a"), (None, "b"), (Some(3), "c"))
    .toDF("k", "lv")
  private def right = Seq((Some(1), "x"), (None, "y"))
    .toDF("rk", "rv")

  test("equi-join never matches NULL keys (3-valued logic)") {
    val joined = left.join(right, col("k") === col("rk"))
    assert(joined.count() === 1L) // only k=1; the two NULLs do NOT pair up
  }

  test("left outer join keeps NULL-key rows unmatched") {
    val lj = left.join(right, col("k") === col("rk"), "left")
    assert(lj.count() === 3L)
    assert(lj.where(col("rv").isNull).count() === 2L) // NULL-k and k=3
  }

  test("left_anti matches NOT EXISTS, not the NULL-hostile NOT IN") {
    val anti = left.join(right.select(col("rk").as("k")), Seq("k"), "left_anti")
    // NOT EXISTS semantics: NULL-key and k=3 survive
    assert(anti.count() === 2L)
    // NOT IN over a set containing NULL returns zero rows — the trap the
    // oracle rewrite in SURVEY §2.3 J5 exists to avoid:
    left.createOrReplaceTempView("edge_l")
    right.createOrReplaceTempView("edge_r")
    val notIn = spark.sql("SELECT * FROM edge_l WHERE k NOT IN (SELECT rk FROM edge_r)")
    assert(notIn.count() === 0L)
  }

  test("NULLS FIRST / NULLS LAST ordering is explicit and stable") {
    val first = left.orderBy(col("k").asc_nulls_first).select("lv").as[String].collect()
    val last = left.orderBy(col("k").asc_nulls_last).select("lv").as[String].collect()
    assert(first.head === "b")
    assert(last.last === "b")
  }

  test("as-of join on an empty right side returns no rows (inner)") {
    val l = Seq((1L, ts("2024-01-01 10:00:00"), "p")).toDF("k", "ts", "pid")
    val r = Seq.empty[(Long, java.sql.Timestamp, Long)].toDF("k", "rts", "sid")
    assert(AsOfJoin.asof(l, r, Seq("k"), "ts", "rts", Seq("sid")).count() === 0L)
  }

  test("sequence pattern on empty input / no stage-1 rows is empty, not an error") {
    import graft.operators.Patterns
    val empty = Seq.empty[(Long, java.sql.Timestamp, Long, String)].toDF("u", "ts", "id", "e")
    val stages = Seq("a" -> (col("e") === "a"), "b" -> (col("e") === "b"))
    assert(Patterns.sequenceMatches(empty, "u", "ts", "id", stages).count() === 0L)
    val noStage1 = Seq((1L, ts("2024-01-01 10:00:00"), 0L, "b")).toDF("u", "ts", "id", "e")
    assert(Patterns.sequenceMatches(noStage1, "u", "ts", "id", stages).count() === 0L)
  }

  test("SQ8 ANN on an empty corpus is empty, not an error") {
    import graft.operators.Similarity
    val empty = Seq.empty[(Long, Array[Float])].toDF("vec_id", "embedding")
    assert(Similarity.sqTopK(empty, empty, "vec_id", "embedding", k = 3).count() === 0L)
  }

  test("lake fileStats/scanPruned on an all-deleted table are empty, not an error") {
    import graft.sources.{DeltaRead, DeltaWrite}
    val table = java.nio.file.Files.createTempDirectory("edge_stats").toString + "/tbl"
    DeltaWrite.append(spark, Seq((1L, 1L)).toDF("id", "v"), table)
    DeltaWrite.overwrite(spark, Seq.empty[(Long, Long)].toDF("id", "v"), table)
    assert(DeltaRead.fileStats(spark, table).count() === 0L)
    val (df, hit, total) = DeltaRead.scanPruned(spark, table, col("id") === 1L)
    assert(hit === 0L && total === 0L && df.count() === 0L)
  }

  test("sessionize on empty input yields zero sessions") {
    val e = Seq.empty[(Long, java.sql.Timestamp, Long)].toDF("user_id", "ts", "event_id")
    val n = Sessionize.sessionCount(e, "user_id", "ts", "event_id", 1L).as[Option[Long]].head()
    assert(n.getOrElse(0L) === 0L) // sum over empty is NULL → zero sessions
  }

  test("minhash near-dup on empty and sub-shingle corpora is empty, not an error") {
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    assert(Dedup.minhashNearDupPairs(empty, "doc_id", "text", 0.5).count() === 0L)
    val tiny = Seq((1L, "a b"), (2L, "c")).toDF("doc_id", "text") // < 3 tokens
    assert(Dedup.minhashNearDupPairs(tiny, "doc_id", "text", 0.5).count() === 0L)
  }

  test("connected components of an empty / self-loop-only edge set is empty") {
    val empty = Seq.empty[(Long, Long)].toDF("id_a", "id_b")
    assert(Dedup.connectedComponents(empty).count() === 0L)
    val selfOnly = Seq((3L, 3L), (7L, 7L)).toDF("id_a", "id_b")
    assert(Dedup.connectedComponents(selfOnly).count() === 0L)
  }

  test("dropNearDuplicates with no near-dups returns the corpus unchanged") {
    val docs = Seq(
      (1L, "completely unique first text about volcanoes and rivers flowing"),
      (2L, "unrelated second document concerning compiler optimization passes")
    ).toDF("doc_id", "text")
    assert(graft.operators.Dedup.dropNearDuplicates(docs, "doc_id", "text", 0.8).count() === 2L)
  }

  test("bloom-pruned join against an EMPTY dim matches the plain join (empty)") {
    import graft.operators.BloomOps
    val fact = Seq((1L, "a"), (2L, "b")).toDF("fk", "v")
    val dim = Seq.empty[(Long, String)].toDF("dk", "w")
    // bloom over zero rows is NULL; might_contain(NULL, x) is NULL → filter
    // drops every row — exactly what the real join would return
    assert(BloomOps.bloomPrunedJoin(fact, dim, "fk", "dk").count() === 0L)
  }

  test("S2 malformed-row policies: PERMISSIVE nulls, DROPMALFORMED drops, FAILFAST throws") {
    val dir = java.nio.file.Files.createTempDirectory("graft_malformed")
    java.nio.file.Files.writeString(dir.resolve("rows.csv"),
      "id,qty\n1,10\n2,notanumber\n3,30\n")
    val schema = org.apache.spark.sql.types.StructType.fromDDL("id INT, qty INT")
    def read(mode: String) = spark.read
      .option("header", "true").option("mode", mode).schema(schema).csv(dir.toString)

    // PERMISSIVE: malformed field parses to NULL, row count preserved
    val permissive = read("PERMISSIVE").collect()
    assert(permissive.length === 3)
    assert(permissive.count(_.isNullAt(1)) === 1)
    // DROPMALFORMED: the bad row disappears. NB: count() would prune every
    // column, parse nothing, and judge no row malformed — collect() forces
    // the full parse.
    assert(read("DROPMALFORMED").collect().length === 2)
    // FAILFAST: the bad row aborts the job
    val e = intercept[org.apache.spark.SparkException](read("FAILFAST").collect())
    assert(e.getMessage.contains("Malformed") || e.getCause != null)
  }

  test("round-4 operators survive empty inputs") {
    import graft.operators.{FreqSketch, FuzzyJoin, Profile, Quality, TimeSeries}
    val emptyStr = Seq.empty[String].toDF("item")
    assert(FreqSketch.heavyHitters(emptyStr, "item", 10).count() === 0L)
    assert(FuzzyJoin.editDistanceJoin(emptyStr.withColumnRenamed("item", "w"), "w",
      Seq("abc").toDF("w"), "w", 1).count() === 0L)

    // profile of an empty frame still emits a row per column (all-zero/null)
    val emptyNum = Seq.empty[(Long, Double)].toDF("k", "v")
    val prof = Profile.numeric(emptyNum, Seq("k")).collect()
    assert(prof.length === 1)
    assert(prof.head.getLong(1) === 0L && prof.head.getLong(2) === 0L &&
      prof.head.getLong(3) === 0L && prof.head.isNullAt(4))

    // constraint audit of an empty frame: zero violations, zero total, passed
    val q = Quality.check(emptyNum, Seq(Quality.NotNull("k"), Quality.Unique("k"))).collect()
    assert(q.length === 2 && q.forall(r => r.getLong(1) == 0L && r.getLong(2) == 0L))

    // gap fill with nothing observed: full grid, zero counts, all-null fill
    val keys = Seq("a").toDF("key")
    val cal = Seq(1, 2).toDF("bucket")
    val obs = Seq.empty[(String, Int, Long, Double)].toDF("key", "bucket", "cnt", "m")
    val filled = TimeSeries.gapFill(keys, cal, obs, Seq("key"), "bucket",
      zeroFill = Map("cnt" -> lit(0L)), forwardFill = Seq("m"))
      .orderBy("bucket").collect()
    assert(filled.length === 2)
    assert(filled.forall(r => r.getLong(2) == 0L && r.isNullAt(3)))
  }

  test("S3 JSON schema-on-read: missing fields are NULL, corrupt lines isolated") {
    val dir = java.nio.file.Files.createTempDirectory("graft_jsonl")
    java.nio.file.Files.writeString(dir.resolve("rows.jsonl"),
      """{"id": 1, "name": "a"}
        |{"id": 2}
        |this is not json
        |""".stripMargin)
    val schema = org.apache.spark.sql.types.StructType
      .fromDDL("id INT, name STRING, _corrupt_record STRING")
    val rows = spark.read.schema(schema).json(dir.toString)
      .select($"id", $"name", $"_corrupt_record".isNotNull.as("corrupt"))
      .orderBy($"id".asc_nulls_last).collect()
    assert(rows.length === 3)
    assert(rows(0).getInt(0) === 1 && rows(0).getString(1) === "a")
    assert(rows(1).getInt(0) === 2 && rows(1).isNullAt(1))
    assert(rows(2).isNullAt(0) && rows(2).getBoolean(2)) // corrupt line captured
  }

  test("extractHtmlText propagates NULL and keeps empty strings empty") {
    val rows = Seq((1L, Some("<p>x</p>")), (2L, None), (3L, Some("")))
      .toDF("id", "h")
      .select($"id", graft.functions.TextFunctions.extractHtmlText($"h").as("t"))
      .orderBy($"id").collect()
    assert(rows(0).getString(1) === "x")
    assert(rows(1).isNullAt(1)) // null in → null out, never a crash or ""
    assert(rows(2).getString(1) === "")
  }

  test("semantic and span dedup are identities on empty and span-free input") {
    val empty = Seq.empty[(Long, Array[Float], Int)].toDF("id", "v", "cell")
    assert(Dedup.semanticDedup(empty, "id", "v", "cell", 0.9).count() === 0L)
    val docs = Seq((1L, "alpha beta gamma delta"), (2L, "one two three four"))
      .toDF("id", "text")
    val kept = graft.operators.Contamination
      .dropSharedSpanDocs(docs, "id", "text", n = 3, minSpanTokens = 3)
      .select("id").as[Long].collect().toSet
    assert(kept === Set(1L, 2L)) // no shared span → nothing dropped
    val emptyDocs = Seq.empty[(Long, String)].toDF("id", "text")
    assert(graft.operators.Contamination
      .dropSharedSpanDocs(emptyDocs, "id", "text", 3, 3).count() === 0L)
  }
}
