package graft

import org.apache.spark.sql.DataFrame
import graft.queries.{BenchQueries, SqlQueries}

/** SURVEY.md §7.1: the DataFrame builders and the SQL texts are the same
  * queries — row-for-row. */
class SqlParitySpec extends SparkSpec {

  private def rows(df: DataFrame): Seq[Seq[String]] =
    df.collect().toSeq.map(r => (0 until r.length).map(i => String.valueOf(r.get(i))))

  private val covered =
    (BenchQueries.headline ++ queries.RelationalQueries.all ++
      queries.FunctionQueries.all ++ queries.LlmQueries.all ++
      queries.AnalyticsQueries.all)
      .filter(q => SqlQueries.texts.contains(q.name))

  covered.foreach { q =>
    test(s"${q.name}: SQL text matches the DataFrame builder") {
      val viaDf = rows(q.build(spark, sf001))
      val viaSql = rows(SqlQueries.run(spark, sf001, q.name))
      assert(viaSql === viaDf, q.name)
    }
  }

  test("asof_join SQL table function matches AsOfJoin.asof (incl. tolerance)") {
    graft.operators.AsOfJoin.registerSqlSurface(spark)
    Tables.registerAll(spark, sf001)
    spark.sql("""CREATE OR REPLACE TEMP VIEW asof_p AS
      SELECT user_id, ts, event_id, value FROM events WHERE event_type = 'purchase'""")
    spark.sql("""CREATE OR REPLACE TEMP VIEW asof_s AS
      SELECT user_id, ts AS signup_ts FROM events WHERE event_type = 'signup'""")
    def sorted(df: DataFrame): Seq[Seq[String]] =
      rows(df.orderBy("user_id", "ts", "event_id"))
    val api = graft.operators.AsOfJoin.asof(
      spark.table("asof_p"), spark.table("asof_s"),
      Seq("user_id"), "ts", "signup_ts", Seq("signup_ts"))
    val sql = spark.sql(
      "SELECT * FROM asof_join('asof_p', 'asof_s', 'user_id', 'ts', 'signup_ts', 'signup_ts')")
    assert(sorted(sql) === sorted(api))
    assert(sorted(sql).nonEmpty)
    val apiTol = graft.operators.AsOfJoin.asof(
      spark.table("asof_p"), spark.table("asof_s"),
      Seq("user_id"), "ts", "signup_ts", Seq("signup_ts"),
      toleranceMs = Some(86400000L))
    val sqlTol = spark.sql(
      "SELECT * FROM asof_join('asof_p', 'asof_s', 'user_id', 'ts', 'signup_ts', 'signup_ts', 86400000)")
    assert(sorted(sqlTol) === sorted(apiTol))
    assert(sorted(sqlTol).size < sorted(sql).size) // tolerance actually filters
  }

  test("delta_scan / iceberg_scan / lake_scan SQL functions match the API reads (incl. time travel)") {
    import org.apache.spark.sql.functions._
    graft.sources.Lake.registerSqlSurface(spark)
    import spark.implicits._
    val delta = java.nio.file.Files.createTempDirectory("graft_sqlscan_d").toString
    val v0 = graft.sources.DeltaWrite.append(spark,
      Seq((1L, "a"), (2L, "b")).toDF("id", "name"), delta)
    graft.sources.DeltaWrite.append(spark, Seq((3L, "c")).toDF("id", "name"), delta)
    val ice = java.nio.file.Files.createTempDirectory("graft_sqlscan_i").toString
    val s0 = graft.sources.IcebergWrite.append(spark,
      Seq((1L, "a"), (2L, "b")).toDF("id", "name"), ice)
    graft.sources.IcebergWrite.append(spark, Seq((3L, "c")).toDF("id", "name"), ice)

    def ids(df: DataFrame): Seq[Long] =
      df.select("id").collect().map(_.getLong(0)).toSeq.sorted
    assert(ids(spark.sql(s"SELECT * FROM delta_scan('$delta')")) === Seq(1L, 2L, 3L))
    assert(ids(spark.sql(s"SELECT * FROM delta_scan('$delta', $v0)")) === Seq(1L, 2L))
    assert(ids(spark.sql(s"SELECT * FROM iceberg_scan('$ice')")) === Seq(1L, 2L, 3L))
    assert(ids(spark.sql(s"SELECT * FROM iceberg_scan('$ice', $s0)")) === Seq(1L, 2L))
    // lake_scan dispatches on the on-disk format
    assert(ids(spark.sql(s"SELECT * FROM lake_scan('$delta')")) === Seq(1L, 2L, 3L))
    assert(ids(spark.sql(s"SELECT * FROM lake_scan('$ice', $s0)")) === Seq(1L, 2L))
    // hash-parity with the API form: identical rows, identical schema
    assert(spark.sql(s"SELECT * FROM delta_scan('$delta')").schema ===
      graft.sources.DeltaRead.snapshot(spark, delta).schema)
    assert(rows(spark.sql(s"SELECT * FROM iceberg_scan('$ice')").orderBy("id")) ===
      rows(graft.sources.IcebergRead.snapshot(spark, ice).orderBy("id")))
    // TIMESTAMP AS OF through SQL
    val now = System.currentTimeMillis() + 60000
    assert(ids(spark.sql(s"SELECT * FROM lake_scan_at('$ice', $now)")) === Seq(1L, 2L, 3L))
    // errors surface loudly: non-literal / wrong arity
    intercept[Exception](spark.sql(s"SELECT * FROM delta_scan(42)").collect())
    // VERSION AS OF 'ref': a string second argument resolves an Iceberg
    // tag/branch name; Delta (no named refs) refuses it loudly
    graft.sources.IcebergWrite.setRef(spark, ice, "pin", s0)
    assert(ids(spark.sql(s"SELECT * FROM iceberg_scan('$ice', 'pin')")) === Seq(1L, 2L))
    assert(ids(spark.sql(s"SELECT * FROM lake_scan('$ice', 'pin')")) === Seq(1L, 2L))
    intercept[Exception](spark.sql(s"SELECT * FROM lake_scan('$delta', 'pin')").collect())
    intercept[Exception](spark.sql(s"SELECT * FROM iceberg_scan('$ice', 'nope')").collect())
  }
}
