package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.expr

/** Table loading over the driver-generated parquet dirs (TESTDATA.md).
  * Each table is a single parquet file `<sfDir>/<name>.parquet`.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  // Schema cache: without an explicit schema every spark.read.parquet runs a
  // footer-inference job at PLAN time — ~50-100 ms burned per query. Schemas
  // here are fixed per table (FIXTURES.md), so infer once per path.
  private val schemaCache =
    scala.collection.concurrent.TrieMap.empty[String, org.apache.spark.sql.types.StructType]

  // Resolved-DataFrame cache, keyed per session: building the source
  // DataFrame resolves the DataSource and lists the directory into a fresh
  // InMemoryFileIndex every time (~10 ms/table at plan time, ×5 tables in a
  // join chain). Table files are immutable for a given path, so the resolved
  // relation is reusable; composed queries re-analyze their own operators but
  // share the relation node. Identity keying (IdentityHashMap — SparkSession
  // doesn't override equals) so a new session never inherits a stopped
  // session's DataFrame. Weak references can't reclaim these entries (the
  // cached Datasets strongly reference their session, so value reaches key);
  // eviction is explicit instead: a listener drops every entry for a
  // SparkContext when that context ends. The bound is therefore
  // contexts-ever-live, not sessions: newSession() clones on one long-lived
  // context share its fate and accumulate until it stops.
  private val dfCache =
    new java.util.IdentityHashMap[SparkSession,
      scala.collection.concurrent.TrieMap[String, DataFrame]]()

  def apply(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    val path = s"$sfDir/$name.parquet"
    val perSession = dfCache.synchronized {
      var m = dfCache.get(spark)
      if (m == null) {
        m = scala.collection.concurrent.TrieMap.empty
        dfCache.put(spark, m)
        // Evict when the session's context stops; sessions of a stopped
        // context are unusable, so their cached plans are dead weight.
        try {
          spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
            override def onApplicationEnd(
                e: org.apache.spark.scheduler.SparkListenerApplicationEnd): Unit =
              dfCache.synchronized {
                val it = dfCache.keySet.iterator()
                while (it.hasNext) if (it.next().sparkContext eq spark.sparkContext) it.remove()
              }
          })
        } catch {
          // Stopped context: its listener bus rejects registration. Don't
          // cache (nothing would ever evict the entry) — let the caller's
          // own downstream use of the dead session surface the failure.
          case _: IllegalStateException => dfCache.remove(spark)
        }
        // Stop race: if the context stopped between registration and the
        // already-posted ApplicationEnd event, the listener will never
        // fire — evict now rather than leak the entry forever.
        if (spark.sparkContext.isStopped) dfCache.remove(spark)
      }
      m
    }
    perSession.getOrElseUpdate(path, {
      // events.ts is parquet TIMESTAMP(NANOS), which Spark 4 refuses to read
      // natively: read it as a long and truncate ns→µs ourselves. Integer
      // `div` is mandatory — double division would lose precision at ~1.7e18.
      // DuckDB oracles CAST(ts AS TIMESTAMP) to apply the same truncation.
      // DELIBERATE session-wide flag (also set in GraftSession at setup):
      // nanosAsLong must be live whenever any cached plan over these
      // fixtures EXECUTES, so it cannot be scoped to this loader call —
      // callers bringing their own session accept nanos-as-long reads for
      // other TIMESTAMP(NANOS) parquet in that session (Spark's alternative
      // is an unsupported-type error, not a different decoding).
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val schema = schemaCache.getOrElseUpdate(path, spark.read.parquet(path).schema)
      normalizeTimestamps(spark.read.schema(schema).parquet(path))
    })
  }

  /** Load-boundary timestamp normalization. The fixtures' physical
    * timestamp encodings have drifted across data regenerations
    * (TIMESTAMP(NANOS) in early drops, `timestamp[us]
    * isAdjustedToUTC=false` now); the engine's contract is that every
    * event-time column surfaces as `TimestampType` regardless:
    *
    *   - legacy path: a `Long` column named `ts` is a nanosAsLong read of
    *     TIMESTAMP(NANOS) — truncate ns→µs with integer `div` (double
    *     division would lose precision at ~1.7e18) and convert;
    *   - any `TimestampNTZType` column is cast to `TimestampType`. Under
    *     the engine's UTC session the cast reinterprets the same µs value
    *     as a UTC instant — bit-identical micros, and DuckDB reads the
    *     same files as naive TIMESTAMP, so oracle hashes are unaffected.
    *
    * Applied to batch loads here and to the streaming file sources in
    * [[graft.streaming.StreamOps]]; one `select` (no-op when nothing
    * needs rewriting) so plans stay a single projection wide. */
  def normalizeTimestamps(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    val needsFix = df.schema.fields.exists(f =>
      f.dataType == TimestampNTZType || (f.dataType == LongType && f.name == "ts"))
    if (!needsFix) df
    else df.select(df.schema.fields.toIndexedSeq.map { f =>
      f.dataType match {
        case LongType if f.name == "ts" =>
          expr("timestamp_micros(ts div 1000)").as("ts")
        case TimestampNTZType =>
          org.apache.spark.sql.functions.col(f.name).cast(TimestampType).as(f.name)
        case _ => org.apache.spark.sql.functions.col(f.name)
      }
    }: _*)
  }

  /** Register every table as a temp view so SQL-shaped queries can run. */
  def registerAll(spark: SparkSession, sfDir: String): Unit =
    names.foreach(n => apply(spark, sfDir, n).createOrReplaceTempView(n))
}

/** Scan-width guard shared by every operator that plans expensive per-row
  * work (shingling, pair loops, JSON parse) below the first shuffle. */
object Spread {
  /** Repartition to full parallelism when the input's scan has fewer file
    * splits than the session would use — a single-row-group local file
    * otherwise pins the whole projection to ONE task. The check reads the
    * FileIndex (`inputFiles`), not `.rdd.getNumPartitions`, which would
    * force a full physical plan (~25 ms of plan-time overhead per call).
    * Non-file inputs (test fixtures, in-memory frames) report zero files
    * and are spread too — harmless, they are small by construction. No-op
    * at production scale (many splits). */
  def ifNarrow(df: DataFrame): DataFrame = {
    val cores = df.sparkSession.sparkContext.defaultParallelism
    if (df.inputFiles.length < math.min(8, cores)) df.repartition(cores) else df
  }
}

/** A named, oracle-checked query.
  *
  * @param name   stable query id (key in SparkEntry.queries / oracleSql)
  * @param build  Spark-side DataFrame builder; receives (session, sfDir)
  * @param oracle equivalent DuckDB SQL over views named like the tables;
  *               None → the driver records a weaker rows-only check.
  *
  * Determinism contract (SURVEY.md §0): every query ends in a total order,
  * rounds floating-point aggregates, pins NULL ordering, and aliases every
  * computed column identically on both sides.
  */
final case class GQuery(
    name: String,
    build: (SparkSession, String) => DataFrame,
    oracle: Option[String] = None)

/** Assembles the full declared inventory (SURVEY.md §2). */
object Registry {
  def all: Seq[GQuery] =
    queries.BenchQueries.all ++
      queries.RelationalQueries.all ++
      queries.FunctionQueries.all ++
      queries.LlmQueries.all ++
      queries.AnalyticsQueries.all ++
      queries.StreamingQueries.all ++
      queries.IoQueries.all

  lazy val byName: Map[String, GQuery] = all.map(q => q.name -> q).toMap
}
