package graft

import org.apache.spark.sql.SparkSession

/** Session factory — the engine's recommended configuration in one place.
  * The same settings serve bench (local[32]) and a 1000-executor cluster:
  * UTC semantics, AQE with byte-sized post-shuffle partitions (not pinned
  * parallelism), and the engine's native functions registered. */
object GraftSession {
  def builder(master: String = s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      : SparkSession.Builder =
    SparkSession.builder()
      .master(master)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
      // Broadcast dims, stream facts: the 10 MB default happily broadcasts a
      // whole fact table at bench scale (a 600k-row hash build per query) and
      // is the wrong bet at 100 TB; 4 MB keeps genuine dimensions broadcast.
      .config("spark.sql.autoBroadcastJoinThreshold", "4m")
      // Timestamp physical-type drift defense (see Tables.normalizeTimestamps):
      // legacy fixture drops used TIMESTAMP(NANOS) (read as long + explicit
      // ns→µs truncation); current drops use timestamp[us] isAdjustedToUTC=
      // false, which Spark 4 would otherwise infer as TIMESTAMP_NTZ. The
      // engine's event-time contract is TimestampType everywhere — turning
      // NTZ inference off restores the instant-typed read at the scan (same
      // µs values under the UTC session), and the load-boundary normalizer
      // covers sessions built without these confs. Set at session setup so
      // neither is a surprise side effect of the first table load.
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.sql.extensions", classOf[functions.GraftExtensions].getName)
      .config("spark.ui.enabled", "false")

  def create(master: String = s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      : SparkSession = {
    val spark = builder(master).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    functions.VectorExpressions.register(spark)
    functions.Aggregators.register(spark)
    spark
  }
}
