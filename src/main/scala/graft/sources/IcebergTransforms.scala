package graft.sources

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Iceberg HIDDEN-PARTITIONING transforms (spec §Partition Transforms):
  * `identity`, `hour`, `day`, `month`, `year`, `bucket[N]`, `truncate[W]`
  * — the full transform set of the v2 spec. [[IcebergWrite.append]]
  * parses `partitionBy` strings ("col", "day(col)", "bucket(16, col)",
  * "truncate(4, col)") into these, evaluates them at write time, and
  * records them in the table's partition-spec JSON so ANY Iceberg engine
  * prunes on them; [[IcebergRead.snapshotPruned]] sees the transform
  * values in each file's partition record.
  *
  * `bucket` is the spec's 32-bit Murmur3 (x86, seed 0) over the value's
  * canonical bytes — ints/longs/dates as 8-byte little-endian longs,
  * strings as UTF-8 — then `(hash & Int.MaxValue) % N`. The hash must
  * match Iceberg's exactly (the spec publishes test vectors, covered in
  * IcebergWriteSpec) or an external engine's bucket pruning would read
  * the wrong buckets. */
private[sources] object IcebergTransforms {

  /** Standard 32-bit Murmur3 (x86 variant), seed 0 — the function the
    * Iceberg spec fixes for bucket transforms. Implemented here rather
    * than via Spark's `hash()` (seed 42, non-standard tail mix) because
    * external engines must compute identical bucket ids. */
  def murmur3(bytes: Array[Byte], seed: Int = 0): Int = {
    val c1 = 0xcc9e2d51
    val c2 = 0x1b873593
    var h1 = seed
    val n = bytes.length
    val nblocks = n / 4
    var i = 0
    while (i < nblocks) {
      val b = i * 4
      var k1 = (bytes(b) & 0xff) | ((bytes(b + 1) & 0xff) << 8) |
        ((bytes(b + 2) & 0xff) << 16) | ((bytes(b + 3) & 0xff) << 24)
      k1 *= c1
      k1 = Integer.rotateLeft(k1, 15)
      k1 *= c2
      h1 ^= k1
      h1 = Integer.rotateLeft(h1, 13)
      h1 = h1 * 5 + 0xe6546b64
      i += 1
    }
    val tail = nblocks * 4
    var k1 = 0
    var shift = 0
    var j = tail
    while (j < n) {
      k1 ^= (bytes(j) & 0xff) << shift
      shift += 8
      j += 1
    }
    if (k1 != 0 || n % 4 != 0) {
      k1 *= c1
      k1 = Integer.rotateLeft(k1, 15)
      k1 *= c2
      h1 ^= k1
    }
    h1 ^= n
    h1 ^= (h1 >>> 16)
    h1 *= 0x85ebca6b
    h1 ^= (h1 >>> 13)
    h1 *= 0xc2b2ae35
    h1 ^= (h1 >>> 16)
    h1
  }

  /** Spec: int, long, date, time, timestamp all hash as the 8-byte
    * little-endian long (ints widen first, so bucket(34:int) ==
    * bucket(34:long)). */
  def hashLong(v: Long): Int = {
    val b = new Array[Byte](8)
    var i = 0
    var x = v
    while (i < 8) { b(i) = (x & 0xff).toByte; x >>>= 8; i += 1 }
    murmur3(b)
  }

  def hashString(s: String): Int = murmur3(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))

  /** UTF-8 bytes hashed directly — what [[hashString]] computes, minus the
    * String round trip (the codegen'd bucket expression hashes Spark's
    * internal `UTF8String.getBytes`, which ARE the UTF-8 bytes). */
  def hashBytes(b: Array[Byte]): Int = murmur3(b)

  def bucketValue(hash: Int, n: Int): Int = (hash & Int.MaxValue) % n

  sealed trait Transform {
    /** Source column name. */
    def source: String
    /** Partition field name (Iceberg's default naming). */
    def fieldName: String
    /** The spec JSON `transform` string. */
    def transformString: String
    /** Result type of the transform for `srcType`. */
    def resultType(srcType: DataType): DataType
    /** The transform as a Column expression over the source column. */
    def column(c: Column, srcType: DataType): Column
  }

  case class Identity(source: String) extends Transform {
    def fieldName: String = source
    def transformString = "identity"
    def resultType(srcType: DataType): DataType = srcType
    def column(c: Column, srcType: DataType): Column = c
  }

  /** `day(ts)`: the UTC date ordinal (days from 1970-01-01) of a date or
    * timestamp — an int in partition records, per the spec. */
  case class Day(source: String) extends Transform {
    def fieldName: String = s"${source}_day"
    def transformString = "day"
    def resultType(srcType: DataType): DataType = IntegerType
    def column(c: Column, srcType: DataType): Column = srcType match {
      case DateType => datediff(c, to_date(lit("1970-01-01")))
      // Spark timestamps are UTC instants; floor-divide epoch seconds so
      // pre-1970 instants land on the correct (negative) ordinal too
      case TimestampType => floor(unix_timestamp(c) / 86400L).cast(IntegerType)
      // NTZ (Iceberg `timestamp` without zone): the spec's day ordinal is
      // over the stored wall-clock value. to_date over NTZ reads the wall
      // clock directly — no cast through TimestampType, which would
      // reinterpret via spark.sql.session.timeZone and shift the ordinal
      // under any non-UTC session.
      case TimestampNTZType =>
        datediff(to_date(c), to_date(lit("1970-01-01")))
      case other => throw new IllegalArgumentException(
        s"day() needs a date/timestamp source, got $other for '$source'")
    }
  }

  /** `hour(ts)`: hours from 1970-01-01 00:00 UTC (an int; floor-divide so
    * pre-1970 instants land on the correct negative ordinal). Timestamp
    * sources only — the spec does not define hour() over dates. */
  case class Hour(source: String) extends Transform {
    def fieldName: String = s"${source}_hour"
    def transformString = "hour"
    def resultType(srcType: DataType): DataType = IntegerType
    def column(c: Column, srcType: DataType): Column = srcType match {
      case TimestampType => floor(unix_timestamp(c) / 3600L).cast(IntegerType)
      // NTZ wall clock: day ordinal × 24 + wall hour — to_date/hour over
      // NTZ never consult the session timezone (a cast through
      // TimestampType would)
      case TimestampNTZType =>
        (datediff(to_date(c), to_date(lit("1970-01-01"))).cast(LongType) * 24L +
          hour(c)).cast(IntegerType)
      case other => throw new IllegalArgumentException(
        s"hour() needs a timestamp source, got $other for '$source'")
    }
  }

  /** Session-TZ-independent UTC civil date of a transform source: dates
    * pass through (pure calendar values); timestamps — UTC instants — go
    * through epoch-day arithmetic and `date_add` from the epoch, so the
    * `year()`/`month()` field extraction downstream runs over DateType
    * and never consults `spark.sql.session.timeZone`; NTZ reads the wall
    * clock via `to_date` (no zone involved). The spec defines the time
    * transforms in UTC — this keeps partition ordinals spec-correct even
    * when a caller's session runs a non-UTC timezone (a `year(ts)` over
    * TimestampType would silently use the session zone). */
  private def utcCivilDate(c: Column, srcType: DataType, what: String): Column =
    srcType match {
      case DateType => c
      case TimestampType => date_add(to_date(lit("1970-01-01")),
        floor(unix_timestamp(c) / 86400L).cast(IntegerType))
      case TimestampNTZType => to_date(c)
      case other => throw new IllegalArgumentException(
        s"$what needs a date/timestamp source, got $other")
    }

  /** `month(ts)`: months from 1970-01 — `(year-1970)*12 + (month-1)`,
    * sign-correct for pre-1970 (1969-12 → -1). UTC calendar fields via
    * [[utcCivilDate]] (spec-correct under any session timezone). */
  case class Month(source: String) extends Transform {
    def fieldName: String = s"${source}_month"
    def transformString = "month"
    def resultType(srcType: DataType): DataType = IntegerType
    def column(c: Column, srcType: DataType): Column = {
      val d = utcCivilDate(c, srcType, s"month() for '$source'")
      ((year(d) - lit(1970)) * lit(12) + (month(d) - lit(1))).cast(IntegerType)
    }
  }

  /** `year(ts)`: years from 1970 (an int — 2024 → 54, 1969 → -1). UTC
    * calendar fields via [[utcCivilDate]]. */
  case class Year(source: String) extends Transform {
    def fieldName: String = s"${source}_year"
    def transformString = "year"
    def resultType(srcType: DataType): DataType = IntegerType
    def column(c: Column, srcType: DataType): Column =
      (year(utcCivilDate(c, srcType, s"year() for '$source'")) - lit(1970))
        .cast(IntegerType)
  }

  case class Bucket(n: Int, source: String) extends Transform {
    require(n > 0, s"bucket($n, $source): N must be positive")
    def fieldName: String = s"${source}_bucket"
    def transformString = s"bucket[$n]"
    def resultType(srcType: DataType): DataType = IntegerType
    // codegen'd Catalyst expression, not a scala UDF (round-19
    // optimization, guide §4): the bucket ordinal is computed for EVERY
    // row of EVERY bucketed write — the UDF form paid
    // encoder boxing (Int → java.lang.Integer → Int) and an opaque
    // closure call inside the staging projection; the expression stays
    // inside whole-stage codegen as a static hash call on the unboxed
    // value. Same engine-pinned Murmur3, same null → null.
    def column(c: Column, srcType: DataType): Column = srcType match {
      case IntegerType | LongType | DateType | StringType =>
        org.apache.spark.sql.graft.Bridge.column(IcebergBucketExpr(
          org.apache.spark.sql.graft.Bridge.expression(c), n))
      case other => throw new IllegalArgumentException(
        s"bucket() over $other is outside this writer's subset for '$source'")
    }
  }

  /** `truncate(W, col)`: ints/longs floor to a multiple of W (sign-correct
    * modulo, per spec: `v - (((v % W) + W) % W)`); strings truncate to W
    * Unicode CODEPOINTS (not UTF-16 units — surrogate pairs count once). */
  case class Truncate(w: Int, source: String) extends Transform {
    require(w > 0, s"truncate($w, $source): W must be positive")
    def fieldName: String = s"${source}_trunc"
    def transformString = s"truncate[$w]"
    def resultType(srcType: DataType): DataType = srcType
    def column(c: Column, srcType: DataType): Column = srcType match {
      case IntegerType | LongType => c - pmod(c, lit(w).cast(srcType))
      case StringType =>
        val f = udf { (v: String) =>
          if (v == null) null
          else {
            val cps = v.codePointCount(0, v.length)
            if (cps <= w) v else v.substring(0, v.offsetByCodePoints(0, w))
          }
        }
        f(c)
      case other => throw new IllegalArgumentException(
        s"truncate() over $other is outside this writer's subset for '$source'")
    }
  }

  private val BucketRe = """bucket\(\s*(\d+)\s*,\s*([A-Za-z_][A-Za-z0-9_]*)\s*\)""".r
  private val TruncRe = """truncate\(\s*(\d+)\s*,\s*([A-Za-z_][A-Za-z0-9_]*)\s*\)""".r
  private val DayRe = """days?\(\s*([A-Za-z_][A-Za-z0-9_]*)\s*\)""".r
  private val HourRe = """hours?\(\s*([A-Za-z_][A-Za-z0-9_]*)\s*\)""".r
  private val MonthRe = """months?\(\s*([A-Za-z_][A-Za-z0-9_]*)\s*\)""".r
  private val YearRe = """years?\(\s*([A-Za-z_][A-Za-z0-9_]*)\s*\)""".r
  private val IdentRe = """(?:identity\(\s*)?([A-Za-z_][A-Za-z0-9_]*)\s*\)?""".r

  /** Parse a `partitionBy` entry: bare column = identity; `hour(c)` /
    * `day(c)` / `month(c)` / `year(c)` (plural forms accepted, matching
    * Iceberg's SQL aliases); `bucket(n, c)`; `truncate(w, c)`. */
  def parse(s: String): Transform = s.trim match {
    case BucketRe(n, c) => Bucket(n.toInt, c)
    case TruncRe(w, c) => Truncate(w.toInt, c)
    case DayRe(c) => Day(c)
    case HourRe(c) => Hour(c)
    case MonthRe(c) => Month(c)
    case YearRe(c) => Year(c)
    case IdentRe(c) if !s.contains("(") || s.trim.startsWith("identity(") => Identity(c)
    case other => throw new IllegalArgumentException(
      s"unparseable partition transform '$other' (supported: col, identity(col), " +
        "hour(col), day(col), month(col), year(col), bucket(n, col), truncate(w, col))")
  }

  /** Reconstruct the `partitionBy` string for a spec-JSON transform —
    * the inverse of [[parse]], used to re-derive a table's partitioning
    * from its metadata (e.g. for upsert's re-append). */
  def unparse(transformString: String, sourceCol: String): String = {
    val B = """bucket\[(\d+)\]""".r
    val T = """truncate\[(\d+)\]""".r
    transformString match {
      case "identity" => sourceCol
      case "day" => s"day($sourceCol)"
      case "hour" => s"hour($sourceCol)"
      case "month" => s"month($sourceCol)"
      case "year" => s"year($sourceCol)"
      case B(n) => s"bucket($n, $sourceCol)"
      case T(w) => s"truncate($w, $sourceCol)"
      case other => throw new IllegalArgumentException(
        s"unsupported partition transform '$other' in table metadata")
    }
  }
}
