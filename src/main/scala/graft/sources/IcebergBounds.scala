package graft.sources

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.charset.StandardCharsets
import org.apache.spark.sql.types._

/** Iceberg SINGLE-VALUE binary serialization (spec §Appendix D: "Single-value
  * serialization") for the manifest `lower_bounds` / `upper_bounds` maps:
  * numerics as little-endian fixed width, strings as UTF-8 bytes, dates as
  * epoch-day int32, timestamps as epoch-micro int64. The encoding must match
  * the spec byte-for-byte — an external engine pruning on our bounds (or us
  * pruning on Spark/Trino/Flink-written bounds) compares these binaries
  * against its own encoded literals.
  *
  * Subset = the writer's primitive-type subset; types outside it simply get
  * no bounds (bounds are per-column optional in the spec). */
private[sources] object IcebergBounds {

  /** Spark types that get bounds (and their Iceberg single-value width). */
  def supported(dt: DataType): Boolean = dt match {
    case BooleanType | IntegerType | LongType | FloatType | DoubleType |
         StringType | DateType | TimestampType => true
    case _ => false
  }

  private def le(n: Int): ByteBuffer = ByteBuffer.allocate(n).order(ByteOrder.LITTLE_ENDIAN)

  /** Encode one non-null agg-output value (the JVM types Spark's min/max
    * return) as the spec binary. */
  def encode(dt: DataType, v: Any): Array[Byte] = dt match {
    case BooleanType => Array[Byte](if (v.asInstanceOf[Boolean]) 1 else 0)
    case IntegerType => le(4).putInt(v.asInstanceOf[Int]).array()
    case LongType => le(8).putLong(v.asInstanceOf[Long]).array()
    case FloatType => le(4).putFloat(v.asInstanceOf[Float]).array()
    case DoubleType => le(8).putDouble(v.asInstanceOf[Double]).array()
    case StringType => v.asInstanceOf[String].getBytes(StandardCharsets.UTF_8)
    case DateType =>
      le(4).putInt(v.asInstanceOf[java.sql.Date].toLocalDate.toEpochDay.toInt).array()
    case TimestampType =>
      val i = v.asInstanceOf[java.sql.Timestamp].toInstant
      le(8).putLong(Math.addExact(Math.multiplyExact(i.getEpochSecond, 1000000L),
        i.getNano / 1000L)).array()
    case other => throw new IllegalArgumentException(s"no single-value encoding for $other")
  }

  /** Decode back to the external JVM value the stats frame carries
    * (Timestamp/Date for temporals — matching what a Spark scan returns). */
  def decode(dt: DataType, bytes: Array[Byte]): Any = {
    def buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    dt match {
      case BooleanType => bytes(0) != 0
      case IntegerType => buf.getInt
      case LongType => buf.getLong
      case FloatType => buf.getFloat
      case DoubleType => buf.getDouble
      case StringType => new String(bytes, StandardCharsets.UTF_8)
      case DateType => java.sql.Date.valueOf(java.time.LocalDate.ofEpochDay(buf.getInt.toLong))
      case TimestampType =>
        val us = buf.getLong
        java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(
          Math.floorDiv(us, 1000000L), Math.floorMod(us, 1000000L) * 1000L))
      case other => throw new IllegalArgumentException(s"no single-value decoding for $other")
    }
  }
}
