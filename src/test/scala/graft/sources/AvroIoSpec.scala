package graft.sources

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpec

/** Avro OCF source/sink (SURVEY.md §2.16 S13a): full supported-type
  * round-trip incl. nulls/arrays/logical types, empty-frame schema
  * survival, multi-file layouts, refusals. */
class AvroIoSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  test("every supported type round-trips exactly, nulls included") {
    val schema = StructType(Seq(
      StructField("b", BooleanType), StructField("i", IntegerType),
      StructField("l", LongType), StructField("f", FloatType),
      StructField("d", DoubleType), StructField("s", StringType),
      StructField("bin", BinaryType), StructField("ts", TimestampType),
      StructField("dt", DateType),
      StructField("arr", ArrayType(DoubleType, containsNull = true))))
    val rows = Seq(
      Row(true, 1, 2L, 1.5f, 2.5, "x", Array[Byte](1, 2),
        java.sql.Timestamp.valueOf("2024-03-01 12:34:56.123456"),
        java.sql.Date.valueOf("2024-03-01"), Seq(1.0, null, 3.0)),
      Row(null, null, null, null, null, null, null, null, null, null))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), schema)
    val dir = tmp("graft_avro_types")
    assert(AvroIo.write(df, dir) === 2L)
    val back = AvroIo.read(spark, dir)
    assert(back.schema.fields.map(f => (f.name, f.dataType)).toSeq ===
      schema.fields.map(f => (f.name, f.dataType)).toSeq)
    val got = back.orderBy(col("i").asc_nulls_last).collect()
    val r0 = got(0)
    assert(r0.getBoolean(0) === true && r0.getInt(1) === 1 && r0.getLong(2) === 2L)
    assert(r0.getFloat(3) === 1.5f && r0.getDouble(4) === 2.5 && r0.getString(5) === "x")
    assert(r0.getAs[Array[Byte]](6).toSeq === Seq[Byte](1, 2))
    assert(r0.getTimestamp(7) === java.sql.Timestamp.valueOf("2024-03-01 12:34:56.123456"),
      "timestamp-micros must survive to the microsecond")
    assert(r0.getDate(8).toString === "2024-03-01")
    assert(r0.getSeq[Any](9) === Seq(1.0, null, 3.0))
    assert(got(1).toSeq.forall(_ == null), "an all-null row must survive")
  }

  test("multi-partition write = multi-file layout; read is file-granular") {
    val df = spark.range(1000).select(col("id"), (col("id") % 7).as("k"))
      .repartition(4)
    val dir = tmp("graft_avro_multi")
    assert(AvroIo.write(df, dir) === 1000L)
    val files = new java.io.File(dir).listFiles().filter(_.getName.endsWith(".avro"))
    assert(files.length === 4)
    val back = AvroIo.read(spark, dir)
    assert(back.rdd.getNumPartitions === 4, "one read task per container file")
    assert(back.agg(sum(col("id"))).head().getLong(0) === (0L until 1000L).sum)
    // a LIMIT that stops mid-file must not break (stream closes on task end)
    assert(back.limit(3).collect().length === 3)
  }

  test("an empty frame still writes a schema-bearing file and reads back empty") {
    val df = spark.range(0).select(col("id"), lit("x").as("s"))
    val dir = tmp("graft_avro_empty")
    assert(AvroIo.write(df, dir) === 0L)
    val back = AvroIo.read(spark, dir)
    assert(back.count() === 0L)
    assert(back.schema.fieldNames.toSeq === Seq("id", "s"))
  }

  test("refusals: unmapped spark type, unmapped avro shape, empty dir") {
    val dir = tmp("graft_avro_refuse")
    intercept[IllegalArgumentException](
      AvroIo.write(spark.range(1).select(map(lit("k"), col("id")).as("m")), dir))
    intercept[IllegalArgumentException](AvroIo.read(spark, tmp("graft_avro_none")))
  }
}
