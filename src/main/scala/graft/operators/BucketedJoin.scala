package graft.operators

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types.{Metadata, StructType}

import graft.sources.IcebergRead

/** STORAGE-PARTITIONED JOIN over two co-bucketed Iceberg tables — the one
  * fact-fact shuffle the relational core could not previously avoid.
  *
  * Both tables must be `bucket(n, key)`-partitioned with the SAME n on the
  * SAME key type (Iceberg's bucket transform is engine-pinned Murmur3, see
  * [[graft.sources.IcebergTransforms]], so equal keys land in equal
  * ordinals in both tables by spec). The join then never needs an
  * exchange: bucket i of the left can only match bucket i of the right.
  *
  * Physical shape (the verdict-blessed "co-partitioned reader" route —
  * no DSv2 connector needed): per side, each bucket's files are read as
  * one narrow partition (`coalesce(1)` over that bucket's parquet scan)
  * and the n buckets are UNIONed in ordinal order, giving an RDD whose
  * partition i IS bucket i; the two sides `zipPartitions` with a local
  * hash join per bucket. Every dependency is narrow — zero shuffles, zero
  * sorts, confirmed by `rdd.toDebugString` carrying no ShuffledRDD.
  *
  * At 100 TB: parallelism = n (pick n so a bucket fits an executor — the
  * same sizing rule Spark's own bucketed tables and Iceberg SPJ follow);
  * the build side of each local join is the RIGHT table's bucket, so put
  * the smaller table right. Falls back loudly when the layouts don't
  * cooperate — callers (and the `bucket_join` SQL TVF) treat that as
  * "use the shuffled plan".
  *
  * Semantics: equi-join on `key`, NULL keys match nothing (SQL equality).
  * `joinType` = `inner` (default) | `left` (outer — unmatched left rows
  * null-fill the right columns) | `left_semi` | `left_anti` (left columns
  * only); all four are bucket-local decisions, so the zero-shuffle shape
  * is identical. Output = left columns ++ right columns minus the right's
  * join key (names must not otherwise collide). Row order within a
  * partition follows the left side's file order — callers needing a total
  * order sort downstream, as with any join.
  */
object BucketedJoin {

  /** True when [[coBucketedJoin]] would plan shuffle-free for this pair. */
  def coBucketed(spark: SparkSession, left: String, right: String,
      key: String): Boolean =
    (IcebergRead.bucketLayout(spark, left, key),
      IcebergRead.bucketLayout(spark, right, key)) match {
      case (Some((nl, _)), Some((nr, _))) => nl == nr
      case _ => false
    }

  def coBucketedJoin(spark: SparkSession, left: String, right: String,
      key: String, joinType: String = "inner"): DataFrame = {
    val jt = joinType.trim.toLowerCase(java.util.Locale.ROOT)
    require(Set("inner", "left", "left_outer", "left_semi", "left_anti")(jt),
      s"coBucketedJoin: unsupported joinType '$joinType' " +
        "(inner | left | left_semi | left_anti)")
    val leftOnly = jt == "left_semi" || jt == "left_anti"
    val outer = jt == "left" || jt == "left_outer"
    val (nL, bucketsL) = IcebergRead.bucketLayout(spark, left, key).getOrElse(
      fail(s"$left is not cleanly bucket(n, $key)-partitioned"))
    val (nR, bucketsR) = IcebergRead.bucketLayout(spark, right, key).getOrElse(
      fail(s"$right is not cleanly bucket(n, $key)-partitioned"))
    require(nL == nR,
      s"bucket counts differ: $left has $nL, $right has $nR — equal keys " +
        "land in different ordinals, a co-partitioned join would be wrong")
    val schemaL = clean(IcebergRead.snapshot(spark, left).schema)
    val schemaR = clean(IcebergRead.snapshot(spark, right).schema)
    require(schemaL.fieldNames.contains(key) && schemaR.fieldNames.contains(key),
      s"join key '$key' missing from a side")
    require(schemaL(key).dataType == schemaR(key).dataType,
      s"join key '$key' types differ: ${schemaL(key).dataType} vs " +
        s"${schemaR(key).dataType} (bucket ordinals would not align)")
    val rightOut =
      if (leftOnly) Nil
      else schemaR.fields.toSeq.filterNot(_.name == key)
        .map(f => if (outer) f.copy(nullable = true) else f)
    val collide = rightOut.map(_.name).toSet intersect schemaL.fieldNames.toSet
    require(collide.isEmpty,
      s"non-key column name collision: ${collide.mkString(",")} — project/" +
        "rename a side first")
    val outSchema = StructType(schemaL.fields.toSeq ++ rightOut)

    // partition i == bucket i: one narrow coalesced scan per bucket,
    // concatenated in ordinal order. RDD-level union, NOT DataFrame
    // union — Spark 4's SQLPartitioningAwareUnionRDD merges same-
    // partitioned children partition-wise, which would collapse all n
    // buckets into one partition; sc.union over partitioner-less children
    // is a plain concatenation, so partition i stays bucket i. The rows
    // travel as InternalRow (queryExecution.toRdd — no Row codec): the
    // whole join runs on unsafe rows, the same currency a shuffled join
    // would move, minus the exchange.
    import org.apache.spark.sql.catalyst.InternalRow
    def side(schema: StructType, buckets: Map[Int, Seq[String]])
        : org.apache.spark.rdd.RDD[InternalRow] =
      spark.sparkContext.union((0 until nL).map { b =>
        buckets.get(b) match {
          case Some(files) =>
            org.apache.spark.sql.graft.Bridge.toInternalRdd(
              spark.read.schema(schema).parquet(files: _*).coalesce(1))
          case None => // empty bucket: ONE empty partition keeps alignment
            spark.sparkContext.parallelize(Seq.empty[InternalRow], 1)
        }
      })

    val keyIdxL = schemaL.fieldIndex(key)
    // semi/anti need only the right KEY column — a narrower parquet read
    val schemaRRead =
      if (leftOnly) StructType(Seq(schemaR(key))) else schemaR
    val keyIdxR = schemaRRead.fieldIndex(key)
    val keyType = schemaL(key).dataType
    val rightTypes = schemaRRead.fields.toSeq
    val joined = side(schemaL, bucketsL).zipPartitions(
        side(schemaRRead, bucketsR), preservesPartitioning = false) { (lit, rit) =>
      import org.apache.spark.sql.catalyst.expressions.{BoundReference, GenericInternalRow, JoinedRow, UnsafeProjection}
      // build on the right bucket, stream the left (NULL keys drop: SQL
      // =). Scan rows are REUSED objects — the build side must copy.
      val build = new java.util.HashMap[Any,
        scala.collection.mutable.ArrayBuffer[InternalRow]]()
      rit.foreach { r =>
        if (!r.isNullAt(keyIdxR)) {
          val k = InternalRow.copyValue(r.get(keyIdxR, keyType))
          var buf = build.get(k)
          if (buf == null) {
            buf = scala.collection.mutable.ArrayBuffer.empty[InternalRow]
            build.put(k, buf)
          }
          buf += r.copy()
        }
      }
      // output projection over JoinedRow(left, right): left fields, then
      // the right's non-key fields — one UnsafeProjection, created per
      // partition (codegen'd field copies, no boxing)
      val nl = schemaL.fields.length
      val outRefs = schemaL.fields.toSeq.zipWithIndex.map { case (f, i) =>
        BoundReference(i, f.dataType, f.nullable)
      } ++ rightTypes.zipWithIndex.collect { case (f, i) if f.name != key =>
        BoundReference(nl + i, f.dataType, nullable = true)
      }
      lazy val proj = UnsafeProjection.create(outRefs)
      lazy val joinedRow = new JoinedRow
      lazy val nullRight = new GenericInternalRow(rightTypes.length)
      val empty: Iterator[InternalRow] = Iterator.empty
      lit.flatMap { l =>
        val matched =
          if (l.isNullAt(keyIdxL)) null
          else build.get(l.get(keyIdxL, keyType))
        jt match {
          case "left_semi" => if (matched != null) Iterator.single(l) else empty
          case "left_anti" => if (matched == null) Iterator.single(l) else empty
          case "inner" =>
            if (matched == null) empty
            else matched.iterator.map(r => proj(joinedRow(l, r)))
          case _ => // left outer
            if (matched == null) Iterator.single(proj(joinedRow(l, nullRight)))
            else matched.iterator.map(r => proj(joinedRow(l, r)))
        }
      }
    }
    org.apache.spark.sql.graft.Bridge.internalCreateDataFrame(spark, joined, outSchema)
  }

  private def clean(s: StructType): StructType =
    StructType(s.fields.map(_.copy(metadata = Metadata.empty)))

  private def fail(msg: String): Nothing =
    throw new IllegalArgumentException(
      s"coBucketedJoin: $msg (no live deletes, every file under the " +
        "current default spec) — use the shuffled join instead")
}
