package graft.sources

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Iceberg's `bucket[n]` transform as a CODEGEN'D Catalyst expression —
  * the write path's per-row ordinal computation (every row of every
  * bucketed append/MERGE/compaction passes through it) without the scala
  * UDF's encoder boxing and closure dispatch (guide §4: prefer
  * codegen-friendly expressions in hot paths).
  *
  * Semantics are exactly [[IcebergTransforms]]'s engine-pinned Murmur3
  * (the value the spec requires, so ordinals agree with external
  * engines): int/long/date hash as the 8-byte little-endian long
  * ([[IcebergTransforms.hashLong]] — DateType's internal form IS epoch
  * days), strings hash their UTF-8 bytes ([[IcebergTransforms.hashBytes]]
  * — `UTF8String.getBytes` is already UTF-8, no String round trip). NULL
  * in → NULL out (the staging writers coalesce to ordinal 0, unchanged).
  * Codegen emits a static call on the unboxed value; the interpreted
  * fallback computes the identical function. */
case class IcebergBucketExpr(child: Expression, n: Int) extends UnaryExpression {
  require(n > 0, s"IcebergBucketExpr: n must be positive, got $n")

  override def dataType: DataType = IntegerType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case IntegerType | LongType | DateType | StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"iceberg bucket() does not support $other")
    }

  override protected def nullSafeEval(input: Any): Any = child.dataType match {
    case IntegerType | DateType => // DateType internal = Int epoch days
      IcebergTransforms.bucketValue(
        IcebergTransforms.hashLong(input.asInstanceOf[Int].toLong), n)
    case LongType =>
      IcebergTransforms.bucketValue(
        IcebergTransforms.hashLong(input.asInstanceOf[Long]), n)
    case StringType =>
      IcebergTransforms.bucketValue(
        IcebergTransforms.hashBytes(input.asInstanceOf[UTF8String].getBytes), n)
    case other => throw new IllegalStateException(s"unreachable: $other")
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val t = "graft.sources.IcebergTransforms"
    child.dataType match {
      case IntegerType | DateType =>
        defineCodeGen(ctx, ev, c => s"$t.bucketValue($t.hashLong((long)$c), $n)")
      case LongType =>
        defineCodeGen(ctx, ev, c => s"$t.bucketValue($t.hashLong($c), $n)")
      case StringType =>
        defineCodeGen(ctx, ev, c => s"$t.bucketValue($t.hashBytes($c.getBytes()), $n)")
      case other => throw new IllegalStateException(s"unreachable: $other")
    }
  }

  override protected def withNewChildInternal(newChild: Expression): IcebergBucketExpr =
    copy(child = newChild)

  override def prettyName: String = "iceberg_bucket"
}
