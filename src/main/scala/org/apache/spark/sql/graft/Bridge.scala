package org.apache.spark.sql.graft

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.classic.ExpressionUtils

/** Minimal bridge into `private[sql]` surface: Column ⇄ Catalyst Expression
  * conversion and temp-function registration. Lives under
  * `org.apache.spark.sql` solely for access; contains no logic. */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Parse an expression TEXT to its catalyst tree eagerly. `functions
    * .expr` wraps the text in a lazy `ColumnNodeExpression(SqlExpression)`
    * that only parses at analysis — useless for callers that need to
    * inspect attributes/subqueries BEFORE resolution. */
  def parseExpression(spark: SparkSession, text: String): Expression =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.sqlParser.parseExpression(text)

  /** Parse a full STATEMENT to its unresolved logical plan — the
    * delegation planner's auto-routes pattern-match this tree instead of
    * tokenizing statement text themselves. */
  def parsePlan(spark: SparkSession,
      text: String): org.apache.spark.sql.catalyst.plans.logical.LogicalPlan =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.sqlParser.parsePlan(text)

  /** Run a (possibly partially unresolved) logical plan through the
    * session — analysis happens eagerly, so a plan the rewriter got wrong
    * throws HERE and refusal-based callers can fall back. */
  def ofRows(spark: SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)
      : org.apache.spark.sql.DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)

  /** Uncorrelated scalar subquery over a one-row/one-column DataFrame —
    * the form expressions like `BloomFilterMightContain` require for their
    * non-literal inputs (executed once, value shipped to every task). */
  def scalarSubquery(df: org.apache.spark.sql.DataFrame): Expression =
    org.apache.spark.sql.catalyst.expressions.ScalarSubquery(
      df.queryExecution.analyzed)

  def registerFunction(spark: SparkSession, name: String,
      clazz: Class[_], builder: Seq[Expression] => Expression): Unit = {
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.functionRegistry
      .createOrReplaceTempFunction(name, builder, "built-in")
  }

  /** Temp TABLE-VALUED function registration (FROM-clause functions like
    * `range`): the builder receives the call's argument expressions and
    * returns the logical plan the reference resolves to. */
  def registerTableFunction(spark: SparkSession, name: String,
      builder: Seq[Expression] => org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): Unit = {
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.tableFunctionRegistry
      .createOrReplaceTempFunction(name, builder, "built-in")
  }

  def logicalPlan(df: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.catalyst.plans.logical.LogicalPlan =
    df.queryExecution.analyzed

  def functionDescription(name: String, clazz: Class[_],
      builder: Seq[Expression] => Expression)
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) =
    (FunctionIdentifier(name), new ExpressionInfo(clazz.getName, name), builder)

  /** A DataFrame's physical rows WITHOUT the InternalRow→Row codec —
    * the zero-copy input for RDD-level operators (BucketedJoin). */
  def toInternalRdd(df: org.apache.spark.sql.DataFrame)
      : org.apache.spark.rdd.RDD[org.apache.spark.sql.catalyst.InternalRow] =
    df.queryExecution.toRdd

  /** Compile a bound expression to a row predicate (codegen with
    * interpreted fallback) — the residual-conjunct evaluator for
    * bucket-local joins. Callers must `initialize(partitionIndex)`. */
  def createPredicate(e: Expression)
      : org.apache.spark.sql.catalyst.expressions.BasePredicate =
    org.apache.spark.sql.catalyst.expressions.Predicate.create(e)

  /** Compile PRE-BOUND expressions to a mutable projection (codegen with
    * interpreted fallback) — the update step of a bucket-local hash
    * aggregation. Callers `target(buffer)` then feed joined rows. */
  def createMutableProjection(exprs: Seq[Expression])
      : org.apache.spark.sql.catalyst.expressions.MutableProjection =
    org.apache.spark.sql.catalyst.expressions.MutableProjection.create(exprs, Nil)

  /** A Spark-configured local scratch directory for task-side spill files
    * — `spark.local.dir`/YARN dirs via Spark's own resolution, never bare
    * `java.io.tmpdir` (which may be a small root partition or a
    * RAM-backed tmpfs, defeating the point of spilling). Executor-side. */
  def localSpillDir(): java.io.File = {
    val dir = new java.io.File(
      org.apache.spark.util.Utils.getLocalDir(org.apache.spark.SparkEnv.get.conf))
    dir.mkdirs()
    dir
  }

  /** Wrap an InternalRow RDD as a DataFrame without the Row codec —
    * the inverse of [[toInternalRdd]]. The rows may be reused objects
    * (standard source contract: consumers copy when buffering). */
  def internalCreateDataFrame(spark: SparkSession,
      rdd: org.apache.spark.rdd.RDD[org.apache.spark.sql.catalyst.InternalRow],
      schema: org.apache.spark.sql.types.StructType): org.apache.spark.sql.DataFrame =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .internalCreateDataFrame(rdd, schema)

  /** [[internalCreateDataFrame]] DECLARING a hash-clustered output
    * partitioning on `clusterCols`: the caller guarantees rows with equal
    * cluster-column values share an RDD partition (the co-partitioned
    * bucket reader's invariant), so `EnsureRequirements` satisfies any
    * `ClusteredDistribution` over a superset of the columns and Spark's
    * OWN Window/Aggregate operators plan WITHOUT an exchange on top.
    *
    * The declared `HashPartitioning` is NOMINAL — the actual placement is
    * the Iceberg bucket transform, not Spark's hash. Clustering-based
    * requirements only need co-location of equal values (true), but an
    * exact-partitioning requirement (co-partitioned join against a real
    * Spark exchange) would mis-align rows: callers must confine these
    * frames to SINGLE-TABLE plans. */
  def internalCreateDataFrameClustered(spark: SparkSession,
      rdd: org.apache.spark.rdd.RDD[org.apache.spark.sql.catalyst.InternalRow],
      schema: org.apache.spark.sql.types.StructType,
      clusterCols: Seq[String]): org.apache.spark.sql.DataFrame = {
    val session = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    val attrs = org.apache.spark.sql.catalyst.types.DataTypeUtils.toAttributes(schema)
    val cluster = attrs.filter(a => clusterCols.contains(a.name))
    require(cluster.nonEmpty, s"no cluster columns $clusterCols in ${schema.fieldNames.mkString(",")}")
    val partitioning = org.apache.spark.sql.catalyst.plans.physical.HashPartitioning(
      cluster, math.max(1, rdd.getNumPartitions))
    org.apache.spark.sql.classic.Dataset.ofRows(session,
      org.apache.spark.sql.execution.LogicalRDD(attrs, rdd, partitioning,
        Nil, isStreaming = false)(session))
  }
}
