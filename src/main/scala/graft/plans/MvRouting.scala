package graft.plans

import scala.collection.concurrent.TrieMap

import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate._
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Filter, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.functions.{col, count, lit, max, min, sum}
import org.apache.spark.sql.types.{DoubleType, LongType}

/** TRANSPARENT MATERIALIZED-VIEW ROUTING — the OLAP-engine feature that
  * makes maintained rollups pay off without query rewrites: an optimizer
  * rule ([[MvRoutingRule]], injected via GraftExtensions) that recognizes
  * an aggregation over a REGISTERED base table and re-plans it against
  * the table's rollup MV whenever the answer is derivable, so the query
  * reads |distinct key tuples| rows instead of the fact table. At 100 TB
  * the routed plan's scan is the MV's few thousand rows — the fact scan,
  * its pushed filters, and its shuffle all disappear.
  *
  * Derivability contract (conservative — anything else falls through to
  * the base plan untouched):
  *   - grouping columns ⊆ MV keys (bare columns; derived keys bail),
  *   - every aggregate call is a non-DISTINCT, unfiltered
  *     `sum/min/max/count/avg` over an MV measure column or `count(*)`;
  *     they may sit inside arbitrary deterministic scalar expressions
  *     (`round(sum(x), 2)`, `sum(a)/count(*)`) whose other leaves are
  *     key columns or literals,
  *   - filters (if any) reference ONLY key columns — they re-apply to the
  *     MV verbatim, since a key-only predicate decides per MV group,
  *   - the MV is FRESH: the base relation's file listing with sizes and
  *     modification times (already materialized in the scan's FileIndex —
  *     no extra IO) matches the listing recorded when the MV was built;
  *     a changed base silently disables routing rather than serving
  *     stale rows. Paths alone would miss an in-place overwrite.
  *
  * Re-aggregation algebra: `sum(m)→sum(sum_m)`, `min/max(m)→min/max` of
  * the partials, `count(*)→sum(cnt_star)`, `count(m)→sum(cnt_m)` (both
  * null-coalesced to 0 for the empty global-aggregate case, where base
  * `count` returns 0 but a sum over zero rows is NULL), and
  * `avg(m)→sum(sum_m)/sum(cnt_m)` guarded against the 0/0 empty case
  * (NULL in both engines; unguarded ANSI division would throw). Double
  * sums re-associate (partial-then-final instead of one pass) — the same
  * re-association any distributed aggregate already performs.
  *
  * Session-wide kill switch: `SET spark.graft.mv.routing=false`.
  */
object Mv {

  /** A registered MV: base path (the scan relation's qualified root), the
    * recorded base file listing (path:len:mtime), key/measure columns,
    * and the MV's analyzed relation (instantiated fresh per rewrite so
    * attribute ids never collide). */
  final case class MvDef(basePath: String, mvPath: String, keys: Seq[String],
      measures: Seq[String], baseFiles: Seq[String], relation: LogicalRelation)

  private val registry = TrieMap.empty[String, MvDef]

  private def mapper = new ObjectMapper()

  private def baseRelation(df: DataFrame): LogicalRelation =
    df.queryExecution.analyzed.collectFirst { case r: LogicalRelation => r }
      .getOrElse(throw new IllegalArgumentException(
        "MV base must be a file-backed table (no LogicalRelation found)"))

  /** path:len:mtime per file, sorted — the freshness fingerprint. The
    * FileIndex has this listing in memory already. */
  private[plans] def listing(rel: LogicalRelation): Seq[String] = rel.relation match {
    case h: HadoopFsRelation =>
      h.location.listFiles(Nil, Nil).flatMap(_.files)
        .map(f => s"${f.getPath}:${f.getLen}:${f.getModificationTime}")
        .sorted.toSeq
    case other => throw new IllegalArgumentException(
      s"MV base must be file-backed, got ${other.getClass.getSimpleName}")
  }

  private def rootOf(rel: LogicalRelation): String = rel.relation match {
    case h: HadoopFsRelation => h.location.rootPaths.head.toString
    case _ => throw new IllegalArgumentException("MV base must be file-backed")
  }

  /** One MV measure bundle per base measure column: null-skipping sum,
    * non-null count, min, max — everything the routing algebra needs. */
  private def measureAggs(measures: Seq[String]) =
    measures.flatMap { m =>
      Seq(sum(col(m)).as(s"sum_$m"), count(col(m)).as(s"cnt_$m"),
        min(col(m)).as(s"min_$m"), max(col(m)).as(s"max_$m"))
    } :+ count(lit(1)).as("cnt_star")

  /** Build (or rebuild) the rollup MV for `basePath` at `mvPath`: ONE
    * map-side-combined aggregation pass over the base, written as plain
    * parquet, plus a meta document recording the derivation and the base
    * listing the freshness gate checks. Registers the result. */
  def create(spark: SparkSession, basePath: String, mvPath: String,
      keys: Seq[String], measures: Seq[String]): MvDef = {
    require(keys.nonEmpty && measures.nonEmpty, "MV needs keys and measures")
    val base = spark.read.parquet(basePath)
    val rel = baseRelation(base)
    val aggs = measureAggs(measures)
    base.groupBy(keys.map(col): _*)
      .agg(aggs.head, aggs.tail: _*)
      .write.mode("overwrite").parquet(s"$mvPath/data")
    val meta = mapper.createObjectNode()
    meta.put("base_path", rootOf(rel))
    val ka = meta.putArray("keys"); keys.foreach(ka.add)
    val ma = meta.putArray("measures"); measures.foreach(ma.add)
    val fa = meta.putArray("base_files"); listing(rel).foreach(fa.add)
    val metaPath = new Path(s"$mvPath/_mv_meta.json")
    val fs = metaPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(metaPath, true)
    try out.write(mapper.writerWithDefaultPrettyPrinter().writeValueAsBytes(meta))
    finally out.close()
    register(spark, mvPath)
  }

  /** Register an existing MV (reads its meta document) so the routing
    * rule can use it for this JVM's sessions. Idempotent. */
  def register(spark: SparkSession, mvPath: String): MvDef = {
    val metaPath = new Path(s"$mvPath/_mv_meta.json")
    val fs = metaPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val in = fs.open(metaPath)
    val meta = try mapper.readTree(in) finally in.close()
    def strs(f: String): Seq[String] = {
      val it = meta.get(f).elements()
      val b = Seq.newBuilder[String]
      while (it.hasNext) b += it.next().asText()
      b.result()
    }
    val rel = baseRelation(spark.read.parquet(s"$mvPath/data"))
    val d = MvDef(meta.get("base_path").asText(), mvPath, strs("keys"),
      strs("measures"), strs("base_files"), rel)
    registry.put(d.basePath, d)
    d
  }

  /** Rebuild an existing MV from its own meta document (same base, keys,
    * measures) — the maintenance verb that brings a stale MV back into
    * routing after base churn. One aggregation pass, re-registers. */
  def refresh(spark: SparkSession, mvPath: String): MvDef = {
    val d = register(spark, mvPath) // read the recorded derivation
    create(spark, d.basePath, mvPath, d.keys, d.measures)
  }

  /** Drop the registration whose base or MV path matches. */
  def unregister(path: String): Unit =
    registry.filterInPlace((k, d) => k != path && d.mvPath != path)

  /** Test hook: drop every registration. */
  def clearRegistry(): Unit = registry.clear()

  private[plans] def lookup(basePath: String): Option[MvDef] = registry.get(basePath)
}

/** The rewrite rule. Runs in the operator-optimization fixed point, so a
  * routed plan is immediately re-optimized (column pruning onto the MV
  * scan, filter pushdown into its parquet reader); idempotent because the
  * rewritten child is the MV relation, which is never a registered base. */
object MvRoutingRule extends Rule[LogicalPlan] {

  /** Strip attribute-only Projects / deterministic Filters down to the
    * base relation, accumulating filter conditions. */
  private def unwrap(p: LogicalPlan): Option[(LogicalRelation, Seq[Expression])] =
    p match {
      case r: LogicalRelation => Some((r, Nil))
      case Filter(cond, child) if cond.deterministic &&
          !SubqueryExpression.hasSubquery(cond) =>
        unwrap(child).map { case (r, cs) => (r, cond +: cs) }
      case Project(exprs, child) if exprs.forall(_.isInstanceOf[AttributeReference]) =>
        unwrap(child)
      case _ => None
    }

  private def basePathOf(r: LogicalRelation): Option[String] = r.relation match {
    case h: HadoopFsRelation => h.location.rootPaths.headOption.map(_.toString)
    case _ => None
  }

  private def aggExpr(f: AggregateFunction): Expression = f.toAggregateExpression()

  /** Rewrite ONE aggregate call onto the MV partials; None = underivable. */
  private def rewriteCall(ae: AggregateExpression,
      mvCol: String => Option[Attribute]): Option[Expression] = ae match {
    case AggregateExpression(f, _, false, None, _) =>
      def m(prefix: String, c: Expression): Option[Attribute] = c match {
        case a: AttributeReference => mvCol(s"${prefix}_${a.name}")
        case _ => None
      }
      f match {
        case Sum(c, _) => m("sum", c).map(a => aggExpr(Sum(a)))
        case Min(c) => m("min", c).map(a => aggExpr(Min(a)))
        case Max(c) => m("max", c).map(a => aggExpr(Max(a)))
        case Count(Seq(Literal(1, _))) =>
          mvCol("cnt_star").map(a =>
            Coalesce(Seq(aggExpr(Sum(a)), Literal(0L, LongType))))
        case Count(Seq(c)) =>
          m("cnt", c).map(a =>
            Coalesce(Seq(aggExpr(Sum(a)), Literal(0L, LongType))))
        case Average(c, _) =>
          m("sum", c).zip(m("cnt", c)).map { case (s, n) =>
            val total = aggExpr(Sum(Cast(s, DoubleType)))
            val cnt = Coalesce(Seq(aggExpr(Sum(n)), Literal(0L, LongType)))
            If(EqualTo(cnt, Literal(0L, LongType)),
              Literal(null, DoubleType), Divide(total, Cast(cnt, DoubleType)))
          }
        case _ => None
      }
    case _ => None
  }

  /** Rewrite a full output expression: aggregate calls via the algebra,
    * bare attributes via the key map, any other deterministic scalar
    * node structurally. None anywhere = the whole aggregate bails. */
  private def rewriteExpr(e: Expression, keyFor: Map[ExprId, Attribute],
      mvCol: String => Option[Attribute]): Option[Expression] = e match {
    case ae: AggregateExpression => rewriteCall(ae, mvCol)
    case a: AttributeReference => keyFor.get(a.exprId)
    case other if other.deterministic && !SubqueryExpression.hasSubquery(other) =>
      if (other.children.isEmpty) Some(other)
      else {
        val cs = other.children.map(rewriteExpr(_, keyFor, mvCol))
        if (cs.forall(_.isDefined)) Some(other.withNewChildren(cs.map(_.get)))
        else None
      }
    case _ => None
  }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (conf.getConfString("spark.graft.mv.routing", "true") != "true") return plan
    plan.transform {
      case agg @ Aggregate(groupings, aggExprs, child, _) =>
        val routed = for {
          (rel, conds) <- unwrap(child)
          path <- basePathOf(rel)
          d <- Mv.lookup(path)
          if Mv.listing(rel) == d.baseFiles // freshness gate, in-memory
          // fresh MV relation instance per rewrite — ids never collide
          mvRel = d.relation.newInstance()
          mvByName = mvRel.output.map(a => a.name -> a).toMap
          keyFor = rel.output.filter(a => d.keys.contains(a.name))
            .flatMap(a => mvByName.get(a.name).map(a.exprId -> _)).toMap
          if groupings.forall {
            case a: AttributeReference => keyFor.contains(a.exprId)
            case _ => false
          }
          // filters: key-column references only, re-bindable to MV attrs
          if conds.forall(_.references.forall(a => keyFor.contains(a.exprId)))
          newAggs <- {
            val rewritten = aggExprs.map {
              case a: AttributeReference =>
                keyFor.get(a.exprId).map(mv => Alias(mv, a.name)(exprId = a.exprId))
              case al @ Alias(childE, name) =>
                rewriteExpr(childE, keyFor, mvByName.get)
                  .map(e => Alias(e, name)(exprId = al.exprId))
              case _ => None
            }
            if (rewritten.forall(_.isDefined)) Some(rewritten.map(_.get)) else None
          }
        } yield {
          val rebound = conds.map(_.transform {
            case a: AttributeReference if keyFor.contains(a.exprId) => keyFor(a.exprId)
          })
          val filtered: LogicalPlan =
            rebound.foldLeft(mvRel: LogicalPlan)((p, c) => Filter(c, p))
          Aggregate(
            groupings.map { case a: AttributeReference => keyFor(a.exprId) },
            newAggs, filtered)
        }
        routed.getOrElse(agg)
    }
  }
}
