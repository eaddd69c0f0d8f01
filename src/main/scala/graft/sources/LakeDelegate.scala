package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

import Lake._

/** The DELEGATION PLANNER for [[Lake.sqlFrame]]'s general SELECTs: each
  * lake reference in the statement registers as a temp view over the
  * format-detected, version-pinned, file-stats-PRUNED scan, the statement
  * text is rewritten to name the views, and the whole statement runs
  * through `spark.sql`. On top of the per-alias pruning tier this object
  * carries the cross-reference planning moves a 100 TB statement needs:
  * ANALYZE-stats broadcast hints, join-derived manifest pruning (the
  * file-level analog of DPP), and the storage-partitioned-join auto-route.
  * Split out of Lake.scala (round 17) — behavior unchanged. */
private[sources] object LakeDelegate {
  def delegateSelect(spark: SparkSession, statement: String): DataFrame = {
    val refs = resolvedRefs(spark, statement)
    // no lake references at all: the statement speaks only session
    // objects — temp views and the registered table functions
    // (bucket_join, lake_table_stats, lake_changes, …) — so hand it to
    // Spark whole; registration is idempotent and cheap
    if (refs.isEmpty) {
      if (!spark.conf.getOption("graft.sqlSurfaceRegistered").contains("1")) {
        registerSqlSurface(spark)
        spark.conf.set("graft.sqlSurfaceRegistered", "1")
      }
      return spark.sql(statement)
    }
    // BLOCK-LOCAL pruning: each reference is attributed conjuncts from its
    // OWN query block's WHERE — the statement's for depth-0 refs, the
    // enclosing derived table's/CTE's for nested ones. A block's own WHERE
    // already filters that block's rows, so pruning with it is the same
    // filter applied earlier — never the cross-block leak the depth gate
    // exists to prevent.
    val pairs = parenPairs(statement)
    def blockOf(pos: Int): (Int, Int) =
      pairs.filter(p => p._1 < pos && pos < p._2)
        .minByOption(p => p._2 - p._1).getOrElse((-1, statement.length))
    // resolve each reference's version and base scan ONCE — conjunct
    // attribution, the analyzed-determinism check, and the unpruned
    // fallback all reuse it, so a statement costs O(refs) log replays,
    // not O(refs x conjuncts)
    val resolved: Seq[(TableRef, Long, DataFrame)] = refs.map { r =>
      if (r.path.endsWith(".view.sql")) (r, -1L, viewFrame(spark, r.path))
      else {
        // a TIMESTAMP pin resolves to its version first, so the view name
        // stays content-addressed on what is actually read
        val v = if (r.atMs >= 0) versionAt(spark, r.path, r.atMs) else r.version
        (r, v, read(spark, r.path, v))
      }
    }
    val conjuncts: Map[Int, Seq[(String, org.apache.spark.sql.Column)]] =
      resolved.zipWithIndex
        // stored views have no file-stats tier (their text re-applies its
        // own WHERE when expanded) — never a pruning target
        .filter { case ((r, _, _), _) => !r.path.endsWith(".view.sql") }
        .groupBy { case ((r, _, _), _) => blockOf(r.start) }
        .flatMap { case ((bs, be), group) =>
          pruneConjuncts(spark, statement.substring(bs + 1, be),
            group.map { case ((r, _, df), i) => (r, i, df) })
        }
    val sb = new java.lang.StringBuilder
    var pos = 0
    val registered = Seq.newBuilder[PrunedView]
    resolved.zipWithIndex.foreach { case ((r, v, base), idx) =>
      val myConj = conjuncts.getOrElse(idx, Nil)
      val scan0 =
        if (myConj.isEmpty) base
        else {
          val pred = myConj.map(_._2).reduce(_ && _)
          scala.util.Try(scanPruned(spark, r.path, pred, v)._1)
            .getOrElse(base)
        }
      // ANALYZE-stats broadcast gate: a big table with a selective
      // equality filter IS broadcast-scale even when its file size alone
      // says shuffle — the persisted rows/bytes/NDV make that decision
      // principled where the 4 MB file threshold cannot see past the scan
      val scan =
        if (r.path.endsWith(".view.sql")) scan0
        else statsBroadcastHint(spark, r.path, v, scan0, myConj.map(_._1))
      val key = java.security.MessageDigest.getInstance("MD5")
        .digest(s"${r.path}@$v@${myConj.map(_._1).mkString("&")}"
          .getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(16)
      val view = s"graft_lake_$key"
      scan.createOrReplaceTempView(view)
      if (!r.path.endsWith(".view.sql"))
        registered += PrunedView(view, r.path, v, myConj, scan)
      sb.append(statement.substring(pos, r.start)).append(view)
      // a bare name without an explicit alias was the qualifier for its
      // columns — keep it resolvable by re-aliasing the view to it
      if (!r.aliasInText && r.alias.isDefined)
        sb.append(" AS ").append(r.alias.get)
      pos = r.end
    }
    sb.append(statement.substring(pos))
    val text = sb.toString
    val df0 = spark.sql(text)
    joinDerivedPrune(spark, df0, text, registered.result())
  }

  /** One delegated reference's registered temp view — the handle
    * [[joinDerivedPrune]] re-prunes through. */
  private final case class PrunedView(view: String, path: String, version: Long,
    conjuncts: Seq[(String, org.apache.spark.sql.Column)], scan: DataFrame)

  /** True while building a frame for EXPLAIN — [[joinDerivedPrune]]'s
    * dim-side bounds probe is a real (bounded) Spark job, and EXPLAIN
    * promises not to run ANY job, so the probe is skipped under it. */
  val planOnly = new scala.util.DynamicVariable[Boolean](false)

  /** The [[analyzeTable]]-stats broadcast decision for one delegated
    * reference: estimated surviving bytes = analyzed bytes × Π selectivity
    * of the reference's own equality/IN conjuncts (`1/ndv`, `k/ndv` —
    * ranges and everything else count 1.0, conservative), broadcast-hint
    * the scan when that estimate fits the session's autoBroadcast
    * threshold. Sound by construction: a hint never changes results, only
    * the join strategy; stats must be stamped at the CURRENT version
    * (and match an explicit pin) or the heuristic plan stands — stale
    * stats must not broadcast a table that grew. */
  private def statsBroadcastHint(spark: SparkSession, path: String,
      version: Long, scan: DataFrame, conjunctTexts: Seq[String]): DataFrame = {
    val stats = tableStats(spark, path).getOrElse(return scan)
    val head = versionOf(spark, path)
    if (stats.version != head || (version >= 0 && version != head)) return scan
    val threshold = scala.util.Try(
      org.apache.spark.network.util.JavaUtils.byteStringAsBytes(
        spark.conf.get("spark.sql.autoBroadcastJoinThreshold")))
      .getOrElse(-1L)
    if (threshold <= 0 || stats.bytes <= threshold) return scan // Catalyst's call
    import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
    import org.apache.spark.sql.catalyst.expressions.{And, AttributeReference, EqualTo, Expression, In, Literal}
    def nameOf(e: Expression): Option[String] = e match {
      case a: UnresolvedAttribute => Some(a.nameParts.last)
      case a: AttributeReference => Some(a.name)
      case _ => None
    }
    def sel(e: Expression): Double = e match {
      case EqualTo(l, _: Literal) =>
        nameOf(l).flatMap(stats.ndv.get).filter(_ > 0).map(1.0 / _).getOrElse(1.0)
      case EqualTo(_: Literal, r) =>
        nameOf(r).flatMap(stats.ndv.get).filter(_ > 0).map(1.0 / _).getOrElse(1.0)
      case In(v, list) if list.forall(_.isInstanceOf[Literal]) =>
        nameOf(v).flatMap(stats.ndv.get).filter(_ > 0)
          .map(n => math.min(1.0, list.size.toDouble / n)).getOrElse(1.0)
      case And(l, r) => sel(l) * sel(r)
      case _ => 1.0
    }
    val s = conjunctTexts.map { t =>
      scala.util.Try(sel(
        org.apache.spark.sql.graft.Bridge.parseExpression(spark, t)))
        .getOrElse(1.0)
    }.product
    if (stats.bytes * s <= threshold)
      org.apache.spark.sql.functions.broadcast(scan)
    else scan
  }

  /** Count of executed dim-side bounds probes — observability for specs
    * (EXPLAIN must leave it unchanged; an executed join SELECT moves it). */
  val jdpProbeCount = new java.util.concurrent.atomic.AtomicLong(0)

  /** Largest dim key set [[joinDerivedPrune]] turns into an IN probe —
    * beyond it the translated survives-expression (one interval+bloom
    * check per key per file) outgrows its usefulness and the min/max
    * bounds probe takes over. */
  private val MaxJdpInKeys = 256

  /** JOIN-DERIVED manifest pruning — the skipping tier S11ppm's per-alias
    * conjuncts cannot reach: a selective DIM-side filter never shrinks the
    * FACT side's file set through its own WHERE, so the Q3-shape join
    * still opens every fact file that survives the fact's own conjuncts.
    * This pass walks the OPTIMIZED logical plan for equi-join conditions
    * between two delegated scans, computes the small side's join-key
    * min/max (ONE tiny agg over its already-pruned, conjunct-filtered
    * rows), feeds `key BETWEEN lo AND hi` through the same [[scanPruned]]
    * file-stats translator on the big side, and re-registers that side's
    * view — the manifest-tier analog of Spark's partition-level DPP for
    * path-addressed tables.
    *
    * Soundness (pruning-only — every gate failure keeps the original
    * plan): only `EqualTo` keys (never null-safe `<=>`, whose NULL keys
    * match and would escape min/max bounds); join types where dropped
    * rows provably cannot contribute — INNER/LeftSemi (either side),
    * LeftOuter (the non-preserved right side only), RightOuter (left);
    * both key attributes must reach the join UNALIASED from their leaf
    * scans (exprId match); a view name registered by two references is
    * never re-pruned (re-registration would leak one occurrence's bounds
    * into the other); bounds from an EMPTY dim skip (never fabricate a
    * false predicate). The dim side must be broadcast-scale (≤128 MB of
    * surviving files) and the fact ≥4× larger — below that the extra
    * snapshot replay and agg job cost more than the files they skip. */
  private def joinDerivedPrune(spark: SparkSession, df0: DataFrame,
      text: String, views: Seq[PrunedView]): DataFrame = scala.util.Try {
    import org.apache.spark.sql.catalyst.expressions.{AttributeReference, EqualTo, Expression}
    if (planOnly.value) return df0 // EXPLAIN runs no jobs, not even the probe
    import org.apache.spark.sql.catalyst.plans.logical.{Join, LogicalPlan}
    import org.apache.spark.sql.catalyst.plans.{InnerLike, LeftOuter, LeftSemi, RightOuter}
    import org.apache.spark.sql.execution.datasources.LogicalRelation
    import org.apache.spark.sql.functions.{col, lit, max, min}
    if (views.length < 2) return df0
    val single = views.groupBy(_.view).collect { case (_, Seq(one)) => one }
      .map(v => v.view -> v).toMap
    def norm(p: String) = new org.apache.hadoop.fs.Path(p).toUri.getPath
    val byPath = single.values.map(v => norm(v.path) -> v).toMap
    // leaf scan of an attribute: the LogicalRelation whose output still
    // carries the attr's exprId (an aliased/derived key never matches)
    def ownerOf(plan: LogicalPlan, a: AttributeReference): Option[PrunedView] =
      plan.collectFirst {
        case lr: LogicalRelation if lr.output.exists(_.exprId == a.exprId) => lr
      }.flatMap { lr =>
        lr.relation match {
          case fs: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
            fs.location.rootPaths.headOption.map(p => norm(p.toString))
              .flatMap(f => byPath.toSeq.filter { case (root, _) =>
                f == root || f.startsWith(root + "/") }
                // nested table roots: the MOST SPECIFIC match owns the file
                .sortBy(-_._1.length).headOption.map(_._2))
          case _ => None
        }
      }
    val plan = df0.queryExecution.optimizedPlan
    def splitAnd(e: Expression): Seq[Expression] = e match {
      case org.apache.spark.sql.catalyst.expressions.And(l, r) =>
        splitAnd(l) ++ splitAnd(r)
      case other => Seq(other)
    }
    // (dim view+key, fact view+key) candidates; at most a handful per
    // statement — each costs one agg job + one snapshot replay
    val candidates = Seq.newBuilder[((PrunedView, String), (PrunedView, String))]
    plan.foreach {
      case j: Join =>
        j.condition.toSeq.flatMap(splitAnd).foreach {
          case EqualTo(a: AttributeReference, b: AttributeReference) =>
            val (la, lb) = (ownerOf(j.left, a).map((_, a.name)),
              ownerOf(j.right, b).map((_, b.name)))
            val (ra, rb) = (ownerOf(j.left, b).map((_, b.name)),
              ownerOf(j.right, a).map((_, a.name)))
            val sides = (la, lb) match {
              case (Some(l), Some(r)) => Some((l, r))
              case _ => (ra, rb) match {
                case (Some(l), Some(r)) => Some((l, r))
                case _ => None
              }
            }
            sides.foreach { case (left, right) =>
              if (left._1.path != right._1.path) j.joinType match {
                case _: InnerLike | LeftSemi =>
                  candidates += ((left, right)); candidates += ((right, left))
                case LeftOuter => candidates += ((left, right)) // prune right
                case RightOuter => candidates += ((right, left)) // prune left
                case _ =>
              }
            }
          case _ =>
        }
      case _ =>
    }
    def bytesOf(v: PrunedView): Long = scala.util.Try(
      v.scan.queryExecution.optimizedPlan.stats.sizeInBytes.toLong
    ).getOrElse(Long.MaxValue)
    val MaxDimBytes = 128L * 1024 * 1024
    var pruned = 0
    val repruned = scala.collection.mutable.Set.empty[String]
    candidates.result().distinct.foreach { case ((dim, dimKey), (fact, factKey)) =>
      if (pruned < 4 && !repruned.contains(fact.view)) {
        val (dimB, factB) = (bytesOf(dim), bytesOf(fact))
        if (dimB <= MaxDimBytes && factB >= 4 * dimB) scala.util.Try {
          val dimRows = dim.conjuncts.map(_._2)
            .foldLeft(dim.scan)((d, c) => d.where(c))
          jdpProbeCount.incrementAndGet()
          // TIGHTER probe first: a small dim key SET feeds `factKey IN
          // (…)` through the stats translator, whose equality checks
          // engage per-file BLOOM sketches (S8bl) — that prunes hash
          // layouts where [min, max] spans the whole domain and a
          // BETWEEN keeps everything. NULL dim keys drop (EqualTo join
          // keys never match them). Overflow (> MaxJdpInKeys distinct)
          // falls back to the one-row bounds agg; both probes are tiny
          // jobs over the already-pruned broadcast-scale dim.
          val keys = dimRows.select(col(dimKey))
            .where(col(dimKey).isNotNull)
            .distinct().limit(MaxJdpInKeys + 1).collect().map(_.get(0)).toSeq
          val joinPred: Option[org.apache.spark.sql.Column] =
            if (keys.isEmpty) None // empty dim: never fabricate FALSE
            else if (keys.length <= MaxJdpInKeys)
              Some(col(factKey).isin(keys: _*))
            else {
              val row = dimRows.agg(min(col(dimKey)), max(col(dimKey))).head()
              if (row.isNullAt(0) || row.isNullAt(1)) None
              else Some(col(factKey) >= lit(row.get(0)) &&
                col(factKey) <= lit(row.get(1)))
            }
          joinPred.foreach { bounds =>
            val pred = (fact.conjuncts.map(_._2) :+ bounds).reduce(_ && _)
            val before = fact.scan.inputFiles.length
            val scan = scanPruned(spark, fact.path, pred, fact.version)._1
            // re-register only a genuine win: re-analysis is not free
            if (scan.inputFiles.length < before) {
              scan.createOrReplaceTempView(fact.view)
              repruned += fact.view
              pruned += 1
            }
          }
        }
      }
    }
    if (pruned == 0) df0 else spark.sql(text)
  }.getOrElse(df0)

  /** Quote-aware matching-paren pairs of a statement — the block map
    * [[delegateSelect]] groups references by. */
  private def parenPairs(s: String): Seq[(Int, Int)] = {
    val out = Seq.newBuilder[(Int, Int)]
    var stack = List.empty[Int]
    var inStr = false
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (inStr) { if (c == '\'') inStr = false }
      else if (c == '\'') inStr = true
      else if (c == '(') stack ::= i
      else if (c == ')') stack match {
        case open :: rest => out += ((open, i)); stack = rest
        case Nil =>
      }
      i += 1
    }
    out.result()
  }

  /** Attribute one query BLOCK's top-level WHERE conjuncts to the single
    * table reference each touches — the file-stats pruning tier for
    * delegated SQL. `blockText` is the block's own text (the whole
    * statement, or the inside of a derived table's/CTE's parens) and
    * `refs` the (reference, global-index) pairs whose INNERMOST block it
    * is — each is at the block's own top level by construction. Returns
    * global-index → (text, stripped-qualifier Column) conjuncts; refs
    * absent from the map scan in full. Soundness gates (see
    * [[delegateSelect]] doc): no block-level set ops or outer joins,
    * deterministic subquery-free conjuncts, every attribute owned by
    * exactly one of the block's refs. */
  private def pruneConjuncts(spark: SparkSession, blockText: String,
      refs: Seq[(TableRef, Int, DataFrame)])
      : Map[Int, Seq[(String, org.apache.spark.sql.Column)]] = {
    import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
    import org.apache.spark.sql.graft.Bridge
    // LEFT/RIGHT/FULL here also matches the string functions LEFT()/
    // RIGHT() in top-level clauses — a false positive only DISABLES an
    // optimization, never changes results
    val safe = Seq("UNION", "INTERSECT", "EXCEPT", "LEFT", "RIGHT", "FULL")
      .forall(kw => topLevelKeyword(blockText, kw) < 0)
    if (!safe || refs.isEmpty) return Map.empty
    val whereText = outerWhereText(blockText).getOrElse(return Map.empty)
    val byIdx = refs.map { case (_, i, df) => i -> df }.toMap
    // lowercased column sets per target, from the already-resolved scans
    val colSets: Map[Int, Set[String]] = refs.flatMap { case (_, i, df) =>
      scala.util.Try(i -> df.schema.fieldNames
        .map(_.toLowerCase(java.util.Locale.ROOT)).toSet).toOption
    }.toMap
    def ownerOf(parts: Seq[String]): Option[Int] = parts match {
      case Seq(c0) =>
        val c = c0.toLowerCase(java.util.Locale.ROOT)
        val owners = colSets.filter(_._2.contains(c)).keys.toSeq
        if (owners.length == 1) Some(owners.head) else None
      case Seq(q, c0) =>
        val c = c0.toLowerCase(java.util.Locale.ROOT)
        refs.collectFirst {
          case (r, i, _) if r.alias.exists(_.equalsIgnoreCase(q)) &&
            colSets.get(i).exists(_.contains(c)) => i
        }
      case _ => None
    }
    splitConjuncts(whereText).flatMap { text =>
      // parse EAGERLY (functions.expr defers parsing to analysis, hiding
      // the attribute/subquery structure this attribution needs)
      scala.util.Try(Bridge.parseExpression(spark, text)).toOption.flatMap { e =>
        val hasSubquery = e.find(
          _.isInstanceOf[org.apache.spark.sql.catalyst.expressions.PlanExpression[_]])
          .isDefined
        // determinism on the UNRESOLVED tree is provisional (an unresolved
        // function reports its children's flag); the authoritative check
        // runs on the ANALYZED filter below
        if (hasSubquery || !e.deterministic) None
        else {
          val attrs = e.collect { case a: UnresolvedAttribute => a.nameParts }
          val owners = attrs.map(ownerOf).distinct
          owners match {
            case Seq(Some(i)) =>
              // strip the (single, verified) qualifier so the predicate
              // binds against the bare scan
              val stripped = e.transform {
                case a: UnresolvedAttribute if a.nameParts.length == 2 =>
                  UnresolvedAttribute(a.nameParts.tail)
              }
              val col = Bridge.column(stripped)
              // analyze against the ref's relation: resolves functions, so
              // the determinism check is authoritative; failures drop the
              // conjunct (pruning is an optimization)
              val ok = scala.util.Try {
                byIdx(i).where(col).queryExecution.analyzed match {
                  case f: org.apache.spark.sql.catalyst.plans.logical.Filter =>
                    f.condition.deterministic
                  case _ => false
                }
              }.getOrElse(false)
              if (ok) Some(i -> (text, col)) else None
            case _ => None // cross-ref, unowned, or attribute-free conjunct
          }
        }
      }
    }.groupBy(_._1).map { case (i, kvs) => i -> kvs.map(_._2) }
  }

  /** Split a predicate text on its top-level ANDs (quote/paren-aware),
    * keeping each `BETWEEN lo AND hi`'s AND glued to its BETWEEN. */
  private[sources] def splitConjuncts(pred: String): Seq[String] = {
    def positions(kw: String): Seq[Int] = {
      val b = Seq.newBuilder[Int]
      var i = topLevelKeyword(pred, kw)
      while (i >= 0) { b += i; i = topLevelKeyword(pred, kw, i + kw.length) }
      b.result()
    }
    val splits = Seq.newBuilder[Int]
    var pendingBetween = 0
    (positions("BETWEEN").map((_, true)) ++ positions("AND").map((_, false)))
      .sortBy(_._1).foreach {
        case (_, true) => pendingBetween += 1
        case (i, false) =>
          if (pendingBetween > 0) pendingBetween -= 1 else splits += i
      }
    val bounds = splits.result()
    (0 +: bounds.map(_ + 3)).zip(bounds :+ pred.length)
      .map { case (a, b) => pred.substring(a, b).trim }
      .filter(_.nonEmpty)
  }
}
