package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

import Lake._

/** The DELEGATION PLANNER for [[Lake.sqlFrame]]'s general SELECTs: each
  * lake reference in the statement registers as a temp view over the
  * format-detected, version-pinned, file-stats-PRUNED scan, the statement
  * text is rewritten to name the views, and the whole statement runs
  * through `spark.sql`. On top of the per-alias pruning tier this object
  * carries the cross-reference planning moves a 100 TB statement needs:
  * ANALYZE-stats broadcast hints (histogram range selectivity included),
  * stats-driven join reordering, join-derived manifest pruning (the
  * file-level analog of DPP), and the bucket-layout auto-routes —
  * storage-partitioned join ([[spjAutoRoute]]), bucket-local aggregation
  * and DISTINCT ([[aggAutoRoute]]), and the join+rollup fusion
  * ([[fuseLocalAgg]]) — every one refusal-based: a gate miss falls back
  * silently to the ordinary delegated plan. */
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
    // STORAGE-PARTITIONED-JOIN auto-route: a plain two-table equi-join
    // over co-bucketed Iceberg tables plans through the shuffle-free
    // co-partitioned reader — the layout's promise must not require
    // knowing the bucket_join TVF exists. Any refusal falls through
    // silently to the ordinary delegated plan.
    spjAutoRoute(spark, statement, refs).foreach(df => return df)
    // BUCKET-LOCAL-AGGREGATION auto-route: a single-table GROUP BY whose
    // keys include the bucket key plans as per-bucket complete aggregation
    // (zero exchange) straight from statement text. Same refusal contract.
    aggAutoRoute(spark, statement, refs).foreach(df => return df)
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
    // STATS-DRIVEN JOIN ORDER: a 3+-table chain of plain INNER JOINs in
    // textual order can be a 10× plan at scale — when every reference has
    // fresh ANALYZE stats, rewrite the FROM chain smallest-filtered-first
    // (greedy, connectivity-preserving) and re-delegate the better text.
    // One level of recursion only: the reordered statement's own reorder
    // pass is a no-op (already ordered), so it falls through to planning.
    joinReorder(spark, statement, resolved, conjuncts).foreach { better =>
      return delegateSelect(spark, better)
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

  /** True while EXPLAIN FILES builds its frame: the SPJ/agg auto-routes
    * read through an opaque RDD whose files `inputFiles` cannot see, so
    * the opened-vs-total report would claim 0 — the routes are suppressed
    * and the report describes the ordinary delegated plan (which is also
    * what a layout-less copy of the data would run). */
  val routesOff = new scala.util.DynamicVariable[Boolean](false)

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
    val s = selectivityOf(spark, stats, conjunctTexts)
    if (stats.bytes * s <= threshold)
      org.apache.spark.sql.functions.broadcast(scan)
    else scan
  }

  /** Estimated fraction of a table's rows surviving `conjunctTexts`
    * (Π per-conjunct selectivity, conservative 1.0 for anything the stats
    * cannot judge): equality/IN through NDV (`1/ndv`, `k/ndv`); range
    * comparisons and BETWEEN through the ANALYZE histograms (interval
    * fraction — a same-column AND of two ranges intersects the interval
    * instead of multiplying, so `BETWEEN` is not double-counted). */
  private[sources] def selectivityOf(spark: SparkSession, stats: TableStats,
      conjunctTexts: Seq[String]): Double = {
    import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
    import org.apache.spark.sql.catalyst.expressions.{And, AttributeReference, Cast, EqualTo, Expression, GreaterThan, GreaterThanOrEqual, In, LessThan, LessThanOrEqual, Literal}
    import org.apache.spark.sql.types.{DateType, NumericType, StringType, TimestampNTZType, TimestampType}
    def nameOf(e: Expression): Option[String] = e match {
      case a: UnresolvedAttribute => Some(a.nameParts.last)
      case a: AttributeReference => Some(a.name)
      case c: Cast => nameOf(c.child)
      case _ => None
    }
    // a literal mapped toward the histogram's canonical double domain. A
    // temporal literal is AMBIGUOUS until the column is known — the same
    // '2020-01-01' is epoch DAYS against a DATE column's histogram but
    // epoch MICROS against a TIMESTAMP one, and picking wrong yields a
    // confident 0 that broadcast-hints a huge scan — so temporals carry
    // BOTH readings and resolve against the histogram's own scale (day
    // domains top out ~1e7; micros for any modern instant exceed 1e12).
    sealed trait Canon
    case class NumV(v: Double) extends Canon
    case class TemporalV(days: Double, micros: Double) extends Canon
    def canonLit(e: Expression): Option[Canon] = e match {
      case Literal(v, _: NumericType) => Some(NumV(v.toString.toDouble))
      case Literal(d: Int, DateType) =>
        Some(TemporalV(d.toDouble, d.toDouble * 86400e6))
      case Literal(us: Long, TimestampType) =>
        Some(TemporalV(us / 86400e6, us.toDouble))
      case Literal(us: Long, TimestampNTZType) =>
        Some(TemporalV(us / 86400e6, us.toDouble))
      case Literal(s, StringType) =>
        val t = String.valueOf(s).trim
        scala.util.Try(java.time.LocalDate.parse(t).toEpochDay.toDouble).toOption
          .map(d => TemporalV(d, d * 86400e6))
          .orElse(scala.util.Try {
            val iso = if (t.contains("T")) t else t.replace(" ", "T")
            val ms = java.time.LocalDateTime.parse(iso)
              .toInstant(java.time.ZoneOffset.UTC).toEpochMilli
            TemporalV(ms / 86400e3, ms * 1000.0)
          }.toOption)
      case c: Cast if c.foldable => scala.util.Try(
        Literal(c.eval(null), c.dataType)).toOption.flatMap(canonLit)
      case _ => None
    }
    // (column, lo, hi) of a single range comparison — None bound = open
    def rangeOf(e: Expression): Option[(String, Option[Canon], Option[Canon])] = e match {
      case LessThan(a, v) => for (n <- nameOf(a); x <- canonLit(v)) yield (n, None, Some(x))
      case LessThanOrEqual(a, v) => for (n <- nameOf(a); x <- canonLit(v)) yield (n, None, Some(x))
      case GreaterThan(a, v) => for (n <- nameOf(a); x <- canonLit(v)) yield (n, Some(x), None)
      case GreaterThanOrEqual(a, v) => for (n <- nameOf(a); x <- canonLit(v)) yield (n, Some(x), None)
      // literal-on-left flips
      case LessThan(v: Literal, a) => for (n <- nameOf(a); x <- canonLit(v)) yield (n, Some(x), None)
      case LessThanOrEqual(v: Literal, a) => for (n <- nameOf(a); x <- canonLit(v)) yield (n, Some(x), None)
      case GreaterThan(v: Literal, a) => for (n <- nameOf(a); x <- canonLit(v)) yield (n, None, Some(x))
      case GreaterThanOrEqual(v: Literal, a) => for (n <- nameOf(a); x <- canonLit(v)) yield (n, None, Some(x))
      case _ => None
    }
    def resolve(h: ColHistogram, c: Canon): Double = c match {
      case NumV(v) => v
      case TemporalV(days, micros) => if (h.hi > 1e10) micros else days
    }
    def fractionOf(col: String, lo: Option[Canon], hi: Option[Canon]): Option[Double] =
      stats.hist.get(col).map { h =>
        h.fraction(lo.map(resolve(h, _)).getOrElse(Double.NegativeInfinity),
          hi.map(resolve(h, _)).getOrElse(Double.PositiveInfinity))
      }
    def sel(e: Expression): Double = e match {
      case EqualTo(l, _: Literal) =>
        nameOf(l).flatMap(stats.ndv.get).filter(_ > 0).map(1.0 / _).getOrElse(1.0)
      case EqualTo(_: Literal, r) =>
        nameOf(r).flatMap(stats.ndv.get).filter(_ > 0).map(1.0 / _).getOrElse(1.0)
      case In(v, list) if list.forall(_.isInstanceOf[Literal]) =>
        nameOf(v).flatMap(stats.ndv.get).filter(_ > 0)
          .map(n => math.min(1.0, list.size.toDouble / n)).getOrElse(1.0)
      case And(l, r) =>
        // same-column range conjunction (BETWEEN) → interval intersection
        (rangeOf(l), rangeOf(r)) match {
          case (Some((cl, llo, lhi)), Some((cr, rlo, rhi))) if cl == cr =>
            stats.hist.get(cl).map { h =>
              def rv(o: Option[Canon], d: Double) =
                o.map(resolve(h, _)).getOrElse(d)
              h.fraction(
                math.max(rv(llo, Double.NegativeInfinity),
                  rv(rlo, Double.NegativeInfinity)),
                math.min(rv(lhi, Double.PositiveInfinity),
                  rv(rhi, Double.PositiveInfinity)))
            }.getOrElse(sel(l) * sel(r))
          case _ => sel(l) * sel(r)
        }
      case other => rangeOf(other)
        .flatMap { case (c, lo, hi) => fractionOf(c, lo, hi) }
        .getOrElse(1.0)
    }
    conjunctTexts.map { t =>
      scala.util.Try(sel(
        org.apache.spark.sql.graft.Bridge.parseExpression(spark, t)))
        .getOrElse(1.0)
    }.product
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
    // path → view only when the path is registered by EXACTLY one view:
    // a role-playing dimension (same path referenced twice with different
    // per-alias conjuncts) registers two views, and a last-wins map would
    // attribute BOTH occurrences' attributes to one of them — the bounds/IN
    // probe would then prune the fact with the wrong occurrence's conjuncts
    // (silent missing rows). Multi-occurrence paths skip this tier.
    val byPath = single.values.toSeq.groupBy(v => norm(v.path))
      .collect { case (p, Seq(one)) => p -> one }.toMap
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

  /** A session byte budget (`1g`-style strings accepted), defaulting. */
  private def budgetBytes(spark: SparkSession, key: String, default: Long): Long =
    spark.conf.getOption(key)
      .flatMap(v => scala.util.Try(
        org.apache.spark.network.util.JavaUtils.byteStringAsBytes(v)).toOption)
      .getOrElse(default)

  /** Manifest bytes of one table's LARGEST bucket — the auto-routes' build/
    * map sizing input (cached layout replay, zero filesystem calls). */
  private def maxBucketBytes(spark: SparkSession, path: String, key: String): Long =
    IcebergRead.bucketLayoutSized(spark, path, key)
      .map(_._2.values.map(_.map(_._2).sum).maxOption.getOrElse(0L))
      .getOrElse(0L)

  /** Compressed-parquet manifest bytes → in-heap row bytes, conservative. */
  private val HeapInflation = 4L

  /** MEMORY GATE for the bucket-local aggregation/DISTINCT auto-routes:
    * when CURRENT-version ANALYZE stats exist, the per-bucket group map is
    * estimated as `min(rows, Π ndv(group col)) / n` groups × (group-column
    * width + per-aggregate buffer + map overhead) and the route REFUSES
    * (→ the shuffled plan, which Spark spills natively) when the estimate
    * exceeds `graft.route.aggBudgetBytes` (default 1 GiB). Absent or stale
    * stats pass the gate — the operator's own flush-and-merge spill then
    * bounds heap; the gate exists so an auto-route never picks a plan the
    * stats already say will spill heavily when the ordinary exchange would
    * not. */
  private def aggRouteFits(spark: SparkSession, path: String, key: String,
      schema: org.apache.spark.sql.types.StructType, groupCols: Seq[String],
      nAggs: Int): Boolean = {
    val st = tableStats(spark, path).getOrElse(return true)
    if (st.version != versionOf(spark, path)) return true
    val n = IcebergRead.bucketLayout(spark, path, key)
      .map(_._1).getOrElse(return true)
    val ndvs = groupCols.map(c => st.ndv.get(c).filter(_ > 0)
      .map(_.toDouble).getOrElse(return true))
    val groups = math.min(st.rows.toDouble, ndvs.product)
    val groupWidth = groupCols.map(c =>
      scala.util.Try(schema(c).dataType.defaultSize.toLong).getOrElse(16L)).sum
    val perGroup = groupWidth + 32L * nAggs + 64L // buffers + map overhead
    groups / n * perGroup <=
      budgetBytes(spark, "graft.route.aggBudgetBytes", 1L << 30)
  }

  /** STORAGE-PARTITIONED-JOIN auto-route (SURVEY §2 S9bj from plain SQL):
    * when a statement is a single-block `SELECT … FROM 'L' a JOIN 'R' b
    * ON a.k = b.k [AND residual…] [WHERE …] [GROUP/ORDER/LIMIT …]` and
    * both references are Iceberg tables `bucket(n, k)`-partitioned with
    * equal n, the join plans through [[graft.operators.BucketedJoin]]
    * instead of the shuffled path — with the statement's per-alias
    * conjuncts pushed INSIDE the per-bucket parquet reads and the join
    * view pruned to exactly the columns the statement references.
    *
    * Sound by refusal — ANY gate miss returns None and the ordinary
    * delegated plan runs instead: both refs depth-0, unpinned, not views;
    * exactly one top-level plain (INNER) JOIN and no other join/set-op
    * keywords; no nested SELECT (a subquery's own aliases must not be
    * qualifier-stripped); no star expansion (`*` / `alias.*` — the SPJ
    * view drops the right key, so expansion would change the column set;
    * `count(*)`/multiplication stars are fine); every ON conjunct parses,
    * exactly one is a qualified same-name equality whose column is the
    * co-bucketed key, the rest ride as bucket-local residuals; every
    * column token resolves to one side (alias-qualified or unique by
    * schema membership). The rewritten text names one SPJ view and drops
    * the alias qualifiers (output column names are unique by the
    * coBucketedJoin collision check, enforced before the rewrite). */
  private def spjAutoRoute(spark: SparkSession, statement: String,
      refs: Seq[TableRef]): Option[DataFrame] = scala.util.Try {
    import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
    import org.apache.spark.sql.catalyst.expressions.{EqualTo, Expression}
    import org.apache.spark.sql.graft.Bridge
    if (routesOff.value) return None
    if (refs.length != 2) return None
    val Seq(l, r) = refs
    if (l.depth != 0 || r.depth != 0) return None
    if (l.version >= 0 || l.atMs >= 0 || r.version >= 0 || r.atMs >= 0) return None
    if (l.path.endsWith(".view.sql") || r.path.endsWith(".view.sql")) return None
    if (!statement.trim.toUpperCase(java.util.Locale.ROOT).startsWith("SELECT")) return None
    // single flat block: exactly one JOIN, no outer/cross/set-op shapes,
    // no nested SELECT anywhere (subqueries carry their own aliases)
    if (Seq("LEFT", "RIGHT", "FULL", "CROSS", "NATURAL", "SEMI", "ANTI",
        "LATERAL", "USING", "UNION", "INTERSECT", "EXCEPT")
        .exists(kw => topLevelKeyword(statement, kw) >= 0)) return None
    val joinIdx = topLevelKeyword(statement, "JOIN")
    if (joinIdx < 0 || topLevelKeyword(statement, "JOIN", joinIdx + 4) >= 0) return None
    if (nestedSelect(statement)) return None
    // the text between the refs must be nothing but the left alias (as
    // recorded) and the JOIN keyword
    val between = statement.substring(l.end, r.start).trim
    val aliasPart =
      if (l.aliasInText) s"(?:AS\\s+)?${java.util.regex.Pattern.quote(l.alias.getOrElse(""))}\\s+"
      else ""
    if (!between.matches(s"(?is)^$aliasPart(?:INNER\\s+)?JOIN$$")) return None
    // the ON clause: from the keyword after the right ref (and its alias)
    // to the next top-level clause keyword
    val onIdx = topLevelKeyword(statement, "ON", r.end)
    if (onIdx < 0) return None
    val betweenRo = statement.substring(r.end, onIdx).trim
    val aliasPartR =
      if (r.aliasInText) s"(?:AS\\s+)?${java.util.regex.Pattern.quote(r.alias.getOrElse(""))}"
      else ""
    if (!betweenRo.matches(s"(?is)^$aliasPartR$$")) return None
    val onEnd = Seq("WHERE", "GROUP", "HAVING", "ORDER", "LIMIT", "WINDOW", "QUALIFY")
      .map(kw => topLevelKeyword(statement, kw, onIdx))
      .filter(_ > onIdx).minOption.getOrElse(statement.length)
    val onText = statement.substring(onIdx + 2, onEnd).trim

    if (Lake.detect(spark, l.path) != Lake.Iceberg ||
      Lake.detect(spark, r.path) != Lake.Iceberg) return None
    val schemaL = IcebergRead.snapshot(spark, l.path).schema
    val schemaR = IcebergRead.snapshot(spark, r.path).schema
    val colsL = schemaL.fieldNames.map(_.toLowerCase(java.util.Locale.ROOT)).toSet
    val colsR = schemaR.fieldNames.map(_.toLowerCase(java.util.Locale.ROOT)).toSet
    val aliasL = l.alias.map(_.toLowerCase(java.util.Locale.ROOT))
    val aliasR = r.alias.map(_.toLowerCase(java.util.Locale.ROOT))
    def lc(s: String) = s.toLowerCase(java.util.Locale.ROOT)
    // side of an attribute: Some(true)=left, Some(false)=right, None=refuse
    def sideOf(parts: Seq[String]): Option[Boolean] = parts match {
      case Seq(q, c) if aliasL.contains(lc(q)) && colsL.contains(lc(c)) => Some(true)
      case Seq(q, c) if aliasR.contains(lc(q)) && colsR.contains(lc(c)) => Some(false)
      case Seq(c) if colsL.contains(lc(c)) && !colsR.contains(lc(c)) => Some(true)
      case Seq(c) if colsR.contains(lc(c)) && !colsL.contains(lc(c)) => Some(false)
      case _ => None
    }
    // exact-case column name of a side (statement tokens may differ in case)
    def colName(schema: org.apache.spark.sql.types.StructType, tok: String): String =
      schema.fieldNames.find(f => lc(f) == lc(tok)).getOrElse(tok)

    // classify the ON conjuncts: one co-bucketed same-name equality is THE
    // key; everything else (parsed, attributable) becomes a residual
    val onConjuncts = splitConjuncts(onText).map(t =>
      t -> Bridge.parseExpression(spark, t)) // any parse failure → refuse (Try)
    def stripQual(e: Expression): Expression = e.transform {
      case a: UnresolvedAttribute if a.nameParts.length == 2 &&
          (aliasL.contains(lc(a.nameParts.head)) || aliasR.contains(lc(a.nameParts.head))) =>
        UnresolvedAttribute(a.nameParts.tail)
    }
    var key: Option[(String, String)] = None // (left column, right column)
    val residuals = Seq.newBuilder[Expression]
    onConjuncts.foreach { case (_, e) =>
      // every attribute must resolve to exactly one side — an unqualified
      // name living in both schemas is ambiguous in the original statement
      val attrs = e.collect { case a: UnresolvedAttribute => a.nameParts }
      if (attrs.exists(sideOf(_).isEmpty)) return None
      e match {
        case EqualTo(a: UnresolvedAttribute, b: UnresolvedAttribute)
            if key.isEmpty && sideOf(a.nameParts) != sideOf(b.nameParts) &&
              sideOf(a.nameParts).isDefined && sideOf(b.nameParts).isDefined => {
          // the key columns may carry DIFFERENT names per side (the
          // natural orders.o_custkey = customer.c_custkey shape)
          val (lTok, rTok) =
            if (sideOf(a.nameParts).contains(true)) (a.nameParts.last, b.nameParts.last)
            else (b.nameParts.last, a.nameParts.last)
          val (kl, kr) = (colName(schemaL, lTok), colName(schemaR, rTok))
          if (graft.operators.BucketedJoin.coBucketed(spark, l.path, r.path, kl, kr))
            key = Some((kl, kr))
          else residuals += stripQual(e)
        }
        case other => residuals += stripQual(other)
      }
    }
    val (k, kr) = key.getOrElse(return None)

    // MEMORY GATE: the per-bucket local join BUILDS the whole right bucket
    // in heap (no spill there). Manifest byte sizes are always known —
    // refuse the auto-route when the largest right bucket, inflated to
    // in-heap row size, exceeds `graft.route.buildBudgetBytes` (default
    // 1 GiB); the shuffled plan, which spills natively, runs instead. An
    // adversely-bucketed layout (n picked for a smaller cluster, a table
    // that grew 10×) must degrade, never OOM a plain SELECT. The explicit
    // bucket_join TVF/API keeps its documented sizing contract.
    if (maxBucketBytes(spark, r.path, kr) * HeapInflation >
      budgetBytes(spark, "graft.route.buildBudgetBytes", 1L << 30)) return None

    // column tokens OUTSIDE the ON clause pick each side's kept columns
    // (the ON's own columns are read automatically as key/residual inputs);
    // star expansion refuses (count(*) and multiplication are fine)
    val (chainsPre, starPre) = identifierChains(statement.substring(0, onIdx))
    val (chainsPost, starPost) = identifierChains(statement.substring(onEnd))
    val chains = chainsPre ++ chainsPost
    if (starPre || starPost) return None
    // the right KEY column is dropped from the join output (its values
    // are the left key's) — a reference to it outside the ON clause would
    // dangle after the rewrite, so refuse and fall back
    if (kr != k && chains.exists {
      case Seq(q, c) => aliasR.contains(lc(q)) && lc(c) == lc(kr)
      case Seq(c) => lc(c) == lc(kr) && colsR.contains(lc(c)) && !colsL.contains(lc(c))
      case _ => false
    }) return None
    val keepL = Seq.newBuilder[String]
    val keepR = Seq.newBuilder[String]
    chains.foreach {
      case Seq(q, c) if aliasL.contains(lc(q)) && colsL.contains(lc(c)) =>
        keepL += colName(schemaL, c)
      case Seq(q, c) if aliasR.contains(lc(q)) && colsR.contains(lc(c)) =>
        keepR += colName(schemaR, c)
      case Seq(q, c) if aliasL.contains(lc(q)) || aliasR.contains(lc(q)) =>
        return None // alias-qualified but not a column — would break resolve
      case Seq(c) if colsL.contains(lc(c)) && colsR.contains(lc(c)) =>
        // shared name: only the join key is unambiguous (one output column)
        if (lc(c) == lc(k)) keepL += k else return None
      case Seq(c) if colsL.contains(lc(c)) => keepL += colName(schemaL, c)
      case Seq(c) if colsR.contains(lc(c)) => keepR += colName(schemaR, c)
      case parts if parts.length > 2 &&
          (aliasL.contains(lc(parts.head)) || aliasR.contains(lc(parts.head))) =>
        return None // alias.struct.field — stripping would mangle it
      case _ => () // function/keyword/view token — not a column
    }

    // per-side WHERE conjuncts push INSIDE the bucket scans; the rewritten
    // statement re-applies the full WHERE (pushdown is an optimization).
    // Only deterministic, subquery-free, single-side conjuncts push.
    var whereL: Option[org.apache.spark.sql.Column] = None
    var whereR: Option[org.apache.spark.sql.Column] = None
    outerWhereText(statement).toSeq.flatMap(splitConjuncts).foreach { t =>
      scala.util.Try(Bridge.parseExpression(spark, t)).toOption.foreach { e =>
        val noSub = e.find(
          _.isInstanceOf[org.apache.spark.sql.catalyst.expressions.PlanExpression[_]]).isEmpty
        val sides = e.collect { case a: UnresolvedAttribute => a.nameParts }
          .map(sideOf).distinct
        if (noSub && e.deterministic) sides match {
          case Seq(Some(true)) =>
            val c = Bridge.column(stripQual(e))
            whereL = Some(whereL.map(_ && c).getOrElse(c))
          case Seq(Some(false)) =>
            val c = Bridge.column(stripQual(e))
            whereR = Some(whereR.map(_ && c).getOrElse(c))
          case _ => ()
        }
      }
    }

    val residual = residuals.result() match {
      case Seq() => None
      case rs => Some(Bridge.column(rs.reduce(
        org.apache.spark.sql.catalyst.expressions.And(_, _))))
    }
    // the join itself — collision check and layout gates live inside;
    // leftCols must carry the key if ANY side's key was referenced
    // the kr fallback only marks "not ALL columns" when nothing of the
    // right side is referenced (empty rightCols would mean the full schema)
    val rightKeep = {
      val ks = keepR.result().distinct
      if (ks.isEmpty) Seq(kr) else ks
    }
    def buildJoin(splitBytes: Long) =
      graft.operators.BucketedJoin.coBucketedJoin(spark,
        l.path, r.path, k,
        leftCols = (keepL.result() :+ k).distinct,
        rightCols = rightKeep,
        leftWhere = whereL, rightWhere = whereR, residual = residual,
        splitBucketBytes = splitBytes, rightKey = kr)
    val viewKey = java.security.MessageDigest.getInstance("MD5")
      .digest(statement.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(16)
    val view = s"graft_spj_$viewKey"
    // rewrite: [left ref .. end of ON] → the view; strip alias qualifiers
    // everywhere else (the view's column names are unique)
    def strip(s: String): String = {
      val sb = new java.lang.StringBuilder
      var i = 0
      var inStr = false
      def isWord(c: Char) = Character.isLetterOrDigit(c) || c == '_'
      while (i < s.length) {
        val c = s.charAt(i)
        if (inStr) { sb.append(c); if (c == '\'') inStr = false; i += 1 }
        else if (c == '\'') { sb.append(c); inStr = true; i += 1 }
        else if (Character.isLetter(c) && (i == 0 || !isWord(s.charAt(i - 1)))) {
          var j = i
          while (j < s.length && isWord(s.charAt(j))) j += 1
          val w = s.substring(i, j)
          val isAlias = aliasL.contains(lc(w)) || aliasR.contains(lc(w))
          if (isAlias && j < s.length && s.charAt(j) == '.' &&
              j + 1 < s.length && (Character.isLetter(s.charAt(j + 1)) || s.charAt(j + 1) == '_'))
            i = j + 1 // drop "alias."
          else { sb.append(w); i = j }
        } else { sb.append(c); i += 1 }
      }
      sb.toString
    }
    val text = strip(statement.substring(0, l.start)) + view + " " +
      strip(statement.substring(onEnd))
    // COMPOSITION: a GROUP BY that includes the join key aggregates
    // bucket-locally ON TOP of the zero-shuffle join (partition i of the
    // joined frame is bucket i, so key-including groups never span
    // partitions) — the whole join+rollup then runs with ZERO exchanges.
    // The fused input must be built WITHOUT the skew split (a split
    // bucket's chunks would each emit a complete-but-partial group —
    // silent wrong results); the unfused route keeps the split.
    fuseLocalAgg(spark, buildJoin(0L), text, k) match {
      case Some(df) => Some(df)
      case None =>
        buildJoin(graft.operators.BucketedJoin.DefaultSplitBucketBytes)
          .createOrReplaceTempView(view)
        Some(spark.sql(text))
    }
  }.toOption.flatten

  /** Fuse a bucket-key GROUP BY into an already co-partitioned frame
    * ([[spjAutoRoute]]'s joined view): `text` is the rewritten statement
    * (alias qualifiers already stripped, FROM names the SPJ view). Same
    * item rules as [[aggAutoRoute]] — group columns pass through,
    * aggregates need an explicit alias; the WHERE (if any) applies to the
    * joined frame BEFORE aggregation (narrow filter, partitioning kept).
    * Any gate miss returns None and the caller runs `text` as-is (the
    * join stays shuffle-free; only the rollup pays its exchange). */
  private def fuseLocalAgg(spark: SparkSession, joined: DataFrame,
      text: String, key: String): Option[DataFrame] = scala.util.Try {
    import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
    import org.apache.spark.sql.graft.Bridge
    val up = text.trim.toUpperCase(java.util.Locale.ROOT)
    if (!up.startsWith("SELECT") || up.startsWith("SELECT DISTINCT")) return None
    if (Seq("HAVING", "WINDOW", "QUALIFY", "OVER")
        .exists(kw => topLevelKeyword(text, kw) >= 0)) return None
    if (nestedSelect(text)) return None
    val groupIdx = topLevelKeyword(text, "GROUP")
    if (groupIdx < 0) return None
    val byIdx = topLevelKeyword(text, "BY", groupIdx)
    if (byIdx < 0) return None
    val tailIdx = Seq("ORDER", "LIMIT")
      .map(kw => topLevelKeyword(text, kw, byIdx))
      .filter(_ >= 0).minOption.getOrElse(text.length)
    val tail = text.substring(tailIdx)
    if (tail.contains("'")) return None
    def lc(s: String) = s.toLowerCase(java.util.Locale.ROOT)
    val colByLc = joined.schema.fieldNames.map(f => lc(f) -> f).toMap
    def plainCol(t: String): Option[String] = {
      val c = t.trim
      if (c.matches("^[A-Za-z_][A-Za-z0-9_]*$")) colByLc.get(lc(c)) else None
    }
    val groupCols = splitTopLevel(text.substring(byIdx + 2, tailIdx))
      .map(t => plainCol(t).getOrElse(return None))
    if (!groupCols.contains(key)) return None
    val fromIdx = topLevelKeyword(text, "FROM")
    if (fromIdx < 0) return None
    val selStart = topLevelKeyword(text, "SELECT") + 6
    val aggCols = Seq.newBuilder[org.apache.spark.sql.Column]
    val outItems = splitTopLevel(text.substring(selStart, fromIdx)).map { item =>
      val asIdx = topLevelKeyword(item, "AS")
      val (bodyText, aliasOut) =
        if (asIdx < 0) (item.trim, None)
        else (item.substring(0, asIdx).trim,
          Some(item.substring(asIdx + 2).trim).filter(_.matches("^[A-Za-z_][A-Za-z0-9_]*$")))
      plainCol(bodyText) match {
        case Some(g) if groupCols.contains(g) =>
          aliasOut match { case Some(o) => s"$g AS $o"; case None => g }
        case Some(_) => return None
        case None =>
          val out = aliasOut.getOrElse(return None)
          val e = Bridge.parseExpression(spark, bodyText)
          if (e.collect { case a: UnresolvedAttribute => a.nameParts }
            .exists(p => p.length != 1 || !colByLc.contains(lc(p.head)))) return None
          aggCols += Bridge.column(e).as(out)
          out
      }
    }
    val aggList = aggCols.result()
    if (aggList.isEmpty) return None
    val input = outerWhereText(text) match {
      case None => joined
      case Some(w) =>
        val e = Bridge.parseExpression(spark, w)
        if (!e.deterministic || e.find(
          _.isInstanceOf[org.apache.spark.sql.catalyst.expressions.PlanExpression[_]]).isDefined)
          return None
        if (e.collect { case a: UnresolvedAttribute => a.nameParts }
          .exists(p => p.length != 1 || !colByLc.contains(lc(p.head)))) return None
        joined.where(Bridge.column(e))
    }
    val view2 = "graft_spjagg_" + java.security.MessageDigest.getInstance("MD5")
      .digest(text.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(16)
    graft.operators.BucketedAgg.localAgg(spark, input, groupCols, aggList)
      .createOrReplaceTempView(view2)
    Some(spark.sql(s"SELECT ${outItems.mkString(", ")} FROM $view2 $tail"))
  }.toOption.flatten

  /** STATS-DRIVEN JOIN REORDER for a flat chain of 3+ plain INNER JOINs
    * over lake references: estimated surviving rows per reference =
    * ANALYZE rows × [[selectivityOf]] of its own attributed conjuncts;
    * the chain rebuilds greedily — smallest first, then always the
    * smallest reference CONNECTED to the built set by some ON conjunct
    * (connectivity-preserving: never introduces a cross join the original
    * didn't have). Inner joins are freely reorderable; every gate miss
    * returns None and the textual order stands: any non-INNER join or
    * set-op keyword, a nested SELECT, a reference without an alias or
    * without CURRENT-version stats, an ON conjunct that fails to parse or
    * attribute, or a already-optimal order. */
  private def joinReorder(spark: SparkSession, statement: String,
      resolved: Seq[(TableRef, Long, DataFrame)],
      conjuncts: Map[Int, Seq[(String, org.apache.spark.sql.Column)]])
      : Option[String] = scala.util.Try {
    import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
    import org.apache.spark.sql.graft.Bridge
    val refs = resolved.map(_._1)
    if (refs.length < 3) return None
    if (refs.exists(r => r.depth != 0 || r.alias.isEmpty ||
      r.path.endsWith(".view.sql"))) return None
    if (Seq("LEFT", "RIGHT", "FULL", "CROSS", "NATURAL", "SEMI", "ANTI",
        "LATERAL", "USING", "UNION", "INTERSECT", "EXCEPT")
        .exists(kw => topLevelKeyword(statement, kw) >= 0)) return None
    if (nestedSelect(statement)) return None
    val n = refs.length
    // chain shape: n-1 top-level JOINs, each strictly between consecutive
    // refs; an ON after every ref but the first
    val joinIdxs = {
      val b = Seq.newBuilder[Int]
      var i = topLevelKeyword(statement, "JOIN")
      while (i >= 0) { b += i; i = topLevelKeyword(statement, "JOIN", i + 4) }
      b.result()
    }
    if (joinIdxs.length != n - 1) return None
    (0 until n - 1).foreach { i =>
      if (!(joinIdxs(i) > refs(i).end && joinIdxs(i) < refs(i + 1).start)) return None
    }
    val clauseEnd = Seq("WHERE", "GROUP", "HAVING", "ORDER", "LIMIT", "WINDOW", "QUALIFY")
      .map(kw => topLevelKeyword(statement, kw, refs.last.end))
      .filter(_ >= 0).minOption.getOrElse(statement.length)
    // per-position ON condition text: after ref k (k >= 1) up to the next
    // JOIN (or the first clause keyword for the last one)
    val onTexts: Seq[String] = (1 until n).map { k =>
      val onIdx = topLevelKeyword(statement, "ON", refs(k).end)
      if (onIdx < 0) return None
      val end = if (k < n - 1) joinIdxs(k) else clauseEnd
      if (onIdx >= end) return None
      // between the ref (plus its alias) and the ON: nothing else
      val aliasPart =
        if (refs(k).aliasInText)
          s"(?:AS\\s+)?${java.util.regex.Pattern.quote(refs(k).alias.get)}"
        else ""
      if (!statement.substring(refs(k).end, onIdx).trim
        .matches(s"(?is)^$aliasPart$$")) return None
      statement.substring(onIdx + 2, end).trim
    }
    // and between ref 0 and the first JOIN: only its alias
    val alias0Part =
      if (refs(0).aliasInText)
        s"(?:AS\\s+)?${java.util.regex.Pattern.quote(refs(0).alias.get)}"
      else ""
    if (!statement.substring(refs(0).end, joinIdxs(0)).trim
      .matches(s"(?is)^$alias0Part$$")) return None

    // every ref needs CURRENT-version stats (stale stats must not order)
    val stats = resolved.map { case (r, v, _) =>
      val st = tableStats(spark, r.path).getOrElse(return None)
      val head = versionOf(spark, r.path)
      if (st.version != head || (v >= 0 && v != head)) return None
      st
    }
    val estRows: Seq[Double] = resolved.zipWithIndex.map { case ((_, _, _), i) =>
      math.max(1.0, stats(i).rows *
        selectivityOf(spark, stats(i), conjuncts.getOrElse(i, Nil).map(_._1)))
    }
    // attribute each ON conjunct to the refs it touches (alias-qualified,
    // or unique schema membership); unattributable → refuse
    val aliasIdx: Map[String, Int] = refs.zipWithIndex
      .map { case (r, i) => r.alias.get.toLowerCase(java.util.Locale.ROOT) -> i }.toMap
    if (aliasIdx.size != n) return None // duplicate aliases
    val colOwners: Map[String, Seq[Int]] = resolved.zipWithIndex
      .flatMap { case ((_, _, df), i) =>
        df.schema.fieldNames.map(c => c.toLowerCase(java.util.Locale.ROOT) -> i) }
      .groupBy(_._1).view.mapValues(_.map(_._2).toSeq).toMap
    def refsOf(text: String): Option[(String, Set[Int])] = {
      val e = Bridge.parseExpression(spark, text)
      if (!e.deterministic || e.find(
        _.isInstanceOf[org.apache.spark.sql.catalyst.expressions.PlanExpression[_]]).isDefined)
        return None
      val owners = e.collect { case a: UnresolvedAttribute => a.nameParts }.map {
        case Seq(q, _) => aliasIdx.get(q.toLowerCase(java.util.Locale.ROOT))
        case Seq(c) => colOwners.get(c.toLowerCase(java.util.Locale.ROOT)) match {
          case Some(Seq(one)) => Some(one)
          case _ => None
        }
        case _ => None
      }
      if (owners.exists(_.isEmpty)) None
      else Some((text, owners.flatten.toSet))
    }
    val onConjuncts: Seq[(String, Set[Int])] =
      onTexts.flatMap(splitConjuncts).map(t => refsOf(t).getOrElse(return None))

    // greedy smallest-first, connected-only
    val order = Seq.newBuilder[Int]
    val placed = scala.collection.mutable.Set.empty[Int]
    val first = estRows.zipWithIndex.minBy(_._1)._2
    order += first; placed += first
    while (placed.size < n) {
      val connected = (0 until n).filterNot(placed.contains).filter { cand =>
        onConjuncts.exists { case (_, owners) =>
          owners.contains(cand) && (owners - cand).nonEmpty &&
            (owners - cand).subsetOf(placed)
        }
      }
      if (connected.isEmpty) return None // would introduce a cross join
      val next = connected.minBy(estRows)
      order += next; placed += next
    }
    val ordered = order.result()
    if (ordered == (0 until n)) return None // already optimal

    // rebuild the FROM chain; each conjunct attaches at the FIRST position
    // where all its refs are present
    val used = scala.collection.mutable.Set.empty[Int]
    val chainSb = new java.lang.StringBuilder
    def refText(i: Int): String = {
      val r = refs(i)
      statement.substring(r.start, r.end) + " " + r.alias.get
    }
    chainSb.append(refText(ordered.head))
    val present = scala.collection.mutable.Set(ordered.head)
    ordered.tail.foreach { i =>
      present += i
      val conds = onConjuncts.zipWithIndex.filter { case ((_, owners), ci) =>
        !used.contains(ci) && owners.subsetOf(present)
      }
      if (!conds.exists(_._1._2.contains(i))) return None // no link to i
      conds.foreach { case (_, ci) => used += ci }
      chainSb.append(" JOIN ").append(refText(i)).append(" ON ")
        .append(conds.map { case ((t, _), _) => s"($t)" }.mkString(" AND "))
    }
    if (used.size != onConjuncts.length) return None
    Some(statement.substring(0, refs.head.start) + chainSb.toString + " " +
      statement.substring(clauseEnd))
  }.toOption.flatten

  /** BUCKET-LOCAL-AGGREGATION auto-route (SURVEY §2 S9ba from plain SQL):
    * when a statement is a single-block `SELECT <items> FROM '/t' [a]
    * [WHERE …] GROUP BY <cols> [ORDER BY …] [LIMIT n]` over ONE Iceberg
    * table whose bucket key is among the group columns, the aggregation
    * plans through [[graft.operators.BucketedAgg]] — per-bucket COMPLETE
    * hash aggregation, zero exchange — with the WHERE pushed inside the
    * per-bucket scans. Every SELECT item must be a group column (optional
    * alias) or an explicitly-aliased aggregate (`sum(x) AS s`) — the view
    * exposes group columns and aliases, and the remainder (ORDER/LIMIT)
    * reruns over it. Refusal-based soundness like [[spjAutoRoute]]: pins,
    * views, joins/set-ops, nested SELECTs, DISTINCT, windows (OVER),
    * HAVING, stars, unaliased aggregates, unattributable WHERE conjuncts
    * (the WHERE cannot re-apply after aggregation, so it must push whole),
    * or a BucketedAgg refusal (DISTINCT aggs, imperative functions, no
    * clean layout) all fall back silently to the shuffled plan. */
  private def aggAutoRoute(spark: SparkSession, statement: String,
      refs: Seq[TableRef]): Option[DataFrame] = scala.util.Try {
    import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
    import org.apache.spark.sql.graft.Bridge
    if (routesOff.value) return None
    if (refs.length != 1) return None
    val r = refs.head
    if (r.depth != 0 || r.version >= 0 || r.atMs >= 0 ||
      r.path.endsWith(".view.sql")) return None
    val up = statement.trim.toUpperCase(java.util.Locale.ROOT)
    if (!up.startsWith("SELECT")) return None
    // SELECT DISTINCT <plain cols incl. the bucket key> routes through the
    // bucket-local de-duplication (a per-bucket hash distinct is globally
    // exact); the grouped shape routes through the local aggregation
    val isDistinct = up.startsWith("SELECT DISTINCT")
    if (Seq("JOIN", "LEFT", "RIGHT", "FULL", "CROSS", "NATURAL", "SEMI",
        "ANTI", "LATERAL", "USING", "UNION", "INTERSECT", "EXCEPT",
        "HAVING", "WINDOW", "QUALIFY", "OVER")
        .exists(kw => topLevelKeyword(statement, kw) >= 0)) return None
    if (nestedSelect(statement)) return None
    val groupIdx = topLevelKeyword(statement, "GROUP")
    if (isDistinct && groupIdx >= 0) return None // DISTINCT-of-groups: fall back
    if (!isDistinct && groupIdx < 0) return None
    val byIdx = if (isDistinct) -1 else {
      val i = topLevelKeyword(statement, "BY", groupIdx)
      if (i < 0) return None
      i
    }
    val tailIdx = Seq("ORDER", "LIMIT")
      .map(kw => topLevelKeyword(statement, kw,
        if (isDistinct) r.end else byIdx))
      .filter(_ >= 0).minOption.getOrElse(statement.length)
    // the tail re-runs through the quote-blind alias strip below — refuse
    // quoted tails BEFORE any layout probing or view registration (a late
    // refusal wasted the probe and leaked a stray graft_bagg_* temp view)
    if (statement.substring(tailIdx).contains("'")) return None
    if (Lake.detect(spark, r.path) != Lake.Iceberg) return None
    val schema = IcebergRead.snapshot(spark, r.path).schema
    def lc(s: String) = s.toLowerCase(java.util.Locale.ROOT)
    val alias = r.alias.map(lc)
    val colByLc = schema.fieldNames.map(f => lc(f) -> f).toMap
    // a plain (optionally alias-qualified) column reference, exact-cased
    def plainCol(text: String): Option[String] = {
      val parts = text.trim.split("\\.").toSeq.map(_.trim)
      val ident = "^[A-Za-z_][A-Za-z0-9_]*$"
      parts match {
        case Seq(c) if c.matches(ident) => colByLc.get(lc(c))
        case Seq(q, c) if alias.contains(lc(q)) && c.matches(ident) =>
          colByLc.get(lc(c))
        case _ => None
      }
    }
    // SELECT items: the list between SELECT [DISTINCT] and the FROM that
    // heads the ref
    val fromIdx = {
      var i = topLevelKeyword(statement, "FROM")
      while (i >= 0 && !(i < r.start &&
        statement.substring(i + 4, r.start).trim.isEmpty)) {
        i = topLevelKeyword(statement, "FROM", i + 4)
      }
      if (i < 0) return None
      i
    }
    val selStart =
      if (isDistinct) topLevelKeyword(statement, "DISTINCT") + 8
      else topLevelKeyword(statement, "SELECT") + 6
    // grouping set: the GROUP BY list, or (DISTINCT) the select items'
    // underlying columns — parsed below, so seed lazily
    val groupCols: Seq[String] =
      if (isDistinct)
        splitTopLevel(statement.substring(selStart, fromIdx)).map { item =>
          val asIdx = topLevelKeyword(item, "AS")
          val body = if (asIdx < 0) item.trim else item.substring(0, asIdx).trim
          plainCol(body).getOrElse(return None) // DISTINCT over expressions: fall back
        }
      else splitTopLevel(statement.substring(byIdx + 2, tailIdx))
        .map(t => plainCol(t).getOrElse(return None))
    if (groupCols.isEmpty) return None
    val key = groupCols.find(c =>
      graft.operators.BucketedAgg.canAggLocally(spark, r.path, c, groupCols))
      .getOrElse(return None)
    def stripQual(e: org.apache.spark.sql.catalyst.expressions.Expression) =
      e.transform {
        case a: UnresolvedAttribute if a.nameParts.length == 2 &&
            alias.contains(lc(a.nameParts.head)) =>
          UnresolvedAttribute(a.nameParts.tail)
      }
    // each item: group column [AS out] → passthrough; else aggregate with
    // a REQUIRED top-level alias → computed in the view, referenced by name
    val aggCols = Seq.newBuilder[org.apache.spark.sql.Column]
    val outItems = splitTopLevel(statement.substring(selStart, fromIdx)).map { item =>
      val asIdx = topLevelKeyword(item, "AS")
      val (bodyText, aliasOut) =
        if (asIdx < 0) (item.trim, None)
        else (item.substring(0, asIdx).trim,
          Some(item.substring(asIdx + 2).trim).filter(_.matches("^[A-Za-z_][A-Za-z0-9_]*$")))
      plainCol(bodyText) match {
        case Some(g) if groupCols.contains(g) =>
          aliasOut match { case Some(o) => s"$g AS $o"; case None => g }
        case Some(_) => return None // a non-grouped bare column: invalid SQL
        case None =>
          val out = aliasOut.getOrElse(return None) // aggregates need AS
          val e = stripQual(Bridge.parseExpression(spark, bodyText))
          if (e.exists(_.isInstanceOf[UnresolvedAttribute]) &&
            e.collect { case a: UnresolvedAttribute => a.nameParts }
              .exists(p => p.length != 1 || !colByLc.contains(lc(p.head)))) return None
          aggCols += Bridge.column(e).as(out)
          out
      }
    }
    val aggList = aggCols.result()
    if (isDistinct && aggList.nonEmpty) return None // aggregate under DISTINCT
    // MEMORY GATE: when current-version stats predict a per-bucket group
    // map beyond the budget, keep the shuffled plan (see [[aggRouteFits]])
    if (!aggRouteFits(spark, r.path, key, schema, groupCols,
      aggList.length)) return None
    // the WHERE must push whole (it cannot re-apply after aggregation)
    val where = outerWhereText(statement) match {
      case None => None
      case Some(w) =>
        val e = stripQual(Bridge.parseExpression(spark, w))
        if (!e.deterministic || e.find(
          _.isInstanceOf[org.apache.spark.sql.catalyst.expressions.PlanExpression[_]]).isDefined)
          return None
        if (e.collect { case a: UnresolvedAttribute => a.nameParts }
          .exists(p => p.length != 1 || !colByLc.contains(lc(p.head)))) return None
        Some(Bridge.column(e))
    }
    val view = "graft_bagg_" + java.security.MessageDigest.getInstance("MD5")
      .digest(statement.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(16)
    // an aggregate-free grouping (GROUP BY with only passthrough columns,
    // or SELECT DISTINCT) is a per-bucket DISTINCT over the grouping set
    val routed =
      if (aggList.isEmpty)
        graft.operators.BucketedAgg.bucketLocalDistinct(spark, r.path, key,
          groupCols, where)
      else
        graft.operators.BucketedAgg.bucketLocalAgg(spark, r.path, key,
          groupCols, aggList, where)
    routed.createOrReplaceTempView(view)
    val tail = statement.substring(tailIdx)
    def stripTail(s: String): String = {
      // drop "alias." qualifiers in ORDER BY etc. (view columns are bare)
      alias match {
        case Some(a) => s.replaceAll("(?i)\\b" + java.util.regex.Pattern.quote(a) + "\\.", "")
        case None => s
      }
    }
    Some(spark.sql(
      s"SELECT ${outItems.mkString(", ")} FROM $view " + stripTail(tail)))
  }.toOption.flatten

  /** Is there a SELECT keyword at paren depth > 0 (a subquery/derived
    * table)? Quote-aware. */
  private def nestedSelect(s: String): Boolean = {
    var depth = 0
    var inStr = false
    var i = 0
    def isWord(c: Char) = Character.isLetterOrDigit(c) || c == '_'
    while (i < s.length) {
      val c = s.charAt(i)
      if (inStr) { if (c == '\'') inStr = false; i += 1 }
      else if (c == '\'') { inStr = true; i += 1 }
      else if (c == '(') { depth += 1; i += 1 }
      else if (c == ')') { depth -= 1; i += 1 }
      else if (Character.isLetter(c) && (i == 0 || !isWord(s.charAt(i - 1)))) {
        var j = i
        while (j < s.length && isWord(s.charAt(j))) j += 1
        if (depth > 0 &&
          s.substring(i, j).equalsIgnoreCase("SELECT")) return true
        i = j
      } else i += 1
    }
    false
  }

  /** Identifier chains (`a`, `a.b`) outside string literals, plus whether
    * any `*` is a COLUMN-EXPANSION star. A star expands when its previous
    * non-space char is `,` or `.` or the previous word is SELECT;
    * `count(*)` (prev `(`) and multiplication (prev identifier/digit/`)`)
    * are not expansions. */
  private def identifierChains(s: String): (Seq[Seq[String]], Boolean) = {
    val out = Seq.newBuilder[Seq[String]]
    var sawExpansion = false
    var inStr = false
    var i = 0
    var prevNonSpace = ' '
    var prevWord = ""
    def isWord(c: Char) = Character.isLetterOrDigit(c) || c == '_'
    while (i < s.length) {
      val c = s.charAt(i)
      if (inStr) { if (c == '\'') inStr = false; i += 1 }
      else if (c == '\'') { inStr = true; prevNonSpace = c; i += 1 }
      else if (c == '*') {
        if (prevNonSpace == ',' || prevNonSpace == '.' ||
          prevWord.equalsIgnoreCase("SELECT")) sawExpansion = true
        prevNonSpace = c; prevWord = ""; i += 1
      } else if (Character.isLetter(c) && (i == 0 || (!isWord(s.charAt(i - 1)) && s.charAt(i - 1) != '.'))) {
        val chain = Seq.newBuilder[String]
        var j = i
        var done = false
        while (!done) {
          var p = j
          while (p < s.length && isWord(s.charAt(p))) p += 1
          chain += s.substring(j, p)
          if (p < s.length && s.charAt(p) == '.' && p + 1 < s.length &&
            (Character.isLetter(s.charAt(p + 1)) || s.charAt(p + 1) == '_')) j = p + 1
          else { j = p; done = true }
        }
        val parts = chain.result()
        out += parts
        prevWord = parts.last
        prevNonSpace = s.charAt(j - 1)
        i = j
      } else {
        if (!Character.isWhitespace(c)) { prevNonSpace = c; prevWord = "" }
        i += 1
      }
    }
    (out.result(), sawExpansion)
  }
}
