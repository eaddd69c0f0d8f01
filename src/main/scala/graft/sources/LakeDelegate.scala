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
  * file-level analog of DPP), and the bucket-layout auto-routes
  * ([[autoRoute]] — storage-partitioned join incl. multi-table chains,
  * bucket-local aggregation/DISTINCT/HAVING, and the join+rollup fusion,
  * all pattern-matched on the PARSED plan) — every one refusal-based: a
  * gate miss falls back silently to the ordinary delegated plan. */
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
    // BUCKET-LAYOUT AUTO-ROUTES: co-bucketed equi-joins (incl. one pair
    // inside a longer INNER chain) plan through the shuffle-free
    // co-partitioned reader, bucket-key GROUP BY/DISTINCT through the
    // per-bucket complete aggregation — straight from statement text; the
    // layout's promise must not require knowing the TVFs exist. The
    // decision pattern-matches the PARSED plan; any refusal falls through
    // silently to the ordinary delegated plan.
    autoRoute(spark, statement, refs).foreach(df => return df)
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
    bucketLayoutMoR(spark, path, key)
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
      nAggs: Int, distinctArgs: Seq[Option[Seq[String]]] = Nil): Boolean = {
    // DISTINCT seen-sets have NO spill path (they must stay complete for
    // the flush-merge to never double-count), so they need a gate that
    // works WITHOUT stats: when no CURRENT-version ANALYZE exists, the
    // largest bucket's manifest bytes, inflated to heap row size, bound
    // the per-partition pair set — refuse past the budget instead of
    // letting an unanalyzed table OOM where the shuffled plan it
    // replaced would have spilled. Fresh stats skip this coarse bound:
    // the precise NDV seen-set model below takes over (a low-NDV
    // distinct argument on a big bucket must keep routing).
    if (distinctArgs.nonEmpty &&
      tableStats(spark, path).forall(_.version != versionOf(spark, path)) &&
      maxBucketBytes(spark, path, key) * HeapInflation >
        budgetBytes(spark, "graft.route.aggBudgetBytes", 1L << 30)) return false
    val st = tableStats(spark, path).getOrElse(return true)
    if (st.version != versionOf(spark, path)) return true
    val n = bucketLayoutMoR(spark, path, key)
      .map(_._1).getOrElse(return true)
    val ndvs = groupCols.map(c => st.ndv.get(c).filter(_ > 0)
      .map(_.toDouble).getOrElse(return true))
    val groups = math.min(st.rows.toDouble, ndvs.product)
    val groupWidth = groupCols.map(c =>
      scala.util.Try(schema(c).dataType.defaultSize.toLong).getOrElse(16L)).sum
    val perGroup = groupWidth + 32L * nAggs + 64L // buffers + map overhead
    // DISTINCT aggregates additionally hold a (group key, args) seen-set
    // per partition WITHOUT a spill path — model it: pairs bound by
    // min(rows, groups × Π ndv(arg)); a non-column argument (or one the
    // stats cannot judge) bounds at rows, the true worst case.
    val seenBytes = distinctArgs.map { args =>
      val pairs = args match {
        case Some(cols) if cols.nonEmpty &&
            cols.forall(c => st.ndv.get(c).exists(_ > 0)) =>
          math.min(st.rows.toDouble,
            groups * cols.map(c => st.ndv(c).toDouble).product)
        case _ => st.rows.toDouble
      }
      val argWidth = args.getOrElse(Nil).map(c =>
        scala.util.Try(schema(c).dataType.defaultSize.toLong).getOrElse(16L))
        .sum max 16L
      pairs / n * (groupWidth + argWidth + 64L)
    }.sum
    groups / n * perGroup + seenBytes <=
      budgetBytes(spark, "graft.route.aggBudgetBytes", 1L << 30)
  }

  /** PLAN-BASED AUTO-ROUTING — the single entry the bucket-layout routes
    * share (SURVEY §2 S9bja, S9baa, S9baf, S9bd, S9bjk and the round-18
    * multi-table/HAVING/count-DISTINCT extensions). The statement's lake
    * references substitute as placeholder names, the text PARSES through
    * Spark's own SQL parser, and every structural decision — join shape,
    * per-side conjunct attribution, select-item classification, qualifier
    * stripping — pattern-matches the unresolved logical plan instead of
    * tokenizing statement text (the round-17 tokenizer-hazard class is
    * gone: quoted identifiers, exotic literals and nested constructs are
    * the parser's problem now). Sound by refusal at two tiers: any
    * unsupported shape returns None BEFORE side effects, and the final
    * rewritten plan analyzes EAGERLY under [[Bridge.ofRows]] — an
    * ambiguity or resolution error the rewrite introduced throws there,
    * the temp view is dropped, and the ordinary delegated plan runs.
    *
    * Routed shapes over bucket(n, key) Iceberg tables:
    *  - single table, GROUP BY including the bucket key (aliased
    *    aggregates, `count(DISTINCT x)` included — bucket-local exact),
    *    optional pushed-whole WHERE, HAVING (rewritten to a filter over
    *    the COMPLETE per-bucket aggregation, extra aggregates it mentions
    *    computed as hidden `__hvN` columns and projected away), ORDER/
    *    LIMIT tails;
    *  - single table, SELECT DISTINCT / aggregate-free GROUP BY over
    *    key-including columns;
    *  - 2+ tables: a flat INNER chain containing ONE co-bucketed pair —
    *    the pair routes through [[graft.operators.BucketedJoin]] (pruned,
    *    per-side WHERE pushed, extra pair-only ON conjuncts as bucket-
    *    local residuals) and the REMAINING references re-join against the
    *    SPJ view (each still pruned + ANALYZE-broadcast-hinted), so a
    *    fact-fact-dims star keeps its zero-exchange fact join;
    *  - 2-table fusion: a GROUP BY including the join key aggregates
    *    bucket-locally ON TOP of the join (zero exchanges end to end).
    *
    * Memory gates ([[aggRouteFits]], `graft.route.buildBudgetBytes`) and
    * the EXPLAIN FILES suppression ([[routesOff]]) ride on top. */
  private def autoRoute(spark: SparkSession, statement: String,
      refs: Seq[TableRef]): Option[DataFrame] = scala.util.Try {
    import org.apache.spark.sql.graft.Bridge
    if (routesOff.value) return None
    if (refs.isEmpty) return None
    if (refs.exists(r => r.depth != 0 || r.version >= 0 || r.atMs >= 0 ||
      r.path.endsWith(".view.sql"))) return None
    // a SINGLE parquet ref can never route (no bucket layout) — skip the
    // parse outright; in a multi-table chain parquet dims are fine (only
    // the co-bucketed PAIR needs a layout; dims re-join the SPJ view like
    // any other scan)
    if (refs.length == 1 &&
      Lake.detect(spark, refs.head.path) == Lake.Parquet) return None
    if (!statement.trim.toUpperCase(java.util.Locale.ROOT).startsWith("SELECT"))
      return None
    val sb = new java.lang.StringBuilder
    var pos = 0
    refs.zipWithIndex.foreach { case (r, i) =>
      sb.append(statement.substring(pos, r.start)).append(s"graft_ref_$i")
      if (!r.aliasInText && r.alias.isDefined)
        sb.append(" AS ").append(r.alias.get)
      pos = r.end
    }
    sb.append(statement.substring(pos))
    routePlan(spark, statement, Bridge.parsePlan(spark, sb.toString), refs)
  }.toOption.flatten

  private def lcs(s: String): String = s.toLowerCase(java.util.Locale.ROOT)

  private def md5short(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(16)

  /** One FROM-clause lake reference of a parsed statement. */
  private final case class RRel(idx: Int, ref: TableRef, alias: Option[String],
      node: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan,
      schema: org.apache.spark.sql.types.StructType) {
    val cols: Map[String, String] = schema.fieldNames.map(f => lcs(f) -> f).toMap
  }

  private def routePlan(spark: SparkSession, statement: String,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan,
      refs: Seq[TableRef]): Option[DataFrame] = {
    import org.apache.spark.sql.catalyst.analysis.{UnresolvedHaving, UnresolvedRelation, UnresolvedStar}
    import org.apache.spark.sql.catalyst.expressions.{Expression, PlanExpression}
    import org.apache.spark.sql.catalyst.plans.logical._
    // subqueries and star expansion refuse outright: a subquery's own
    // aliases must not be qualifier-stripped, and a star's column set
    // would change under the keyed rewrite (`count(*)` is safe — the
    // parser already folded it to `count(1)`)
    val allExprs: Seq[Expression] = plan.collect { case n => n.expressions }.flatten
    if (allExprs.exists(_.exists(e => e.isInstanceOf[PlanExpression[_]] ||
      e.isInstanceOf[UnresolvedStar]))) return None

    // the FROM tree under the allowed single-child stack; anything else
    // (CTEs, set ops, lateral, derived tables) refuses
    def fromTree(p: LogicalPlan): Option[LogicalPlan] = p match {
      case _: Join | _: UnresolvedRelation | _: SubqueryAlias => Some(p)
      case g: GlobalLimit => fromTree(g.child)
      case l: LocalLimit => fromTree(l.child)
      case s: Sort => fromTree(s.child)
      case d: Distinct => fromTree(d.child)
      case pr: Project => fromTree(pr.child)
      case a: Aggregate => fromTree(a.child)
      case h: UnresolvedHaving => fromTree(h.child)
      case f: Filter => fromTree(f.child)
      case _ => None
    }
    val core = fromTree(plan).getOrElse(return None)

    def placeholderIdx(u: UnresolvedRelation): Option[Int] =
      u.multipartIdentifier match {
        case Seq(one) if one.startsWith("graft_ref_") =>
          one.stripPrefix("graft_ref_").toIntOption.filter(refs.indices.contains)
        case _ => None
      }
    def relOf(p: LogicalPlan): Option[RRel] = p match {
      case u: UnresolvedRelation => placeholderIdx(u).map(i =>
        RRel(i, refs(i), None, p, tableSchema(spark, refs(i).path)))
      case s: SubqueryAlias => s.child match {
        case u: UnresolvedRelation => placeholderIdx(u).map(i =>
          RRel(i, refs(i), Some(s.alias), p,
            tableSchema(spark, refs(i).path)))
        case _ => None
      }
      case _ => None
    }
    // decompose the FROM tree: plain INNER joins over placeholder leaves
    val joinsB = Seq.newBuilder[Join]
    val relsB = Seq.newBuilder[RRel]
    def walk(p: LogicalPlan): Boolean = p match {
      case j: Join =>
        j.joinType == org.apache.spark.sql.catalyst.plans.Inner &&
          j.condition.isDefined && j.hint == JoinHint.NONE && {
            joinsB += j
            walk(j.left) && walk(j.right)
          }
      case other => relOf(other) match {
        case Some(r) => relsB += r; true
        case None => false
      }
    }
    if (!walk(core)) return None
    val rels = relsB.result()
    val joins = joinsB.result()
    // every statement reference appears exactly once as a FROM relation,
    // and aliases are unambiguous
    if (rels.map(_.idx).sorted != refs.indices.toSeq) return None
    val aliases = rels.flatMap(_.alias).map(lcs)
    if (aliases.distinct.length != aliases.length) return None

    if (rels.length == 1)
      aggRoutePlan(spark, statement, plan, core, rels.head)
        .orElse(windowRoutePlan(spark, statement, plan, core, rels.head))
    else spjRoutePlan(spark, statement, plan, core, rels, joins)
  }

  /** BUCKET-LOCAL WINDOW FUNCTIONS: a single-table statement whose EVERY
    * `OVER` clause partitions by a column set including the bucket key is
    * bucket-confined for exactly the reason GROUP BY is — so the table
    * swaps for the clustering-declared co-partitioned reader
    * ([[graft.operators.BucketedAgg.clusteredReader]]) and Spark's OWN
    * `WindowExec` plans on top WITHOUT its exchange (the per-partition
    * sort stays, as a narrow spill-capable SortExec). Stock Spark pays a
    * full-fact `Exchange hashpartitioning` for the B3 top-k-per-key and
    * B4 running-sum shapes; here the window moves ZERO bytes. The WHERE
    * pushes into the per-bucket scans (and file-stats-prunes) and stays
    * in the plan (idempotent re-filter). Refusals: any Aggregate in the
    * statement (window-over-rollup input is no longer the table), an
    * empty PARTITION BY, or no spec covering a bucketable key. */
  private def windowRoutePlan(spark: SparkSession, statement: String,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan,
      core: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan,
      rel: RRel): Option[DataFrame] = scala.util.Try {
    import org.apache.spark.sql.catalyst.analysis.{UnresolvedAttribute, UnresolvedHaving, UnresolvedRelation}
    import org.apache.spark.sql.catalyst.expressions.{Expression, WindowSpecDefinition}
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Filter, SubqueryAlias}
    import org.apache.spark.sql.graft.Bridge
    if (plan.collectFirst {
      case a: Aggregate => a
      case h: UnresolvedHaving => h
    }.isDefined) return None
    val allExprs: Seq[Expression] = plan.collect { case n => n.expressions }.flatten
    val specs = allExprs.flatMap(_.collect { case w: WindowSpecDefinition => w })
    if (specs.isEmpty) return None
    if (specs.exists(_.partitionSpec.isEmpty)) return None
    def plainCol(e: Expression): Option[String] = e match {
      case a: UnresolvedAttribute => a.nameParts match {
        case Seq(c) => rel.cols.get(lcs(c))
        case Seq(q, c) if rel.alias.exists(_.equalsIgnoreCase(q)) =>
          rel.cols.get(lcs(c))
        case _ => None
      }
      case _ => None
    }
    // one key every spec partitions by, with a live bucket layout
    val candidates = specs.map(_.partitionSpec.flatMap(plainCol).toSet)
      .reduce(_ intersect _)
    val key = candidates.toSeq.sorted.find(c =>
      Lake.bucketLayoutMoR(spark, rel.ref.path, c).isDefined)
      .getOrElse(return None)
    // the WHERE directly over the scan pushes (and stays in the plan —
    // deterministic re-filter is a no-op); other shapes just don't push
    val whereCol = plan.collectFirst {
      case f: Filter if f.child eq core => f.condition
    }.flatMap { c =>
      val relAliases = rel.alias.map(lcs).toSet
      val stripped = c.transformUp {
        case a: UnresolvedAttribute if a.nameParts.length >= 2 &&
            relAliases.contains(lcs(a.nameParts.head)) =>
          UnresolvedAttribute(a.nameParts.tail)
      }
      val ok = stripped.deterministic && stripped.collect {
        case a: UnresolvedAttribute => a
      }.forall(plainCol(_).isDefined)
      if (ok) Some(Bridge.column(stripped)) else None
    }
    val readCols = allExprs.flatMap(_.collect {
      case a: UnresolvedAttribute => a
    }).flatMap(plainCol).distinct
    val reader = graft.operators.BucketedAgg.clusteredReader(
      spark, rel.ref.path, key, readCols, whereCol)
    val view = "graft_bwin_" + md5short(statement)
    reader.createOrReplaceTempView(view)
    val viewRel = UnresolvedRelation(Seq(view))
    // the reader PRESERVES column names, so the reference swaps in place
    // (alias kept — no qualifier stripping needed)
    val replacement = rel.alias match {
      case Some(a) => SubqueryAlias(a, viewRel)
      case None => viewRel
    }
    val newPlan = plan.transformDown { case n if n eq rel.node => replacement }
    try {
      val df = Bridge.ofRows(spark, newPlan)
      scala.util.Try(spark.catalog.dropTempView(view))
      // PARTITIONING BARRIER: the routed plan's nominal HashPartitioning
      // must not escape into user composition — a later join against this
      // frame would trust it as genuine Spark-hash placement and shuffle
      // ONLY the other side, mis-aligning rows (the placement is the
      // Iceberg bucket transform). Re-wrap the result as a plain
      // RDD-backed frame with Unknown partitioning; the window still
      // runs exchange-free INSIDE the wrapped lineage, and any later
      // consumer pays its own (correct) exchange.
      Some(Bridge.internalCreateDataFrame(
        spark, df.queryExecution.toRdd, df.schema))
    } catch { case scala.util.control.NonFatal(_) =>
      scala.util.Try(spark.catalog.dropTempView(view)); None
    }
  }.toOption.flatten

  /** The single-table bucket-local aggregation/DISTINCT route over the
    * parsed plan (see [[autoRoute]]). */
  private def aggRoutePlan(spark: SparkSession, statement: String,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan,
      core: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan,
      rel: RRel): Option[DataFrame] = {
    import org.apache.spark.sql.catalyst.analysis.{UnresolvedAttribute, UnresolvedFunction, UnresolvedHaving, UnresolvedRelation}
    import org.apache.spark.sql.catalyst.expressions.{Alias, Expression, NamedExpression}
    import org.apache.spark.sql.catalyst.plans.logical._
    import org.apache.spark.sql.graft.Bridge
    def descend(p: LogicalPlan): Option[LogicalPlan] = p match {
      case g: GlobalLimit => descend(g.child)
      case l: LocalLimit => descend(l.child)
      case s: Sort => descend(s.child)
      case a: Aggregate => Some(a)
      case h: UnresolvedHaving => Some(h)
      case d: Distinct => Some(d)
      case _ => None
    }
    val aggNode = descend(plan).getOrElse(return None)
    val relAliases: Set[String] = rel.alias.map(lcs).toSet
    def strip(e: Expression): Expression = e.transformUp {
      case a: UnresolvedAttribute if a.nameParts.length >= 2 &&
          relAliases.contains(lcs(a.nameParts.head)) =>
        UnresolvedAttribute(a.nameParts.tail)
    }
    def plainCol(e: Expression): Option[String] = e match {
      case a: UnresolvedAttribute => a.nameParts match {
        case Seq(c) => rel.cols.get(lcs(c))
        case Seq(q, c) if rel.alias.exists(_.equalsIgnoreCase(q)) =>
          rel.cols.get(lcs(c))
        case _ => None
      }
      case _ => None
    }
    def colsOnly(e: Expression): Boolean =
      e.collect { case a: UnresolvedAttribute => a }.forall(plainCol(_).isDefined)
    // ALIAS SHADOWING guard: an output alias that reuses a table column
    // name for a DIFFERENT expression would capture stripped outer
    // qualifiers (ORDER BY t.x after SELECT t.y AS x) — refuse
    def shadowed(items: Seq[NamedExpression]): Boolean = items.exists {
      case al: Alias => rel.cols.contains(lcs(al.name)) &&
        !plainCol(al.child).contains(rel.cols(lcs(al.name)))
      case _ => false
    }
    def whereColOf(cond: Option[Expression]): Option[org.apache.spark.sql.Column] =
      cond.map { c =>
        val s2 = strip(c)
        if (!colsOnly(s2) || !s2.deterministic)
          throw new IllegalArgumentException("non-pushable WHERE") // -> Try
        Bridge.column(s2)
      }
    def run(target: LogicalPlan, groupCols: Seq[String],
        aggList: Seq[org.apache.spark.sql.Column],
        outItems: Seq[NamedExpression],
        havingCond: Option[Expression],
        whereCol: Option[org.apache.spark.sql.Column],
        nAggs: Int,
        distinctArgs: Seq[Option[Seq[String]]]): Option[DataFrame] = {
      val key = groupCols.find(c => graft.operators.BucketedAgg
        .canAggLocally(spark, rel.ref.path, c, groupCols)).getOrElse(return None)
      if (!aggRouteFits(spark, rel.ref.path, key, rel.schema, groupCols,
        nAggs, distinctArgs)) return None
      val view = "graft_bagg_" + md5short(statement)
      val routed =
        if (aggList.isEmpty)
          graft.operators.BucketedAgg.bucketLocalDistinct(spark, rel.ref.path,
            key, groupCols, whereCol)
        else
          graft.operators.BucketedAgg.bucketLocalAgg(spark, rel.ref.path,
            key, groupCols, aggList, whereCol)
      routed.createOrReplaceTempView(view)
      val rel2 = UnresolvedRelation(Seq(view))
      val newSub = Project(outItems,
        havingCond.map(Filter(_, rel2)).getOrElse(rel2))
      val newPlan = plan.transformDown { case n if n eq target => newSub }
        .transformDown { case n => n.transformExpressions {
          case a: UnresolvedAttribute if a.nameParts.length >= 2 &&
              relAliases.contains(lcs(a.nameParts.head)) =>
            UnresolvedAttribute(a.nameParts.tail)
        }}
      // the view exists only to let analysis resolve the routed subtree;
      // once ofRows has analyzed EAGERLY the DataFrame holds the resolved
      // plan and needs no catalog entry — drop on success too, or distinct
      // routed statements accumulate temp views for the session's lifetime
      try {
        val df = Bridge.ofRows(spark, newPlan)
        scala.util.Try(spark.catalog.dropTempView(view))
        Some(df)
      } catch { case scala.util.control.NonFatal(_) =>
        scala.util.Try(spark.catalog.dropTempView(view)); None
      }
    }
    def buildAgg(a: Aggregate, having: Option[Expression],
        target: LogicalPlan): Option[DataFrame] = {
      val (whereOpt, base) = a.child match {
        case f: Filter => (Some(f.condition), f.child)
        case other => (None, other)
      }
      if (!(base eq core)) return None
      if (shadowed(a.aggregateExpressions)) return None
      val groupCols = a.groupingExpressions.map(e =>
        plainCol(e).getOrElse(return None))
      if (groupCols.isEmpty) return None
      val aggColsB = Seq.newBuilder[org.apache.spark.sql.Column]
      var nAggs = 0
      var bodyAlias = Map.empty[String, String] // stripped body text -> out name
      val outItemsB = Seq.newBuilder[NamedExpression]
      // DISTINCT aggregate arguments (plain columns, or None when the
      // stats cannot judge them) — the memory gate models their seen-sets
      val distinctArgsB = Seq.newBuilder[Option[Seq[String]]]
      def noteDistinct(body: Expression): Unit = body.foreach {
        case f: org.apache.spark.sql.catalyst.analysis.UnresolvedFunction
            if f.isDistinct =>
          val cols = f.arguments.map(plainCol)
          distinctArgsB +=
            (if (cols.nonEmpty && cols.forall(_.isDefined)) Some(cols.flatten)
             else None)
        case _ =>
      }
      a.aggregateExpressions.foreach {
        case at: UnresolvedAttribute =>
          val g = plainCol(at).getOrElse(return None)
          if (!groupCols.contains(g)) return None
          outItemsB += UnresolvedAttribute(Seq(g))
        case al: Alias =>
          plainCol(al.child) match {
            case Some(g) if groupCols.contains(g) =>
              outItemsB += Alias(UnresolvedAttribute(Seq(g)), al.name)()
            case Some(_) => return None // ungrouped bare column: invalid SQL
            case None => // an aggregate — computed inside the routed view
              val body = strip(al.child)
              if (!colsOnly(body) || !body.deterministic) return None
              aggColsB += Bridge.column(body).as(al.name)
              nAggs += 1
              noteDistinct(body)
              bodyAlias += body.toString -> al.name
              outItemsB += UnresolvedAttribute(Seq(al.name))
          }
        case _ => return None // unaliased aggregate / exotic select item
      }
      // HAVING: the per-bucket aggregation is COMPLETE, so HAVING is just
      // a filter over the routed view — aggregate subtrees it mentions
      // reuse a select alias when structurally identical, otherwise ride
      // as hidden __hvN columns projected away above the filter
      var hv = 0
      def replFn(e: Expression): Expression = e match {
        case f: UnresolvedFunction =>
          val body = strip(f)
          bodyAlias.get(body.toString) match {
            case Some(out) => UnresolvedAttribute(Seq(out))
            case None =>
              if (!colsOnly(body) || !body.deterministic)
                throw new IllegalArgumentException("non-routable HAVING")
              val out = s"__hv$hv"
              hv += 1
              aggColsB += Bridge.column(body).as(out)
              nAggs += 1
              noteDistinct(body)
              bodyAlias += body.toString -> out
              UnresolvedAttribute(Seq(out))
          }
        case other => other.mapChildren(replFn)
      }
      val havingCond = having.map(c => replFn(strip(c)))
      val whereCol = whereColOf(whereOpt)
      run(target, groupCols, aggColsB.result(), outItemsB.result(),
        havingCond, whereCol, nAggs, distinctArgsB.result())
    }
    aggNode match {
      case h @ UnresolvedHaving(cond, a: Aggregate) => buildAgg(a, Some(cond), h)
      case a: Aggregate => buildAgg(a, None, a)
      case d: Distinct => d.child match {
        case pr: Project =>
          val (whereOpt, base) = pr.child match {
            case f: Filter => (Some(f.condition), f.child)
            case other => (None, other)
          }
          if (!(base eq core)) return None
          if (shadowed(pr.projectList)) return None
          val groupColsB = Seq.newBuilder[String]
          val outItemsB = Seq.newBuilder[NamedExpression]
          pr.projectList.foreach {
            case at: UnresolvedAttribute =>
              val g = plainCol(at).getOrElse(return None)
              groupColsB += g
              outItemsB += UnresolvedAttribute(Seq(g))
            case al: Alias =>
              val g = plainCol(al.child).getOrElse(return None)
              groupColsB += g
              outItemsB += Alias(UnresolvedAttribute(Seq(g)), al.name)()
            case _ => return None // DISTINCT over expressions: fall back
          }
          val whereCol = whereColOf(whereOpt)
          run(d, groupColsB.result().distinct, Nil, outItemsB.result(),
            None, whereCol, 0, Nil)
        case _ => None
      }
      case _ => None
    }
  }

  /** The storage-partitioned-join route over the parsed plan (see
    * [[autoRoute]]): exactly one co-bucketed pair plans through
    * [[graft.operators.BucketedJoin]]; with 3+ references the remaining
    * ones re-join against the SPJ view in a greedily-connected chain
    * (never introducing a cross join the statement didn't have), each
    * still file-stats-pruned and ANALYZE-broadcast-hinted. */
  private def spjRoutePlan(spark: SparkSession, statement: String,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan,
      core: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan,
      rels: Seq[RRel],
      joins: Seq[org.apache.spark.sql.catalyst.plans.logical.Join])
      : Option[DataFrame] = {
    import org.apache.spark.sql.catalyst.analysis.{UnresolvedAttribute, UnresolvedHaving, UnresolvedRelation}
    import org.apache.spark.sql.catalyst.expressions.{Alias, And, EqualTo, Expression}
    import org.apache.spark.sql.catalyst.plans.logical._
    import org.apache.spark.sql.graft.Bridge
    val byIdx = rels.map(r => r.idx -> r).toMap
    def colOf(a: UnresolvedAttribute): Option[(Int, String)] = a.nameParts match {
      case Seq(c) =>
        val owners = rels.filter(_.cols.contains(lcs(c)))
        if (owners.length == 1) Some((owners.head.idx, owners.head.cols(lcs(c))))
        else None
      case q +: rest if rest.nonEmpty =>
        rels.find(_.alias.exists(_.equalsIgnoreCase(q)))
          .flatMap(r => r.cols.get(lcs(rest.head)).map(c => (r.idx, c)))
      case _ => None
    }
    def splitAnd(e: Expression): Seq[Expression] = e match {
      case And(l, r) => splitAnd(l) ++ splitAnd(r)
      case other => Seq(other)
    }
    // every ON conjunct must attribute fully to table columns
    final case class Conj(e: Expression, owners: Set[Int])
    val conjs: Seq[Conj] = joins.flatMap(j => splitAnd(j.condition.get)).map { e =>
      val owners = e.collect { case a: UnresolvedAttribute => a }.map(colOf)
      if (owners.exists(_.isEmpty)) return None
      Conj(e, owners.flatten.map(_._1).toSet)
    }
    // the co-bucketed pair: first equality conjunct between two distinct
    // references whose columns share a bucket layout (textual order keeps
    // the left table left)
    var found: Option[(Conj, RRel, RRel, String, String)] = None
    conjs.foreach { c =>
      if (found.isEmpty) c.e match {
        case EqualTo(a: UnresolvedAttribute, b: UnresolvedAttribute)
            if a.nameParts.length <= 2 && b.nameParts.length <= 2 =>
          (colOf(a), colOf(b)) match {
            case (Some((oa, ca)), Some((ob, cb))) if oa != ob =>
              val (li, lk0, ri, rk0) =
                if (oa < ob) (oa, ca, ob, cb) else (ob, cb, oa, ca)
              if (graft.operators.BucketedJoin.coBucketed(spark,
                  byIdx(li).ref.path, byIdx(ri).ref.path, lk0, rk0))
                found = Some((c, byIdx(li), byIdx(ri), lk0, rk0))
            case _ =>
          }
        case _ =>
      }
    }
    val (pairConj, lRel, rRel, lk, rk) = found.getOrElse(return None)
    // MEMORY GATE → GRACE: the per-bucket local join builds the whole
    // right bucket in heap. Past the budget the route no longer refuses —
    // oversized buckets GRACE-SPLIT into key-hash sub-joins inside
    // [[graft.operators.BucketedJoin]] (both sides re-read k times on
    // disjoint key slices; still zero exchange). Only a layout needing
    // more than MaxGraceSplits slices refuses to the shuffled plan.
    val graceBudget = budgetBytes(spark,
      "graft.route.buildBudgetBytes", 1L << 30) / HeapInflation
    if (graceBudget <= 0 ||
      maxBucketBytes(spark, rRel.ref.path, rk) >
        graceBudget * graft.operators.BucketedJoin.MaxGraceSplits) return None
    val pairIdx = Set(lRel.idx, rRel.idx)
    val pairAliases: Set[String] = Set(lRel.alias, rRel.alias).flatten.map(lcs)
    def strip(e: Expression): Expression = e.transformUp {
      case a: UnresolvedAttribute if a.nameParts.length >= 2 &&
          pairAliases.contains(lcs(a.nameParts.head)) =>
        UnresolvedAttribute(a.nameParts.tail)
    }
    val residualConjs = conjs.filter(c =>
      !(c.e eq pairConj.e) && c.owners.subsetOf(pairIdx))
    val chainConjs = conjs.filter(c =>
      !(c.e eq pairConj.e) && !c.owners.subsetOf(pairIdx))

    // columns the SPJ view must carry: every pair-owned attribute outside
    // the consumed key equality and the residual conjuncts (residual
    // inputs are read internally by the join, not output)
    val skip = java.util.Collections.newSetFromMap(
      new java.util.IdentityHashMap[Expression, java.lang.Boolean]())
    skip.add(pairConj.e)
    residualConjs.foreach(c => skip.add(c.e))
    val keepL = Seq.newBuilder[String]
    val keepR = Seq.newBuilder[String]
    plan.foreach { n =>
      val es: Seq[Expression] = n match {
        case j: Join => j.condition.toSeq.flatMap(splitAnd).filterNot(skip.contains)
        case other => other.expressions
      }
      es.foreach(_.foreach {
        case a: UnresolvedAttribute => colOf(a) match {
          case Some((i, c)) if i == lRel.idx => keepL += c
          case Some((i, c)) if i == rRel.idx => keepR += c
          case _ => // another ref's column / select alias — analysis decides
        }
        case _ =>
      })
    }
    // ALIAS SHADOWING guard (same hazard as the agg route)
    val outAliasBad = plan.collect {
      case p2: Project => p2.projectList
      case a2: Aggregate => a2.aggregateExpressions
    }.flatten.exists {
      case al: Alias =>
        val n = lcs(al.name)
        (lRel.cols.contains(n) || rRel.cols.contains(n)) && !(al.child match {
          case ua: UnresolvedAttribute =>
            colOf(ua).exists(_._2.equalsIgnoreCase(al.name))
          case _ => false
        })
      case _ => false
    }
    if (outAliasBad) return None

    // per-side WHERE conjuncts push INSIDE the bucket scans; the rewritten
    // plan re-applies the full WHERE (pushdown is an optimization). Other
    // references' single-owner conjuncts feed their scans' pruning tier.
    var whereL: Option[org.apache.spark.sql.Column] = None
    var whereR: Option[org.apache.spark.sql.Column] = None
    val dimConj = scala.collection.mutable.Map.empty[Int, Seq[Expression]]
    plan.foreach {
      case f: Filter if f.child eq core =>
        splitAnd(f.condition).foreach { e =>
          val attrs = e.collect { case a: UnresolvedAttribute => a }
          val owned = attrs.map(colOf)
          val owners = owned.flatten.map(_._1).distinct
          if (e.deterministic && attrs.nonEmpty &&
              owned.forall(_.isDefined) && owners.length == 1) {
            if (owners.head == lRel.idx) {
              val c = Bridge.column(strip(e))
              whereL = Some(whereL.map(_ && c).getOrElse(c))
            } else if (owners.head == rRel.idx) {
              val c = Bridge.column(strip(e))
              whereR = Some(whereR.map(_ && c).getOrElse(c))
            } else dimConj(owners.head) =
              dimConj.getOrElse(owners.head, Nil) :+ e
          }
        }
      case _ =>
    }
    val residual: Option[org.apache.spark.sql.Column] =
      residualConjs.map(c => strip(c.e)) match {
        case Seq() => None
        case rs => Some(Bridge.column(rs.reduce(And(_, _))))
      }
    val rightKeep = {
      val ks = keepR.result().distinct
      if (ks.isEmpty) Seq(rk) else ks
    }
    def buildJoin(split: Long) = graft.operators.BucketedJoin.coBucketedJoin(
      spark, lRel.ref.path, rRel.ref.path, lk,
      leftCols = (keepL.result() :+ lk).distinct,
      rightCols = rightKeep,
      leftWhere = whereL, rightWhere = whereR, residual = residual,
      splitBucketBytes = split, rightKey = rk,
      buildBudgetBytes = graceBudget)
    val view = "graft_spj_" + md5short(statement)
    val viewRel = UnresolvedRelation(Seq(view))

    // rebuild the FROM tree: the SPJ view, then (3+ tables) the remaining
    // references greedily connected by the chain conjuncts
    def stripAlias(e: Expression, al: Option[String]): Expression = e.transformUp {
      case a: UnresolvedAttribute if a.nameParts.length >= 2 &&
          al.exists(_.equalsIgnoreCase(a.nameParts.head)) =>
        UnresolvedAttribute(a.nameParts.tail)
    }
    def dimLeaf(r: RRel): LogicalPlan = {
      val cs = dimConj.getOrElse(r.idx, Nil)
      val base = read(spark, r.ref.path)
      val pruned =
        if (cs.isEmpty) base
        else scala.util.Try(scanPruned(spark, r.ref.path,
          cs.map(e => Bridge.column(stripAlias(e, r.alias))).reduce(_ && _),
          -1L)._1).getOrElse(base)
      val hinted = statsBroadcastHint(spark, r.ref.path, -1L, pruned,
        cs.flatMap(e => scala.util.Try(stripAlias(e, r.alias).sql).toOption))
      r.alias match {
        case Some(a) => SubqueryAlias(a, Bridge.logicalPlan(hinted))
        case None => Bridge.logicalPlan(hinted)
      }
    }
    val others = rels.filter(r => !pairIdx.contains(r.idx))
    val newCore: LogicalPlan =
      if (others.isEmpty) {
        if (chainConjs.nonEmpty) return None // unreachable, defensive
        viewRel
      } else {
        val placed = scala.collection.mutable.Set(lRel.idx, rRel.idx)
        val pending = scala.collection.mutable.ArrayBuffer(others: _*)
        val unused = scala.collection.mutable.ArrayBuffer(chainConjs: _*)
        var tree: LogicalPlan = viewRel
        while (pending.nonEmpty) {
          val ni = pending.indexWhere(r => unused.exists(c =>
            c.owners.contains(r.idx) && (c.owners - r.idx).nonEmpty &&
              (c.owners - r.idx).subsetOf(placed)))
          if (ni < 0) return None // would introduce a cross join
          val next = pending.remove(ni)
          placed += next.idx
          val conds = unused.filter(_.owners.subsetOf(placed.toSet)).toSeq
          conds.foreach(unused -= _)
          val cond = conds.map(c => strip(c.e)).reduce(And(_, _))
          tree = Join(tree, dimLeaf(next),
            org.apache.spark.sql.catalyst.plans.Inner, Some(cond), JoinHint.NONE)
        }
        if (unused.nonEmpty) return None
        tree
      }
    val newPlan = plan.transformDown { case n if n eq core => newCore }
      .transformDown { case n => n.transformExpressions {
        case a: UnresolvedAttribute if a.nameParts.length >= 2 &&
            pairAliases.contains(lcs(a.nameParts.head)) =>
          UnresolvedAttribute(a.nameParts.tail)
      }}

    // FUSION (2-table only): a GROUP BY including the join key aggregates
    // bucket-locally ON TOP of the zero-shuffle join. The fused input is
    // built WITHOUT the skew split (a split bucket's chunks would each
    // emit a complete-looking partial group); the unfused route keeps it.
    val fused =
      if (others.nonEmpty) None
      else fusePlan(spark, () => buildJoin(0L), newPlan, viewRel, lk)
    fused match {
      case Some(df) => Some(df)
      case None =>
        buildJoin(graft.operators.BucketedJoin.DefaultSplitBucketBytes)
          .createOrReplaceTempView(view)
        // dropped on success too — see the agg route's rationale
        try {
          val df = org.apache.spark.sql.graft.Bridge.ofRows(spark, newPlan)
          scala.util.Try(spark.catalog.dropTempView(view))
          Some(df)
        } catch { case scala.util.control.NonFatal(_) =>
          scala.util.Try(spark.catalog.dropTempView(view)); None
        }
    }
  }

  /** Fuse a join-key GROUP BY into the already co-partitioned SPJ frame:
    * partition i of the joined frame is bucket i, so key-including groups
    * never span partitions and the COMPLETE per-partition aggregation
    * ([[graft.operators.BucketedAgg.localAgg]] — spill-capable) emits
    * final rows; a WHERE between the grouping and the join applies as a
    * narrow filter first; a HAVING filters the COMPLETE fused rollup
    * (absent aggregates as hidden __hvN columns, like the single-table
    * route). Any gate miss returns None and the caller runs the unfused
    * plan (join still shuffle-free; only the rollup pays its exchange). */
  private def fusePlan(spark: SparkSession, buildJoin: () => DataFrame,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan,
      viewRel: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan,
      key: String): Option[DataFrame] = scala.util.Try {
    import org.apache.spark.sql.catalyst.analysis.{UnresolvedAttribute, UnresolvedHaving, UnresolvedRelation}
    import org.apache.spark.sql.catalyst.expressions.{Alias, Expression, NamedExpression}
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Filter, LogicalPlan, Project}
    import org.apache.spark.sql.graft.Bridge
    // the fused shape: [UnresolvedHaving]? Aggregate([Filter]? viewRel) —
    // a HAVING becomes a filter over the COMPLETE per-partition rollup,
    // exactly like the single-table route (absent aggregates as __hvN)
    var target: Option[Aggregate] = None
    var havingNode: Option[UnresolvedHaving] = None
    var whereCond: Option[Expression] = None
    def inspect(a: Aggregate, h: Option[UnresolvedHaving]): Unit = a.child match {
      case f: Filter if f.child eq viewRel =>
        target = Some(a); havingNode = h; whereCond = Some(f.condition)
      case c if c eq viewRel => target = Some(a); havingNode = h
      case _ =>
    }
    plan.foreach {
      case h @ UnresolvedHaving(_, a2: Aggregate) => inspect(a2, Some(h))
      case a2: Aggregate if !havingNode.exists(_.child eq a2) =>
        inspect(a2, None)
      case _ =>
    }
    val a = target.getOrElse(return None)
    val joined = buildJoin()
    val colByLc = joined.schema.fieldNames.map(f => lcs(f) -> f).toMap
    def plainCol(e: Expression): Option[String] = e match {
      case at: UnresolvedAttribute => at.nameParts match {
        case Seq(c) => colByLc.get(lcs(c))
        case _ => None
      }
      case _ => None
    }
    def colsOnly(e: Expression): Boolean =
      e.collect { case at: UnresolvedAttribute => at }
        .forall(plainCol(_).isDefined)
    val groupCols = a.groupingExpressions.map(e =>
      plainCol(e).getOrElse(return None))
    if (!groupCols.contains(key)) return None
    val aggColsB = Seq.newBuilder[org.apache.spark.sql.Column]
    val outItemsB = Seq.newBuilder[NamedExpression]
    var bodyAlias = Map.empty[String, String]
    a.aggregateExpressions.foreach {
      case at: UnresolvedAttribute =>
        val g = plainCol(at).getOrElse(return None)
        if (!groupCols.contains(g)) return None
        outItemsB += UnresolvedAttribute(Seq(g))
      case al: Alias =>
        plainCol(al.child) match {
          case Some(g) if groupCols.contains(g) =>
            outItemsB += Alias(UnresolvedAttribute(Seq(g)), al.name)()
          case Some(_) => return None
          case None =>
            if (!colsOnly(al.child) || !al.child.deterministic) return None
            aggColsB += Bridge.column(al.child).as(al.name)
            bodyAlias += al.child.toString -> al.name
            outItemsB += UnresolvedAttribute(Seq(al.name))
        }
      case _ => return None
    }
    // HAVING aggregate subtrees: reuse a select alias when structurally
    // identical, else compute as hidden __hvN columns filtered then
    // dropped by the Project above
    var hv = 0
    def replFn(e: Expression): Expression = e match {
      case f: org.apache.spark.sql.catalyst.analysis.UnresolvedFunction =>
        bodyAlias.get(f.toString) match {
          case Some(out) => UnresolvedAttribute(Seq(out))
          case None =>
            if (!colsOnly(f) || !f.deterministic)
              throw new IllegalArgumentException("non-fusable HAVING")
            val out = s"__hv$hv"
            hv += 1
            aggColsB += Bridge.column(f).as(out)
            bodyAlias += f.toString -> out
            UnresolvedAttribute(Seq(out))
        }
      case other => other.mapChildren(replFn)
    }
    val havingCond = havingNode.map(h => replFn(h.havingCondition))
    val aggList = aggColsB.result()
    if (aggList.isEmpty) return None
    val input = whereCond match {
      case None => joined
      case Some(c) =>
        if (!colsOnly(c) || !c.deterministic) return None
        joined.where(Bridge.column(c))
    }
    val view2 = "graft_spjagg_" + md5short(plan.toString)
    graft.operators.BucketedAgg.localAgg(spark, input, groupCols, aggList)
      .createOrReplaceTempView(view2)
    val rel2 = UnresolvedRelation(Seq(view2))
    val newSub = Project(outItemsB.result(),
      havingCond.map(Filter(_, rel2)).getOrElse(rel2))
    val replaceAt: LogicalPlan = havingNode.getOrElse(a)
    val newPlan = plan.transformDown { case n if n eq replaceAt => newSub }
    // dropped on success too — see the agg route's rationale
    try {
      val df = Bridge.ofRows(spark, newPlan)
      scala.util.Try(spark.catalog.dropTempView(view2))
      Some(df)
    } catch { case scala.util.control.NonFatal(_) =>
      scala.util.Try(spark.catalog.dropTempView(view2)); None
    }
  }.toOption.flatten


  /** STATS-DRIVEN JOIN REORDER for a flat chain of 3+ plain INNER JOINs
    * over lake references: estimated surviving rows per reference =
    * ANALYZE rows × [[selectivityOf]] of its own attributed conjuncts;
    * the chain rebuilds greedily — smallest first, then always the
    * smallest reference CONNECTED to the built set by some ON conjunct
    * (connectivity-preserving: never introduces a cross join the original
    * didn't have). A reference without CURRENT-version stats estimates
    * its rows from scan bytes / schema row width instead of killing the
    * reorder (at least one ref must carry real stats). Inner joins are
    * freely reorderable; every gate miss returns None and the textual
    * order stands: any non-INNER join or set-op keyword, a nested SELECT,
    * a reference without an alias, an ON conjunct that fails to parse or
    * attribute, or an already-optimal order. */
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

    // CURRENT-version stats where available (stale stats must not order);
    // a ref WITHOUT current stats no longer kills the whole reorder — its
    // rows are estimated from the scan's file bytes over the schema's
    // estimated row width (a coarse proxy, but ordering only needs
    // relative magnitude, and one unanalyzed small dim should not forfeit
    // a 10× plan win on the analyzed rest). At least one ref must carry
    // real stats — an all-proxy ordering has nothing principled to say.
    val stats: Seq[Option[TableStats]] = resolved.map { case (r, v, _) =>
      tableStats(spark, r.path).filter { st =>
        val head = versionOf(spark, r.path)
        st.version == head && (v < 0 || v == head)
      }
    }
    if (stats.forall(_.isEmpty)) return None
    val estRows: Seq[Double] = resolved.zipWithIndex.map { case ((_, _, df), i) =>
      stats(i) match {
        case Some(st) => math.max(1.0, st.rows *
          selectivityOf(spark, st, conjuncts.getOrElse(i, Nil).map(_._1)))
        case None =>
          val bytes = scala.util.Try(
            df.queryExecution.optimizedPlan.stats.sizeInBytes.toDouble)
            .getOrElse(return None)
          val width = math.max(1L,
            df.schema.fields.map(_.dataType.defaultSize.toLong).sum)
          math.max(1.0, bytes / width)
      }
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

}
