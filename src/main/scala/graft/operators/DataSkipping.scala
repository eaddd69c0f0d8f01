package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{ByteType, DoubleType, FloatType, IntegerType, IntegralType, LongType, ShortType}

/** File-level data skipping (the Delta/Iceberg stats-pruning idea over plain
  * parquet): collect per-file min/max/null-count statistics once, then answer
  * selective queries by reading ONLY the files whose [min, max] interval can
  * possibly satisfy the predicate.
  *
  * Why it matters at 100 TB: partition pruning only helps on the partition
  * key; file-level stats prune on ANY clustered column (pair with
  * [[Layout.zorderWrite]] so several columns cluster at once). The stats
  * table is ~one row per file — for a 100 TB table in 1 GB files that is
  * 100k rows, a driver-side prune that saves reading terabytes. Parquet
  * row-group stats do the same work only AFTER a task was scheduled per
  * file; skipping decides before scheduling anything.
  */
object DataSkipping {

  /** Distributed bloom probe over the stats table: one sketch
    * deserialization per stats ROW (= per file) — O(files), never touches
    * data. Null sketch → keep the file (conservative). */
  private val bloomProbe = udf((blob: Array[Byte], hash: Long) =>
    blob == null ||
      org.apache.spark.util.sketch.BloomFilter
        .readFrom(new java.io.ByteArrayInputStream(blob)).mightContainLong(hash))

  /** One stats pass: per-file min/max/null-count for `statCols`, plus an
    * optional per-file BLOOM FILTER for each of `bloomCols` (over
    * xxhash64 of the value — the same Catalyst sketch the runtime join
    * filter uses). Blooms are the point-lookup lever min/max cannot be:
    * on a high-cardinality unclustered column every file's [min, max]
    * spans the whole domain and interval pruning keeps everything, while
    * a bloom answers "could THIS value be in THIS file" at ~1% false
    * positives for ~1 byte/row. At production scale these rows are
    * produced at WRITE time by the committing job (the writer has the
    * data in hand); this one-pass collector retrofits stats onto an
    * existing table. */
  def collectStats(spark: SparkSession, tableDir: String, statCols: Seq[String],
      bloomCols: Seq[String] = Nil, bloomItems: Long = 1000000L,
      bloomBits: Long = 1024L * 1024, tokenBloomCols: Seq[String] = Nil): DataFrame = {
    val aggs = statCols.flatMap(c => Seq(
      min(col(c)).as(s"min_$c"), max(col(c)).as(s"max_$c"),
      sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"nulls_$c"))) ++
      bloomCols.map(c =>
        BloomOps.bloomAgg(xxhash64(col(c)), bloomItems, bloomBits).as(s"bloom_$c")) :+
      count(lit(1L)).as("rows")
    val base = spark.read.parquet(tableDir)
      .groupBy(input_file_name().as("file"))
      .agg(aggs.head, aggs.tail: _*)
    // TOKEN blooms (`tokbloom_<c>`): a bloom over every WHITESPACE
    // TOKEN of a text column — the text-search lever the value bloom is
    // not: "which files could contain documents with this term" for
    // `array_contains(split(c, ' '), term)` predicates, the full-text
    // skipping idea log engines use. The token fan-out changes row
    // cardinality, so each token bloom is its own exploded aggregation
    // (still one linear pass per column) joined back on file. The prefix
    // is deliberately disjoint from the value blooms' `bloom_` — a value
    // bloom over a column literally named `tokens_x` must never be
    // reclassified as a token bloom over `x` (that would probe equality
    // predicates against the wrong sketch and prune unsoundly).
    tokenBloomCols.foldLeft(base) { (acc, c) =>
      val tb = spark.read.parquet(tableDir)
        .select(input_file_name().as("file"),
          explode_outer(split(col(c), " ")).as("__tok"))
        .groupBy(col("file"))
        .agg(BloomOps.bloomAgg(xxhash64(col("__tok")), bloomItems, bloomBits)
          .as(s"tokbloom_$c"))
      acc.join(tb, Seq("file"), "left")
    }
  }

  /** Column attribute by name. Also sees through WIDENING numeric casts
    * (the ones the analyzer inserts to compare a column against a wider
    * literal): widening is value-preserving (or at worst monotone, for
    * long→double), so comparing the raw stats bound against the literal
    * under Spark's own coercion stays exact. Narrowing casts are NOT seen
    * through — double→int truncation and long→int overflow are not
    * interval-safe, and pruning through them could drop matching files. */
  private object Attr {
    private val rank = Map[Any, Int](ByteType -> 1, ShortType -> 2, IntegerType -> 3, LongType -> 4)
    private def widening(c: Cast): Boolean = (c.child.dataType, c.dataType) match {
      case (f, t) if rank.contains(f) && rank.contains(t) => rank(f) <= rank(t)
      case (f, FloatType | DoubleType) if rank.contains(f) => true
      case (FloatType, DoubleType) => true
      case _ => false
    }
    def unapply(e: Expression): Option[String] = e match {
      case a: AttributeReference => Some(a.name)
      case u: UnresolvedAttribute => Some(u.name)
      case c: Cast if widening(c) => unapply(c.child)
      case _ => None
    }
  }

  /** The attribute matched WITHOUT unwrapping any cast — the only shape a
    * BLOOM probe may engage on: sketches hold xxhash64 over the column's
    * NATIVE type, and xxhash64 is type-dispatched (hashInt(5) !=
    * hashLong(5)), so a literal widened through an analyzer cast would
    * probe with the wrong hash family and prune a file that contains the
    * value. Interval (min/max) pruning stays available through [[Attr]] —
    * widening is value-preserving, so bound comparisons remain exact. */
  private object BareAttr {
    def unapply(e: Expression): Option[String] = e match {
      case a: AttributeReference => Some(a.name)
      case u: UnresolvedAttribute => Some(u.name)
      case _ => None
    }
  }

  /** Translate a row predicate into a file-survives predicate over the stats
    * columns. Conservative by construction: any sub-expression we cannot
    * reason about maps to `true` (keep the file), so pruning never drops a
    * file that could contain a matching row — the same contract as parquet
    * row-group filtering. Handles =, <, <=, >, >=, IN, IS [NOT] NULL, AND,
    * OR with literals on either side (BETWEEN arrives as two comparisons). */
  def fileSurvives(pred: Expression, statCols: Set[String],
      bloomCols: Set[String] = Set.empty,
      tokenBloomCols: Set[String] = Set.empty): Column = {
    def known(name: String): Boolean = statCols.contains(name)
    def mn(c: String) = col(s"min_$c")
    def mx(c: String) = col(s"max_$c")
    def nulls(c: String) = col(s"nulls_$c")
    def l(e: Expression): Column = Bridge.column(e)
    // NULL stats keep the file: a stats source may legitimately lack a
    // file's bounds for a column (Iceberg bounds are per-column OPTIONAL —
    // e.g. entries re-authored by compaction), and dropping on a
    // three-valued-NULL comparison would lose matching rows. The cost is
    // conservative: an all-null column's file now also survives equality
    // probes (its nulls_ count still serves IS NULL).
    def safe(c: Column): Column = coalesce(c, lit(true))
    // Bloom probe for an equality leg: deserialize the file's sketch and
    // test xxhash64(literal) — the literal's hash is evaluated HERE at
    // translate time (same seed-42 hash the collector used), so the probe
    // is (binary, const-long) per stats row. A null sketch (no non-null
    // values in the file, or stats collected without this bloom) keeps the
    // file — conservative like every unknown shape.
    // castFree gates the probe: only a literal compared against the BARE
    // attribute carries the column's native type, so only then does
    // xxhash64(literal) land in the same hash family the sketch was built
    // from. A widened comparison (int col = 5L) keeps interval pruning but
    // must not bloom-probe — hashLong(5) is not hashInt(5), and a false
    // negative here would DROP a file that contains the value.
    def bloomHit(a: String, v: Expression, castFree: Boolean): Column =
      if (!castFree || !bloomCols.contains(a)) lit(true)
      else {
        val hash = XxHash64(Seq(v), 42L).eval(null).asInstanceOf[Long]
        bloomProbe(col(s"bloom_$a"), lit(hash))
      }
    def eqCheck(a: String, v: Literal, castFree: Boolean): Column = {
      val iv = if (known(a)) safe(mn(a) <= l(v) && mx(a) >= l(v)) else lit(true)
      iv && bloomHit(a, v, castFree)
    }
    // The engine-wide whitespace tokenization as the OPTIMIZER sees it:
    // split(c, " ") with a NON-POSITIVE limit literal (the analyzer fills
    // -1 for the two-arg form) over a token-bloomed column. Matching this
    // exact shape is what keeps the probe SOUND — a matching row holds the
    // literal as a complete token, and every complete token of the file
    // was inserted in the sketch. A POSITIVE limit is deliberately NOT
    // matched: split's final element then keeps the remainder WITH
    // separators (limit=1 yields the whole text), so array_contains could
    // match a multi-word element whose hash was never inserted — pruning
    // on it would silently drop matching files. (A raw substring
    // `contains` can match across token boundaries and is likewise NOT
    // pruned.)
    object TokensOf {
      def unapply(e: Expression): Option[String] = e match {
        case StringSplit(Attr(a), Literal(sep, _), Literal(lim, _))
            if tokenBloomCols.contains(a) && String.valueOf(sep) == " " &&
              lim.asInstanceOf[Number].intValue <= 0 => Some(a)
        case _ => None
      }
    }
    def tokenBloomHit(a: String, v: Expression): Column = {
      val hash = XxHash64(Seq(v), 42L).eval(null).asInstanceOf[Long]
      bloomProbe(col(s"tokbloom_$a"), lit(hash))
    }

    // Literal OR a foldable cast of one: an ANALYZED-but-not-optimized
    // predicate (the shape the pruned-scan entry points hand over) carries
    // the analyzer's type-coercion casts unfolded — `id >= 1000` over a
    // bigint column arrives as GreaterThanOrEqual(id, Cast(1000, bigint)),
    // and matching only bare Literals silently stops pruning on exactly
    // the most common comparisons. Folding evaluates the SAME expression
    // the runtime comparison would (same value, same dataType), so the
    // bound test stays exact; an eval that throws (ANSI cast overflow)
    // just declines to prune.
    object Lit {
      def unapply(e: Expression): Option[Literal] = e match {
        case v: Literal => Some(v)
        case c: Cast if c.foldable && c.deterministic =>
          scala.util.Try(Literal(c.eval(null), c.dataType)).toOption
        case _ => None
      }
    }
    def go(e: Expression): Column = e match {
      case And(a, b) => go(a) && go(b)
      case Or(a, b) => go(a) || go(b)
      case ArrayContains(TokensOf(a), Lit(v)) => tokenBloomHit(a, v)
      case EqualTo(ae @ Attr(a), Lit(v)) if known(a) || bloomCols.contains(a) =>
        eqCheck(a, v, BareAttr.unapply(ae).isDefined)
      case EqualTo(Lit(v), ae @ Attr(a)) if known(a) || bloomCols.contains(a) =>
        eqCheck(a, v, BareAttr.unapply(ae).isDefined)
      case LessThan(Attr(a), Lit(v)) if known(a) => safe(mn(a) < l(v))
      case LessThanOrEqual(Attr(a), Lit(v)) if known(a) => safe(mn(a) <= l(v))
      case GreaterThan(Attr(a), Lit(v)) if known(a) => safe(mx(a) > l(v))
      case GreaterThanOrEqual(Attr(a), Lit(v)) if known(a) => safe(mx(a) >= l(v))
      // literal-on-left comparisons: same interval test, flipped
      case LessThan(Lit(v), Attr(a)) if known(a) => safe(mx(a) > l(v))
      case LessThanOrEqual(Lit(v), Attr(a)) if known(a) => safe(mx(a) >= l(v))
      case GreaterThan(Lit(v), Attr(a)) if known(a) => safe(mn(a) < l(v))
      case GreaterThanOrEqual(Lit(v), Attr(a)) if known(a) => safe(mn(a) <= l(v))
      case In(ae @ Attr(a), vs) if (known(a) || bloomCols.contains(a)) &&
          vs.forall(Lit.unapply(_).isDefined) =>
        // empty IN-list matches nothing; foldLeft keeps that exact (and
        // avoids reduce's crash on Nil)
        val castFree = BareAttr.unapply(ae).isDefined
        vs.foldLeft(lit(false))((acc, v) =>
          acc || eqCheck(a, Lit.unapply(v).get, castFree))
      case InSet(child @ Attr(a), hset) if known(a) || bloomCols.contains(a) =>
        // the optimizer rewrites IN-lists longer than
        // spark.sql.optimizer.inSetConversionThreshold (default 10) to
        // InSet over internal values — without this case, exactly the
        // large IN-lists stop pruning. Internal values become typed
        // Literals of the child's type (the CAST's type when the attr was
        // matched through one — interval-safe, but never bloom-safe).
        val castFree = BareAttr.unapply(child).isDefined
        hset.foldLeft(lit(false)) { (acc, v) =>
          acc || eqCheck(a, Literal(v, child.dataType), castFree)
        }
      case IsNull(Attr(a)) if known(a) => safe(nulls(a) > 0)
      // a file of ONLY nulls can never satisfy IS NOT NULL — the `rows`
      // column every stats source carries (collectStats, Delta add.stats,
      // Iceberg manifest record_count) makes this a pure metadata test
      case IsNotNull(Attr(a)) if known(a) => safe(nulls(a) < col("rows"))
      case _ => lit(true) // unknown shape → cannot prune on it
    }
    go(pred)
  }

  /** The skipping scan: prune the stats table with the predicate, read only
    * surviving files, and re-apply the exact predicate to the rows (stats
    * pruning is a necessary condition only). Returns (dataframe,
    * survivingFiles, totalFiles) so callers/tests can assert the prune
    * actually happened. */
  def scan(spark: SparkSession, tableDir: String, stats: DataFrame, pred: Column)
      : (DataFrame, Long, Long) = {
    val statCols = stats.columns.collect { case c if c.startsWith("min_") => c.stripPrefix("min_") }
    val tokenBloomCols = stats.columns.collect {
      case c if c.startsWith("tokbloom_") => c.stripPrefix("tokbloom_") }
    val bloomCols = stats.columns.collect {
      case c if c.startsWith("bloom_") => c.stripPrefix("bloom_") }
    val total = stats.count()
    // A Column is an unresolved ColumnNode tree in Spark 4; resolve it
    // against the actual table (plan-only, nothing executes) so the
    // translator sees analyzed Catalyst comparisons with typed literals —
    // BETWEEN already split, IN-lists typed, implicit casts explicit.
    val cond = spark.read.parquet(tableDir).where(pred)
      .queryExecution.optimizedPlan
      .collectFirst { case f: org.apache.spark.sql.catalyst.plans.logical.Filter => f.condition }
    val survives = cond
      .map(fileSurvives(_, statCols.toSet, bloomCols.toSet, tokenBloomCols.toSet))
      .getOrElse(lit(true))
    val survivors = stats.where(survives)
      .select("file").collect().map(_.getString(0))
    val df =
      if (survivors.isEmpty) spark.read.parquet(tableDir).where(lit(false))
      else spark.read.parquet(survivors.toIndexedSeq: _*).where(pred)
    (df, survivors.length.toLong, total)
  }
}
