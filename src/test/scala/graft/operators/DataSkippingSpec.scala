package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

class DataSkippingSpec extends SparkSpec {
  import spark.implicits._

  private lazy val dir = {
    val d = java.nio.file.Files.createTempDirectory("graft_skip").toString
    // Cluster by o_orderkey so file min/max intervals are disjoint on it.
    Tables(spark, sf001, "orders")
      .repartitionByRange(8, col("o_orderkey"))
      .sortWithinPartitions(col("o_orderkey"))
      .write.mode("overwrite").parquet(d)
    d
  }
  private lazy val stats =
    DataSkipping.collectStats(spark, dir, Seq("o_orderkey", "o_totalprice")).cache()

  private def full = spark.read.parquet(dir)

  test("IS NULL / IS NOT NULL prune on null counts: all-null and no-null files drop") {
    val d = java.nio.file.Files.createTempDirectory("graft_skip_null").toString
    // 4 files: two all-null in `v`, one mixed, one null-free — laid out by
    // a null-clustering key so the null counts differ per file
    (0L until 400L).map { i =>
      val v: java.lang.Long = if (i < 200) null else if (i < 250 && i % 5 == 0) null else i
      (i, v)
    }.toDF("id", "v")
      .repartitionByRange(4, col("id")).sortWithinPartitions(col("id"))
      .write.mode("overwrite").parquet(d)
    val st = DataSkipping.collectStats(spark, d, Seq("id", "v"))
    val total = st.count()
    assert(total === 4L)

    // IS NOT NULL: the all-null files can never match
    val (nn, nnKept, nnTotal) = DataSkipping.scan(spark, d, st, col("v").isNotNull)
    assert(nnTotal === total && nnKept < total, s"IS NOT NULL kept $nnKept of $nnTotal")
    assert(nn.count() === spark.read.parquet(d).where(col("v").isNotNull).count())

    // IS NULL: the null-free files can never match
    val (nl, nlKept, _) = DataSkipping.scan(spark, d, st, col("v").isNull)
    assert(nlKept < total, s"IS NULL kept $nlKept of $total")
    assert(nl.count() === spark.read.parquet(d).where(col("v").isNull).count())

    // conjunction: IS NOT NULL leg prunes, range leg prunes further
    val (cj, cjKept, _) = DataSkipping.scan(spark, d, st,
      col("v").isNotNull && col("id") >= 300L)
    assert(cjKept <= nnKept)
    assert(cj.count() === spark.read.parquet(d)
      .where(col("v").isNotNull && col("id") >= 300L).count())
  }

  test("stats cover every file and all rows") {
    val nFiles = new java.io.File(dir).listFiles().count(_.getName.endsWith(".parquet"))
    assert(stats.count() === nFiles.toLong)
    assert(stats.agg(sum($"rows")).as[Long].head() === full.count())
  }

  test("point predicate on the clustered key reads few files, same result") {
    val key = full.agg(max($"o_orderkey")).as[Long].head() / 2
    val pred = col("o_orderkey") === key
    val (df, hit, total) = DataSkipping.scan(spark, dir, stats, pred)
    assert(total === stats.count())
    assert(hit <= 2, s"point lookup should touch ≤2 of $total files, hit $hit")
    assert(df.count() === full.where(pred).count())
  }

  test("range predicate prunes and returns exactly the full-scan rows") {
    val hi = full.agg(max($"o_orderkey")).as[Long].head()
    val pred = col("o_orderkey") > lit(hi * 3 / 4)
    val (df, hit, total) = DataSkipping.scan(spark, dir, stats, pred)
    assert(hit < total, s"top-quartile range should skip files ($hit of $total)")
    val got = df.agg(count(lit(1)), sum($"o_totalprice")).as[(Long, Double)].head()
    val want = full.where(pred).agg(count(lit(1)), sum($"o_totalprice")).as[(Long, Double)].head()
    assert(got === want)
  }

  test("predicate on an unclustered column keeps all files but stays correct") {
    // o_totalprice is uncorrelated with the o_orderkey clustering → every
    // file's [min,max] straddles a mid price; pruning must keep them all.
    val mid = full.agg(avg($"o_totalprice")).as[Double].head()
    val pred = col("o_totalprice") > lit(mid)
    val (df, hit, total) = DataSkipping.scan(spark, dir, stats, pred)
    assert(hit === total)
    assert(df.count() === full.where(pred).count())
  }

  test("conjunction prunes via its prunable leg; unknown shapes never prune") {
    val hi = full.agg(max($"o_orderkey")).as[Long].head()
    // left leg prunable, right leg arbitrary (arithmetic — unknown shape)
    val pred = col("o_orderkey") > lit(hi * 3 / 4) && (col("o_totalprice") * 2 > lit(0))
    val (df, hit, total) = DataSkipping.scan(spark, dir, stats, pred)
    assert(hit < total)
    assert(df.count() === full.where(pred).count())

    val (df2, hit2, total2) =
      DataSkipping.scan(spark, dir, stats, col("o_totalprice") * 2 > lit(0))
    assert(hit2 === total2, "unknown predicate shape must keep every file")
    assert(df2.count() === full.count())
  }

  test("string and timestamp predicates prune on their clustered columns") {
    val d = java.nio.file.Files.createTempDirectory("graft_skip_ts").toString
    Tables(spark, sf001, "orders")
      .repartitionByRange(8, col("o_orderdate"))
      .sortWithinPartitions(col("o_orderdate"))
      .write.mode("overwrite").parquet(d)
    val st = DataSkipping.collectStats(spark, d, Seq("o_orderdate", "o_orderstatus")).cache()
    val f = spark.read.parquet(d)

    // post-load contract (DataContractSpec): event-time is TimestampType
    val maxDate = f.agg(max($"o_orderdate")).collect().head.getTimestamp(0)
    val cutoff = java.sql.Timestamp.from(
      maxDate.toInstant.minus(java.time.Duration.ofDays(200)))
    val predTs = col("o_orderdate") > lit(cutoff)
    val (dfTs, hitTs, totalTs) = DataSkipping.scan(spark, d, st, predTs)
    assert(hitTs < totalTs, s"late-date range should skip files ($hitTs of $totalTs)")
    assert(dfTs.count() === f.where(predTs).count())

    // status is uncorrelated with date clustering → no pruning, full parity
    val predS = col("o_orderstatus") === "F"
    val (dfS, hitS, totalS) = DataSkipping.scan(spark, d, st, predS)
    assert(hitS === totalS)
    assert(dfS.count() === f.where(predS).count())
  }

  test("pruning never loses rows across a sweep of thresholds and operators") {
    val keys = full.agg(min($"o_orderkey"), max($"o_orderkey")).as[(Long, Long)].head()
    val (lo, hi) = keys
    val span = hi - lo
    for (q <- Seq(0.0, 0.1, 0.33, 0.5, 0.77, 0.99, 1.0)) {
      val v = lo + (span * q).toLong
      for (pred <- Seq(
          col("o_orderkey") <= v, col("o_orderkey") > v, col("o_orderkey") === v,
          col("o_orderkey") >= v && col("o_orderkey") < v + span / 10)) {
        val (df, _, _) = DataSkipping.scan(spark, dir, stats, pred)
        assert(df.count() === full.where(pred).count(), s"mismatch at q=$q pred=$pred")
      }
    }
  }

  test("z-ordered layout lets stats prune on BOTH clustered dimensions") {
    val d = java.nio.file.Files.createTempDirectory("graft_skip_z").toString
    val orders = Tables(spark, sf001, "orders")
    Layout.zorderWrite(orders, Seq("o_custkey", "o_totalprice"), d, targetFiles = 16)
    val st = DataSkipping.collectStats(spark, d, Seq("o_custkey", "o_totalprice")).cache()
    val f = spark.read.parquet(d)

    val maxCust = f.agg(max($"o_custkey")).as[Long].head()
    val maxPrice = f.agg(max($"o_totalprice")).as[Double].head()
    // a narrow box in (custkey, price) space — z-order clusters both, so
    // most files' rectangles miss it; a linear sort would prune one dim only
    val pred = $"o_custkey" > lit(maxCust * 3 / 4) && $"o_totalprice" > lit(maxPrice * 0.75)
    val (df, hit, total) = DataSkipping.scan(spark, d, st, pred)
    assert(hit <= total / 2, s"z-order box query should skip most files ($hit of $total)")
    assert(df.count() === f.where(pred).count())

    // each single dimension also prunes on its own
    val (_, hitC, _) = DataSkipping.scan(spark, d, st, $"o_custkey" > lit(maxCust * 3 / 4))
    val (_, hitP, _) = DataSkipping.scan(spark, d, st, $"o_totalprice" > lit(maxPrice * 0.75))
    assert(hitC < total && hitP < total, s"per-dim pruning: cust $hitC, price $hitP of $total")
  }

  test("narrowing casts never prune (not interval-safe); widening casts do") {
    val d = java.nio.file.Files.createTempDirectory("graft_skip_cast").toString
    Seq((1, 4.5), (2, 9.5), (3, 20.5), (4, 30.5)).toDF("k", "x")
      .repartitionByRange(2, col("k")).sortWithinPartitions(col("k"))
      .write.mode("overwrite").parquet(d)
    val st = DataSkipping.collectStats(spark, d, Seq("k", "x")).cache()
    val f = spark.read.parquet(d)

    // double→int truncation: row x=4.5 matches cast(x as int) = 4, but the
    // raw interval test min_x <= 4 fails — the translator must refuse to
    // prune through the narrowing cast and keep every file
    val narrowing = col("x").cast("int") === 4
    val (dfN, hitN, totalN) = DataSkipping.scan(spark, d, st, narrowing)
    assert(hitN === totalN, "narrowing cast must not prune")
    assert(dfN.count() === f.where(narrowing).count())
    assert(dfN.count() === 1L)

    // int→long widening (analyzer inserts it for a long literal) stays exact
    val widening = col("k") === lit(4L)
    val (dfW, hitW, totalW) = DataSkipping.scan(spark, d, st, widening)
    assert(hitW < totalW, s"widening cast should still prune ($hitW of $totalW)")
    assert(dfW.count() === 1L)
  }

  test("IN-list and empty-result predicates") {
    val keys = full.orderBy($"o_orderkey").limit(2).select($"o_orderkey").as[Long].collect()
    val inPred = col("o_orderkey").isin(keys.map(Long.box).toIndexedSeq: _*)
    val (dfIn, hitIn, totalIn) = DataSkipping.scan(spark, dir, stats, inPred)
    assert(hitIn < totalIn, "two low keys should land in the first file(s)")
    assert(dfIn.count() === keys.length.toLong)

    val hi = full.agg(max($"o_orderkey")).as[Long].head()
    val (dfNone, hitNone, _) =
      DataSkipping.scan(spark, dir, stats, col("o_orderkey") > lit(hi + 1000000))
    assert(hitNone === 0L)
    assert(dfNone.count() === 0L)
  }

  test("bloom filters prune point lookups where min/max cannot") {
    val d = java.nio.file.Files.createTempDirectory("graft_skip_bloom").toString
    // HASH layout on a high-cardinality string key: every file's [min, max]
    // spans the whole domain, so interval pruning keeps all 8 files — the
    // exact case blooms exist for.
    Tables(spark, sf001, "orders")
      .withColumn("ok_str", concat(lit("K"), $"o_orderkey"))
      .repartition(8, col("o_orderkey"))
      .write.mode("overwrite").parquet(d)
    val f = spark.read.parquet(d)

    // min/max-only stats: point lookup keeps everything. The probed key is
    // the MEDIAN o_orderkey — lexicographically interior, so every file's
    // string [min, max] straddles it under the hash layout (an extreme key
    // would let interval pruning win by accident).
    val stPlain = DataSkipping.collectStats(spark, d, Seq("ok_str")).cache()
    val mid = f.agg(max($"o_orderkey")).as[Long].head() / 2
    val key = f.where($"o_orderkey" >= mid).orderBy($"o_orderkey")
      .limit(1).select($"ok_str").as[String].head()
    val (dfP, hitP, totalP) = DataSkipping.scan(spark, d, stPlain, col("ok_str") === key)
    assert(hitP === totalP, "interval pruning cannot help a hash layout")
    assert(dfP.count() === 1L)

    // bloom stats: the same lookup touches ~1 file (≤2 allows an fp)
    val st = DataSkipping.collectStats(spark, d, Seq("o_orderkey"),
      bloomCols = Seq("ok_str"), bloomItems = 10000L).cache()
    val (df, hit, total) = DataSkipping.scan(spark, d, st, col("ok_str") === key)
    assert(hit <= 2, s"bloom point lookup should touch ≤2 of $total files, hit $hit")
    assert(df.count() === 1L)

    // IN over two keys from different files: union of probes, exact rows
    val two = f.orderBy($"o_orderkey").limit(40).select($"ok_str").as[String].collect()
      .distinct.take(2)
    val inPred = col("ok_str").isin(two.toIndexedSeq: _*)
    val (dfIn, hitIn, _) = DataSkipping.scan(spark, d, st, inPred)
    assert(hitIn <= 4)
    assert(dfIn.count() === 2L)

    // absent value: at most fp files touched, zero rows back
    val (dfNo, hitNo, _) = DataSkipping.scan(spark, d, st, col("ok_str") === "K-nope")
    assert(hitNo <= 2)
    assert(dfNo.count() === 0L)

    // OR with an interval leg: survivors are the UNION of both prunes
    val loKey = f.agg(min($"o_orderkey")).as[Long].head()
    val orPred = col("ok_str") === key || col("o_orderkey") <= lit(loKey)
    val (dfOr, _, _) = DataSkipping.scan(spark, d, st, orPred)
    assert(dfOr.count() === f.where(orPred).count())
  }

  test("a widened literal never bloom-probes (wrong hash family) but native probes still prune") {
    import spark.implicits._
    val d = java.nio.file.Files.createTempDirectory("graft_skip_bloomcast").toString
    // INT column, hash layout: sketches hold xxhash64-of-INT values. A
    // comparison against a LONG literal analyzes as Cast(k, bigint) = 5L —
    // probing the sketch with hashLong would miss (hashInt(v) != hashLong(v))
    // and silently prune the file that HOLDS the value. The gate must fall
    // back to interval-only pruning there, and keep full bloom pruning for
    // the native-typed probe.
    (0 until 1000).map(i => (i, s"p$i")).toDF("k", "p")
      .repartition(4, col("k")).write.mode("overwrite").parquet(d)
    val st = DataSkipping.collectStats(spark, d, Seq("k"),
      bloomCols = Seq("k"), bloomItems = 10000L).cache()

    // native INT probe: bloom prunes to the one holding file
    val (dfI, hitI, totalI) = DataSkipping.scan(spark, d, st, col("k") === 707)
    assert(totalI === 4L)
    assert(hitI <= 2, s"native probe should bloom-prune, hit $hitI")
    assert(dfI.count() === 1L)

    // widened LONG literal: the row MUST come back (no false prune)
    val (dfL, _, _) = DataSkipping.scan(spark, d, st, col("k") === lit(707L))
    assert(dfL.count() === 1L, "widened equality dropped a matching row")

    // long IN-list over the int column — same gate; and one long enough to
    // become InSet (threshold 10) whose child is the CAST
    val (dfIn, _, _) = DataSkipping.scan(spark, d, st,
      col("k").isin(707L, 9999999L))
    assert(dfIn.count() === 1L)
    val bigIn = (0 until 12).map(i => (700L + i): Any)
    val (dfSet, _, _) = DataSkipping.scan(spark, d, st,
      col("k").isin(bigIn: _*))
    assert(dfSet.count() === 12L)
  }

  test("token blooms prune text-search predicates; substring contains never prunes") {
    import spark.implicits._
    val d = java.nio.file.Files.createTempDirectory("graft_skip_tok").toString
    // 20 files × 50 docs of common filler; the needle token lives in ONE file
    val docs = (0 until 1000).map { i =>
      val needle = if (i >= 100 && i < 105) " zebrahash" else ""
      (i.toLong, s"alpha beta gamma delta$needle epsilon")
    }.toDF("id", "text")
    docs.repartitionByRange(20, $"id").write.mode("overwrite").parquet(d)
    val st = DataSkipping.collectStats(spark, d, Seq("id"),
      tokenBloomCols = Seq("text"), bloomItems = 10000L).cache()

    // token search: split + array_contains — prunes to ~1 file, exact rows
    val pred = array_contains(split($"text", " "), "zebrahash")
    val (df, hit, total) = DataSkipping.scan(spark, d, st, pred)
    assert(total === 20L)
    assert(hit <= 2, s"token search should touch ≤2 of $total files, hit $hit")
    assert(df.select("id").as[Long].collect().sorted.toSeq === (100L until 105L))

    // absent token: nothing (or fp-few) read, zero rows
    val (dfNo, hitNo, _) = DataSkipping.scan(spark, d, st,
      array_contains(split($"text", " "), "no-such-token"))
    assert(hitNo <= 2)
    assert(dfNo.count() === 0L)

    // common token: every file legitimately survives, result exact
    val (dfAll, hitAll, _) = DataSkipping.scan(spark, d, st,
      array_contains(split($"text", " "), "beta"))
    assert(hitAll === 20L)
    assert(dfAll.count() === 1000L)

    // substring contains can cross token boundaries → deliberately NOT
    // pruned (conservative: all files kept, rows exact)
    val (dfSub, hitSub, _) = DataSkipping.scan(spark, d, st, $"text".contains("zebra"))
    assert(hitSub === 20L)
    assert(dfSub.count() === 5L)

    // a non-space separator is NOT our tokenization → no pruning either
    val (dfSep, hitSep, _) = DataSkipping.scan(spark, d, st,
      array_contains(split($"text", ","), "zebrahash"))
    assert(hitSep === 20L)
    assert(dfSep.count() === 0L)

    // AND with an interval leg composes: both prunes intersect
    val (dfAnd, hitAnd, _) = DataSkipping.scan(spark, d, st,
      pred && $"id" < lit(500L))
    assert(hitAnd <= 2)
    assert(dfAnd.count() === 5L)

    // a POSITIVE limit literal is NOT our tokenization: split(text, ' ', 2)
    // leaves "gamma delta epsilon..." (separators included) in the last
    // element — array_contains can then match multi-word elements never
    // inserted in the sketch, so pruning must refuse (all files kept).
    val (dfLim, hitLim, _) = DataSkipping.scan(spark, d, st,
      array_contains(split($"text", " ", 2), "alpha"))
    assert(hitLim === 20L, "positive-limit split must not prune")
    assert(dfLim.count() === 1000L)
    // limit=1 is the extreme case: the single element IS the whole text
    val (dfLim1, hitLim1, _) = DataSkipping.scan(spark, d, st,
      array_contains(split($"text", " ", 1), "alpha beta gamma delta epsilon"))
    assert(hitLim1 === 20L)
    assert(dfLim1.count() === 995L)
  }

  test("a value bloom over a column named tokens_x is never mistaken for a token bloom") {
    import spark.implicits._
    val d = java.nio.file.Files.createTempDirectory("graft_skip_collide").toString
    // `tokens_x` holds opaque values; `x` holds text. A value bloom over
    // tokens_x produces stat column bloom_tokens_x — with the old shared
    // prefix, scan() reclassified it as a TOKEN bloom for column `x` and
    // probed token predicates on x against the WRONG sketch (unsound).
    val rows = (0 until 400).map { i =>
      val tag = if (i >= 50 && i < 55) "needle" else s"v$i"
      (i.toLong, tag, if (i >= 200 && i < 205) "rare words here" else "common words here")
    }.toDF("id", "tokens_x", "x")
    rows.repartitionByRange(8, $"id").write.mode("overwrite").parquet(d)
    val st = DataSkipping.collectStats(spark, d, Seq("id"),
      bloomCols = Seq("tokens_x"), bloomItems = 10000L).cache()

    // the value bloom on tokens_x still prunes equality probes on tokens_x
    val (dfEq, hitEq, total) = DataSkipping.scan(spark, d, st, $"tokens_x" === "needle")
    assert(total === 8L)
    assert(hitEq <= 2, s"value bloom should prune ($hitEq of $total)")
    assert(dfEq.count() === 5L)

    // a token predicate on `x` has NO token bloom → must keep all files,
    // and the result stays exact
    val predTok = array_contains(split($"x", " "), "rare")
    val (dfTok, hitTok, _) = DataSkipping.scan(spark, d, st, predTok)
    assert(hitTok === 8L, "no token bloom on x: nothing may prune")
    assert(dfTok.count() === 5L)
  }

  test("long IN-lists (optimized to InSet above threshold 10) still prune") {
    // 12 clustered low keys > inSetConversionThreshold (10) → the optimizer
    // rewrites In → InSet; without the InSet translator case this read all files
    val keys = full.orderBy($"o_orderkey").limit(12).select($"o_orderkey").as[Long].collect()
    assert(keys.length > 10)
    val pred = col("o_orderkey").isin(keys.map(Long.box).toIndexedSeq: _*)
    val (df, hit, total) = DataSkipping.scan(spark, dir, stats, pred)
    assert(hit < total, s"InSet over low keys should prune ($hit of $total)")
    assert(df.count() === keys.length.toLong)
  }
}
