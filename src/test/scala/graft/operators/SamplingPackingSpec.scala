package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Edge semantics for the deterministic sampling/split and packing
  * operators (their value paths are oracle-checked via l11–l13). */
class SamplingPackingSpec extends SparkSpec {
  import spark.implicits._

  test("temperatureMix upweights small sources, caps at keep-all, stays deterministic") {
    // heavily skewed: big=2000 rows, small=40 rows
    val df = (Seq.tabulate(2000)(i => (i.toLong, "big")) ++
      Seq.tabulate(40)(i => (2000L + i, "small"))).toDF("id", "src")
    val kept = Sampling.temperatureMix(df, "src", "id",
      temperature = 2.0, targetFraction = 0.5)
    val bySource = kept.groupBy("src").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val rateBig = bySource("big").toDouble / 2000
    val rateSmall = bySource.getOrElse("small", 0L).toDouble / 40
    // τ > 1 flattens: the small source keeps a HIGHER fraction
    assert(rateSmall > rateBig, s"small=$rateSmall big=$rateBig")
    // overall fraction ≈ target (md5 buckets are uniform-ish; wide margin)
    val overall = kept.count().toDouble / 2040
    assert(overall > 0.35 && overall < 0.65, s"overall=$overall")
    // τ = 1 degenerates to a plain uniform sample: equal rates (same
    // threshold for every source up to floor granularity)
    val nat = Sampling.temperatureMix(df, "src", "id",
      temperature = 1.0, targetFraction = 0.5)
      .groupBy("src").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // identical per-row membership predicate → determinism across layouts
    val again = Sampling.temperatureMix(df.repartition(7), "src", "id",
      temperature = 2.0, targetFraction = 0.5)
    assert(again.select("id").collect().map(_.getLong(0)).sorted.toSeq ===
      kept.select("id").collect().map(_.getLong(0)).sorted.toSeq)
    // extreme temperature: tiny source caps at keeping everything
    val hot = Sampling.temperatureMix(df, "src", "id",
      temperature = 100.0, targetFraction = 0.5)
      .groupBy("src").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(hot("small") === 40L, s"capped source keeps all rows: $hot; nat=$nat")
  }

  test("weightedSample: p=1 keeps all, p=0 keeps none, rate tracks p, monotone supersets") {
    val df = Seq.tabulate(4000)(i => (i.toLong, (i % 100).toDouble / 100)).toDF("id", "p")
    assert(Sampling.weightedSample(df, "id", lit(1.0)).count() === 4000L)
    assert(Sampling.weightedSample(df, "id", lit(0.0)).count() === 0L)
    // out-of-range probabilities clamp instead of erroring
    assert(Sampling.weightedSample(df, "id", lit(7.5)).count() === 4000L)
    assert(Sampling.weightedSample(df, "id", lit(-3.0)).count() === 0L)
    // fixed p=0.3: empirical rate near 0.3 (md5 buckets uniform-ish)
    val r = Sampling.weightedSample(df, "id", lit(0.3)).count().toDouble / 4000
    assert(r > 0.2 && r < 0.4, s"rate=$r")
    // per-row p: kept(p) ⊆ kept(min(1, 2p)) — same key ⇒ same bucket
    val low = Sampling.weightedSample(df, "id", col("p"))
      .select("id").collect().map(_.getLong(0)).toSet
    val high = Sampling.weightedSample(df, "id", col("p") * 2)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(low.subsetOf(high), s"${(low -- high).size} rows lost when p doubled")
    // layout-independent: repartitioning changes nothing
    val re = Sampling.weightedSample(df.repartition(7), "id", col("p"))
      .select("id").collect().map(_.getLong(0)).toSet
    assert(re === low)
  }

  test("fixedKPerStratum equals the naive full window; tiny strata keep all; relayout-stable") {
    import org.apache.spark.sql.expressions.Window
    // 2000 rows across two strata forces the hash-prefix prefilter path
    // (threshold ≈ 16·65536/1000 per stratum); the tiny stratum exercises
    // the keep-everything fallback
    val df = (0L until 2000L).map(i => (i, if (i % 2 == 0) "a" else "b")).toDF("id", "s")
      .union(Seq((9999L, "tiny")).toDF("id", "s"))
    val got = Sampling.fixedKPerStratum(df, "s", "id", k = 2, seed = "t")
      .select("s", "id").as[(String, Long)].collect().toSet
    val naive = df
      .withColumn("__h", Sampling.epochShuffleKey(col("id"), "t"))
      .withColumn("__rk", row_number().over(
        Window.partitionBy(col("s")).orderBy(col("__h"), col("id"))))
      .where(col("__rk") <= 2).select("s", "id").as[(String, Long)].collect().toSet
    assert(got === naive, "prefilter must be lossless")
    assert(got.count(_._1 == "a") === 2 && got.count(_._1 == "b") === 2)
    assert(got.contains(("tiny", 9999L)), "strata with < k rows keep everything")
    val relaid = Sampling.fixedKPerStratum(df.repartition(13), "s", "id", 2, "t")
      .select("s", "id").as[(String, Long)].collect().toSet
    assert(relaid === got, "sample must not depend on the physical layout")
  }

  test("trainTestSplit is disjoint and exhaustive, including NULL keys") {
    val df = (Seq.tabulate(50)(i => Some(s"k$i")) :+ Option.empty[String])
      .zipWithIndex.map { case (k, i) => (k, i) }.toDF("key", "v")
    val (train, test) = Sampling.trainTestSplit(df, "key", testBuckets = 20)
    assert(train.count() + test.count() === 51L) // null-key row lands somewhere
    assert(train.join(test, Seq("v"), "inner").count() === 0L) // disjoint
    // determinism: same split on re-evaluation
    val (train2, _) = Sampling.trainTestSplit(df, "key", testBuckets = 20)
    assert(train.select("v").as[Int].collect().sorted.toSeq ===
      train2.select("v").as[Int].collect().sorted.toSeq)
  }

  test("sharded packing equals per-shard global packing and parallelizes the window") {
    val docs = (1 to 60).map(i => (i.toLong, s"s${i % 3}", 40L + i % 7)).toDF("id", "shard", "toks")
    val sharded = Packing.withBinSharded(docs, Seq("shard"), "id", col("toks"), budget = 100)
      .select(col("shard"), col("id"), col("bin"))
    // reference: run the global form on each shard independently
    val reference = (0 to 2).map { s =>
      Packing.withBin(docs.where(col("shard") === s"s$s"), "id", col("toks"), budget = 100)
        .select(col("shard"), col("id"), col("bin"))
    }.reduce(_ unionByName _)
    assert(sharded.collect().toSet === reference.collect().toSet)
    // the sharded window must actually partition (no single-task funnel)
    val plan = sharded.queryExecution.executedPlan.toString
    assert(!plan.contains("SinglePartition"), plan.take(1500))
  }

  test("distributed packing equals the exact global window, any shard count") {
    val docs = (1 to 137).map(i => (i.toLong, 30L + (i * 7) % 11)).toDF("id", "toks")
    val exact = Packing.withBin(docs, "id", col("toks"), budget = 100)
      .select(col("id"), col("__cum"), col("bin")).collect().toSet
    for (n <- Seq(1, 3, 8)) {
      val dist = Packing.withBinDistributed(docs, "id", col("toks"), budget = 100, shards = n)
        .select(col("id"), col("__cum"), col("bin"))
      assert(dist.collect().toSet === exact, s"shards=$n")
      // the window must be partitioned by the shard id, never SinglePartition
      val plan = dist.queryExecution.executedPlan.toString
      assert(!plan.contains("SinglePartition"), s"shards=$n: ${plan.take(1500)}")
    }
  }

  test("distributed packing survives a shard whose tokens are all NULL") {
    // ids 1..10 range-shard into two halves; the upper half's tokens are
    // ALL NULL — its per-shard sum is NULL and must contribute a ZERO
    // offset (not crash the totals collect), matching the global window's
    // null cum/bin on those rows
    val docs = (1 to 10).map(i =>
      (i.toLong, if (i > 5) null else java.lang.Long.valueOf(40L + i)))
      .toDF("id", "toks")
    // bin assignment matches the global window (null tokens → null bin);
    // __cum itself may differ on a shard's LEADING null rows (the window
    // sum skips nulls, the local cumsum has nothing yet) — bin is the
    // contract, and non-null rows' bins pin the offsets were right
    val exact = Packing.withBin(docs, "id", col("toks"), budget = 100)
      .select(col("id"), col("bin")).collect()
      .map(r => (r.getLong(0), Option(r.get(1)))).toSet
    val dist = Packing.withBinDistributed(docs, "id", col("toks"), budget = 100, shards = 2)
      .select(col("id"), col("bin")).collect()
      .map(r => (r.getLong(0), Option(r.get(1)))).toSet
    assert(dist === exact)
    // an all-null FIRST shard: later shards' offsets must treat it as zero
    val docs2 = (1 to 10).map(i =>
      (i.toLong, if (i <= 5) null else java.lang.Long.valueOf(60L + i)))
      .toDF("id", "toks")
    val exact2 = Packing.withBin(docs2, "id", col("toks"), budget = 100)
      .select(col("id"), col("bin")).collect()
      .map(r => (r.getLong(0), Option(r.get(1)))).toSet
    val dist2 = Packing.withBinDistributed(docs2, "id", col("toks"), budget = 100, shards = 2)
      .select(col("id"), col("bin")).collect()
      .map(r => (r.getLong(0), Option(r.get(1)))).toSet
    assert(dist2 === exact2)
  }
}
