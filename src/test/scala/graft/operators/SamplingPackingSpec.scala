package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Edge semantics for the deterministic sampling/split and packing
  * operators (their value paths are oracle-checked via l11–l13). */
class SamplingPackingSpec extends SparkSpec {
  import spark.implicits._

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
}
