package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

class BloomOpsSpec extends SparkSpec {
  import spark.implicits._

  test("bloom-pruned join equals the plain join (false positives removed)") {
    val orders = Tables(spark, sf001, "orders")
    val dim = Tables(spark, sf001, "customer").where(col("c_acctbal") > 7000)
      .select(col("c_custkey"), col("c_mktsegment"))
    val pruned = BloomOps.bloomPrunedJoin(orders, dim, "o_custkey", "c_custkey")
      .select("o_orderkey", "c_custkey").as[(Long, Long)].collect().toSet
    val plain = orders.join(dim, col("o_custkey") === col("c_custkey"))
      .select("o_orderkey", "c_custkey").as[(Long, Long)].collect().toSet
    assert(pruned === plain)
    assert(plain.nonEmpty)
  }

  test("the bloom probe prunes non-matching fact rows before the join") {
    val orders = Tables(spark, sf001, "orders")
    val dim = Tables(spark, sf001, "customer").where(col("c_acctbal") > 9000)
      .select(col("c_custkey"))
    val factRows = orders.count()
    val semiRows = orders.join(dim, col("o_custkey") === col("c_custkey"), "left_semi").count()
    val prunedRows = BloomOps.bloomPrunedFact(orders, dim, "o_custkey", "c_custkey").count()
    // sound: never drops a matching row; effective: close to the semi-join
    // count (equal here — at 8M bits over a few hundred keys the false-
    // positive rate is ~0, and any fp would still need a hash collision)
    assert(prunedRows >= semiRows)
    assert(prunedRows < factRows)
    assert(prunedRows <= semiRows + factRows / 100) // fpp well under 1%
  }

  test("might_contain accepts present keys and rejects a distinct key space") {
    val keys = spark.range(0, 1000).select(col("id"))
    val bf = keys.agg(BloomOps.bloomAgg(xxhash64(col("id")), 1000L, 65536L).as("bf"))
    val probed = spark.range(0, 2000)
      .select(col("id"), BloomOps.mightContain(bf, xxhash64(col("id"))).as("hit"))
      .as[(Long, Boolean)].collect()
    val (present, absent) = probed.partition(_._1 < 1000)
    assert(present.forall(_._2), "no false negatives allowed")
    val fpr = absent.count(_._2).toDouble / absent.length
    assert(fpr < 0.05, s"fpr=$fpr")
  }
}
