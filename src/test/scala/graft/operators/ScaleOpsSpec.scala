package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

class ScaleOpsSpec extends SparkSpec {
  import spark.implicits._

  test("scalableTopK (bounded aggregator) equals bruteForceTopK (window) exactly") {
    val emb = Tables(spark, sf001, "embeddings")
    val q = emb.where(col("vec_id") < 50)
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.select(col("vec_id"), col("rank"), col("nn_id"), round(col("cosine"), 9).as("c"))
        .orderBy("vec_id", "rank").as[(Long, Int, Long, Double)].collect().toSeq
    assert(canon(Similarity.scalableTopK(emb, q, "vec_id", "embedding", 3)) ===
      canon(Similarity.bruteForceTopK(emb, q, "vec_id", "embedding", 3)))
  }

  test("salted aggregation equals plain aggregation") {
    val li = Tables(spark, sf001, "lineitem")
    val salted = SkewOps.saltedCountSum(li, Seq("l_returnflag"), "l_quantity", salts = 8)
      .orderBy("l_returnflag").as[(String, Long, Double)].collect()
    val plain = li.groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("cnt"), sum(col("l_quantity")).as("s"))
      .orderBy("l_returnflag").as[(String, Long, Double)].collect()
    assert(salted.map(r => (r._1, r._2)).toSeq === plain.map(r => (r._1, r._2)).toSeq)
    salted.zip(plain).foreach { case (s, p) =>
      assert(math.abs(s._3 - p._3) < 1e-6, s"${s._1}: ${s._3} vs ${p._3}")
    }
  }

  test("salted join equals plain inner join") {
    val orders = Tables(spark, sf001, "orders").select("o_orderkey", "o_custkey", "o_totalprice")
    val customer = Tables(spark, sf001, "customer")
      .select(col("c_custkey").as("o_custkey"), col("c_name"))
    val plain = orders.join(customer, Seq("o_custkey"))
      .orderBy("o_orderkey").as[(Long, Long, Double, String)].collect().toSeq
    val salted = SkewOps.saltedJoin(orders, customer, Seq("o_custkey"), salts = 8)
      .select("o_custkey", "o_orderkey", "o_totalprice", "c_name")
      .orderBy("o_orderkey").as[(Long, Long, Double, String)].collect().toSeq
    assert(salted === plain)
  }
}
