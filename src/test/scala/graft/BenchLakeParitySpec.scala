package graft

/** The round-20 routed bench additions must compute EXACTLY what their
  * shuffled twins compute — the hash-reduce makes the whole output row
  * set comparable as one (sum, count) pair. */
class BenchLakeParitySpec extends SparkSpec {
  test("routed bench additions equal their shuffled twins") {
    val qs = queries.BenchLakeQueries.routed.map(q => q.name -> q).toMap
    val pairs = Seq(
      ("rb1_window_routed", "rb1b_window_shuffled"),
      ("rb2_rollup_masked_routed", "rb2b_rollup_masked_shuffled"),
      ("rb3_spj_routed", "rb3b_spj_shuffled"),
      ("rb4_composite_pruned_routed", "rb4b_composite_pruned_shuffled"))
    pairs.foreach { case (r, t) =>
      val a = qs(r).build(spark, sf001).collect().toSeq
      val b = qs(t).build(spark, sf001).collect().toSeq
      assert(a === b, s"$r vs $t")
      assert(a.head.getLong(1) > 0, s"$r computed zero rows — the forced " +
        "hash-reduce would hide an empty layout")
    }
  }
}
