package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

class AnalyticsSpec extends SparkSpec {
  import spark.implicits._

  // ---- Profile ----------------------------------------------------------

  test("Profile.numeric counts nulls/distincts and rounds min/max/avg") {
    val df = Seq[(java.lang.Long, java.lang.Double)](
      (1L, 2.0), (2L, 4.0), (2L, null), (null, 10.0))
      .toDF("k", "v")
    val rows = Profile.numeric(df, Seq("k", "v"))
      .as[(String, Long, Long, Long, Double, Double, Double)].collect()
    assert(rows.length === 2)
    val k = rows.find(_._1 == "k").get
    assert(k === (("k", 3L, 1L, 2L, 1.0, 2.0, 1.67)))
    val v = rows.find(_._1 == "v").get
    assert(v === (("v", 3L, 1L, 3L, 2.0, 10.0, 5.33)))
  }

  test("Profile.numeric approx mode keeps exact row shape") {
    val df = Seq((1L, 1.0), (2L, 2.0)).toDF("k", "v")
    val rows = Profile.numeric(df, Seq("k"), approx = true)
      .as[(String, Long, Long, Long, Double, Double, Double)].collect()
    assert(rows.head === (("k", 2L, 0L, 2L, 1.0, 2.0, 1.5)))
  }

  test("Profile.psi: identical slices give 0, shifted slices attribute drift") {
    // ref: uniform over buckets {0,1}; cur: identical → every contrib 0
    val same = Seq((5.0, true), (15.0, true), (5.0, false), (15.0, false))
      .toDF("v", "ref")
    val r0 = Profile.psi(same, col("v"), col("ref"), 0.0, 20.0, 2)
      .as[(Int, Long, Long, Long)].collect()
    assert(r0 === Array((0, 1L, 1L, 0L), (1, 1L, 1L, 0L)))

    // ref all in bucket 0, cur all in bucket 1 → symmetric ±contributions,
    // each (1 - eps)·ln((1-eps)/eps) ≈ 13.8 in PSI units
    val shifted = Seq((5.0, true), (5.0, true), (15.0, false), (15.0, false))
      .toDF("v", "ref")
    val r1 = Profile.psi(shifted, col("v"), col("ref"), 0.0, 20.0, 2)
      .as[(Int, Long, Long, Long)].collect()
    assert(r1.map(_._1).toSeq === Seq(0, 1))
    assert(r1(0)._4 === r1(1)._4) // symmetric
    assert(r1(0)._4 > 13000000L && r1(0)._4 < 14000000L)
  }

  test("Profile.psi clamps out-of-range values to edge buckets") {
    val df = Seq((-100.0, true), (999.0, true), (5.0, false), (15.0, false))
      .toDF("v", "ref")
    val rows = Profile.psi(df, col("v"), col("ref"), 0.0, 20.0, 2)
      .as[(Int, Long, Long, Long)].collect()
    assert(rows.map(r => (r._1, r._2, r._3)).toSeq ===
      Seq((0, 1L, 1L), (1, 1L, 1L)))
  }

  // ---- TimeSeries.gapFill ------------------------------------------------

  test("gapFill zero-fills counts, forward-fills measures, leaves leading gaps null") {
    val observed = Seq(("a", 2, 5L, 10.0), ("a", 4, 2L, 20.0), ("b", 1, 1L, 7.0))
      .toDF("key", "bucket", "cnt", "m")
    val keys = Seq("a", "b").toDF("key")
    val cal = Seq(1, 2, 3, 4).toDF("bucket")
    val out = TimeSeries
      .gapFill(keys, cal, observed, Seq("key"), "bucket",
        zeroFill = Map("cnt" -> lit(0L)), forwardFill = Seq("m"))
      .orderBy("key", "bucket")
      .as[(String, Int, Long, Option[Double])].collect().toSeq
    assert(out === Seq(
      ("a", 1, 0L, None),          // leading gap: no prior observation
      ("a", 2, 5L, Some(10.0)),
      ("a", 3, 0L, Some(10.0)),    // forward-filled
      ("a", 4, 2L, Some(20.0)),
      ("b", 1, 1L, Some(7.0)),
      ("b", 2, 0L, Some(7.0)),
      ("b", 3, 0L, Some(7.0)),
      ("b", 4, 0L, Some(7.0))))
  }

  // ---- FreqSketch.heavyHitters ------------------------------------------

  private def exactHH(items: org.apache.spark.sql.DataFrame, k: Int): Seq[(String, Long)] = {
    val n = items.count()
    items.groupBy(col("item")).agg(count(lit(1)).as("cnt"))
      .where(col("cnt") > lit(n.toDouble / k))
      .orderBy(col("cnt").desc, col("item"))
      .as[(String, Long)].collect().toSeq
  }

  test("heavyHitters equals exact groupBy+HAVING on skewed data, any partitioning") {
    // Zipf-ish: item i appears ~ 3000/i times; deterministic construction.
    val data = (1 to 40).flatMap(i => Seq.fill(3000 / i)(s"item_$i"))
    for (parts <- Seq(1, 3, 17)) {
      val items = spark.createDataset(data).repartition(parts).toDF("item")
      val got = FreqSketch.heavyHitters(items, "item", k = 20)
        .as[(String, Long)].collect().toSeq
      assert(got === exactHH(items, 20), s"parts=$parts")
    }
  }

  test("heavyHitters stays exact for long keys beyond 2^53 (no double coercion)") {
    // adjacent longs that collapse to the SAME double — a recount joining
    // the raw long column to string candidates would coerce to double and
    // conflate them
    val a = 9007199254740992L
    val b = 9007199254740993L
    val items = spark.createDataset(Seq.fill(30)(a) ++ Seq.fill(20)(b) ++ (1L to 50L))
      .toDF("item")
    val got = FreqSketch.heavyHitters(items, "item", k = 10)
      .as[(String, Long)].collect().toSeq
    assert(got === Seq((a.toString, 30L), (b.toString, 20L)))
  }

  test("heavyHitters handles a uniform stream (no item qualifies)") {
    val items = spark.createDataset((1 to 1000).map(i => s"u_$i")).toDF("item")
    assert(FreqSketch.heavyHitters(items, "item", k = 100).count() === 0L)
  }

  test("heavyHitters ignores null items as candidates but counts them in N") {
    val items = (Seq.fill(60)(Some("hot")) ++ Seq.fill(40)(Option.empty[String]))
      .toDF("item")
    val got = FreqSketch.heavyHitters(items, "item", k = 4)
      .as[(String, Long)].collect().toSeq
    // N = 100, bar = 25: "hot" (60) qualifies; null never emitted.
    assert(got === Seq(("hot", 60L)))
  }

  // ---- Quality.check -----------------------------------------------------

  test("Quality.check counts violations exactly, one row per rule, NULL-strict") {
    val df = Seq[(java.lang.Long, String, java.lang.Double)](
      (1L, "F", 10.0), (2L, "O", -5.0), (2L, "X", null), (null, null, 200.0))
      .toDF("k", "status", "price")
    val got = Quality.check(df, Seq(
      Quality.NotNull("k"),
      Quality.Unique("k"),
      Quality.InSet("status", Seq("F", "O")),
      Quality.Between("price", 0.0, 100.0),
      Quality.Satisfies("k_pos", col("k") > 0)))
      .as[(String, Long, Long, Boolean)].collect().toMap2
    assert(got("not_null:k") === ((1L, 4L, false)))       // one NULL key
    assert(got("unique:k") === ((1L, 4L, false)))         // k=2 twice → 1 surplus
    assert(got("in_set:status") === ((2L, 4L, false)))    // "X" and NULL violate
    assert(got("between:price") === ((3L, 4L, false)))    // -5, NULL, 200
    assert(got("satisfies:k_pos") === ((1L, 4L, false)))  // NULL k violates
  }

  test("Quality.check passes a clean frame") {
    val df = Seq((1L, "F"), (2L, "O")).toDF("k", "status")
    val got = Quality.check(df, Seq(Quality.NotNull("k"), Quality.Unique("k")))
      .as[(String, Long, Long, Boolean)].collect()
    assert(got.forall(r => r._2 == 0L && r._4))
  }

  private implicit class Map2[A, B, C, D](rows: Array[(A, B, C, D)]) {
    def toMap2: Map[A, (B, C, D)] = rows.map(r => r._1 -> ((r._2, r._3, r._4))).toMap
  }

  // ---- HLL sketch set algebra (b14b) -------------------------------------

  test("sketch intersect estimate is within 5% of exact at sf0.001") {
    val o = Tables(spark, sf001, "orders")
    val exact = o.where(col("o_orderstatus") === "F").select(col("o_custkey"))
      .intersect(o.where(col("o_orderstatus") === "O").select(col("o_custkey")))
      .count()
    val est = graft.queries.AnalyticsQueries.b14b.build(spark, sf001)
      .select(col("est_intersect")).as[Long].head()
    assert(math.abs(est - exact) <= math.max(1L, (exact * 0.05).toLong),
      s"est=$est exact=$exact")
  }
}
