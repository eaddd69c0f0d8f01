package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Fixed-point PageRank (SURVEY.md §2.14 T55): hand-checkable structures
  * and the exactness properties the micro-unit arithmetic promises. */
class GraphSpec extends SparkSpec {
  import spark.implicits._

  private def ranks(edges: Seq[(Long, Long)], iters: Int): Map[Long, Long] =
    Graph.pageRank(edges.toDF("src", "dst"), "src", "dst", iters)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("a 2-cycle is a fixed point: every node keeps exactly 1_000_000") {
    // outdeg 1 both ways: r = 150000 + 850000*1000000 div 1000000 = 1000000
    val r = ranks(Seq((1L, 2L), (2L, 1L)), iters = 5)
    assert(r === Map(1L -> 1000000L, 2L -> 1000000L))
  }

  test("star graph: the hub outranks the (identical) leaves") {
    val edges = (1L to 5L).flatMap(i => Seq((i, 0L), (0L, i)))
    val r = ranks(edges, iters = 8)
    assert((1L to 5L).map(r).toSet.size === 1, "symmetric leaves must tie exactly")
    assert(r(0L) > r(1L))
    // closed system with damping: total mass stays near N·1e6 (integral
    // division leaks at most 1 micro-unit per in-edge per iteration)
    assert(math.abs(r.values.sum - 6000000L) < 100L)
  }

  test("dangling node receives mass but redistributes none (documented variant)") {
    // 1 -> 2 -> 3, 3 dangling: total mass decays, no error, 3 still ranked
    val r = ranks(Seq((1L, 2L), (2L, 3L)), iters = 4)
    assert(r.keySet === Set(1L, 2L, 3L))
    assert(r(1L) === 150000L) // no in-edges: floor at (1-d)·base
    assert(r(3L) > r(1L))
  }

  test("damping arithmetic is exact far beyond the naive Long-product overflow") {
    // the update step's old form `850000 * s div 1000000` wrapped negative
    // once in-mass s exceeded ~1.08e13 (reachable on web-scale graphs);
    // the split form must match BigInt arithmetic across that threshold
    val masses = Seq(0L, 999999L, 1000000L, 10845624119L * 1000L,
      12000000000000L, 500000000000000000L, Long.MaxValue / 850000L * 900L)
    val got = masses.toDF("s")
      .select(expr(
        "coalesce(s, 0L) div 1000000 * 850000 + coalesce(s, 0L) % 1000000 * 850000 div 1000000"))
      .as[Long].collect()
    val want = masses.map(s => (BigInt(850000) * s / 1000000).toLong)
    assert(got.toSeq === want)
  }

  test("multigraph edges are deduplicated, results partition-invariant") {
    val edges = Seq((1L, 2L), (1L, 2L), (2L, 1L), (2L, 3L), (3L, 2L))
    val a = ranks(edges, iters = 6)
    val b = Graph.pageRank(edges.toDF("src", "dst").repartition(7), "src", "dst", 6)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(a === b, "fixed-point ranks must be bit-identical across layouts")
    assert(a === ranks(edges.distinct, iters = 6))
  }

  private def tris(edges: Seq[(Long, Long)]): Map[Long, Long] =
    Graph.triangleCounts(edges.toDF("s", "d"), "s", "d")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("triangleCounts: K4 has 4 triangles with every node on 3; squares have none") {
    val k4 = for (i <- 1L to 4L; j <- (i + 1) to 4L) yield (i, j)
    assert(tris(k4) === Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
    assert(tris(Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L))) === Map.empty)
  }

  test("triangleCounts ignores direction, duplicates, and self-loops; layout-invariant") {
    // one triangle {1,2,3} fed as a directed multigraph mess + a self-loop
    val messy = Seq((1L, 2L), (2L, 1L), (2L, 3L), (3L, 2L), (3L, 1L),
      (1L, 3L), (1L, 3L), (2L, 2L))
    assert(tris(messy) === Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
    val relaid = Graph.triangleCounts(messy.toDF("s", "d").repartition(7), "s", "d")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(relaid === tris(messy))
    // hub + one closing edge: exactly the triangles through the closure
    val hub = (2L to 20L).map(i => (1L, i)) :+ ((2L, 3L))
    assert(tris(hub) === Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
  }
}
