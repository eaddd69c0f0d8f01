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

  private def hops(edges: Seq[(Long, Long)], seeds: Seq[Long], maxHops: Int,
      undirected: Boolean = true): Map[Long, Int] =
    Graph.hopDistances(edges.toDF("s", "d"), "s", "d",
        seeds.toDF("n"), "n", maxHops, undirected)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap

  test("hopDistances: path graph measures hops, bound truncates, seeds at 0") {
    val path = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L))
    assert(hops(path, Seq(1L), 10) ===
      Map(1L -> 0, 2L -> 1, 3L -> 2, 4L -> 3, 5L -> 4))
    assert(hops(path, Seq(1L), 2) === Map(1L -> 0, 2L -> 1, 3L -> 2))
    assert(hops(path, Seq(1L), 0) === Map(1L -> 0))
  }

  test("hopDistances: min distance wins with multiple seeds; shortcut beats long way") {
    // cycle 1-2-3-4-5-6-1 plus chord 1-4: node 4 is 1 hop via the chord
    val cyc = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (5L, 6L), (6L, 1L), (1L, 4L))
    assert(hops(cyc, Seq(1L), 6) ===
      Map(1L -> 0, 2L -> 1, 3L -> 2, 4L -> 1, 5L -> 2, 6L -> 1))
    // two seeds: every node takes the closer one
    assert(hops(Seq((1L, 2L), (2L, 3L), (3L, 4L)), Seq(1L, 4L), 5) ===
      Map(1L -> 0, 2L -> 1, 3L -> 1, 4L -> 0))
  }

  test("hopDistances: directed edges, isolated seeds, unreachable nodes, layouts") {
    // directed 1->2->3 with a back-edge 3->1: from 2, only forward reach
    assert(hops(Seq((1L, 2L), (2L, 3L), (3L, 1L)), Seq(2L), 5, undirected = false) ===
      Map(2L -> 0, 3L -> 1, 1L -> 2))
    // a seed with no edges still appears; disconnected node 9 never does
    assert(hops(Seq((1L, 2L), (9L, 10L)), Seq(1L, 7L), 3) ===
      Map(1L -> 0, 7L -> 0, 2L -> 1))
    // layout invariance + shuffle (non-broadcast) path equality
    val edges = (1L to 40L).map(i => (i, i % 7 + 100L)) ++ Seq((100L, 101L), (101L, 102L))
    val base = hops(edges, Seq(1L), 3)
    val relaid = Graph.hopDistances(edges.toDF("s", "d").repartition(11), "s", "d",
        Seq(1L).toDF("n"), "n", 3, undirected = true, broadcastFrontier = false)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(relaid === base)
  }
}
