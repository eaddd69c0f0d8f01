package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Iterative graph analytics over edge DataFrames. Companion to the
  * star-contraction connected components in [[Dedup]]: where components
  * answer "which docs form one duplicate cluster", PageRank answers "how
  * central is each node" — the link-analysis quality-weighting idea
  * (CommonCrawl-style page centrality as a training-data quality prior).
  *
  * All arithmetic is FIXED-POINT (long micro-units with integral
  * division): sums of longs are exact and order-independent, so the
  * result is bit-identical across partitionings, cluster sizes, and
  * engines — float PageRank cannot promise any of that (its per-node sums
  * depend on reduce order). The price is a deterministic rounding-down of
  * up to 1 micro-unit per in-edge per iteration, which is far below any
  * ranking-relevant signal.
  */
object Graph {

  /** PageRank with damping d = 0.85 over a DIRECTED edge set, K fixed
    * iterations, ranks in micro-units (node mass starts at 1_000_000):
    *
    *   r₀(v)    = 1_000_000
    *   rₖ₊₁(v)  = 150_000 + (850_000 · Σ_{u→v} ⌊rₖ(u) / outdeg(u)⌋) div 1_000_000
    *
    * The simplified "lost mass" variant: a dangling node (no out-edges)
    * keeps receiving rank but redistributes none — callers wanting the
    * strongly-connected behavior add reverse edges. Fixed iteration count
    * rather than convergence detection keeps the computation a pure
    * function of the input (and the oracle replayable).
    *
    * Scale shape: per iteration ONE join of edges against the rank frame
    * on src + ONE aggregation on dst. The rank frame is O(nodes) — orders
    * of magnitude smaller than edges — so with `broadcastRanks` (default)
    * the join is a broadcast-hash over the stationary edge frame and the
    * only shuffle per round is the dst aggregation. (The explicit hint
    * matters: checkpointed frames lose size statistics, and the planner
    * would otherwise sort-merge the full edge set every iteration.) For
    * graphs whose rank frame exceeds executor memory (web-scale), pass
    * `broadcastRanks = false`: the joins become co-partitioned shuffles
    * on src, the classic Pregel layout. `localCheckpoint` per iteration
    * cuts the growing lineage so plan analysis stays O(1) per round
    * instead of O(K). Edges are deduplicated defensively — PageRank over
    * a multigraph double-counts contributions.
    */
  def pageRank(edges: DataFrame, srcCol: String, dstCol: String,
      iterations: Int, broadcastRanks: Boolean = true): DataFrame = {
    require(iterations >= 1, s"pageRank needs >= 1 iteration, got $iterations")
    val spark = edges.sparkSession
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .distinct().localCheckpoint()
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct().localCheckpoint()
    val bc: DataFrame => DataFrame = if (broadcastRanks) broadcast else identity
    // rank div deg is stationary per src across the join — fold outdeg into
    // the rank frame ONCE per round so the edge join is a single hash probe
    val outdeg = e.groupBy(col("src")).agg(count(lit(1)).as("deg")).localCheckpoint()
    var ranks = nodes.withColumn("rank", lit(1000000L))
    for (_ <- 1 to iterations) {
      val sending = ranks.withColumnRenamed("node", "src")
        .join(bc(outdeg), Seq("src"), "left")
        .select(col("src"), expr("rank div deg").as("c"))
        .where(col("c").isNotNull) // dangling nodes send nothing
      val contrib = e
        .join(bc(sending), "src")
        .groupBy(col("dst").as("node")).agg(sum(col("c")).as("s"))
      // ⌊850000·s / 1e6⌋ computed WITHOUT the wide intermediate: the naive
      // product overflows Long once a node's in-mass s exceeds ~1.08e13
      // (reachable on the web-scale graphs the broadcastRanks=false path
      // exists for). Split s = q·1e6 + r: the quotient term is exact and
      // the remainder product is bounded by 850000·999999 < 2^40.
      ranks = nodes.join(bc(contrib), Seq("node"), "left")
        .select(col("node"),
          (lit(150000L) + expr(
            "coalesce(s, 0L) div 1000000 * 850000 + coalesce(s, 0L) % 1000000 * 850000 div 1000000"))
            .as("rank"))
        .localCheckpoint()
    }
    ranks
  }

  /** PER-NODE TRIANGLE COUNTS over an UNDIRECTED edge set — the graph-
    * cohesion primitive (community signal; divide by d(v)·(d(v)−1)/2 for
    * the local clustering coefficient). Input edges are canonicalized
    * (direction ignored, self-loops dropped, duplicates collapsed);
    * output is (node, tri_cnt) for every node on ≥ 1 triangle.
    *
    * Scale shape: the classic DEGREE-ORDERED ORIENTATION — each
    * undirected edge points from its smaller (degree, id) endpoint, so
    * every triangle {x ≺ y ≺ z} is found exactly once as the path
    * x→y→z closed by x→z. Both joins are plain equi-joins and the wedge
    * fan-out is bounded by FORWARD degrees (≤ O(√E) on any graph) — a
    * hub's O(d²) wedge explosion cannot happen, which is what makes the
    * count feasible on power-law graphs at scale. No windows, no
    * cross-joins; cost O(Σ d⁺(v)²) = O(E^1.5) worst case. */
  def triangleCounts(edges: DataFrame, srcCol: String, dstCol: String): DataFrame = {
    val und = edges
      .select(least(col(srcCol), col(dstCol)).as("a"),
        greatest(col(srcCol), col(dstCol)).as("b"))
      .where(col("a") =!= col("b") && col("a").isNotNull && col("b").isNotNull)
      .distinct()
    val deg = und.select(explode(array(col("a"), col("b"))).as("n"))
      .groupBy(col("n")).agg(count(lit(1)).as("d"))
    val oriented = und
      .join(deg.select(col("n").as("a"), col("d").as("da")), "a")
      .join(deg.select(col("n").as("b"), col("d").as("db")), "b")
      .select(when(struct(col("da"), col("a")) < struct(col("db"), col("b")),
          struct(col("a").as("u"), col("b").as("v")))
        .otherwise(struct(col("b").as("u"), col("a").as("v"))).as("e"))
      .select(col("e.u").as("u"), col("e.v").as("v"))
      .localCheckpoint() // consumed three times below: cut the shared lineage
    val tri = oriented.as("e1")
      .join(oriented.as("e2"), col("e1.v") === col("e2.u"))
      .select(col("e1.u").as("x"), col("e1.v").as("y"), col("e2.v").as("z"))
      .join(oriented.as("e3"), col("x") === col("e3.u") && col("z") === col("e3.v"),
        "left_semi")
    tri.select(explode(array(col("x"), col("y"), col("z"))).as("node"))
      .groupBy(col("node")).agg(count(lit(1)).as("tri_cnt"))
  }

  /** BOUNDED-HOP SHORTEST DISTANCES (frontier BFS): for every node
    * reachable from `seeds` within `maxHops` edges, the minimum hop count
    * (seeds themselves at 0). The k-hop-neighborhood primitive — "every
    * supplier within 3 collaboration hops of nation X", blast-radius /
    * reachability queries. Unreachable nodes are absent, seeds with no
    * edges still appear (dist 0), exactly the recursive-CTE semantics.
    *
    * Scale shape: per round ONE equi-join of the stationary edge frame
    * against the current frontier plus ONE anti-join against the visited
    * set — the classic frontier BFS, never re-expanding settled nodes, so
    * total join work is O(E · rounds) worst case and in practice O(edges
    * out of the frontier). Frontier and visited frames are O(reachable
    * nodes) — usually orders of magnitude under the edge set — so with
    * `broadcastFrontier` (default) both joins are broadcast-hash probes
    * of the big edge frame and NO shuffle of edges ever happens; for
    * graphs whose reachable set exceeds executor memory pass false and
    * both become co-partitioned shuffles on the join key (Pregel layout).
    * `localCheckpoint` per round cuts the growing lineage (plan stays
    * O(1) per round); the early-exit `isEmpty` probe is a frontier-sized
    * job, cheap next to a wasted round at scale. */
  def hopDistances(edges: DataFrame, srcCol: String, dstCol: String,
      seeds: DataFrame, seedCol: String, maxHops: Int,
      undirected: Boolean = true, broadcastFrontier: Boolean = true): DataFrame = {
    require(maxHops >= 0, s"hopDistances needs maxHops >= 0, got $maxHops")
    val fwd = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .where(col("src").isNotNull && col("dst").isNotNull)
    val e = (if (undirected)
        fwd.union(fwd.select(col("dst").as("src"), col("src").as("dst")))
      else fwd).distinct().localCheckpoint()
    val bc: DataFrame => DataFrame = if (broadcastFrontier) broadcast else identity
    var visited = seeds.select(col(seedCol).as("node")).distinct()
      .withColumn("dist", lit(0)).localCheckpoint()
    var frontier = visited.select(col("node"))
    var k = 0
    while (k < maxHops && !frontier.isEmpty) {
      k += 1
      frontier = e.join(bc(frontier.withColumnRenamed("node", "src")), "src")
        .select(col("dst").as("node")).distinct()
        .join(bc(visited.select(col("node"))), Seq("node"), "left_anti")
        .localCheckpoint()
      visited = visited.union(frontier.withColumn("dist", lit(k))).localCheckpoint()
    }
    visited
  }
}
