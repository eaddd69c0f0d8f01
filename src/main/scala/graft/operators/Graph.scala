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
    * on src (both sides hash-partitioned on the same key — with edges
    * pre-partitioned by src the join reuses one partitioning across all K
    * iterations) + ONE aggregation on dst; the rank frame is O(nodes),
    * orders of magnitude smaller than edges. `localCheckpoint` per
    * iteration cuts the growing lineage so plan analysis stays O(1) per
    * round instead of O(K). Edges are deduplicated defensively — PageRank
    * over a multigraph double-counts contributions.
    */
  def pageRank(edges: DataFrame, srcCol: String, dstCol: String,
      iterations: Int): DataFrame = {
    require(iterations >= 1, s"pageRank needs >= 1 iteration, got $iterations")
    val spark = edges.sparkSession
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .distinct().localCheckpoint()
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct().localCheckpoint()
    val outdeg = e.groupBy(col("src")).agg(count(lit(1)).as("deg")).localCheckpoint()
    var ranks = nodes.withColumn("rank", lit(1000000L))
    for (_ <- 1 to iterations) {
      val contrib = e
        .join(ranks.withColumnRenamed("node", "src"), "src")
        .join(outdeg, "src")
        .select(col("dst").as("node"), expr("rank div deg").as("c"))
        .groupBy(col("node")).agg(sum(col("c")).as("s"))
      ranks = nodes.join(contrib, Seq("node"), "left")
        .select(col("node"),
          (lit(150000L) + expr("850000 * coalesce(s, 0L) div 1000000")).as("rank"))
        .localCheckpoint()
    }
    ranks
  }
}
