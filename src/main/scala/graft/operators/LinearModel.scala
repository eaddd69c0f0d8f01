package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** In-engine training of a binary LINEAR classifier — the cheap filter a
  * training-data pipeline distills from an expensive labeling pass (a
  * heuristic gate, an LLM judge, a human sample) and then applies to the
  * full 100 TB corpus at scan speed.
  *
  * All arithmetic is FIXED-POINT (long micro-units, truncating integral
  * division) with a HARD-SIGMOID link, the same determinism contract as
  * [[Graph.pageRank]]: per-row terms are exact integers, per-iteration
  * gradients are SUMS of integers (order-independent), so training is
  * bit-identical across partitionings, cluster sizes, and engines — an
  * external SQL oracle can replay the whole schedule. Float GD could not
  * promise any of that (its gradient sums depend on reduce order).
  *
  * Model: p = hardsig(w·x) with hardsig(z) = clamp(½ + z/4, 0, 1) — the
  * piecewise-linear sigmoid (all in micro-units: clamp(500000 + z div 4,
  * 0, 1000000)). Full-batch gradient ascent on the squared-error
  * surrogate: wᵢ += (Σ_d (y_d − p_d)·x_{d,i} div 10⁶) · lrNum div
  * (n·lrDen).
  *
  * Scale shape: one aggregation job per iteration (#features integer
  * sums, map-side combined); weights are O(features) driver state —
  * the classic distributed full-batch GD layout. The per-row gradient
  * term is divided by 10⁶ BEFORE summing, so its magnitude is ≤ 10⁶ and
  * the sum stays far from Long overflow even at 10⁹⁺ rows (≤ 10¹⁵).
  */
object LinearModel {

  /** Truncating integral division as exact COLUMN arithmetic (SQL `div`
    * semantics, sign toward zero): a % b carries the dividend's sign, so
    * (a − a % b) is exactly divisible and the double division is exact
    * for |a| < 2⁵³ — every use here is bounded well inside that. */
  private def idiv(a: Column, b: Long): Column =
    ((a - a % lit(b)) / lit(b)).cast("long")

  /** Micro-unit dot product of literal weights against feature columns —
    * z_d = Σᵢ wᵢ·x_{d,i} div 10⁶. Usable anywhere a Column is (scoring a
    * scan, a filter predicate). */
  def scoreMicro(weights: Seq[Long], featureCols: Seq[Column]): Column = {
    require(weights.length == featureCols.length, "one weight per feature")
    val terms = weights.zip(featureCols).map { case (w, x) => lit(w) * x }
    idiv(terms.reduce(_ + _), 1000000L)
  }

  /** hardsig(z) in micro-units: clamp(500000 + z div 4, 0, 10⁶). */
  def hardSigmoidMicro(zMicro: Column): Column =
    greatest(lit(0L), least(lit(1000000L), lit(500000L) + idiv(zMicro, 4L)))

  /** Train `iterations` full-batch steps from zero weights. `features`
    * must be LONG micro-unit columns (caller scales; keep |x| ≤ ~10⁶ so
    * per-row products fit comfortably), `label` a LONG in {0, 1000000}.
    * Returns the micro-unit weight per feature, in order.
    *
    * Latency shape: iterations are SEQUENTIAL by construction — each step
    * is one aggregation job over the checkpointed frame whose result
    * feeds the next step's plan, so wall time is K × (one agg job), the
    * irreducible dependency chain of full-batch GD. Throughput per job is
    * the map-side-combined sum (scales with cores); K is the knob to
    * tune, not parallelism. A step whose every weight delta is zero ends
    * training early (pure driver check, no extra job): the update is
    * deterministic, so all remaining iterations would repeat the same
    * no-op — the replaying oracle sees identical weights either way. */
  def trainLogistic(df: DataFrame, features: Seq[Column], label: Column,
      iterations: Int, lrNum: Long = 1L, lrDen: Long = 1L): Seq[Long] = {
    require(iterations >= 1 && features.nonEmpty && lrNum > 0 && lrDen > 0)
    // materialize the (features, label) projection once — every iteration
    // re-aggregates the same narrow integer frame, not the source plan
    val cols = features.zipWithIndex.map { case (f, i) => f.cast("long").as(s"x$i") }
    val frame = df.select(cols :+ label.cast("long").as("y"): _*).localCheckpoint()
    var w = Seq.fill(features.length)(0L)
    var it = 0
    var converged = false
    while (it < iterations && !converged) {
      val z = scoreMicro(w, features.indices.map(i => col(s"x$i")))
      val err = col("y") - hardSigmoidMicro(z)
      // per-row div 10⁶ BEFORE the sum: bounded terms, overflow-safe sums
      val aggs = features.indices.map(i =>
        sum(idiv(err * col(s"x$i"), 1000000L)).as(s"g$i")) :+
        count(lit(1L)).as("n")
      val row = frame.agg(aggs.head, aggs.tail: _*).head()
      val n = row.getLong(features.length)
      require(n > 0, "trainLogistic on an empty frame")
      val deltas = w.indices.map(i => row.getLong(i) * lrNum / (n * lrDen))
      converged = deltas.forall(_ == 0L)
      w = w.zip(deltas).map { case (wi, d) => wi + d }
      it += 1
    }
    w
  }
}
