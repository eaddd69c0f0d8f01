package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.graft.Bridge

/** Bloom-filter join pruning — the manual form of Spark's runtime row-level
  * filtering (`spark.sql.optimizer.runtime.bloomFilter.*`), built on the
  * same Catalyst expressions (`BloomFilterAggregate` /
  * `BloomFilterMightContain`, not SQL-registered in Spark 4; reached via
  * the [[org.apache.spark.sql.graft.Bridge]]).
  *
  * Why it matters at 100 TB: in `fact ⋈ selective-dim`, the shuffle writes
  * the whole fact table before any matching happens. A bloom filter over
  * the dim keys is a few MB regardless of fact size; broadcasting it and
  * filtering the fact rows BEFORE the exchange drops the non-matching
  * fraction (bounded by the false-positive rate) from the shuffle entirely.
  * The subsequent real join removes false positives, so results are
  * byte-identical to the plain join.
  */
object BloomOps {

  /** Aggregate a bloom filter over (already xxhash64-hashed, long) keys. */
  def bloomAgg(keyHash: Column, expectedItems: Long, numBits: Long): Column =
    Bridge.column(new BloomFilterAggregate(
      Bridge.expression(keyHash),
      Literal(expectedItems), Literal(numBits)).toAggregateExpression())

  /** Membership probe against a one-row bloom DataFrame (as produced by
    * `dim.agg(bloomAgg(...))`). `might_contain` requires its bloom input to
    * be a constant or scalar subquery — the same shape Spark's own runtime
    * filter injects — so the bloom side is attached as an uncorrelated
    * scalar subquery: executed once, its binary value shipped to tasks. */
  def mightContain(bloomDf: DataFrame, keyHash: Column): Column =
    Bridge.column(new BloomFilterMightContain(
      Bridge.scalarSubquery(bloomDf), Bridge.expression(keyHash)))

  /** The pruned fact side alone (no join) — what survives the bloom probe;
    * building block for [[bloomPrunedJoin]] and for feeding a downstream
    * shuffle directly. */
  def bloomPrunedFact(
      fact: DataFrame,
      dim: DataFrame,
      factKey: String,
      dimKey: String,
      expectedItems: Long = 1000000L,
      numBits: Long = 8L * 1024 * 1024): DataFrame = {
    val bf = dim.agg(bloomAgg(xxhash64(col(dimKey)), expectedItems, numBits).as("__bf"))
    fact.where(mightContain(bf, xxhash64(col(factKey))))
  }

  /** Inner equi-join with the fact side pre-pruned through a bloom filter of
    * the dim keys. `factKey` and `dimKey` must be distinct column names.
    * Sizing: `numBits ≈ 1.44 · expectedItems · log2(1/fpp)` — the defaults
    * give ~1% fpp at 1M dim keys for a 1 MB subquery value. */
  def bloomPrunedJoin(
      fact: DataFrame,
      dim: DataFrame,
      factKey: String,
      dimKey: String,
      expectedItems: Long = 1000000L,
      numBits: Long = 8L * 1024 * 1024): DataFrame = {
    require(factKey != dimKey, "factKey and dimKey must be distinct names")
    bloomPrunedFact(fact, dim, factKey, dimKey, expectedItems, numBits)
      .join(dim, col(factKey) === col(dimKey))
  }
}
