package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Edit-distance join without a cross join, via deletion neighborhoods
  * (the SymSpell trick — Garbe 2012, public; also the 1-deletion indexing
  * of Mor & Fraenkel 1982): if ed(a, b) ≤ d then the sets of strings
  * reachable from a and from b by deleting ≤ d characters intersect, so an
  * equi-join on delete-variant keys yields a candidate superset, and one
  * exact levenshtein per CANDIDATE pair (not per cross pair) finishes.
  *
  * Scale notes: each side explodes to ≤ (len·d + 1) key rows per distinct
  * string — linear blow-up, shuffled on the key like any equi-join, vs the
  * O(n·m) nested loop a theta levenshtein join plans as. Skew lever: a
  * delete key shared by many strings (common prefixes) fans out like any
  * hot join key — AQE skew-join splits it; candidates are deduped before
  * the levenshtein verify so each surviving pair is scored once. The key
  * generation is pure codegen'd HOFs (transform/flatten over substr), no
  * UDF in the hot path.
  */
object FuzzyJoin {

  /** All strings obtained from `c` by deleting exactly one character. */
  private def deletes1(c: Column): Column =
    when(length(c) <= 0, array())
      .otherwise(transform(sequence(lit(1), length(c)), i =>
        concat(c.substr(lit(1), i - 1), c.substr(i + 1, length(c) - i))))

  /** The delete-neighborhood key set: the string itself plus every variant
    * at delete-depth ≤ maxDist (maxDist ∈ {1, 2}). */
  def deleteKeys(c: Column, maxDist: Int): Column = {
    require(maxDist >= 1 && maxDist <= 2, s"maxDist $maxDist not in 1..2")
    val d1 = deletes1(c)
    val keys =
      if (maxDist == 1) concat(array(c), d1)
      else concat(array(c), d1, flatten(transform(d1, s => deletes1(s))))
    array_distinct(keys)
  }

  /** Distinct (a, b, dist) pairs with levenshtein(a, b) ≤ maxDist, a from
    * `left(leftCol)`, b from `right(rightCol)`. Self-pairs (a == b across
    * sides) are emitted with dist 0 — callers doing a self-join filter with
    * `a < b`. */
  def editDistanceJoin(left: DataFrame, leftCol: String,
      right: DataFrame, rightCol: String, maxDist: Int): DataFrame = {
    val lk = left.select(col(leftCol).as("a")).where(col("a").isNotNull).distinct()
      .select(col("a"), explode(deleteKeys(col("a"), maxDist)).as("__key"))
    val rk = right.select(col(rightCol).as("b")).where(col("b").isNotNull).distinct()
      .select(col("b"), explode(deleteKeys(col("b"), maxDist)).as("__key"))
    lk.join(rk, "__key")
      .select(col("a"), col("b"))
      .distinct()
      // threshold form: banded O(d·len) per pair instead of O(len²), returns
      // -1 above the bound — the verify cost follows d, not string length
      .withColumn("dist", levenshtein(col("a"), col("b"), maxDist))
      .where(col("dist") >= 0)
  }
}
