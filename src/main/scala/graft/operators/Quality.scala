package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality constraint suite — the reference's per-file
  * metadata validation (C2) generalized to column-level dataset audits,
  * same shape as the public AWS Deequ Check API: declare rules, get one
  * row per rule with exact violation counts.
  *
  * Scale notes: every rule evaluates in ONE aggregation pass over the
  * data — rule count changes the projection width, never the number of
  * scans or shuffles. Uniqueness rules ride the same pass through
  * Catalyst's multi-distinct expand rewrite. NULL semantics are strict:
  * a NULL value violates any value rule (in-set / between / predicate),
  * because an unknown value cannot be shown to satisfy the constraint —
  * mirror rules needing lenient NULLs with an explicit `isNull ||`
  * predicate in `Satisfies`.
  */
object Quality {

  sealed trait Rule { def name: String }

  /** Column must never be NULL. */
  final case class NotNull(column: String) extends Rule {
    val name = s"not_null:$column"
  }

  /** Column values must be unique (violations = surplus duplicate rows,
    * NULLs ignored — pair with NotNull for key columns). */
  final case class Unique(column: String) extends Rule {
    val name = s"unique:$column"
  }

  /** Column must be one of the given values. */
  final case class InSet(column: String, values: Seq[Any]) extends Rule {
    val name = s"in_set:$column"
  }

  /** Column must lie in [lo, hi]. */
  final case class Between(column: String, lo: Double, hi: Double) extends Rule {
    val name = s"between:$column"
  }

  /** Row predicate that must hold (NULL result = violation). */
  final case class Satisfies(label: String, predicate: Column) extends Rule {
    val name = s"satisfies:$label"
  }

  /** 1 if the row violates the rule, else 0 — NULL-safe by construction
    * (`when` sends a NULL condition to `otherwise`). */
  private def violation(r: Rule): Column = r match {
    case NotNull(c) => when(col(c).isNull, 1L).otherwise(0L)
    case InSet(c, vs) => when(col(c).isin(vs: _*), 0L).otherwise(1L)
    case Between(c, lo, hi) => when(col(c).between(lo, hi), 0L).otherwise(1L)
    case Satisfies(_, p) => when(p, 0L).otherwise(1L)
    case Unique(c) => throw new IllegalStateException(s"unique:$c is aggregate-level")
  }

  /** One row per rule: (rule, violations, total, passed), ordered by rule. */
  def check(df: DataFrame, rules: Seq[Rule]): DataFrame = {
    require(rules.nonEmpty, "constraint suite needs at least one rule")
    val aggs = count(lit(1)).as("__total") +: rules.zipWithIndex.flatMap {
      case (Unique(c), i) =>
        Seq(count(col(c)).as(s"__cnt_$i"), countDistinct(col(c)).as(s"__dc_$i"))
      case (r, i) =>
        // sum over zero rows is NULL — an empty frame has zero violations
        Seq(coalesce(sum(violation(r)), lit(0L)).as(s"__v_$i"))
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val rows = rules.zipWithIndex.map { case (r, i) =>
      val v = r match {
        case Unique(_) => col(s"__cnt_$i") - col(s"__dc_$i")
        case _ => col(s"__v_$i")
      }
      struct(lit(r.name).as("rule"), v.as("violations"),
        col("__total").as("total"), (v === 0).as("passed"))
    }
    one.select(explode(array(rows: _*)).as("r")).select(col("r.*")).orderBy(col("rule"))
  }
}
