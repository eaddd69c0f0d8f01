package graft.functions

import org.apache.spark.sql.{Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Custom typed UDAF surface (SURVEY.md §4.3): a weighted mean implemented
  * as an `Aggregator[IN, BUF, OUT]` with a mergeable buffer — partial
  * aggregation (map-side combine) works exactly like built-in aggregates,
  * so the operator shuffles one buffer per group per partition at scale. */
object WeightedMean extends Aggregator[(Double, Double), (Double, Double), Double] {
  override def zero: (Double, Double) = (0.0, 0.0)
  override def reduce(b: (Double, Double), in: (Double, Double)): (Double, Double) =
    (b._1 + in._1 * in._2, b._2 + in._2)
  override def merge(a: (Double, Double), b: (Double, Double)): (Double, Double) =
    (a._1 + b._1, a._2 + b._2)
  override def finish(b: (Double, Double)): Double =
    if (b._2 == 0.0) Double.NaN else b._1 / b._2
  override def bufferEncoder: Encoder[(Double, Double)] =
    Encoders.tuple(Encoders.scalaDouble, Encoders.scalaDouble)
  override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
}

object Aggregators {
  /** Register `weighted_mean(value, weight)` for SQL/DataFrame use. */
  def register(spark: SparkSession): Unit =
    spark.udf.register("weighted_mean", udaf(WeightedMean))
}
