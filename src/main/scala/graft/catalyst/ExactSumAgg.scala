package graft.catalyst

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed `Aggregator` (the §2.2 UDAF surface): exact, order-independent
  * double summation via BigDecimal partials — the distributed form of
  * `Stat0.ExactSum`, for global moments that must be bit-identical under
  * any partitioning (partial aggregation + merge come free from the
  * Aggregator contract, unlike the reference's PG aggregates which have
  * no combine function — `postgeoda/sql/weights.sql:196-206`).
  *
  * Register for SQL/DataFrame use:
  *   spark.udf.register("exact_sum", functions.udaf(ExactSumAgg))
  */
object ExactSumAgg extends Aggregator[Double, java.math.BigDecimal, Double] {
  override def zero: java.math.BigDecimal = java.math.BigDecimal.ZERO
  override def reduce(b: java.math.BigDecimal, a: Double): java.math.BigDecimal =
    if (a.isNaN || a.isInfinite) b else b.add(new java.math.BigDecimal(a))
  override def merge(b1: java.math.BigDecimal, b2: java.math.BigDecimal): java.math.BigDecimal =
    b1.add(b2)
  override def finish(b: java.math.BigDecimal): Double = b.doubleValue()
  override def bufferEncoder: Encoder[java.math.BigDecimal] =
    Encoders.kryo[java.math.BigDecimal]
  override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
}
