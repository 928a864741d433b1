package graft.functions

import java.math.RoundingMode

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** User-function surface (SURVEY.md §2-B "UDF/UDAF"): one scalar UDF (pot key
  * derivation) and one typed Aggregator (exact-decimal weighted average).
  */
object Udfs {

  /** Pot document-key derivation: `id` overrides `name` (reference
    * server.go:347-354; id wins). Null when neither present — documented
    * deviation from the reference's panic (SURVEY.md §7.4).
    */
  val potKey: (String, String) => String =
    (id, name) => if (id != null) id else name

  /** Exact-decimal weighted average: value*weight accumulated as
    * DECIMAL(38,6) so the result is identical regardless of row order or
    * partitioning — merge() is exact, which is what makes the aggregation
    * safe on a 1000-executor cluster. Mirrors Ora.dsum's determinism rules.
    */
  class WeightedAvg
      extends Aggregator[(Double, Double), (BigDecimal, BigDecimal), Double] {

    private def dec6(d: Double): BigDecimal =
      BigDecimal(java.math.BigDecimal.valueOf(d).setScale(6, RoundingMode.HALF_UP))

    override def zero: (BigDecimal, BigDecimal) = (BigDecimal(0), BigDecimal(0))

    override def reduce(
        b: (BigDecimal, BigDecimal), a: (Double, Double)): (BigDecimal, BigDecimal) =
      (b._1 + dec6(a._1 * a._2), b._2 + dec6(a._2))

    override def merge(
        x: (BigDecimal, BigDecimal), y: (BigDecimal, BigDecimal)): (BigDecimal, BigDecimal) =
      (x._1 + y._1, x._2 + y._2)

    override def finish(b: (BigDecimal, BigDecimal)): Double =
      b._1.toDouble / b._2.toDouble

    override def bufferEncoder: Encoder[(BigDecimal, BigDecimal)] =
      Encoders.product[(BigDecimal, BigDecimal)]

    override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }
}
