package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed `Aggregator`s — the modern Dataset UDAF tier (SURVEY.md §2.10),
  * complementing the lower-level `TypedImperativeAggregate`
  * ([[BottomKLongs]]): declarative zero/reduce/merge/finish with
  * Encoder-managed buffers, usable both on typed Datasets
  * (`ds.select(agg.toColumn)`) and as an untyped column function
  * (`functions.udaf(agg)`).
  *
  * Buffers are fixed-point longs (cents × integral weight), so partial
  * aggregation and merge are exact integer arithmetic — associative,
  * commutative, and bit-identical across partitionings and engines; only
  * `finish` divides into a double.
  */
object TypedAggregators {

  /** (value cents, weight) running totals. */
  final case class WSum(cents: Long, weight: Long)

  /** round-half-AWAY-from-zero — the tie rule of BOTH DuckDB's
    * `round()` and its `CAST(double AS BIGINT)` (probed: 2.5→3,
    * −2.5→−3), where `math.round` alone is half-up (−2.5→−2). For
    * non-negative inputs the two agree, but pinning the away rule
    * keeps negative prices and (contract-violating) fractional
    * weights engine-identical instead of silently divergent.
    */
  private def halfAway(x: Double): Long = {
    val a = math.round(math.abs(x))
    if (x < 0) -a else a
  }

  /** Quantity-weighted mean price: Σ(cents(p)·q) / (100·Σq).
    * Input (price, integral-valued weight); null-free inputs expected
    * (filter upstream). Both the cents and weight conversions use
    * [[halfAway]], matching the af1 oracle's `round()`/`CAST` — a
    * fractional weight (contract violation) rounds the same way on
    * both engines rather than truncating here and rounding there.
    */
  object WeightedMeanPrice extends Aggregator[(Double, Double), WSum, Double] {
    override def zero: WSum = WSum(0L, 0L)
    override def reduce(b: WSum, in: (Double, Double)): WSum = {
      val cents = halfAway(in._1 * 100) // exact on 2-dec money
      val w = halfAway(in._2)
      WSum(b.cents + cents * w, b.weight + w)
    }
    override def merge(a: WSum, b: WSum): WSum =
      WSum(a.cents + b.cents, a.weight + b.weight)
    override def finish(b: WSum): Double =
      if (b.weight == 0) Double.NaN
      else b.cents.toDouble / (100.0 * b.weight.toDouble)
    override def bufferEncoder: Encoder[WSum] = Encoders.product[WSum]
    override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }
}
