package graft.functions

import java.math.{BigDecimal => JBigDecimal, RoundingMode}

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed UDAF surface (SURVEY.md §2.5 "UDF/UDAF/UDTF"): a custom
  * `Aggregator[IN, BUF, OUT]` — Spark's idiomatic replacement for the
  * reference's per-type mapper hooks when the extension point is an
  * aggregate rather than a scalar.
  *
  * Weighted average with an exact-decimal buffer: each product is
  * rounded to DECIMAL scale 6 exactly like `CAST(x AS DECIMAL(38,6))`
  * (valueOf shortest-repr + HALF_UP, mirroring Spark's Cast), so the
  * result is order-independent and reproducible by the DuckDB oracle —
  * the same stabilization trick as the `dsum` helper. */
object WeightedAvg extends Aggregator[(Double, Double), (JBigDecimal, JBigDecimal), Double] {

  private def d6(x: Double): JBigDecimal =
    JBigDecimal.valueOf(x).setScale(6, RoundingMode.HALF_UP)

  override def zero: (JBigDecimal, JBigDecimal) =
    (JBigDecimal.ZERO, JBigDecimal.ZERO)

  override def reduce(b: (JBigDecimal, JBigDecimal), in: (Double, Double)): (JBigDecimal, JBigDecimal) = {
    val (x, w) = in
    (b._1.add(d6(x * w)), b._2.add(d6(w)))
  }

  override def merge(a: (JBigDecimal, JBigDecimal), b: (JBigDecimal, JBigDecimal)): (JBigDecimal, JBigDecimal) =
    (a._1.add(b._1), a._2.add(b._2))

  override def finish(r: (JBigDecimal, JBigDecimal)): Double =
    if (r._2.signum() == 0) Double.NaN
    else r._1.doubleValue() / r._2.doubleValue()

  override def bufferEncoder: Encoder[(JBigDecimal, JBigDecimal)] =
    Encoders.tuple(Encoders.DECIMAL, Encoders.DECIMAL)

  override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
}
