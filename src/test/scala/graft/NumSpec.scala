package graft

import org.apache.spark.SparkException
import org.apache.spark.sql.functions._

/** Contract tests for the shared numeric-stability grid (ops.Num):
  * exact round-trips inside the documented envelope, and a LOUD
  * failure — not a silent long-wrap — beyond it. */
class NumSpec extends SparkTestBase {
  import graft.ops.Num

  test("fquant round-trips in-envelope values exactly on the 2^-30 grid") {
    import spark.implicits._
    // values whose 2^-30 quantization is exact: dyadic rationals
    val vs = Seq(0.0, 1.0, -1.5, 0.25, 12345.0 + math.pow(2, -10))
    val out = vs.toDF("v")
      .select((Num.fquant($"v").cast("double") / Num.FpShift.toDouble).as("q"))
      .collect().map(_.getDouble(0))
    assert(out.toSeq === vs)
  }

  test("fquant passes NULL through as NULL") {
    import spark.implicits._
    val out = Seq[Option[Double]](None, Some(2.0)).toDF("v")
      .select(Num.fquant($"v").as("q")).collect()
    assert(out(0).isNullAt(0))
    assert(out(1).getLong(0) === 2L * Num.FpShift)
  }

  test("fquant raises loudly when |v|*2^30 would wrap a long (and on NaN)") {
    import spark.implicits._
    // 2^33 unscaled is the documented per-addend bound; 2^34 is far past it
    val over = math.pow(2, 34)
    val e1 = intercept[Exception] {
      Seq(over).toDF("v").select(Num.fquant($"v")).collect()
    }
    assert(exceptionChain(e1).exists(_.getMessage.contains("fquant envelope")), e1.getMessage)
    val e2 = intercept[Exception] {
      Seq(Double.NaN).toDF("v").select(Num.fquant($"v")).collect()
    }
    assert(exceptionChain(e2).exists(_.getMessage.contains("fquant envelope")), e2.getMessage)
    // boundary sanity: the largest in-envelope magnitude still works
    val under = math.pow(2, 32) // |v|*2^30 = 2^62 < 2^63
    val ok = Seq(under).toDF("v").select(Num.fquant($"v")).collect()(0).getLong(0)
    assert(ok === (1L << 62))
  }

  private def exceptionChain(t: Throwable): List[Throwable] =
    Iterator.iterate(t)(_.getCause).takeWhile(_ != null).take(10).toList
}
