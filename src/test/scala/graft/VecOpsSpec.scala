package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{VecDot, VecOps, VecSqDist}

/** The codegen'd vector kernels replace `aggregate(zip_with(...))`
  * higher-order folds for speed; these properties pin the contract that
  * made that safe — BIT-equality with the sequential left fold from 0.0
  * (the same order the DuckDB oracle's `list_reduce` uses). */
class VecOpsSpec extends SparkTestBase {
  import spark.implicits._

  private def vecs(seed: Int, n: Int, dim: Int): Seq[(Seq[Double], Seq[Double])] = {
    val rnd = new scala.util.Random(seed)
    Seq.fill(n)((Seq.fill(dim)(rnd.nextGaussian()), Seq.fill(dim)(rnd.nextGaussian())))
  }

  test("VecDot is bit-equal to the aggregate(zip_with) fold") {
    val df = vecs(seed = 5, n = 200, dim = 37).toDF("a", "b")
    val rows = df.select(
        VecDot($"a", $"b").as("kernel"),
        expr("aggregate(zip_with(a, b, (x, y) -> x * y), CAST(0 AS DOUBLE), (acc, x) -> acc + x)")
          .as("hof"))
      .collect()
    rows.foreach { r =>
      assert(java.lang.Double.doubleToRawLongBits(r.getDouble(0)) ==
        java.lang.Double.doubleToRawLongBits(r.getDouble(1)))
    }
  }

  test("VecSqDist is bit-equal to the aggregate(zip_with) fold") {
    val df = vecs(seed = 17, n = 200, dim = 37).toDF("a", "b")
    val rows = df.select(
        VecSqDist($"a", $"b").as("kernel"),
        expr("aggregate(zip_with(a, b, (x, y) -> (x - y) * (x - y)), CAST(0 AS DOUBLE), (acc, x) -> acc + x)")
          .as("hof"))
      .collect()
    rows.foreach { r =>
      assert(java.lang.Double.doubleToRawLongBits(r.getDouble(0)) ==
        java.lang.Double.doubleToRawLongBits(r.getDouble(1)))
    }
  }

  test("kernels eval identically interpreted and codegen'd") {
    // nullSafeEval (interpreted) vs the generated call path
    val a = Array(0.25, -1.5, 3.0)
    val b = Array(2.0, 0.5, -0.125)
    val ad = new org.apache.spark.sql.catalyst.util.GenericArrayData(a.map(_.asInstanceOf[Any]))
    val bd = new org.apache.spark.sql.catalyst.util.GenericArrayData(b.map(_.asInstanceOf[Any]))
    assert(VecOps.dot(ad, bd) == 0.25 * 2.0 + -1.5 * 0.5 + 3.0 * -0.125)
    val d0 = 0.25 - 2.0; val d1 = -1.5 - 0.5; val d2 = 3.0 - -0.125
    assert(VecOps.sqDist(ad, bd) == d0 * d0 + d1 * d1 + d2 * d2)
  }

  test("e2 JL projection: norm ratio concentrates near 1; signs are balanced") {
    // the sign matrix is baked data — each row should be near-balanced
    // (a degenerate all-one row would make p_j a scaled sum, not a
    // projection); md5 low bits give ~32±10 per 64
    graft.queries.Clustering.rpSigns.foreach { row =>
      assert(row.size == 64)
      val pos = row.count(_ == 1)
      assert(pos >= 18 && pos <= 46, s"sign row badly unbalanced: $pos/64")
    }
    val rows = SparkEntry.queries("e2_random_projection")(
      spark, "/root/testdata/sf0.001").collect()
    assert(rows.nonEmpty)
    val ratios = rows.map(_.getAs[Double]("jl_ratio"))
    // JL with k=8: each ratio is chi^2_8/8-ish — loose per-row bounds,
    // tight-ish mean (E=1, se ~ 0.5/sqrt(n))
    ratios.foreach(r => assert(r > 0.01 && r < 6.0, s"jl_ratio $r"))
    val mean = ratios.sum / ratios.length
    assert(mean > 0.5 && mean < 1.6, s"mean jl_ratio $mean")
  }
}
