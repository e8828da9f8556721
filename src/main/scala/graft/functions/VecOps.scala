package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Vector kernels for the similarity-search operators. A native Catalyst
  * expression (single static call inside whole-stage codegen) instead of
  * `aggregate(zip_with(...))` lambda folds — the higher-order functions
  * evaluate interpreted per element, which dominated the brute-force
  * cosine join (~20× slower at sf0.1).
  *
  * The loop accumulates left-to-right from 0.0 — the exact IEEE add order
  * of both the previous fold and the DuckDB oracle's `list_reduce`, so
  * results stay bit-identical.
  */
object VecOps {
  def dot(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) { acc += a.getDouble(i) * b.getDouble(i); i += 1 }
    acc
  }

  /** Squared L2 distance, same left-to-right-from-0.0 add order as the
    * oracle's `list_reduce` over per-dim squared differences. */
  def sqDist(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      val d = a.getDouble(i) - b.getDouble(i)
      acc += d * d
      i += 1
    }
    acc
  }
}

/** Multi-table random-hyperplane LSH signatures, computed entirely
  * inside codegen with statically cached plane weights.
  *
  * The naive formulation — one `array(lit, lit, …)` Column per plane —
  * puts nTables·bits·dim literal nodes in the expression tree (10k+ for
  * 16×5×64), and Catalyst's analysis/optimization of that tree costs
  * more DRIVER time than the whole distributed job (measured ~1.4 s of
  * a 3.0 s wall at sf0.1). Here the plan carries a single expression
  * node; weights are derived on demand (md5-seeded, deterministic — the
  * same `digit(md5("t|p|j")) - 7.5` scheme the literal version used) and
  * cached per (nTables, bits, dim) in a JVM-static map, so executors
  * materialize them once on first touch, like a broadcast without the
  * plan-size cost. */
object LshSig {
  private val cache =
    new java.util.concurrent.ConcurrentHashMap[(Int, Int, Int), Array[Array[Double]]]

  private def md5Hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  def planes(nTables: Int, bits: Int, dim: Int): Array[Array[Double]] =
    cache.computeIfAbsent((nTables, bits, dim), _ =>
      Array.tabulate(nTables * bits) { tp =>
        val t = tp / bits; val p = tp % bits
        Array.tabulate(dim) { j =>
          Integer.parseInt(md5Hex(s"$t|$p|$j").substring(0, 1), 16) - 7.5
        }
      })

  /** Bucket code per table: `bits` sign bits of hyperplane dot products,
    * packed into a long. */
  def sig(v: ArrayData, nTables: Int, bits: Int): ArrayData = {
    val dim = v.numElements()
    val pl = planes(nTables, bits, dim)
    val vec = new Array[Double](dim)
    var j = 0
    while (j < dim) { vec(j) = v.getDouble(j); j += 1 }
    val out = new Array[Any](nTables)
    var t = 0
    while (t < nTables) {
      var code = 0L
      var p = 0
      while (p < bits) {
        val w = pl(t * bits + p)
        var acc = 0.0
        var i = 0
        while (i < dim) { acc += vec(i) * w(i); i += 1 }
        code = (code << 1) | (if (acc >= 0) 1L else 0L)
        p += 1
      }
      out(t) = code
      t += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }
}

/** `lsh_sig(ARRAY<DOUBLE>) -> ARRAY<BIGINT>` (one bucket code per LSH
  * table), codegen'd. */
case class LshSignature(child: Expression, nTables: Int, bits: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.LongType)
  override protected def nullSafeEval(a: Any): Any =
    LshSig.sig(a.asInstanceOf[ArrayData], nTables, bits)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.functions.LshSig.sig($a, $nTables, $bits)")
  override protected def withNewChildInternal(c: Expression): LshSignature =
    copy(child = c)
}

object LshSignature {
  def apply(v: Column, nTables: Int, bits: Int): Column =
    ColumnBridge.column(LshSignature(ColumnBridge.expression(v), nTables, bits))
}

/** `dot(ARRAY<DOUBLE>, ARRAY<DOUBLE>) -> DOUBLE`, codegen'd.
  * ImplicitCastInputTypes because the expression is SQL-REACHABLE
  * (GraftExtensions registers it as `graft_dot`): without declared
  * input types, an `array<float>` argument passes analysis and
  * `ArrayData.getDouble` reads 8-byte strides over 4-byte elements —
  * silently wrong numbers; with them the analyzer inserts the cast a
  * DataFrame call site writes explicitly. */
case class VecDot(left: Expression, right: Expression) extends BinaryExpression
    with org.apache.spark.sql.catalyst.expressions.ImplicitCastInputTypes {
  override def inputTypes = org.apache.spark.sql.graft.TypeBridge.doubleArrayPair
  override def dataType: DataType = DoubleType
  override protected def nullSafeEval(a: Any, b: Any): Any =
    VecOps.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.VecOps.dot($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): VecDot =
    copy(l, r)
}

object VecDot {
  def apply(a: Column, b: Column): Column =
    ColumnBridge.column(VecDot(ColumnBridge.expression(a), ColumnBridge.expression(b)))
}

/** `sq_dist(ARRAY<DOUBLE>, ARRAY<DOUBLE>) -> DOUBLE` (squared L2),
  * codegen'd. Same declared-input-type contract as [[VecDot]]. */
case class VecSqDist(left: Expression, right: Expression) extends BinaryExpression
    with org.apache.spark.sql.catalyst.expressions.ImplicitCastInputTypes {
  override def inputTypes = org.apache.spark.sql.graft.TypeBridge.doubleArrayPair
  override def dataType: DataType = DoubleType
  override protected def nullSafeEval(a: Any, b: Any): Any =
    VecOps.sqDist(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.VecOps.sqDist($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): VecSqDist =
    copy(l, r)
}

object VecSqDist {
  def apply(a: Column, b: Column): Column =
    ColumnBridge.column(VecSqDist(ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
