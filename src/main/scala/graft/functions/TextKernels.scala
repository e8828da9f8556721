package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** One-pass text kernels. The Gopher repetition rule needs the DISTINCT
  * count of adjacent word bigrams; expressed with `transform(sequence…)`
  * + `array_distinct` the lambda evaluates interpreted per element AND
  * the whole array pipeline is re-inlined into every consumer by
  * Catalyst's projection collapse (the p1 filter computed it twice per
  * row). A native codegen'd expression evaluates once per reference and
  * never materializes the bigram array.
  *
  * Semantics parity: bigram i is `concat_ws(' ', toks[i], toks[i+1])`
  * (`concat_ws` SKIPS null inputs — `UTF8String.concatWs` matches), the
  * same value the HOF pipeline and the DuckDB oracle
  * (`array_to_string(toks[i+1:i+2], ' ')`) produce.
  */
object TextKernels {
  private val Space = UTF8String.fromString(" ")

  def distinctBigrams(toks: ArrayData): Long = {
    val n = toks.numElements()
    if (n < 2) return 0L
    val seen = new java.util.HashSet[UTF8String](Math.min(n * 2, 1 << 16))
    var i = 0
    while (i < n - 1) {
      seen.add(UTF8String.concatWs(Space, toks.getUTF8String(i), toks.getUTF8String(i + 1)))
      i += 1
    }
    seen.size.toLong
  }
}

/** `distinct_bigrams(ARRAY<STRING>) -> BIGINT`, codegen'd. */
case class DistinctBigrams(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override protected def nullSafeEval(a: Any): Any =
    TextKernels.distinctBigrams(a.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.functions.TextKernels.distinctBigrams($a)")
  override protected def withNewChildInternal(c: Expression): DistinctBigrams = copy(c)
}

object DistinctBigrams {
  def apply(c: Column): Column =
    ColumnBridge.column(DistinctBigrams(ColumnBridge.expression(c)))
}
