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

/** Single-pass SimHash: folds the 60 bit-votes of each md5 token hash
  * into one vote array per document, so the exchange carries ONE partial
  * buffer row per doc instead of the 60 vote rows the groupBy-bits
  * formulation shuffles. Bit b of the fingerprint is set when the
  * accumulated vote for bit b of the token-hash nibbles is positive —
  * exactly the arithmetic of the DuckDB oracle
  * (`(strpos('0123456789abcdef', substr(h, b//4+1, 1))-1 >> b%4) & 1`,
  * votes summed as `bit*2-1`, fingerprint `Σ 1<<b where vote>0`). */
object SimHashAgg extends Aggregator[String, Array[Int], Long] {
  private val Bits = 60

  override def zero: Array[Int] = new Array[Int](Bits)

  override def reduce(votes: Array[Int], h: String): Array[Int] = {
    var b = 0
    while (b < Bits) {
      val digit = Character.digit(h.charAt(b / 4), 16)
      votes(b) += (((digit >> (b % 4)) & 1) * 2) - 1
      b += 1
    }
    votes
  }

  override def merge(a: Array[Int], b: Array[Int]): Array[Int] = {
    var i = 0
    while (i < Bits) { a(i) += b(i); i += 1 }
    a
  }

  override def finish(votes: Array[Int]): Long = {
    var acc = 0L
    var b = 0
    while (b < Bits) { if (votes(b) > 0) acc |= 1L << b; b += 1 }
    acc
  }

  // public API only: the catalyst ExpressionEncoder is private-ish and
  // unstable across Spark versions; kryo round-trips Array[Int] fine and
  // only pays serialization at the exchange boundary
  override def bufferEncoder: Encoder[Array[Int]] = Encoders.kryo[Array[Int]]

  override def outputEncoder: Encoder[Long] = Encoders.scalaLong
}

/** Count-Min Sketch (Cormode & Muthukrishnan, "An improved data stream
  * summary: the count-min sketch and its applications") as a NATIVE
  * Catalyst aggregate (`TypedImperativeAggregate`): the whole token
  * stream of a partition reduces to one d×w long matrix, partials merge
  * by elementwise addition at the exchange, and the final buffer is the
  * sketch — the single-pass frequency summary a 100 TB pipeline keeps
  * when exact per-term counts would need a corpus-wide shuffle.
  *
  * The input is the PRE-HASHED bucket vector (one bucket per sketch
  * row, computed by codegen'd md5 expressions in the query — the repo's
  * hex-fold hash family both engines evaluate identically), so the
  * aggregate itself only counts: update is d array increments. The
  * sketch is exact-deterministic (pure integer counting), which is what
  * lets a DuckDB oracle replicate estimates bit-for-bit.
  */
case class CountMinAgg(
    child: org.apache.spark.sql.catalyst.expressions.Expression,
    d: Int,
    w: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate[Array[Long]] {

  import org.apache.spark.sql.catalyst.InternalRow
  import org.apache.spark.sql.catalyst.expressions.Expression
  import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
  import org.apache.spark.sql.types._

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def createAggregationBuffer(): Array[Long] = new Array[Long](d * w)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val bs = child.eval(input).asInstanceOf[ArrayData]
    if (bs != null) {
      var j = 0
      while (j < d) { buf(j * w + bs.getInt(j)) += 1L; j += 1 }
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) { a(i) += b(i); i += 1 }
    a
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(buf.length * 8)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    Array.fill(bytes.length / 8)(bb.getLong())
  }

  override def withNewMutableAggBufferOffset(o: Int): CountMinAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): CountMinAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      c: IndexedSeq[org.apache.spark.sql.catalyst.expressions.Expression]): CountMinAgg =
    copy(child = c.head)
}

object CountMin {
  import org.apache.spark.sql.Column
  import org.apache.spark.sql.graft.ColumnBridge

  /** `count_min(bucketVector) -> ARRAY<BIGINT>[d*w]` over an
    * `ARRAY<INT>` column of per-row bucket indices. */
  def apply(buckets: Column, d: Int, w: Int): Column =
    ColumnBridge.column(
      CountMinAgg(ColumnBridge.expression(buckets), d, w).toAggregateExpression())
}
