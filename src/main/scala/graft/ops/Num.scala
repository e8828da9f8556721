package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.{abs, concat, lit, raise_error, round, sum, when}
import org.apache.spark.sql.types.DecimalType

/** Shared numeric-stability contract for oracle-compared aggregates. */
object Num {

  /** DECIMAL(38,6)-stabilized sum cast back to double — the cross-engine
    * bit-exactness idiom for double aggregates over PROVENANCE-NICE
    * decimals (prices, quantities: values whose decimal representation
    * is short, so the 10^6 scaling is exact in both engines). For
    * arbitrary doubles (sqrt outputs, products, covariance terms) use
    * [[fsum]] instead — see its scaladoc for the measured divergence.
    * One shared definition: a precision/scale change here moves every
    * query and every oracle contract together instead of drifting file
    * by file. */
  def dsum(c: Column): Column = sum(c.cast(DecimalType(38, 6))).cast("double")

  /** PORTABLE EXACT SUM on a dyadic grid — the cross-engine reduction
    * for doubles whose values are NOT provenance-nice decimals. The
    * DECIMAL(38,s) idiom is only bit-portable while |v|·10^s stays well
    * under 2^53: DuckDB scales by 10^s in DOUBLE (ulp-sized error
    * before its integer rounding) where Spark rounds the shortest
    * decimal string — measured 2200/4096 last-ulp mismatches on the e1
    * covariance sums at scale 18, and a single last-ulp flip through
    * p4's floor(rate·10⁴) discretization moved a membership boundary.
    * A power-of-two grid sidesteps both: v·2^30 is EXACT in every IEEE
    * engine, round() is ties-away-from-zero in both Spark (HALF_UP)
    * and DuckDB, the integer sum is exact, and the final int→double +
    * ÷2^30 are deterministic roundings. Quantization at 2^-30 is the
    * same in both engines by construction, so sums are bit-identical.
    *
    * Capacity: the quantized addends are exact int64s (each |v| must
    * stay under 2^33 ≈ 8.6e9 unscaled — enforce per call site), but
    * the ACCUMULATOR is DECIMAL(38,0), exact integer arithmetic to
    * 10^38 — so the sum itself cannot overflow at any reachable group
    * cardinality, where a bare long sum would WRAP SILENTLY under
    * Spark's non-ANSI mode (a silent hash divergence; the DuckDB
    * replay sums in HUGEINT and errors loudly on its BIGINT cast
    * instead). Beyond 2^63 the two engines fail differently — Spark
    * stays correct, DuckDB errors — but neither is ever silently
    * wrong, which is the contract. */
  val FpShift = 1073741824L // 2^30

  /** 2^63 as a double — the first value whose LongType cast would wrap. */
  private val LongEnvelope = 9.223372036854776e18

  /** Quantize onto the dyadic 2^-30 grid as an exact integer — the
    * per-row half of [[fsum]], exposed for chains (p4/t13) that window
    * or divide the quantized values before any sum.
    *
    * ENVELOPE GUARD: the capacity note above (each |v|·2^30 must stay
    * under 2^63) is enforced here, not just documented — a scaled value
    * at or beyond 2^63, or a NaN, raises loudly instead of wrapping /
    * zeroing silently under Spark's non-ANSI long cast. The predicate
    * `!(|scaled| < 2^63)` is codegen'd and also trips on NaN (all NaN
    * comparisons are false); NULLs fall through unchanged. */
  def fquant(c: Column): Column = {
    val scaled = c * FpShift.toDouble
    when(!(abs(scaled) < LongEnvelope) && scaled.isNotNull,
         raise_error(concat(
           lit("Num.fquant envelope exceeded: |v|*2^30 >= 2^63 would wrap silently; v="),
           c.cast("string"))))
      .otherwise(round(scaled))
      .cast("long")
  }

  def fsum(c: Column): Column =
    sum(fquant(c).cast(DecimalType(38, 0))).cast("double") / FpShift.toDouble

  /** DuckDB replay of [[fquant]] / [[fsum]] — HUGEINT-exact sum, loud
    * BIGINT cast (see capacity note above). */
  def fquantSql(x: String): String =
    s"CAST(round(($x) * 1073741824) AS BIGINT)"
  def fsumSql(x: String): String =
    s"CAST(CAST(SUM(${fquantSql(x)}) AS BIGINT) AS DOUBLE) / 1073741824"
}
