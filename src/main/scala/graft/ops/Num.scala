package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.sum
import org.apache.spark.sql.types.DecimalType

/** Shared numeric-stability contract for oracle-compared aggregates. */
object Num {

  /** DECIMAL(38,6)-stabilized sum cast back to double — THE cross-engine
    * bit-exactness idiom for every oracle-compared double aggregate
    * (decimal addition is exact, so float summation order can't flip a
    * bit between Spark and the DuckDB replay). One shared definition:
    * a precision/scale change here moves every query and every oracle
    * contract together instead of drifting file by file. */
  def dsum(c: Column): Column = sum(c.cast(DecimalType(38, 6))).cast("double")
}
