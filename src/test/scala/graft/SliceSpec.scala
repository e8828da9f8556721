package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.ops.Pipeline
import graft.sources.Slice

/** Slice-scanner parity (`scanner/slice.go`) and dataflow Pipeline ops. */
class SliceSpec extends SparkTestBase {

  test("fromData: column_%d names and row-0 type inference (slice.go:68-87)") {
    val now = java.sql.Timestamp.valueOf("2024-01-01 10:00:00")
    val df = Slice.fromData(spark, Seq(Seq(1, "s", 2.5, true, now)))
    assert(df.schema.fieldNames.toSeq ==
      Seq("column_0", "column_1", "column_2", "column_3", "column_4"))
    assert(df.schema.fields.map(_.dataType).toSeq ==
      Seq(IntegerType, StringType, DoubleType, BooleanType, TimestampType))
    assert(df.count() == 1)
  }

  test("fromData: nil cell in row 0 → NullType column (slice.go:79)") {
    val df = Slice.fromData(spark, Seq(Seq(1, null)))
    assert(df.schema.fields(1).dataType == NullType)
  }

  test("fromData: arity mismatch error matches reference text (slice.go:57-60)") {
    val err = intercept[IllegalArgumentException] {
      Slice.fromData(spark, Seq(Seq(1, 2), Seq(3)))
    }
    assert(err.getMessage == "length of row 2 != length of the first row: 1 != 2")
  }

  test("fromData: empty and null input → empty DataFrame") {
    assert(Slice.fromData(spark, Seq.empty).count() == 0)
    assert(Slice.fromData(spark, null).schema.isEmpty)
  }

  test("pipeline: filter + rewrite + header + post-filter limit") {
    val df = Slice.fromData(spark,
      Seq(Seq(1, "admin"), Seq(2, "bob"), Seq(3, "eve"), Seq(4, "admin")))
    // README.md:166-172 drop-admin preprocessor as its relational split
    val p = Pipeline(
      filter = Some(col("column_1") =!= "admin"),
      rewrite = Seq("column_1" -> upper(col("column_1"))),
      header = Some(Seq("id", "user")),
      limit = 1)
    val out = p(df).collect()
    assert(out.length == 1, "limit counts post-filter rows")
    assert(out(0).getInt(0) == 2 && out(0).getString(1) == "BOB")
    assert(p(df).schema.fieldNames.toSeq == Seq("id", "user"))
  }

  test("pipeline: header arity check") {
    val df = Slice.fromData(spark, Seq(Seq(1, "a")))
    val err = intercept[IllegalArgumentException] {
      Pipeline(header = Some(Seq("only")))(df)
    }
    assert(err.getMessage == "invalid header length")
  }

  test("pipeline: limit 0 short-circuits to empty relation") {
    val df = Slice.fromData(spark, Seq(Seq(1, "a")))
    val plan = Pipeline(limit = 0)(df)
    assert(plan.count() == 0)
    // Catalyst folds limit-0 into an empty LocalRelation — no scan at all
    assert(plan.queryExecution.optimizedPlan.toString.contains("LocalRelation"))
  }
}
