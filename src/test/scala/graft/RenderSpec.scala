package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.functions.{GoFormat, Render}

/** Parity tests for the tostring render layer against the semantics of
  * `/root/reference/tostring/tostring.go:34-98`. */
class RenderSpec extends SparkTestBase {
  import spark.implicits._

  // ---- GoFormat (float 'f' -1 semantics, tostring.go:71-74) ----

  test("double formatting: table of Go strconv.FormatFloat('f',-1,64) cases") {
    val cases = Seq(
      0.0 -> "0",
      1.0 -> "1",
      -1.0 -> "-1",
      3.14 -> "3.14",
      -2.5 -> "-2.5",
      0.001 -> "0.001",
      1e7 -> "10000000",
      1e21 -> "1000000000000000000000",
      1.5e-7 -> "0.00000015",
      1.0e-7 -> "0.0000001",
      123456.789 -> "123456.789",
      Double.NaN -> "NaN",
      Double.PositiveInfinity -> "+Inf",
      Double.NegativeInfinity -> "-Inf",
      -0.0 -> "-0")
    cases.foreach { case (d, want) =>
      assert(GoFormat.formatDouble(d) == want, s"for $d")
    }
  }

  test("float formatting matches 32-bit shortest form") {
    assert(GoFormat.formatFloat(3.14f) == "3.14")
    assert(GoFormat.formatFloat(1.0f) == "1")
    assert(GoFormat.formatFloat(-0.5f) == "-0.5")
    assert(GoFormat.formatFloat(1e10f) == "10000000000")
  }

  test("double formatting properties: never scientific, always round-trips") {
    val rnd = new scala.util.Random(42)
    (1 to 2000).foreach { _ =>
      // mix of magnitudes, including ones where JVM toString goes scientific
      val d = rnd.nextDouble() * math.pow(10, rnd.nextInt(61) - 30) *
        (if (rnd.nextBoolean()) 1 else -1)
      val s = GoFormat.formatDouble(d)
      assert(!s.contains("E") && !s.contains("e"), s"scientific for $d: $s")
      assert(java.lang.Double.parseDouble(s) == d, s"round-trip for $d: $s")
    }
  }

  test("GoFormatDouble expression works in a plan (codegen path)") {
    val df = Seq(3.14, 1.0, 1e21, 0.001).toDF("x")
      .select(Render.goDouble($"x").as("s"))
    assert(df.as[String].collect().toSeq ==
      Seq("3.14", "1", "1000000000000000000000", "0.001"))
    val withNull = Seq[Option[Double]](Some(2.5), None).toDF("x")
      .select(Render.goDouble($"x").as("s"))
    assert(withNull.collect().map(r => Option(r.getString(0))).toSeq ==
      Seq(Some("2.5"), None))
  }

  // ---- timestamps (RFC3339Nano, zero-time→NULL; tostring.go:65-70) ----

  test("rfc3339Nano: trims fractional zeros, Z at UTC, zero time is NULL") {
    val rows = Seq(
      "2024-03-01 12:30:45.123456" -> "2024-03-01T12:30:45.123456Z",
      "2024-03-01 12:30:45.120000" -> "2024-03-01T12:30:45.12Z",
      "2024-03-01 12:30:45.000000" -> "2024-03-01T12:30:45Z",
      "2024-03-01 00:00:00"        -> "2024-03-01T00:00:00Z")
    val df = rows.map(_._1).toDF("s")
      .select(Render.rfc3339Nano(to_timestamp($"s")).as("r"))
    assert(df.as[String].collect().toSeq == rows.map(_._2))

    val zero = Seq("0001-01-01 00:00:00").toDF("s")
      .select(Render.rfc3339Nano(to_timestamp($"s")).as("r"))
    assert(zero.collect()(0).isNullAt(0))
  }

  // ---- full render dispatch (type switch, tostring.go:38-97) ----

  test("render: primitives, binary raw string, bool, decimal") {
    val schema = StructType(Seq(
      StructField("s", StringType), StructField("b", BinaryType),
      StructField("f", BooleanType), StructField("i", LongType),
      StructField("d", DecimalType(10, 2))))
    val data = Seq(Row("txt", "raw-bytes".getBytes("UTF-8"), true, 42L,
      new java.math.BigDecimal("12.50")))
    val df = spark.createDataFrame(spark.sparkContext.parallelize(data), schema)
    val out = Render.renderAll(df).collect()(0)
    assert(out.getString(0) == "txt")
    assert(out.getString(1) == "raw-bytes")
    assert(out.getString(2) == "true")
    assert(out.getString(3) == "42")
    assert(out.getString(4) == "12.50")
  }

  test("render: empty array/map and 'null' JSON coerce to NULL (tostring.go:79-83)") {
    val df = Seq(
      (Seq(1, 2), Map("a" -> 1)),
      (Seq.empty[Int], Map.empty[String, Int])
    ).toDF("arr", "m")
    val out = Render.renderAll(df).collect()
    assert(out(0).getString(0) == "[1,2]")
    assert(out(0).getString(1) == """{"a":1}""")
    assert(out(1).isNullAt(0), "empty array renders as NULL")
    assert(out(1).isNullAt(1), "empty map renders as NULL")
  }

  test("render: SQL NULL stays NULL for every type") {
    val schema = StructType(Seq(
      StructField("s", StringType), StructField("i", IntegerType),
      StructField("x", DoubleType), StructField("t", TimestampType),
      StructField("a", ArrayType(IntegerType))))
    val data = Seq(Row(null, null, null, null, null))
    val df = spark.createDataFrame(spark.sparkContext.parallelize(data), schema)
    val out = Render.renderAll(df).collect()(0)
    (0 until 5).foreach(i => assert(out.isNullAt(i), s"col $i"))
  }
}
