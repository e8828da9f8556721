package graft

import org.apache.spark.sql.functions._

import graft.functions.DistinctBigrams

/** DistinctBigrams must agree exactly with the HOF formulation it
  * replaced (transform+array_distinct), which the DuckDB oracle mirrors. */
class TextKernelSpec extends SparkTestBase {

  test("kernel matches the transform+array_distinct formulation on random docs") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    val words = Vector("a", "b", "spark", "join", "the", "x")
    val docs = (0 until 200).map { i =>
      (i.toLong, Seq.fill(rnd.nextInt(30))(words(rnd.nextInt(words.size))).mkString(" "))
    } :+ ((200L, "one")) :+ ((201L, "")) :+ ((202L, "a a a a a a"))
    val df = docs.toDF("id", "text")
      .select($"id", split(lower($"text"), "\\s+").as("toks"))
    // equality on the >=2-token population (what p1/t7 filter on; below
    // 2 tokens the HOF "bigram" degenerates to a 1-token slice)
    val strict = df.filter(size($"toks") >= 2).select(
        DistinctBigrams($"toks").as("kernel"),
        size(array_distinct(expr(
          "transform(sequence(0, size(toks)-2), i -> concat_ws(' ', slice(toks, i+1, 2)))")))
          .cast("long").as("hof"))
      .collect()
    assert(strict.nonEmpty)
    strict.foreach(r => assert(r.getLong(0) === r.getLong(1), r))
  }

  test("degenerate inputs: empty and single-token arrays count zero") {
    import spark.implicits._
    val df = Seq(Seq.empty[String], Seq("only")).toDF("toks")
    val out = df.select(DistinctBigrams($"toks")).collect().map(_.getLong(0))
    assert(out.toSeq === Seq(0L, 0L))
  }

  test("all-identical bigrams count once") {
    import spark.implicits._
    val df = Seq(Seq("a", "a", "a", "a")).toDF("toks")
    assert(df.select(DistinctBigrams($"toks")).head().getLong(0) === 1L)
  }
}
