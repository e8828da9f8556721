package graft

import org.apache.spark.sql.functions._

/** DataSource V2 generator source: determinism, partitioning, pruning. */
class DocGenSpec extends SparkTestBase {
  import spark.implicits._

  private def gen(rows: Int, parts: Int = 4) =
    spark.read.format("graft-docs")
      .option("rows", rows.toString)
      .option("partitions", parts.toString)
      .load()

  test("generates the requested rows across the requested partitions") {
    val df = gen(1000, 8)
    assert(df.count() == 1000)
    assert(df.rdd.getNumPartitions == 8)
    assert(df.select(countDistinct($"doc_id")).as[Long].head() == 1000)
  }

  test("deterministic across reads and independent of partitioning") {
    val a = gen(200, 2).orderBy($"doc_id").collect().toSeq
    val b = gen(200, 7).orderBy($"doc_id").collect().toSeq
    assert(a == b)
  }

  test("column pruning reaches the reader (scan schema is the projection)") {
    val df = gen(100).select($"doc_id")
    df.collect()
    val scan = df.queryExecution.executedPlan.collectLeaves().head.toString
    assert(scan.contains("doc_id") && !scan.contains("text"),
      "text must be pruned from the scan: " + scan)
  }

  test("doc_id range filters push into generation (DSv2 partition pruning)") {
    // 2 billion nominal rows: only pushed-down range narrowing makes
    // this tractable — generation must never run for pruned ids
    val big = spark.read.format("graft-docs")
      .option("rows", (2L << 30).toString)
      .option("partitions", "8")
      .load()
    val t0 = System.nanoTime()
    val got = big.filter($"doc_id" >= 5 && $"doc_id" < 10)
      .select($"doc_id").as[Long].collect().sorted.toSeq
    val secs = (System.nanoTime() - t0) / 1e9
    assert(got == Seq(5L, 6L, 7L, 8L, 9L))
    assert(secs < 30, s"range pushdown must prune generation (took $secs s)")
    // equality prunes to a single id; conflicting bounds prune to empty
    assert(big.filter($"doc_id" === 42).count() == 1)
    assert(big.filter($"doc_id" > 10 && $"doc_id" < 5).count() == 0)
  }

  test("non-range filters stay post-scan and results match unfiltered read") {
    val all = gen(300).filter($"lang" === "en").select($"doc_id").as[Long]
      .collect().toSet
    val expect = gen(300).collect().filter(_.getString(1) == "en")
      .map(_.getLong(0)).toSet
    assert(all == expect && all.nonEmpty)
  }

  test("generated corpus flows into the text-analysis operators") {
    val df = gen(500)
    val stats = df.groupBy($"lang").agg(count(lit(1)).as("n"))
    assert(stats.count() == 5)
    assert(df.filter(size(split($"text", " ")) === $"n_tokens").count() == 500,
      "n_tokens must agree with the text")
  }
}
