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

  test("COUNT/MIN/MAX push into the source: a 10-billion-row count is arithmetic") {
    // only possible if the aggregate is answered from the id range —
    // generating 1e10 documents would run for days
    val huge = spark.read.format("graft-docs")
      .option("rows", "10000000000").load()
    val r = huge.agg(count(lit(1)), min($"doc_id"), max($"doc_id")).head()
    assert(r.getLong(0) == 10000000000L)
    assert(r.getLong(1) == 0L && r.getLong(2) == 9999999999L)
    // composes with filter pushdown: the narrowed range answers exactly
    val f = huge.filter($"doc_id" >= 9999999000L)
      .agg(count(lit(1)), min($"doc_id")).head()
    assert(f.getLong(0) == 1000L && f.getLong(1) == 9999999000L)
    // empty range: count 0, min/max NULL
    val e = huge.filter($"doc_id" < 0L).agg(count(lit(1)), max($"doc_id")).head()
    assert(e.getLong(0) == 0L && e.isNullAt(1))
    // and the pushed plan must actually be the aggregate scan
    val plan = huge.agg(count(lit(1))).queryExecution.executedPlan.toString
    assert(plan.contains("DocGenAggScan") || plan.contains("PushedAggregat"),
      "aggregate must reach the source: " + plan)
  }

  test("aggregates the source cannot answer fall back to full generation") {
    val df = gen(200)
    // grouped aggregation is NOT pushed (groupByExpressions nonEmpty) —
    // results must still be correct via the normal generate-and-agg path
    val byLang = df.groupBy($"lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byLang.values.sum == 200L && byLang.keySet.subsetOf(
      Set("en", "de", "fr", "es", "zh")))
    // SUM over a generated column is not translatable either
    val s = df.agg(sum($"n_tokens")).head().getLong(0)
    assert(s > 0)
  }

  test("generated corpus flows into the text-analysis operators") {
    val df = gen(500)
    val stats = df.groupBy($"lang").agg(count(lit(1)).as("n"))
    assert(stats.count() == 5)
    assert(df.filter(size(split($"text", " ")) === $"n_tokens").count() == 500,
      "n_tokens must agree with the text")
  }

  test("keyed scan: shard aggregation runs exchange-free and equals unkeyed data") {
    spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
    def keyed(parts: Int) = spark.read.format("graft-docs")
      .option("rows", "2000").option("partitions", parts.toString)
      .option("keyed", "true").load()
    // same corpus: the key column is derived, the cells are unchanged
    val plain = gen(2000, 8).orderBy($"doc_id")
      .select($"doc_id", $"lang", $"text", $"n_tokens").collect().toSeq
    val viaKeyed = keyed(8).orderBy($"doc_id")
      .select($"doc_id", $"lang", $"text", $"n_tokens").collect().toSeq
    assert(viaKeyed == plain)
    // shard column is consistent with the clustering contract
    assert(keyed(8).filter($"shard" =!= ($"doc_id" % 8).cast("int")).count() == 0)
    // the group-by on the reported key needs NO shuffle before the
    // final aggregate: with KeyGroupedPartitioning honored, partial and
    // final agg fuse over the scan; without it there'd be an Exchange
    // hashpartitioning(shard) between them
    val agg = keyed(8).groupBy($"shard")
      .agg(count(lit(1)).as("n"), sum($"n_tokens").as("s"))
    agg.collect()
    val plan = agg.queryExecution.executedPlan.toString
    assert(!plan.contains("hashpartitioning(shard"),
      "storage-partitioned agg must not re-shuffle the shard key: " + plan)
    assert(agg.collect().map(_.getLong(1)).sum == 2000)
  }

  test("storage-partitioned JOIN: two keyed scans join without any shuffle") {
    spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
    def keyed(rows: Int) = spark.read.format("graft-docs")
      .option("rows", rows.toString).option("partitions", "8")
      .option("keyed", "true").load()
    // per-shard aggregates of two differently-sized keyed corpora,
    // joined on the partition key: both sides are already clustered by
    // shard, so the join (and both aggregations) must plan with ZERO
    // shuffle exchanges — the full storage-partitioned-join path
    val a = keyed(2000).groupBy($"shard").agg(count(lit(1)).as("na"))
    val b = keyed(1600).groupBy($"shard").agg(count(lit(1)).as("nb"))
    val j = a.join(b, "shard")
    val rows = j.collect()
    assert(rows.length == 8)
    assert(rows.map(_.getLong(1)).sum == 2000 && rows.map(_.getLong(2)).sum == 1600)
    val plan = j.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning"),
      "storage-partitioned join must not shuffle either side: " + plan)
    assert(!plan.contains("BroadcastExchange"),
      "the proof must be co-partitioning, not a broadcast fallback: " + plan)
  }
}
