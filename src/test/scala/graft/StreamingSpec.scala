package graft

import org.apache.spark.sql.functions._

import graft.sources.Tables
import graft.streaming.Streams

/** Proves the streaming wiring: the watermarked Structured Streaming plan
  * over the events parquet produces exactly the batch result of the same
  * Column transform (Spark batch/stream unification). */
class StreamingSpec extends SparkTestBase {

  /** MULTISET of rows (sorted renderings) — a `toSet` compare would mask
    * duplicate-emission or duplicate-collapse bugs in the stream path. */
  private def rowsOf(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  test("tumbling window: streaming memory-sink result equals batch result") {
    val batch = rowsOf(Streams.tumblingHourly(Tables.events(spark, sf0001)))
    val stream = rowsOf(Streams.runToMemory(spark,
      Streams.tumblingHourlyStream(Streams.eventsStream(spark, sf0001)),
      "tumbling_test"))
    assert(stream.nonEmpty)
    assert(stream == batch)
  }

  test("stream-static join: streaming result equals batch result") {
    val customers = Tables.customer(spark, sf0001)
    val batch = rowsOf(
      Streams.enrichWithCustomers(Tables.events(spark, sf0001), customers))
    val stream = rowsOf(Streams.runToMemory(spark,
      Streams.enrichWithCustomers(Streams.eventsStream(spark, sf0001), customers),
      "stream_static_test"))
    assert(stream.nonEmpty)
    assert(stream == batch)
  }

  test("stream-stream join: streaming pairs equal batch pairs") {
    val batch = rowsOf(Streams.clickPurchasePairs(Tables.events(spark, sf0001)))
    val stream = rowsOf(Streams.runToMemory(spark,
      Streams.clickPurchasePairsStream(Streams.eventsStream(spark, sf0001)),
      "ss_join_test", "append"))
    assert(stream.nonEmpty)
    assert(stream == batch)
  }

  test("stateful streaming: flatMapGroupsWithState running per-user counts") {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    import spark.implicits._
    val events = Streams.eventsStream(spark, sf0001)
      .select(col("user_id"), col("event_type"))
      .as[(Long, String)]
    val counted = events
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (user: Long, rows: Iterator[(Long, String)], state: GroupState[Long]) => {
          val total = state.getOption.getOrElse(0L) + rows.size
          state.update(total)
          Iterator((user, total))
        })
      .toDF("user_id", "n")
    val got = Streams.runToMemory(spark, counted, "stateful_test", "append")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = Tables.events(spark, sf0001)
      .groupBy(col("user_id")).count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == want)
  }

  test("streaming export: foreachBatch drives the CSV sink per micro-batch") {
    import graft.sinks.{CsvOptions, CsvSink}
    val outDir = java.nio.file.Files.createTempDirectory("graft_sexp").toString
    val q = Streams.eventsStream(spark, sf0001)
      .select(col("event_id"), col("event_type"), col("value"))
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, id: Long) =>
        CsvSink.writeDir(batch, s"$outDir/batch_$id", CsvOptions())
      }
      .start()
    try q.processAllAvailable() finally q.stop()
    val readBack = spark.read.option("header", "true").csv(s"$outDir/batch_*")
    assert(readBack.count() ==
      Tables.events(spark, sf0001).count())
  }

  test("late data beyond the watermark is dropped from closed windows") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_late_src").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft_late_ckpt").toString
    def write(ts: String*): Unit =
      ts.map(t => Tuple1(java.sql.Timestamp.valueOf(t))).toDF("ts")
        .coalesce(1).write.mode("append").parquet(dir)
    // batch 1: max event time 11:00 → watermark 10:50 for the next batch,
    // closing the earliest 30-minute window
    write("2024-01-01 10:05:00", "2024-01-01 10:10:00", "2024-01-01 11:00:00")
    val schema = new org.apache.spark.sql.types.StructType()
      .add("ts", org.apache.spark.sql.types.TimestampType)
    val agg = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(dir)
      .withWatermark("ts", "10 minutes")
      .groupBy(window($"ts", "30 minutes")).agg(count(lit(1)).as("n"))
      .select($"window.start".as("ws"), $"n")
    val q = agg.writeStream.format("memory").queryName("late_test")
      .outputMode("append").option("checkpointLocation", ckpt).start()
    try {
      q.processAllAvailable()
      // batch 2: 10:07 is behind the 10:50 watermark (its window is
      // closed) → must be DROPPED; 11:30 is on time
      write("2024-01-01 10:07:00", "2024-01-01 11:30:00")
      q.processAllAvailable()
    } finally q.stop()
    val rows = spark.table("late_test").collect()
      .map(r => r.getTimestamp(0) -> r.getLong(1)).toMap
    assert(rows.nonEmpty)
    // the earliest window holds only batch 1's two events — a batch run
    // over the union would count 3; the stream dropped the late row
    assert(rows(rows.keys.min) === 2L, rows.toString)
  }

  test("checkpoint recovery: stop/restart resumes exactly-once from state") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_ckpt_src").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft_ckpt_loc").toString
    def write(rows: (String, Double)*): Unit =
      rows.toDF("k", "v").coalesce(1).write.mode("append").parquet(dir)
    val schema = new org.apache.spark.sql.types.StructType()
      .add("k", org.apache.spark.sql.types.StringType)
      .add("v", org.apache.spark.sql.types.DoubleType)
    def plan = spark.readStream.schema(schema).parquet(dir)
      .groupBy($"k").agg(count(lit(1)).as("n"), sum($"v").as("s"))
    def run(queryName: String): Unit = {
      val q = plan.writeStream.format("memory").queryName(queryName)
        .outputMode("complete").option("checkpointLocation", ckpt).start()
      try q.processAllAvailable() finally q.stop()
    }
    write("a" -> 1.0, "a" -> 2.0, "b" -> 10.0)
    run("ckpt_phase1")
    assert(spark.table("ckpt_phase1").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap == Map("a" -> 2L, "b" -> 1L))
    // stopped. New data lands while the query is down:
    write("a" -> 4.0, "c" -> 100.0)
    // restart a FRESH query instance from the same checkpoint — the
    // source must NOT re-read phase-1 files (offsets recovered) and the
    // aggregation state MUST survive (state store recovered): state loss
    // under-counts `a`/`b`, re-processing double-counts them; only
    // exactly-once recovery reproduces the batch answer over all data.
    run("ckpt_phase2")
    val got = spark.table("ckpt_phase2").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    val want = spark.read.parquet(dir)
      .groupBy($"k").agg(count(lit(1)).as("n"), sum($"v").as("s"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got == want, s"$got vs $want")
    assert(got == Set(("a", 3L, 7.0), ("b", 1L, 10.0), ("c", 1L, 100.0)))
  }

  test("RocksDB state store: recovery holds on the scale-grade backend") {
    // the default (HDFSBackedStateStoreProvider) keeps state on the JVM
    // heap — at 100 TB the state store must spill off-heap, which is
    // what Spark's built-in RocksDB provider is for. Same stop/append/
    // restart scenario as the checkpoint-recovery test, on RocksDB.
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_rdb_src").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft_rdb_loc").toString
    def write(rows: (String, Double)*): Unit =
      rows.toDF("k", "v").coalesce(1).write.mode("append").parquet(dir)
    val schema = new org.apache.spark.sql.types.StructType()
      .add("k", org.apache.spark.sql.types.StringType)
      .add("v", org.apache.spark.sql.types.DoubleType)
    def run(queryName: String): Unit = {
      val q = spark.readStream.schema(schema).parquet(dir)
        .groupBy($"k").agg(count(lit(1)).as("n"))
        .writeStream.format("memory").queryName(queryName)
        .outputMode("complete")
        .option("checkpointLocation", ckpt)
        .start()
      try q.processAllAvailable() finally q.stop()
    }
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      write("a" -> 1.0, "b" -> 2.0)
      run("rdb_phase1")
      write("a" -> 3.0, "c" -> 4.0)
      run("rdb_phase2")
      val got = spark.table("rdb_phase2").collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(got == Map("a" -> 2L, "b" -> 1L, "c" -> 1L), got.toString)
    } finally {
      prev match { case Some(v) => spark.conf.set(key, v)
                   case None => spark.conf.unset(key) }
    }
  }

  test("streaming dropDuplicates within watermark runs and dedupes") {
    val events = Streams.eventsStream(spark, sf0001)
      .withWatermark("ts", "1 hour")
      .dropDuplicatesWithinWatermark("user_id", "event_type")
      .select(col("user_id"), col("event_type"))
    val got = Streams.runToMemory(spark, events, "dedup_test", "append")
    val n = got.count()
    val distinctPairs = Tables.events(spark, sf0001)
      .select(col("user_id"), col("event_type")).distinct().count()
    assert(n == distinctPairs, s"$n vs $distinctPairs")
  }
}
