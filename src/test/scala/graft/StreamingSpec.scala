package graft

import org.apache.spark.sql.functions._

import graft.sources.Tables
import graft.streaming.Streams

/** Proves the streaming wiring: the watermarked Structured Streaming plan
  * over the events parquet produces exactly the batch result of the same
  * Column transform (Spark batch/stream unification). */
class StreamingSpec extends SparkTestBase {

  test("tumbling window: streaming memory-sink result equals batch result") {
    val batch = Streams.tumblingHourly(Tables.events(spark, sf0001))
      .collect().toSet
    val stream = Streams.runToMemory(spark,
      Streams.tumblingHourlyStream(Streams.eventsStream(spark, sf0001)),
      "tumbling_test")
      .collect().toSet
    assert(stream.nonEmpty)
    assert(stream == batch)
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
