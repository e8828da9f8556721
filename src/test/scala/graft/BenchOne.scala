package graft

import org.apache.spark.sql.SparkSession

/** Dev probe: time one registered query (3 runs) or ad-hoc stages.
  * Usage: Test/runMain graft.BenchOne <query_name> [sfDir]
  */
object BenchOne {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time(label: String)(body: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = body
      println(f"[benchone] $label: ${(System.nanoTime() - t0) / 1e9}%.3f s ($n rows)")
    }
    if (name == "_shingleab") {
      import org.apache.spark.sql.functions._
      val docs = graft.sources.Tables.documents(spark, sfDir)
      def hof = graft.queries.LlmPipeline.shingleIndex(docs)
      def codegen = docs
        .select(col("doc_id"), split(lower(col("text")), "\\s+").as("toks"))
        .filter(size(col("toks")) >= 3)
        .select(col("doc_id"), col("toks"),
          explode(sequence(lit(0), size(col("toks")) - 3)).as("i"))
        .select(col("doc_id"), concat_ws(" ",
          expr("toks[i]"), expr("toks[i+1]"), expr("toks[i+2]")).as("shingle"))
        .distinct()
      (1 to 3).foreach { i => time(s"hof run$i")(hof.count()) }
      (1 to 3).foreach { i => time(s"codegen run$i")(codegen.count()) }
    } else if (name.startsWith("_jobs:")) {
      // per-stage attribution: warm once, then run instrumented
      val q = name.stripPrefix("_jobs:")
      val fn = SparkEntry.queries(q)
      // the bench's plan-preserving action: df.count() would let
      // Catalyst dead-code-eliminate aggregates/sorts and attribute a
      // plan the bench never bills (dq1 profiled 0.65 s under count()
      // vs 7.5 s billed — the round-7 accounting lesson applies to the
      // profiler too)
      def act(df: org.apache.spark.sql.DataFrame): Long =
        df.queryExecution.toRdd.count()
      (1 to 2).foreach { i => time(s"$q warm$i")(act(fn(spark, sfDir))) }
      import org.apache.spark.scheduler._
      import scala.collection.mutable
      val stages = mutable.ArrayBuffer[(Int, String, Long, Int)]()
      val listener = new SparkListener {
        override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
          val si = sc.stageInfo
          val dur = (si.completionTime.getOrElse(0L) - si.submissionTime.getOrElse(0L))
          // RDD scope names identify the physical operators in the stage
          // (the stage name itself is just the AQE callsite)
          val ops = si.rddInfos.flatMap(_.scope).map(_.name)
            .filterNot(_.startsWith("WholeStageCodegen")).distinct.mkString("|").take(90)
          stages += ((si.stageId, ops, dur, si.numTasks))
        }
      }
      spark.sparkContext.addSparkListener(listener)
      time(s"$q instrumented")(act(fn(spark, sfDir)))
      spark.sparkContext.removeSparkListener(listener)
      Thread.sleep(500)
      stages.sortBy(-_._3).foreach { case (id, nm, dur, nt) =>
        println(f"[benchone] stage $id%4d ${dur}%6d ms $nt%4d tasks  $nm")
      }
      println(f"[benchone] stage total: ${stages.map(_._3).sum} ms over ${stages.size} stages")
    } else if (name.startsWith("_seq:")) {
      // battery-context reproduction: run the listed queries in order
      // in ONE JVM with the bench's own plan-preserving action, to
      // separate isolated-vs-in-battery cost (e.g. dq1's 0.85 s
      // isolated vs 7.5-8.3 s billed in the 149-query battery)
      val qs = name.stripPrefix("_seq:").split(",").toSeq
      qs.foreach { q =>
        val fn = SparkEntry.queries(q)
        (1 to 2).foreach { i =>
          time(s"$q seq$i")(fn(spark, sfDir).queryExecution.toRdd.count())
          spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
          spark.sqlContext.clearCache()
          System.gc()
        }
      }
    } else if (name == "_audioprof") {
      // raw javax.sound op costs, single-threaded: which codec call
      // dominates the audio family's per-doc bill?
      import javax.sound.sampled._
      def encode(pcm: Array[Byte], n: Int): Array[Byte] = {
        val fmt = new AudioFormat(8000f, 16, 1, true, false)
        val ais = new AudioInputStream(
          new java.io.ByteArrayInputStream(pcm), fmt, n.toLong)
        val bos = new java.io.ByteArrayOutputStream()
        AudioSystem.write(ais, AudioFileFormat.Type.WAVE, bos)
        bos.toByteArray
      }
      def decode(bytes: Array[Byte]): Array[Byte] = {
        val in = AudioSystem.getAudioInputStream(
          new java.io.ByteArrayInputStream(bytes))
        try in.readAllBytes() finally in.close()
      }
      val n = 384
      val pcm = new Array[Byte](n * 2)
      java.util.Arrays.fill(pcm, 7.toByte)
      val wav = encode(pcm, n)
      val reps = 20000
      (1 to 2).foreach { round =>
        time(s"encode x$reps round$round") {
          var i = 0; var acc = 0L
          while (i < reps) { acc += encode(pcm, n).length; i += 1 }; acc
        }
        time(s"decode x$reps round$round") {
          var i = 0; var acc = 0L
          while (i < reps) { acc += decode(wav).length; i += 1 }; acc
        }
      }
    } else if (name.startsWith("_explain:")) {
      // the deliverable plan artifact: .explain("formatted") exactly as
      // the optimization guide §7.2 prescribes (initial plan, pushed
      // filters, read schema, join strategies, exchange placement)
      val q = name.stripPrefix("_explain:")
      val df = SparkEntry.queries(q)(spark, sfDir)
      println(s"== $q @ $sfDir ==")
      df.explain("formatted")
    } else if (name.startsWith("_aqe:")) {
      // final ADAPTIVE plan: execute first (AQE re-plans at runtime,
      // so the pre-execution plan hides coalesced exchanges), then
      // print with per-exchange partition specs visible
      val q = name.stripPrefix("_aqe:")
      val df = SparkEntry.queries(q)(spark, sfDir)
      df.queryExecution.toRdd.count()
      println(df.queryExecution.executedPlan.toString)
    } else if (name.startsWith("_rdd:")) {
      // the bench main's plan-preserving action, for apples-to-apples
      val q = name.stripPrefix("_rdd:")
      val fn = SparkEntry.queries(q)
      (1 to 3).foreach { i =>
        time(s"$q rdd run$i")(fn(spark, sfDir).queryExecution.toRdd.count())
      }
    } else {
      val fn = SparkEntry.queries(name)
      (1 to 3).foreach { i =>
        time(s"$name run$i")(fn(spark, sfDir).count())
      }
    }
    spark.stop()
  }
}
