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
    } else if (name == "_d2stages") {
      import org.apache.spark.sql.functions._
      import graft.queries.LlmPipeline
      val docs = graft.sources.Tables.documents(spark, sfDir)
      (1 to 2).foreach { round =>
        var sh: org.apache.spark.sql.DataFrame = null
        time(s"r$round sh checkpoint") { sh = LlmPipeline.shingleIndex(docs).localCheckpoint(); 0L }
        var bk: org.apache.spark.sql.DataFrame = null
        time(s"r$round bk checkpoint") {
          bk = LlmPipeline.buckets(sh, Seq("shingle"), LlmPipeline.MaxShingleDf).localCheckpoint(); 0L }
        val full = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
        val rare = bk.select(explode(col("ids")).as("doc_id"))
          .groupBy(col("doc_id")).agg(count(lit(1)).as("rn"))
        val st = full.join(rare, Seq("doc_id"), "left")
          .select(col("doc_id"), col("n"),
            (col("n") - coalesce(col("rn"), lit(0L))).as("h"))
        val ri = LlmPipeline.bucketPairs(bk)
          .groupBy(col("d1"), col("d2")).agg(count(lit(1)).as("ri"))
        time(s"r$round ri.count")(ri.count())
        val pruned = ri
          .join(st.as("s1"), col("d1") === col("s1.doc_id"))
          .join(st.as("s2"), col("d2") === col("s2.doc_id"))
          .withColumn("ubi", col("ri") + least(col("s1.h"), col("s2.h")))
          .filter(col("ubi").cast("double") /
            (col("s1.n") + col("s2.n") - col("ubi")) >= 0.5)
          .select(col("d1"), col("d2"))
        time(s"r$round pruned.count")(pruned.count())
        val ids = pruned.select(col("d1").as("doc_id"))
          .union(pruned.select(col("d2").as("doc_id"))).distinct()
        val shc = sh.join(ids, Seq("doc_id"), "left_semi")
        time(s"r$round shc.count")(shc.count())
        val sizes = shc.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
        val inter = pruned
          .join(shc.as("a"), col("d1") === col("a.doc_id"))
          .join(shc.as("b"), col("d2") === col("b.doc_id") && col("a.shingle") === col("b.shingle"))
          .groupBy(col("d1"), col("d2")).agg(count(lit(1)).as("inter"))
        time(s"r$round verify.count")(
          inter
            .join(sizes.as("s1"), col("d1") === col("s1.doc_id"))
            .join(sizes.as("s2"), col("d2") === col("s2.doc_id"))
            .select(col("d1"), col("d2"),
              (col("inter").cast("double") / (col("s1.n") + col("s2.n") - col("inter"))).as("jaccard"))
            .filter(col("jaccard") >= 0.5).count())
      }
    } else if (name.startsWith("_jobs:")) {
      // per-stage attribution: warm once, then run instrumented
      val q = name.stripPrefix("_jobs:")
      val fn = SparkEntry.queries(q)
      (1 to 2).foreach { i => time(s"$q warm$i")(fn(spark, sfDir).count()) }
      import org.apache.spark.scheduler._
      import scala.collection.mutable
      val stages = mutable.ArrayBuffer[(Int, String, Long, Int)]()
      val listener = new SparkListener {
        override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
          val si = sc.stageInfo
          val dur = (si.completionTime.getOrElse(0L) - si.submissionTime.getOrElse(0L))
          stages += ((si.stageId, si.name.takeWhile(_ != '\n').take(90), dur, si.numTasks))
        }
      }
      spark.sparkContext.addSparkListener(listener)
      time(s"$q instrumented")(fn(spark, sfDir).count())
      spark.sparkContext.removeSparkListener(listener)
      Thread.sleep(500)
      stages.sortBy(-_._3).foreach { case (id, nm, dur, nt) =>
        println(f"[benchone] stage $id%4d ${dur}%6d ms $nt%4d tasks  $nm")
      }
      println(f"[benchone] stage total: ${stages.map(_._3).sum} ms over ${stages.size} stages")
    } else {
      val fn = SparkEntry.queries(name)
      (1 to 3).foreach { i =>
        time(s"$name run$i")(fn(spark, sfDir).count())
      }
    }
    spark.stop()
  }
}
