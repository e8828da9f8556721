package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: times every registered query at the given scale factor
  * and prints ONE JSON line. Each query gets one untimed warmup pass first
  * (JVM/codegen/session warmup would otherwise be billed to the first
  * query), and failures are reported per-query instead of being recorded
  * as plausible timings. */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def esc(s: String): String =
      s.flatMap {
        case '"' => "\\\""; case '\\' => "\\\\"; case '\n' => "\\n"
        case c if c < ' ' => f"\\u${c.toInt}%04x"; case c => c.toString
      }

    val queries = SparkEntry.queries.toSeq.sortBy(_._1)

    // Session-level warmup on one cheap query so JVM/session/codegen
    // startup isn't billed to the first query's own warmup pass.
    try SparkEntry.entry(spark).count() catch { case _: Throwable => () }

    // Blocks pinned by localCheckpoint (Materialize) and broadcasts are
    // only reclaimed when the ContextCleaner notices dead references
    // after a GC. Across 76 queries x 3 invocations in one JVM they
    // accumulate in BlockManager storage and inflate every query that
    // runs after a checkpoint-heavy one (the r5 artifact showed 5-9x
    // inflation on untouched queries). Dropping persistent RDDs and
    // forcing a GC after each query keeps measurements independent.
    def dropQueryState(): Unit = {
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
      spark.sqlContext.clearCache()
      System.gc()
    }

    // PLAN-PRESERVING action: df.count() wraps the query in a new
    // Aggregate, letting Catalyst dead-code-eliminate everything the
    // count doesn't need — final sorts vanish, and an agg over a
    // pushdown-capable source (g2) collapses to an empty-schema full
    // scan that CANNOT push, so the bench would bill a plan the query
    // never runs. toRdd executes the query's own optimized physical
    // plan (AQE included) and the RDD-level count just drains it.
    def run(df: org.apache.spark.sql.DataFrame): Long =
      df.queryExecution.toRdd.count()

    // Per query: one untimed warmup, then two timed runs keeping the
    // faster (single-run numbers on a shared box swing 2-3x on GC/JIT
    // noise). If the two timed runs disagree by >1.5x the query is
    // NOISY — take a third run so one GC pause can't be the billed
    // number, and record every run in BENCH_full.json so bimodality is
    // visible in the artifact instead of hiding behind the min.
    // dropQueryState runs BETWEEN runs, not just after the query: each
    // run materializes its OWN checkpoint/broadcast blocks (new plan
    // objects every invocation), so without the inter-run drop a
    // re-run executes under the dead weight of its predecessors'
    // pinned blocks — measured as d7 billing [2.8, 18.7, 17.7] in a
    // 140-query battery whose isolated runs are a stable ~2 s. The
    // drop happens OUTSIDE the timed window and every run re-derives
    // its state from scratch, so billing stays honest.
    val results = queries.map { case (name, fn) =>
      def timed(): (Double, Option[String]) = {
        val t0 = System.nanoTime()
        val err =
          try { run(fn(spark, sfDir)); None }
          catch { case e: Throwable =>
            Some(s"${e.getClass.getSimpleName}: ${Option(e.getMessage).getOrElse("").take(200)}")
          }
        val dt = (System.nanoTime() - t0) / 1e9
        dropQueryState()
        (dt, err)
      }
      try run(fn(spark, sfDir)) catch { case _: Throwable => () }
      dropQueryState()
      val (t1, e1) = timed()
      val (t2, e2) = timed()
      val extra =
        if (e1.isEmpty && e2.isEmpty && math.max(t1, t2) > 1.5 * math.min(t1, t2))
          Some(timed()) else None
      // the extra run is a NOISE PROBE on a query that already has two
      // clean timed runs: if it errors (transient OOM is likeliest under
      // exactly the pressure that made the query noisy), its fast-fail
      // duration must not become the billed min and its error must not
      // flip a clean query into the failure count
      val runs = Seq(t1, t2) ++ extra.filter(_._2.isEmpty).map(_._1)
      (name, runs, e1.orElse(e2))
    }

    // ms precision keeps the line short, and the headline total goes LAST:
    // the round artifact stores only the TAIL of this process's output, so
    // a long queries map must not push the total out of the window. The
    // per-query map is sorted by ASCENDING cost: truncation cuts the HEAD
    // of the line, so the entries that vanish are the cheap ones and
    // every expensive query's number sits near the preserved tail.
    // Locale.ROOT: the default-locale f-interpolator renders "1,234" on
    // comma-decimal locales, which is invalid JSON.
    def r(v: Double): String = String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    val mins = results.map { case (k, runs, e) => (k, runs.min, e) }
    val qs = mins.sortBy(_._2).map { case (k, v, _) => s""""${esc(k)}":${r(v)}""" }
      .mkString("{", ",", "}")
    val errs = mins.collect { case (k, _, Some(e)) => s""""${esc(k)}":"${esc(e)}"""" }
      .mkString("{", ",", "}")
    val failures = mins.count(_._3.isDefined)
    val total = mins.map(_._2).sum
    val line = s"""{"queries":$qs,"errors":$errs,"failures":$failures,"sf":"${esc(sfDir)}","metric":"total","unit":"sec","value":${r(total)}}"""
    // Full artifact on disk as well: the driver's captured tail can
    // truncate long stdout lines, but BENCH_full.json always has every
    // per-query number — including EVERY timed run ("runs"), so a
    // stable 1.2s query and a bimodal 0.8s/4s one are distinguishable
    // in the artifact even though both bill their min.
    val runsJson = results.sortBy(_._2.min).map { case (k, runs, _) =>
      s""""${esc(k)}":[${runs.map(r).mkString(",")}]""" }.mkString("{", ",", "}")
    val full = s"""{"queries":$qs,"runs":$runsJson,"errors":$errs,"failures":$failures,"sf":"${esc(sfDir)}","metric":"total","unit":"sec","value":${r(total)}}"""
    try java.nio.file.Files.write(
      java.nio.file.Paths.get("BENCH_full.json"),
      full.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    catch { case _: Throwable => () } // read-only CWD must not fail the bench
    println(line)
    spark.stop()
  }
}
