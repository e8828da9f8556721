package graft

/** Debug helper: print the executed plan of a named query. */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val spark = SparkTestBase.session
    args.foreach { name =>
      println(s"===== $name =====")
      println(SparkEntry.queries(name)(spark, "/root/testdata/sf0.001")
        .queryExecution.executedPlan.toString)
    }
    spark.stop()
  }
}
