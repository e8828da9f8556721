package graft
import org.apache.spark.sql.{SparkSession, DataFrame}
import graft.{queries => q}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Aggregates the per-category query registries; every implemented
  * operator from SURVEY.md §2 has one `queries` entry, and an `oracleSql`
  * entry wherever the semantics are ANSI-SQL-expressible for DuckDB.
  */
object SparkEntry {

  private val registries: Seq[(Map[String, (SparkSession, String) => DataFrame], Map[String, String])] =
    Seq(
      (q.Relational.queries, q.Relational.oracleSql),
      (q.Battery.queries, q.Battery.oracleSql),
      (q.Export.queries, q.Export.oracleSql),
      (q.LlmPipeline.queries, q.LlmPipeline.oracleSql),
      (q.Retrieval.queries, q.Retrieval.oracleSql),
      (q.Graph.queries, q.Graph.oracleSql),
      (q.Clustering.queries, q.Clustering.oracleSql),
      (q.Quality.queries, q.Quality.oracleSql),
      (q.Linkage.queries, q.Linkage.oracleSql),
      (q.Selection.queries, q.Selection.oracleSql),
      (q.Streaming.queries, q.Streaming.oracleSql),
    )

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q1_agg")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    registries.map(_._1).reduce(_ ++ _)

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    registries.map(_._2).reduce(_ ++ _)
}
