package graft

import graft.queries.Clustering
import graft.sources.Tables

/** Semantic evidence for c1 k-means beyond the oracle gate: Lloyd's
  * algorithm never increases total within-cluster sum of squares as
  * iterations are added (both the re-assignment and the centroid
  * re-estimation are WSS-non-increasing steps). */
class ClusteringSpec extends SparkTestBase {

  test("kmeans total WSS is non-increasing in the iteration count") {
    val e = Tables.embeddings(spark, sf0001)
    val wss = (1 to 3).map { iters =>
      Clustering.kmeans(e, k = 4, iters = iters)
        .agg(org.apache.spark.sql.functions.sum("wss")).head().getDouble(0)
    }
    assert(wss(0) >= wss(1) && wss(1) >= wss(2),
      s"WSS must not increase with more Lloyd iterations: $wss")
  }

  test("kmeans partitions the corpus: member counts sum to n") {
    val e = Tables.embeddings(spark, sf0001)
    val n = e.count()
    val out = Clustering.kmeans(e, k = 4, iters = 2)
    assert(out.agg(org.apache.spark.sql.functions.sum("n_members"))
      .head().getLong(0) == n)
  }
}
