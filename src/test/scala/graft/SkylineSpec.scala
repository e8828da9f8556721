package graft

import org.apache.spark.sql.functions._

import graft.queries.{Battery, Graph, Quality}

/** Coverage for the round-11 additions: the 2-D skyline operator (q64),
  * k-core peeling (gr4), and FD discovery (dq5). Each is checked against
  * an in-memory reference implementation (the quadratic/iterative form
  * the distributed plan must equal), plus the structural properties the
  * oracle's hash cannot localize when they break. */
class SkylineSpec extends SparkTestBase {

  // ---- skyline -----------------------------------------------------

  /** Quadratic reference: r kept iff no q dominates it. */
  private def refSkyline(rows: Seq[(Long, Int, Double)]): Set[(Long, Int, Double)] =
    rows.filter { case (_, sz, pr) =>
      !rows.exists { case (_, qs, qp) =>
        qp <= pr && qs >= sz && (qp < pr || qs > sz)
      }
    }.toSet

  private def runSkyline(rows: Seq[(Long, Int, Double)], parts: Int): Set[(Long, Int, Double)] = {
    import spark.implicits._
    val df = spark.createDataset(rows).repartition(parts)
      .toDF("p_partkey", "p_size", "p_retailprice")
    Battery.skyline2d(df).as[(Long, Int, Double)].collect().toSet
  }

  test("skyline matches the quadratic reference across random inputs") {
    for (seed <- Seq(3, 17, 99); parts <- Seq(1, 4)) {
      val rnd = new scala.util.Random(seed)
      val rows = Seq.tabulate(200)(i =>
        (i.toLong, rnd.nextInt(20), (rnd.nextInt(40) * 25).toDouble))
      assert(runSkyline(rows, parts) === refSkyline(rows),
        s"seed=$seed parts=$parts")
    }
  }

  test("skyline tie semantics: exact duplicates both stay, dominated ties drop") {
    // (1) and (2) tie on both axes — mutual non-dominators, both kept;
    // (3) shares the price level but is smaller — dominated by (1)/(2);
    // (4) is cheaper with equal size — dominates (1)/(2)? no: size 5 < 7,
    //     so it survives on the cheap flank; (5) strictly dominated.
    val rows = Seq(
      (1L, 7, 100.0), (2L, 7, 100.0), (3L, 5, 100.0),
      (4L, 5, 90.0), (5L, 4, 120.0))
    assert(runSkyline(rows, 3) === Set((1L, 7, 100.0), (2L, 7, 100.0), (4L, 5, 90.0)))
    assert(refSkyline(rows) === runSkyline(rows, 3))
  }

  test("q64 on the sf0.001 fixture equals the reference brute force") {
    import spark.implicits._
    val rows = graft.sources.Tables.part(spark, sf0001)
      .select($"p_partkey", $"p_size", $"p_retailprice")
      .as[(Long, Int, Double)].collect().toSeq
    val got = Battery.skyline2d(
      graft.sources.Tables.part(spark, sf0001)
        .select($"p_partkey", $"p_size", $"p_retailprice"))
      .as[(Long, Int, Double)].collect().toSet
    assert(got === refSkyline(rows))
    assert(got.nonEmpty)
  }

  // ---- k-core ------------------------------------------------------

  /** Iterate-to-fixpoint reference peel on an undirected pair list. */
  private def refKcore(pairs: Seq[(Long, Long)], k: Int): Map[Long, Int] = {
    var adj = pairs.flatMap { case (a, b) => Seq(a -> b, b -> a) }
    var done = false
    while (!done) {
      val deg = adj.groupBy(_._1).map { case (n, xs) => n -> xs.size }
      val keep = deg.filter(_._2 >= k).keySet
      val next = adj.filter { case (a, b) => keep(a) && keep(b) }
      done = next.size == adj.size
      adj = next
    }
    adj.groupBy(_._1).map { case (n, xs) => n -> xs.size }
  }

  private def kcoreMap(pairs: Seq[(Long, Long)], k: Int, rounds: Int): Map[Long, Int] = {
    import spark.implicits._
    val sym = pairs.toDF("a", "b").select(col("a"), col("b"))
      .union(pairs.toDF("a", "b").select(col("b").as("a"), col("a").as("b")))
    Graph.kcoreEdges(sym, k, rounds)
      .groupBy(col("a")).agg(count(lit(1)).as("dg"))
      .as[(Long, Long)].collect().map { case (n, d) => n -> d.toInt }.toMap
  }

  test("k-core matches the fixpoint reference on random graphs") {
    for (seed <- Seq(5, 23); k <- Seq(2, 3)) {
      val rnd = new scala.util.Random(seed)
      val pairs = Seq.fill(80)((rnd.nextInt(40).toLong, rnd.nextInt(40).toLong))
        .filter { case (a, b) => a != b }
        .map { case (a, b) => (math.min(a, b), math.max(a, b)) }.distinct
      // depth 40 >> any 40-node peel sequence: guaranteed fixpoint
      assert(kcoreMap(pairs, k, rounds = 8) === refKcore(pairs, k),
        s"seed=$seed k=$k")
    }
  }

  test("a too-shallow unroll on a path graph does NOT fixpoint (depth is load-bearing)") {
    // path 0-1-2-...-9: the 2-core is empty, but each round only peels
    // the two endpoints — depth 4 still has survivors, so gr4's depth
    // check is a real assertion, not vacuously true
    val path = (0L until 9L).map(i => (i, i + 1))
    assert(kcoreMap(path, k = 2, rounds = 2).nonEmpty)
    assert(kcoreMap(path, k = 2, rounds = 8) === Map.empty[Long, Int])
  }

  test("gr4's fixture peel fixpoints within the unrolled depth at sf0.001 and sf0.01") {
    import spark.implicits._
    for (dir <- Seq(sf0001, "/root/testdata/sf0.01")) {
      val pairs = Graph.cachedEdges(spark, dir, minShared = 5, maxDf = 100)
      val sym = pairs.select($"d1".as("a"), $"d2".as("b"))
        .union(pairs.select($"d2".as("a"), $"d1".as("b")))
      def coreAt(rounds: Int) =
        Graph.kcoreEdges(sym, k = 2, rounds = rounds)
          .groupBy($"a").agg(count(lit(1)).as("dg"))
          .as[(Long, Long)].collect().toSet
      // the query unrolls 4 rounds; fixpoint by round 3 means round 4
      // is provably the true k-core (one extra no-op round of margin)
      assert(coreAt(3) === coreAt(4), s"dir=$dir")
    }
  }

  // ---- FD discovery ------------------------------------------------

  test("dq5 verdicts: a key FD holds, a non-key FD is quantified") {
    val out = Quality.queries("dq5_fd_discovery")(spark, sf0001)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getBoolean(5)))
      .toMap
    val (dg, vg, md, riv, holds) = out("orders: o_orderkey -> o_orderstatus")
    assert(holds && vg === 0L && md === 1L && riv === 0L && dg > 0L)
    // the violating FDs must account their group and row mass coherently
    out.values.foreach { case (dgx, vgx, mdx, rivx, h) =>
      assert(h === (vgx == 0L))
      assert(vgx <= dgx)
      if (vgx > 0) assert(mdx > 1L && rivx >= vgx * 2)
    }
  }
}
