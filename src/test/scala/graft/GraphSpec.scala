package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.ops.ConnectedComponents

/** Unit coverage for the connected-components operator backing
  * cc1_dup_clusters (transitive duplicate-cluster resolution). */
class GraphSpec extends SparkTestBase {

  private def cc(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    import spark.implicits._
    val df = edges.toDF("src", "dst")
    ConnectedComponents.run(df, "src", "dst")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("chain collapses to its minimum id across multiple hops") {
    // 1-2-3-4-5 is a 4-hop chain: only transitive closure finds 5 -> 1
    assert(cc(Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L))) ===
      Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 5L -> 1L))
  }

  test("disjoint components keep distinct representatives") {
    assert(cc(Seq((2L, 1L), (10L, 11L), (11L, 12L), (7L, 7L))) ===
      Map(1L -> 1L, 2L -> 1L, 10L -> 10L, 11L -> 10L, 12L -> 10L))
  }

  test("edge direction does not matter") {
    assert(cc(Seq((5L, 4L), (3L, 4L), (3L, 2L))) ===
      Map(2L -> 2L, 3L -> 2L, 4L -> 2L, 5L -> 2L))
  }

  test("self-loops are ignored, not components") {
    // (7,7) above contributed no node; an all-self-loop input is empty
    assert(cc(Seq((7L, 7L))) === Map.empty[Long, Long])
  }

  test("random graphs match a reference union-find across densities") {
    for (seed <- Seq(2, 19, 71); nEdges <- Seq(30, 120)) {
      val rnd = new scala.util.Random(seed)
      val n = 60
      val edges = Seq.fill(nEdges)(
        (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
      // reference union-find with path compression
      val parent = Array.tabulate(n)(identity)
      def find(x: Int): Int = {
        var r = x
        while (parent(r) != r) r = parent(r)
        var c = x
        while (parent(c) != c) { val nx = parent(c); parent(c) = r; c = nx }
        r
      }
      edges.foreach { case (a, b) =>
        if (a != b) {
          val (ra, rb) = (find(a.toInt), find(b.toInt))
          if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
        }
      }
      val touched = edges.filter(e => e._1 != e._2)
        .flatMap(e => Seq(e._1, e._2)).toSet
      // min-id-per-component labels: one more find pass after all unions
      val want = touched.map(v => v -> find(v.toInt).toLong).toMap
      assert(cc(edges) === want, s"seed=$seed edges=$nEdges")
    }
  }

  test("nodes universe unions isolated nodes back as singleton clusters") {
    import spark.implicits._
    // 9 appears in no edge; 7 only in a self-loop — both are singletons
    val edges = Seq((1L, 2L), (7L, 7L)).toDF("src", "dst")
    val nodes = Seq(1L, 2L, 7L, 9L).toDF("id")
    val out = ConnectedComponents.run(edges, "src", "dst", nodes = Some(nodes))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out === Map(1L -> 1L, 2L -> 1L, 7L -> 7L, 9L -> 9L))
  }

  test("superseded round checkpoints are freed eagerly") {
    import spark.implicits._
    // 64-node chain: pointer jumping needs several rounds; without the
    // per-round free every round's checkpoint blocks would still be
    // registered when the run returns
    val edges = (1L until 64L).map(i => (i, i + 1)).toDF("src", "dst")
    val before = spark.sparkContext.getPersistentRDDs.size
    val out = ConnectedComponents.run(edges, "src", "dst")
    assert(out.count() === 64)
    val after = spark.sparkContext.getPersistentRDDs.size
    // at most the final labels checkpoint outlives the run
    assert(after <= before + 1, s"persistent RDDs grew $before -> $after")
  }

  test("maxIter guard throws instead of returning unconverged labels") {
    import spark.implicits._
    val df = Seq((1L, 2L)).toDF("src", "dst")
    intercept[IllegalStateException] {
      ConnectedComponents.run(df, "src", "dst", maxIter = 0)
    }
  }

  test("cc1_dup_clusters: every cluster id is the minimum doc_id of its cluster") {
    val out = SparkEntry.queries("cc1_dup_clusters")(spark, "/root/testdata/sf0.001")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(out.nonEmpty)
    val byCluster = out.groupBy(_._2).view.mapValues(_.map(_._1).min)
    byCluster.foreach { case (cid, minDoc) => assert(cid === minDoc) }
    // labels reference real members: each cluster contains its own id
    out.groupBy(_._2).foreach { case (cid, members) =>
      assert(members.map(_._1).contains(cid))
    }
  }

  test("pageRank conserves rank mass; hubs dominate; symmetric nodes tie") {
    import spark.implicits._
    // star 0-(1..10) plus an isolated symmetric pair (20, 21)
    val pairs = (1L to 10L).map(l => (0L, l)) :+ (20L, 21L)
    val sym = (pairs ++ pairs.map(_.swap)).toDF("a", "b")
    val ranks = graft.queries.Graph.pageRank(sym, iters = 3)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(ranks.size === 13)
    // no dangling nodes -> total rank mass stays 1 every iteration, up to
    // the fsum grid: each per-node contribution sum is quantized onto the
    // 2^-30 dyadic grid (Num.fquant, <= 2^-30 absolute error per term), so
    // over `iters` iterations of `n` nodes the drift bound is
    // iters * n * 2^-30; assert with a 2x margin.
    val gridBound = 3 * ranks.size * math.pow(2, -30) * 2
    assert(math.abs(ranks.values.sum - 1.0) < gridBound, s"mass=${ranks.values.sum}")
    // the star center out-ranks every leaf
    (1L to 10L).foreach(l => assert(ranks(0L) > ranks(l),
      s"center ${ranks(0L)} vs leaf $l ${ranks(l)}"))
    // structurally identical nodes get bit-identical ranks
    assert(ranks(20L) == ranks(21L))
    assert(ranks(1L) == ranks(10L))
  }

  test("gr3: LPA communities refine cc1's connected components") {
    val comm = SparkEntry.queries("gr3_label_propagation")(spark, "/root/testdata/sf0.001")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val comp = SparkEntry.queries("cc1_dup_clusters")(spark, "/root/testdata/sf0.001")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(comm.nonEmpty && comm.keySet == comp.keySet)
    // labels can only propagate along edges, so two nodes sharing a
    // community label must sit in the same connected component
    comm.groupBy(_._2).values.foreach { members =>
      val comps = members.keys.map(comp).toSet
      assert(comps.size == 1, s"community spans components: $members -> $comps")
    }
    // every community label is itself a node of that community's component
    comm.foreach { case (node, lbl) =>
      assert(comp.contains(lbl) && comp(lbl) == comp(node),
        s"label $lbl of node $node is not in the same component")
    }
  }

  test("gr2: triangle stats invariants hold and the plan has no cartesian") {
    val df = SparkEntry.queries("gr2_triangle_stats")(spark, "/root/testdata/sf0.001")
    val row = df.collect().head
    val (nodes, edges, wedges, tris, gcc) =
      (row.getLong(0), row.getLong(1), row.getLong(2), row.getLong(3), row.getDouble(4))
    assert(nodes > 0 && edges > 0)
    // every triangle closes exactly 3 wedges; gcc = 3T/W is in [0, 1]
    assert(3 * tris <= wedges, s"3*$tris > $wedges")
    assert(gcc >= 0.0 && gcc <= 1.0, s"gcc=$gcc")
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct"), p)
  }

  private def hops(edges: Seq[(Long, Long)], srcs: Seq[Long],
                   rounds: Int): Map[Long, Long] = {
    import spark.implicits._
    val pairs = edges.toDF("a", "b")
    val sym = pairs.union(pairs.select(col("b"), col("a"))).toDF("a", "b")
    graft.queries.Graph.bfsHops(sym, srcs.toDF("node"), rounds)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("bfsHops: diamond graph takes the SHORT path (first-reach = min-dist)") {
    // 1-2-4 (len 2) and 1-3-5-4 (len 3): node 4 must read hop 2, not 3
    assert(hops(Seq((1L, 2L), (2L, 4L), (1L, 3L), (3L, 5L), (5L, 4L)), Seq(1L), 4) ===
      Map(1L -> 0L, 2L -> 1L, 3L -> 1L, 4L -> 2L, 5L -> 2L))
  }

  test("bfsHops: nodes beyond the round cap stay ABSENT, not sentinel") {
    // path 1-2-3-4-5-6 with 2 rounds reaches only {1,2,3}
    val m = hops(Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (5L, 6L)), Seq(1L), 2)
    assert(m === Map(1L -> 0L, 2L -> 1L, 3L -> 2L))
  }

  test("bfsHops: multi-source takes the nearest source; disjoint island absent") {
    // sources 1 and 6 on path 1-2-3-4-5-6; island 10-11 never reached
    val m = hops(Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (5L, 6L), (10L, 11L)),
      Seq(1L, 6L), 4)
    assert(m === Map(1L -> 0L, 2L -> 1L, 3L -> 2L, 4L -> 2L, 5L -> 1L, 6L -> 0L))
  }

  test("bfsHopsPerSource: trees are independent — equal to k single-source runs") {
    import spark.implicits._
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (5L, 6L), (10L, 11L))
    val pairs = edges.toDF("a", "b")
    val sym = pairs.union(pairs.select(col("b"), col("a"))).toDF("a", "b")
    val multi = graft.queries.Graph.bfsHopsPerSource(
        sym, Seq(1L, 6L, 10L).toDF("src"), rounds = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val single = Seq(1L, 6L, 10L).flatMap { s =>
      hops(edges, Seq(s), 3).map { case (n, h) => (s, n) -> h }
    }.toMap
    assert(multi === single)
    // the min-over-sources collapse reproduces plain multi-source bfsHops
    val collapsed = multi.groupBy(_._1._2).map { case (n, m) => n -> m.values.min }
    assert(collapsed === hops(edges, Seq(1L, 6L, 10L), 3))
  }

  test("gr10: harmonic mass is exact on the 12-grid and bounded by reached pivots") {
    val rows = SparkEntry.queries("gr10_harmonic_centrality")(
      spark, "/root/testdata/sf0.001").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val reached = r.getAs[Long]("n_pivots_reached")
      val h12 = r.getAs[Long]("h12")
      // each reached pivot contributes 12/d for d in 1..4: [3, 12] per pivot
      assert(h12 >= 3L * reached && h12 <= 12L * reached,
        s"h12 $h12 outside [3, 12]·$reached")
    }
  }

  test("gr11: assortativity equals a local replay and sits in [-1, 1]") {
    val r = SparkEntry.queries("gr11_degree_assortativity")(
      spark, "/root/testdata/sf0.001").collect().head
    val edges = graft.queries.Graph.cachedEdges(
        spark, "/root/testdata/sf0.001", minShared = 5, maxDf = 100)
      .collect().flatMap(e => Seq(e.getLong(0) -> e.getLong(1), e.getLong(1) -> e.getLong(0)))
    val deg = edges.groupBy(_._1).view.mapValues(_.length.toLong).toMap
    val m = edges.length.toLong
    val sxy = edges.map { case (a, b) => deg(a) * deg(b) }.sum
    val sx = edges.map { case (a, _) => deg(a) }.sum
    val sxx = edges.map { case (a, _) => deg(a) * deg(a) }.sum
    assert(r.getAs[Long]("m_directed") == m)
    assert(r.getAs[Long]("r_num") == m * sxy - sx * sx)
    assert(r.getAs[Long]("r_den") == m * sxx - sx * sx)
    val a = r.getAs[Double]("assortativity")
    assert(a >= -1.0 - 1e-12 && a <= 1.0 + 1e-12, s"r=$a outside [-1,1]")
  }

  test("d36: both keepers live in their cluster; longest beats min-id on chars") {
    val dir = "/root/testdata/sf0.001"
    val rows = SparkEntry.queries("d36_keep_longest_policy")(spark, dir).collect()
    assert(rows.nonEmpty)
    val clusters = SparkEntry.queries("cc1_dup_clusters")(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    rows.foreach { r =>
      val cid = r.getAs[Long]("cluster_id")
      assert(r.getAs[Long]("cluster_size") >= 2L)
      assert(clusters(r.getAs[Long]("keeper_longest")) == cid)
      assert(clusters(r.getAs[Long]("keeper_minid")) == cid)
      assert(r.getAs[Long]("kept_chars_longest") >= r.getAs[Long]("kept_chars_minid"),
        s"cluster $cid: longest policy kept fewer chars than min-id")
      assert(r.getAs[Boolean]("policy_agrees") ==
        (r.getAs[Long]("keeper_longest") == r.getAs[Long]("keeper_minid")))
    }
  }

  test("gr13: local coefficients replay locally; node triangles sum to 3x global") {
    val rows = SparkEntry.queries("gr13_local_clustering")(
      spark, "/root/testdata/sf0.001").collect()
    assert(rows.nonEmpty)
    val adj = graft.queries.Graph.cachedEdges(
        spark, "/root/testdata/sf0.001", minShared = 5, maxDf = 100)
      .collect().flatMap(e => Seq(e.getLong(0) -> e.getLong(1), e.getLong(1) -> e.getLong(0)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    var triSum = 0L
    rows.foreach { r =>
      val v = r.getAs[Long]("doc_id")
      val nbrs = adj(v).toSeq.sorted
      val tri = (for (i <- nbrs.indices; j <- i + 1 until nbrs.length
        if adj(nbrs(i)).contains(nbrs(j))) yield 1).size.toLong
      assert(r.getAs[Long]("degree") == nbrs.size.toLong, s"node $v degree")
      assert(r.getAs[Long]("n_triangles") == tri, s"node $v triangles")
      triSum += tri
    }
    // each global triangle is counted once per corner
    val global = SparkEntry.queries("gr2_triangle_stats")(
      spark, "/root/testdata/sf0.001").collect().head.getAs[Long]("n_triangles")
    assert(triSum == 3L * global, s"corner sum $triSum != 3x global $global")
  }

  test("d31: no near-dup cluster spans splits; totals cover the corpus") {
    val dir = "/root/testdata/sf0.001"
    val out = SparkEntry.queries("d31_leakfree_split")(spark, dir).collect()
    val docs = graft.sources.Tables.documents(spark, dir)
    assert(out.map(_.getAs[Long]("n_docs")).sum == docs.count())
    // replay the invariant d11 cannot offer: every doc of a cluster
    // lands in the SAME split — check by recomputing per-doc splits
    val labels = ConnectedComponents.run(
        graft.queries.Graph.cachedEdges(spark, dir, minShared = 5, maxDf = 100),
        "d1", "d2")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    def split(cluster: Long): String = {
      val h = java.security.MessageDigest.getInstance("MD5")
        .digest(cluster.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.charAt(0)
      if (h < 'c') "train" else if (h < 'e') "val" else "test"
    }
    val perDoc = docs.select(col("doc_id")).collect().map(_.getLong(0))
      .map(id => id -> split(labels.getOrElse(id, id)))
    perDoc.groupBy { case (id, _) => labels.getOrElse(id, id) }.values
      .foreach { members =>
        assert(members.map(_._2).toSet.size == 1,
          s"cluster split across: ${members.take(5).toSeq}")
      }
    // and the aggregate counts match the recomputation
    val expect = perDoc.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    assert(out.map(r => r.getString(0) -> r.getAs[Long]("n_docs")).toMap == expect)
  }

  test("gr6 PPR: hub dominates, mass stays in [0, 1], support within 3 hops") {
    val dir = "/root/testdata/sf0.001"
    val ppr = SparkEntry.queries("gr6_personalized_pagerank")(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(ppr.nonEmpty)
    ppr.values.foreach(v => assert(v >= 0.0 && v <= 1.0, s"ppr $v"))
    // total mass can only leak (teleport returns to the hub; no source
    // re-injection), never exceed the initial unit
    assert(ppr.values.sum <= 1.0 + 1e-9, s"mass ${ppr.values.sum}")
    // the hub holds the max rank: it receives ALL teleport mass
    val hub = ppr.maxBy(_._2)._1
    val hops = SparkEntry.queries("gr5_bfs_hops")(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(hops(hub) == 0L, s"PPR argmax $hub must be gr5's hop-0 hub")
    // positive rank implies reachability from the hub within 3 steps
    ppr.filter(_._2 > 0.0).keys.foreach { n =>
      assert(hops.get(n).exists(_ <= 3L),
        s"node $n has positive PPR but no <=3-hop path from the hub")
    }
  }

  test("gr8: component sizes >= 2 and node mass equals cc1's universe") {
    val dir = "/root/testdata/sf0.001"
    val hist = SparkEntry.queries("gr8_component_size_histogram")(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getLong(1))
    assert(hist.nonEmpty)
    // an edge-derived component has at least its two endpoints
    hist.foreach { case (size, n) => assert(size >= 2L && n >= 1L) }
    val nodeMass = hist.map { case (size, n) => size * n }.sum
    val cc1 = SparkEntry.queries("cc1_dup_clusters")(spark, dir).count()
    assert(nodeMass == cc1, s"histogram mass $nodeMass != cc1 nodes $cc1")
  }

  test("gr9: modularity terms are consistent and the partition beats random") {
    val dir = "/root/testdata/sf0.001"
    val rows = SparkEntry.queries("gr9_modularity")(spark, dir).collect()
    assert(rows.nonEmpty)
    val m = math.sqrt(rows.head.getAs[Long]("q_den") / 4.0).toLong
    rows.foreach { r =>
      val (nn, le, ds, qn, qd) = (r.getAs[Long]("n_nodes"),
        r.getAs[Long]("intra_edges"), r.getAs[Long]("degree_sum"),
        r.getAs[Long]("q_num"), r.getAs[Long]("q_den"))
      assert(qd == 4L * m * m)
      assert(qn == 4L * m * le - ds * ds, "q_num inconsistent with its own terms")
      assert(le <= nn * (nn - 1) / 2, s"more intra edges than pairs: $le vs $nn nodes")
      assert(ds <= 2L * m)
    }
    // degree mass across communities covers every edge end exactly once
    assert(rows.map(_.getAs[Long]("degree_sum")).sum == 2L * m)
    // intra edges cannot exceed the edge budget; LPA on a near-dup
    // graph must beat the random-graph null (Q > 0)
    assert(rows.map(_.getAs[Long]("intra_edges")).sum <= m)
    val q = rows.map(_.getAs[Long]("q_num")).sum.toDouble /
      rows.head.getAs[Long]("q_den")
    assert(q > 0.0, s"modularity $q not better than random")
  }

  test("gr5: hub is hop 0, every hop-k node has a hop-(k-1) neighbor") {
    val out = SparkEntry.queries("gr5_bfs_hops")(spark, "/root/testdata/sf0.001")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out.nonEmpty)
    assert(out.values.count(_ == 0L) == 1, "exactly one hub at hop 0")
    assert(out.values.max <= 4L)
    val edges = graft.queries.Graph.cachedEdges(
        spark, "/root/testdata/sf0.001", minShared = 5, maxDf = 100)
      .collect().flatMap(r => Seq(r.getLong(0) -> r.getLong(1), r.getLong(1) -> r.getLong(0)))
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).toSet }
    out.filter(_._2 > 0L).foreach { case (node, h) =>
      assert(edges(node).exists(nb => out.get(nb).contains(h - 1)),
        s"node $node at hop $h has no hop-${h - 1} neighbor")
    }
  }

  test("gr14: scores replay against a brute-force adjacency; pairs are non-edges") {
    val dir = "/root/testdata/sf0.001"
    val rows = SparkEntry.queries("gr14_link_prediction")(spark, dir).collect()
    assert(rows.nonEmpty, "fixture graph must yield >=1 predicted link")
    // rebuild the mutual-kNN adjacency locally from d5's top-5 lists
    val knn = SparkEntry.queries("d5_cosine_topk")(spark, dir)
      .collect().map(r => r.getAs[Long]("vec_id") -> r.getAs[Long]("nbr"))
    val knnSet = knn.toSet
    val adj = knn.filter { case (a, b) => knnSet.contains((b, a)) }
      .flatMap { case (a, b) => Seq(a -> b, b -> a) }.distinct
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).toSet }
    rows.foreach { r =>
      val (u, w) = (r.getAs[Long]("u"), r.getAs[Long]("w"))
      val (cn, du, dw) = (r.getAs[Long]("cn"),
        r.getAs[Long]("deg_u"), r.getAs[Long]("deg_w"))
      assert(u < w, "canonical orientation")
      assert(!adj(u).contains(w), s"($u,$w) is already an edge")
      assert(adj(u).size == du && adj(w).size == dw, s"($u,$w) degree mismatch")
      assert(adj(u).intersect(adj(w)).size == cn, s"($u,$w) cn mismatch")
      assert(r.getAs[Long]("union_deg") == du + dw - cn)
      val j = r.getAs[Double]("jaccard")
      assert(j > 0.0 && j <= 1.0, s"jaccard $j out of range")
      assert(cn >= 2L, "pigeonhole floor")
    }
    // completeness: every brute-force non-adjacent pair with >=2 common
    // neighbors appears in the output
    val got = rows.map(r => (r.getAs[Long]("u"), r.getAs[Long]("w"))).toSet
    val nodes = adj.keys.toSeq.sorted
    for (u <- nodes; w <- nodes if u < w && !adj(u).contains(w)
         if adj(u).intersect(adj(w)).size >= 2)
      assert(got.contains((u, w)), s"missing predicted link ($u,$w)")
  }

  test("gr15: eccentricities equal local BFS from each representative") {
    val dir = "/root/testdata/sf0.001"
    val rows = SparkEntry.queries("gr15_component_eccentricity")(spark, dir).collect()
    assert(rows.nonEmpty)
    val adj = graft.queries.Graph.cachedEdges(spark, dir, minShared = 5, maxDf = 100)
      .collect().flatMap(r => Seq(r.getLong(0) -> r.getLong(1), r.getLong(1) -> r.getLong(0)))
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).toSet }
    rows.foreach { r =>
      val rep = r.getAs[Long]("cluster_id")
      // local BFS
      var seen = Map(rep -> 0)
      var frontier = Set(rep)
      var d = 0
      while (frontier.nonEmpty && d < 8) {
        d += 1
        val next = frontier.flatMap(adj).filterNot(seen.contains)
        next.foreach(n => seen += n -> d)
        frontier = next
      }
      assert(r.getAs[Long]("n_reached") == seen.size.toLong, s"rep $rep reach")
      assert(r.getAs[Long]("ecc") == seen.values.max.toLong, s"rep $rep ecc")
      assert(r.getAs[Boolean]("fully_connected"),
        s"rep $rep: component not fully reached — BFS round cap too low")
      assert(r.getAs[Long]("n_members") >= 2L)
      assert(r.getAs[Long]("ecc") >= 1L)
    }
  }
}
