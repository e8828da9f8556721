package graft

import org.apache.spark.sql.functions._

/** Semantic + plan-shape checks for the data-selection operators
  * (queries/Selection.scala). The oracle gate already hash-verifies both
  * end-to-end; these assert the ALGORITHMIC contracts the hash cannot
  * express (threshold property, greedy-cover equivalence, scale shape). */
class SelectionSpec extends SparkTestBase {

  test("d28: priority-sample threshold property and estimator bounds") {
    val df = SparkEntry.queries("d28_priority_sample")(spark, sf0001).cache()
    try {
      val rows = df.collect()
      assert(rows.length == 100, s"expected n=100 sampled docs, got ${rows.length}")
      // est = max(w, τ) for one shared τ: every row's est is >= its own w,
      // and all rows where est > w agree on the same τ value
      val taus = rows.map(r => (r.getDouble(1), r.getDouble(2)))
        .collect { case (w, est) if est > w => est }.distinct
      assert(taus.length <= 1, s"multiple τ values: ${taus.toSeq}")
      assert(rows.forall { r => r.getDouble(2) >= r.getDouble(1) })
      // unbiased subset-sum estimator: one draw won't hit Σw exactly, but
      // a correct τ puts it within a factor of 2 on this fixture (a wrong
      // τ — e.g. max instead of the (n+1)-th priority — lands far out)
      val estSum = rows.map(_.getDouble(2)).sum
      val trueSum = spark.read.parquet(s"$sf0001/documents.parquet")
        .select(size(split(lower(col("text")), "\\s+")).cast("double").as("w"))
        .agg(sum(col("w"))).collect().head.getDouble(0)
      assert(estSum > trueSum * 0.5 && estSum < trueSum * 2.0,
        s"estimator $estSum vs true $trueSum out of plausible range")
    } finally df.unpersist()
  }

  test("sel1: greedy k-center equals a local replay; radius sequence non-increasing") {
    val out = SparkEntry.queries("sel1_kcenter_coreset")(spark, sf0001).collect()
    assert(out.length == 8)
    val dists = out.map(_.getDouble(2))
    assert(dists.head == 0.0)
    // covering radius can only shrink as centers are added: the selected
    // max-min distance at round t+1 is <= that at round t
    assert(dists.drop(1).zip(dists.drop(2)).forall { case (a, b) => b <= a },
      s"radius sequence not non-increasing: ${dists.toSeq}")
    // local greedy replay over the collected fixture must select the
    // same ids in the same order
    val e = spark.read.parquet(s"$sf0001/embeddings.parquet")
      .selectExpr("vec_id", "transform(embedding, x -> CAST(x AS DOUBLE)) AS v")
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
      .sortBy(_._1)
    def sq(a: Array[Double], b: Array[Double]): Double = {
      var acc = 0.0; var i = 0
      while (i < a.length) { val d = a(i) - b(i); acc += d * d; i += 1 }
      acc
    }
    var centers = Vector(e.head)
    var d = e.map(x => sq(x._2, e.head._2))
    var expect = Vector(e.head._1)
    for (_ <- 1 until 8) {
      val best = d.zipWithIndex.maxBy { case (dist, i) => (dist, -e(i)._1) }._2
      expect :+= e(best)._1
      centers :+= e(best)
      d = d.zip(e).map { case (cur, x) => math.min(cur, sq(x._2, e(best)._2)) }
    }
    assert(out.map(_.getLong(1)).toSeq == expect,
      s"selected ${out.map(_.getLong(1)).toSeq} vs local greedy $expect")
  }

  test("sel2: DSIR scores equal a local replay; ranking contract holds") {
    val out = SparkEntry.queries("sel2_dsir_importance")(spark, sf0001).collect()
    assert(out.length <= 100 && out.nonEmpty)
    // rank is dense 1..n and w is non-increasing with doc_id tie-break
    assert(out.map(_.getInt(0)).toSeq == (1 to out.length))
    val ws = out.map(r => (r.getDouble(4), r.getLong(1)))
    assert(ws.zip(ws.drop(1)).forall { case ((w1, id1), (w2, id2)) =>
      w2 < w1 || (w2 == w1 && id2 > id1) }, ws.toSeq.take(10).toString)
    // w is exactly score/n_tokens per row
    out.foreach { r =>
      assert(r.getDouble(4) == r.getLong(3).toDouble / r.getLong(2), r.toString)
    }

    // full local replay of the scoring definition over the fixture
    def bucket(t: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(t.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.substring(0, 3), 16)
    }
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
      .select("doc_id", "source", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    def toksOf(t: String): Seq[String] = t.toLowerCase.split("\\s+").toSeq
    val cntT = docs.filter(_._2 == "src0").flatMap(d => toksOf(d._3))
      .groupBy(bucket).map { case (b, xs) => b -> xs.length.toLong }
    val raw = docs.filter(_._2 != "src0")
    val cntR = raw.flatMap(d => toksOf(d._3))
      .groupBy(bucket).map { case (b, xs) => b -> xs.length.toLong }
    def sB(b: Long): Long =
      ((cntT.getOrElse(b, 0L) + 1L) * 1000000L) / (cntR(b) + 1L)
    val perDoc = raw.map { case (id, _, text) =>
      val ts = toksOf(text)
      val score = ts.map(t => sB(bucket(t))).sum
      (id, ts.length.toLong, score, score.toDouble / ts.length)
    }
    val expect = perDoc.sortBy { case (id, _, _, w) => (-w, id) }.take(100)
      .map(x => (x._1, x._2, x._3))
    val got = out.map(r => (r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got == expect.toSeq, s"got ${got.take(5)} vs ${expect.take(5)}")
  }

  test("sel2 scale shape: score table broadcasts, top-k via TakeOrderedAndProject") {
    val df = SparkEntry.queries("sel2_dsir_importance")(spark, sf0001)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("TakeOrderedAndProject"), p)
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("d28/sel1 scale shape: top-k via TakeOrderedAndProject, no corpus exchange in sel1's update") {
    val d28 = SparkEntry.queries("d28_priority_sample")(spark, sf0001)
    d28.collect()
    val p28 = d28.queryExecution.executedPlan.toString
    assert(p28.contains("TakeOrderedAndProject"), p28)
    // the windows must run on the survivor frame, after the take — a
    // Window directly over the corpus scan would be a global sort
    // (indexOf alone would pass vacuously at -1 if Window vanished)
    assert(p28.contains("Window"), p28)
    assert(p28.indexOf("Window") < p28.indexOf("TakeOrderedAndProject"),
      "windows must consume the top-(n+1) frame, not the corpus: " + p28)

    // the final union-of-selections plan reads checkpointed round
    // results, so audit the round's update plan directly: the center
    // must arrive broadcast, never via cartesian/shuffle of the corpus
    val e = spark.read.parquet(s"$sf0001/embeddings.parquet")
      .selectExpr("vec_id", "transform(embedding, x -> CAST(x AS DOUBLE)) AS v")
      .withColumn("d", lit(Double.MaxValue))
    val center = e.orderBy(col("vec_id")).limit(1).select(col("v").as("cv"))
    val upd = graft.queries.Selection.kcenterUpdate(e, center)
    upd.collect()
    val psel = upd.queryExecution.executedPlan.toString
    assert(psel.contains("BroadcastNestedLoopJoin"), psel)
    assert(!psel.contains("CartesianProduct"), psel)
  }

  test("sel3: budget respected and greedy-maximal; equals a local replay") {
    import org.apache.spark.sql.functions._
    val dir = "/root/testdata/sf0.001"
    val out = SparkEntry.queries("sel3_token_budget")(spark, dir).collect()
      .map(r => r.getString(0) ->
        (r.getAs[Long]("n_docs_kept"), r.getAs[Long]("tokens_kept"),
          r.getAs[Long]("budget_used"))).toMap
    assert(out.nonEmpty)
    // local replay: same order, same greedy prefix-by-budget
    val docs = graft.sources.Tables.documents(spark, dir)
      .filter(col("text").isNotNull)
      .select(col("doc_id"), col("lang"), col("n_chars"),
        size(split(lower(col("text")), "\\s+")).cast("long").as("nt"))
      .collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("lang"),
        r.getAs[Long]("n_chars"), r.getAs[Long]("nt")))
    // cumsum is monotone (nt >= 0), so the window filter keeps exactly
    // the maximal PREFIX in (n_chars DESC, doc_id) order
    val expect = docs.groupBy(_._2).map { case (lang, rows) =>
      val ordered = rows.sortBy(r => (-r._3, r._1))
      var cum = 0L; var kept = 0L
      ordered.takeWhile { r => cum += r._4; cum <= 20000L }
        .foreach(_ => kept += 1)
      val toks = ordered.take(kept.toInt).map(_._4).sum
      lang -> (kept, toks, toks)
    }
    expect.foreach { case (lang, (kept, toks, cum)) =>
      if (kept > 0)
        assert(out(lang) == ((kept, toks, cum)), s"$lang: ${out.get(lang)} vs ($kept,$toks,$cum)")
    }
    out.values.foreach { case (_, toksKept, used) =>
      assert(used <= 20000L && toksKept <= used)
    }
  }

  test("sel6: weights normalize per alpha, concentrate with temperature, and tie to t13") {
    val dir = "/root/testdata/sf0.001"
    val rows = SparkEntry.queries("sel6_temperature_sweep")(spark, dir).collect()
    val byAlpha = rows.groupBy(_.getAs[Long]("alpha_pct"))
    assert(byAlpha.keySet == Set(25L, 50L, 100L))
    byAlpha.foreach { case (a, rs) =>
      val s = rs.map(_.getAs[Double]("weight")).sum
      assert(math.abs(s - 1.0) < 1e-9, s"alpha $a: weights sum $s")
    }
    // higher temperature exponent concentrates mass on the biggest source
    def maxW(a: Long) = byAlpha(a).map(_.getAs[Double]("weight")).max
    assert(maxW(100L) >= maxW(50L) && maxW(50L) >= maxW(25L),
      "temperature failed to concentrate the mixture")
    // the alpha=0.5 column IS t13 — one definition, two surfaces
    val t13 = SparkEntry.queries("t13_mixture_weights")(spark, dir).collect()
      .map(r => r.getAs[String]("source") -> r.getAs[Double]("weight")).toMap
    byAlpha(50L).foreach { r =>
      assert(r.getAs[Double]("weight") == t13(r.getAs[String]("source")),
        s"${r.getAs[String]("source")}: sel6@0.5 diverged from t13")
    }
  }

  test("sel4: stages balanced within 1 doc; tranche ttr spans are ordered") {
    val rows = SparkEntry.queries("sel4_curriculum_stages")(
      spark, "/root/testdata/sf0.001").collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getAs[String]("source")).foreach { case (src, rs) =>
      val byStage = rs.map(r => r.getAs[Long]("stage") -> r).toMap
      assert(byStage.keySet.subsetOf(Set(1L, 2L, 3L)), s"$src: stages ${byStage.keySet}")
      // NTILE balance: tranche sizes differ by at most one
      val sizes = rs.map(_.getAs[Long]("n_docs"))
      assert(sizes.max - sizes.min <= 1L, s"$src: unbalanced tranches $sizes")
      // ordering by ttr DESC means stage k's floor >= stage k+1's ceiling
      val stages = byStage.keys.toSeq.sorted
      stages.zip(stages.tail).foreach { case (a, b) =>
        assert(byStage(a).getAs[Long]("min_ttr_ppm") >=
          byStage(b).getAs[Long]("max_ttr_ppm"),
          s"$src: stage $a floor below stage $b ceiling")
      }
    }
  }

  test("sel7: dedup fill replays locally and strictly dominates the raw fill") {
    val dir = "/root/testdata/sf0.001"
    val rows = graft.SparkEntry.queries("sel7_dedup_aware_budget")(spark, dir).collect()
    assert(rows.nonEmpty)
    // independent loser set: union-find over the cached near-dup edges
    val pairs = graft.queries.Graph.cachedEdges(spark, dir, minShared = 5, maxDf = 100)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) { val (lo, hi) = (math.min(ra, rb), math.max(ra, rb)); parent(hi) = lo }
    }
    val losers = parent.keys.filter(n => find(n) != n).toSet
    val docs = graft.sources.Tables.documents(spark, dir)
      .selectExpr("doc_id", "lang", "n_chars",
        "CAST(size(split(lower(text), '\\\\s+')) AS LONG) AS nt")
      .where("text IS NOT NULL").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    rows.foreach { r =>
      val lang = r.getAs[String]("lang")
      val seq = docs.filter(_._2 == lang).sortBy(d => (-d._3, d._1))
      var (cr, cd) = (0L, 0L)
      var (nkr, tkr, dupR, nkd, tkd) = (0L, 0L, 0L, 0L, 0L)
      seq.foreach { case (id, _, _, nt) =>
        val dup = losers.contains(id)
        cr += nt; if (!dup) cd += nt
        if (cr <= 20000L) {
          nkr += 1; tkr += nt; if (dup) dupR += nt
        }
        if (!dup && cd <= 20000L) { nkd += 1; tkd += nt }
      }
      assert(r.getAs[Long]("n_kept_raw") == nkr, s"$lang n_kept_raw")
      assert(r.getAs[Long]("tokens_raw") == tkr, s"$lang tokens_raw")
      assert(r.getAs[Long]("dup_tokens_in_raw") == dupR, s"$lang dup_tokens")
      assert(r.getAs[Long]("n_kept_dedup") == nkd, s"$lang n_kept_dedup")
      assert(r.getAs[Long]("tokens_dedup") == tkd, s"$lang tokens_dedup")
      // prefix property: every non-dup doc the raw fill kept, the
      // dedup fill keeps too
      assert(tkd >= tkr - dupR, s"$lang dedup fill lost unique mass")
    }
    // non-vacuous: somewhere the raw fill burned budget on duplicates
    assert(rows.map(_.getAs[Long]("dup_tokens_in_raw")).sum > 0L,
      "no duplicate mass in any raw fill — composition untested")
  }
}
