package graft

import org.apache.spark.sql.functions._

import graft.ops.Salt
import graft.sources.Tables

/** Scale-technique evidence: salting correctness and bucketed co-located
  * joins (shuffle elimination). */
class ScaleSpec extends SparkTestBase {
  import spark.implicits._

  test("gr16: spectrum replays from cc1 labels; mass conserved") {
    val rows = SparkEntry.queries("gr16_cluster_size_spectrum")(spark, sf0001)
      .collect()
    assert(rows.nonEmpty)
    val nDocs = Tables.documents(spark, sf0001).count()
    // mass conservation: the histogram's doc mass is the whole corpus
    assert(rows.map(_.getAs[Long]("n_docs")).sum == nDocs)
    // local replay from cc1's labels + singleton fill
    val labels = SparkEntry.queries("cc1_dup_clusters")(spark, sf0001)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val allIds = Tables.documents(spark, sf0001).select($"doc_id")
      .collect().map(_.getLong(0))
    val sizes = allIds.groupBy(id => labels.getOrElse(id, id)).map(_._2.length)
    val expected = sizes.groupBy(sz => java.lang.Long.toBinaryString(sz.toLong).length)
    rows.foreach { r =>
      val b = r.getAs[Long]("bucket").toInt
      val cl = expected(b)
      assert(r.getAs[Long]("n_clusters") == cl.size.toLong, s"bucket $b clusters")
      assert(r.getAs[Long]("n_docs") == cl.map(_.toLong).sum, s"bucket $b docs")
      assert(r.getAs[Long]("min_size") == cl.min.toLong &&
        r.getAs[Long]("max_size") == cl.max.toLong, s"bucket $b bounds")
    }
    assert(rows.map(_.getAs[Long]("bucket")).toSet == expected.keySet.map(_.toLong))
  }

  test("p9: fertility algebra — word/char mass replays, tokens bound below") {
    val rows = SparkEntry.queries("p9_tokenizer_fertility")(spark, sf0001)
      .collect()
    assert(rows.nonEmpty)
    // corpus word/char mass per lang recomputed directly (no BPE)
    val direct = Tables.documents(spark, sf0001)
      .selectExpr("lang", "filter(split(lower(text), '\\\\s+'), w -> length(w) >= 1) AS ws")
      .selectExpr("lang", "CAST(size(ws) AS LONG) AS nw",
        "CAST(aggregate(ws, 0L, (a, w) -> a + length(w)) AS LONG) AS nc")
      .groupBy("lang").agg(sum($"nw").as("nw"), sum($"nc").as("nc"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    rows.foreach { r =>
      val l = r.getAs[String]("lang")
      val (nw, nc) = direct(l)
      assert(r.getAs[Long]("n_words") == nw, s"$l word mass")
      assert(r.getAs[Long]("n_chars") == nc, s"$l char mass")
      // every word tokenizes to >= 1 symbol and <= its char count
      val nt = r.getAs[Long]("n_tokens")
      assert(nt >= nw && nt <= nc, s"$l token mass $nt outside [$nw, $nc]")
      assert(r.getAs[Long]("fertility_ppm") >= 1000000L, s"$l fertility < 1")
      assert(r.getAs[Long]("chars_per_token_ppm") >= 1000000L,
        s"$l chars/token < 1")
    }
  }

  test("dq12: event field-quality report replays locally") {
    val rows = SparkEntry.queries("dq12_event_field_quality")(spark, sf0001)
      .collect()
    assert(rows.nonEmpty)
    val ev = Tables.events(spark, sf0001)
      .selectExpr("event_type", "user_id",
        "props IS NULL OR props = '' AS ep", "value IS NULL OR value <= 0 AS nv")
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getBoolean(2), r.getBoolean(3)))
    val byType = ev.groupBy(_._1)
    assert(rows.length == byType.size)
    rows.foreach { r =>
      val t = r.getAs[String]("event_type")
      val g = byType(t)
      val n = g.length.toLong
      assert(r.getAs[Long]("n_events") == n, s"$t n_events")
      assert(r.getAs[Long]("n_users") == g.map(_._2).distinct.length.toLong)
      assert(r.getAs[Long]("empty_props_ppm") ==
        g.count(_._3).toLong * 1000000L / n, s"$t empty props")
      assert(r.getAs[Long]("nonpos_value_ppm") ==
        g.count(_._4).toLong * 1000000L / n, s"$t nonpos value")
      assert(r.getAs[Long]("events_per_user_x1000") ==
        n * 1000L / g.map(_._2).distinct.length.toLong)
    }
  }

  test("r12 additions: no cartesian products anywhere in the plans") {
    for (q <- Seq("gr16_cluster_size_spectrum", "p9_tokenizer_fertility",
        "dq12_event_field_quality", "d40_oph_minhash",
        "e8_embedding_drift")) {
      val df = SparkEntry.queries(q)(spark, sf0001)
      df.collect()
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.contains("CartesianProduct"), s"$q: $plan")
    }
  }

  test("r13: e4 consumes the persisted truth-set artifact — nothing quadratic in its plan") {
    // before r13 e4 ran its own per-invocation n² crossJoin (the r12
    // verdict's scale-killer flag); now both rankings come from the
    // sanctioned cachedKnn/cachedKnnPre16 corpus artifact and the timed
    // plan must contain no pair expansion of any kind
    val df = SparkEntry.queries("e4_matryoshka_overlap")(spark, sf0001)
    df.collect() // first call pays the (sanctioned, documented) derivation
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), s"e4: $plan")
    assert(!plan.contains("BroadcastNestedLoopJoin"), s"e4: $plan")
  }

  test("r14: the exact-kNN truth set is query-side bounded (#queries·corpus, never corpus²)") {
    import spark.implicits._
    // the Spark cap constant and every consumer oracle's predicate must
    // agree: the same md5-ordered LIMIT keyed to the same rendering
    for (q <- Seq("d5_cosine_topk", "ml2_knn_label_eval",
        "ml3_knn_calibration", "e10_margin_mining", "d39_ivf_probe_sweep",
        "e4_matryoshka_overlap", "gr14_link_prediction",
        "gr17_knn_reciprocity")) {
      val sql = SparkEntry.oracleSql(q)
      assert(sql.contains(s"LIMIT ${queries.LlmPipeline.KnnQueryCap}"),
        s"$q oracle must carry the kNN query-side cap")
      assert(sql.contains("ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id"),
        s"$q oracle must use the md5 query-sample order")
    }
    // the sampled query side is deterministic, bounded, and exactly the
    // first-cap rows by (md5(decimal rendering), id)
    val n = spark.range(5000).select(col("id").as("vec_id"))
    val cap = queries.LlmPipeline.KnnQueryCap
    val got = queries.LlmPipeline.knnQuerySide(n, cap)
      .collect().map(_.getLong(0))
    assert(got.length == cap, s"query side must be capped at $cap")
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val expected = (0L until 5000L)
      .sortBy(id => (md5hex(id.toString), id)).take(cap)
    assert(got.toSeq == expected, "sample must be the md5-first cap rows")
    // and the physical plan is a bounded top-k (TakeOrderedAndProject),
    // never a full sort of the corpus
    val plan = queries.LlmPipeline.knnQuerySide(n, 16)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan)
  }

  test("d40: OPH estimator bounds; identical docs read a perfect estimate") {
    val rows = SparkEntry.queries("d40_oph_minhash")(spark, sf0001).collect()
    assert(rows.nonEmpty, "no OPH candidates — banding vacuous")
    rows.foreach { r =>
      val fb = r.getAs[Long]("filled_both")
      val m = r.getAs[Long]("matches")
      assert(fb >= 0L && fb <= 16L && m >= 0L && m <= fb)
      val est = r.getAs[Long]("oph_est_ppm")
      assert(est >= 0L && est <= 1000000L)
      assert(r.getAs[Long]("err_ppm") ==
        est - r.getAs[Long]("exact_ppm"))
      // an exact duplicate has identical slot signatures: estimate 10^6
      // (vacuous at sf0.001 — the fixture has no exact-dup docs — but
      // the invariant must hold wherever one appears)
      if (r.getAs[Long]("exact_ppm") == 1000000L) {
        assert(m == fb && fb > 0L, s"dup pair with imperfect signature: $r")
        assert(est == 1000000L && r.getAs[Long]("err_ppm") == 0L)
      }
    }
    // banding is not vacuous: a candidate pair shares an exact band —
    // its 4 slot strings are equal — so filled slots in that band match
    assert(rows.exists(_.getAs[Long]("matches") >= 1L),
      "no candidate pair with any matching filled slot")
  }

  test("dq13: k-anonymity spectrum replays exactly from a local QI grouping") {
    val rows = SparkEntry.queries("dq13_k_anonymity")(spark, sf0001).collect()
    assert(rows.nonEmpty)
    val cust = Tables.customer(spark, sf0001)
      .select($"c_nationkey", $"c_mktsegment", $"c_acctbal").collect()
      .map(r => (r.getInt(0), r.getString(1),
        math.floor(r.getDouble(2) / 1000.0).toLong))
    val sizes = cust.groupBy(identity).map(_._2.length.toLong).toSeq
    val tot = sizes.sum
    assert(tot == cust.length.toLong)
    val byBucket = sizes.groupBy(sz => java.lang.Long.toBinaryString(sz).length.toLong)
    assert(rows.map(_.getAs[Long]("bucket")).toSet == byBucket.keySet)
    rows.foreach { r =>
      val szs = byBucket(r.getAs[Long]("bucket"))
      assert(r.getAs[Long]("n_classes") == szs.length.toLong)
      assert(r.getAs[Long]("n_rows") == szs.sum)
      assert(r.getAs[Long]("rows_below_k") == szs.filter(_ < 5L).sum)
      assert(r.getAs[Long]("rows_ppm") == szs.sum * 1000000L / tot)
    }
  }

  test("c4: grid-density core points replay exactly from a local cell fold") {
    val rows = SparkEntry.queries("c4_grid_density")(spark, sf0001).collect()
    assert(rows.nonEmpty)
    val pts = Tables.embeddings(spark, sf0001)
      .selectExpr("CAST(embedding[0] AS DOUBLE) AS x",
        "CAST(embedding[1] AS DOUBLE) AS y")
      .collect()
      .map(r => (math.floor(r.getDouble(0) * 10).toLong,
        math.floor(r.getDouble(1) * 10).toLong))
    val cells = pts.groupBy(identity).map { case (c, v) => c -> v.length.toLong }
    def nbhd(c: (Long, Long)): Long =
      (for (dx <- -1 to 1; dy <- -1 to 1)
        yield cells.getOrElse((c._1 + dx, c._2 + dy), 0L)).sum
    val perPoint = pts.map(c => (c, nbhd(c)))
    assert(rows.map(_.getAs[Long]("n_points")).sum == pts.length.toLong)
    val byBucket = perPoint.groupBy { case (_, n) =>
      java.lang.Long.toBinaryString(n).length.toLong }
    assert(rows.map(_.getAs[Long]("bucket")).toSet == byBucket.keySet)
    rows.foreach { r =>
      val g = byBucket(r.getAs[Long]("bucket"))
      assert(r.getAs[Long]("n_points") == g.length.toLong)
      assert(r.getAs[Long]("n_cells") == g.map(_._1).distinct.length.toLong)
      assert(r.getAs[Long]("n_core") == g.count(_._2 >= 20L).toLong)
      assert(r.getAs[Long]("min_nbhd") == g.map(_._2).min)
      assert(r.getAs[Long]("max_nbhd") == g.map(_._2).max)
    }
    // a point's neighborhood includes its own cell: nbhd >= 1 everywhere
    assert(perPoint.forall(_._2 >= 1L))
  }

  test("p10: epoch shuffle plan replays exactly from a JVM md5 permutation") {
    val rows = SparkEntry.queries("p10_epoch_shuffle_plan")(spark, sf0001)
      .collect().sortBy(_.getAs[Long]("epoch"))
    assert(rows.length == 4)
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    def h52(s: String): Long = java.lang.Long.parseLong(md5hex(s).take(13), 16)
    val docs = Tables.documents(spark, sf0001)
      .select($"doc_id", $"source").collect()
      .map(r => (h52(r.getLong(0).toString) % 64L, r.getString(1)))
    val shards = docs.groupBy(_._1).map { case (sh, g) =>
      val dom = g.groupBy(_._2).map { case (src, v) => (src, v.length) }
        .toSeq.minBy { case (src, n) => (-n, src) }._1
      (sh, dom, g.length.toLong)
    }.toSeq
    for (epoch <- 0L to 3L) {
      val perm = shards
        .map { case (sh, dom, nd) => (h52(s"$epoch:$sh"), sh, dom, nd) }
        .sortBy { case (k, sh, _, _) => (k, sh) }
        .zipWithIndex.map { case ((_, sh, dom, nd), i) => (i + 1L, sh, dom, nd) }
      val runLens = perm.foldLeft(List.empty[(String, Long)]) {
        case ((src, len) :: tail, (_, _, dom, _)) if src == dom =>
          (src, len + 1L) :: tail
        case (acc, (_, _, dom, _)) => (dom, 1L) :: acc
      }.map(_._2)
      val r = rows(epoch.toInt)
      assert(r.getAs[Long]("n_shards") == shards.length.toLong)
      assert(r.getAs[Long]("perm_fp") ==
        perm.map { case (p, sh, _, _) => p * sh }.sum)
      assert(r.getAs[Long]("weighted_pos") ==
        perm.map { case (p, _, _, nd) => p * nd }.sum)
      assert(r.getAs[Long]("n_runs") == runLens.length.toLong)
      assert(r.getAs[Long]("max_run") == runLens.max)
    }
    // the permutations actually differ across epochs (that's the point)
    assert(rows.map(_.getAs[Long]("perm_fp")).distinct.length > 1)
  }

  test("t36: perplexity buckets replay from t22's gated scores") {
    val sc = SparkEntry.queries("t22_lm_score")(spark, sf0001).collect()
      .map(r => (r.getAs[Long]("n_bigrams"),
        math.floor(r.getAs[Double]("lm_score") * 1048576).toLong))
    val rows = SparkEntry.queries("t36_perplexity_buckets")(spark, sf0001)
      .collect()
    val tot = sc.length.toLong
    assert(rows.map(_.getAs[Long]("n_docs")).sum == tot)
    // nearest-rank cutoffs: min q with cum*3 >= tot is the value at
    // rank ceil(tot/3) of the sorted score multiset (ties inclusive)
    val qs = sc.map(_._2).sorted
    val cutTail = qs((((tot + 2) / 3) - 1).toInt)
    val cutMid = qs((((2 * tot + 2) / 3) - 1).toInt)
    val byBucket = sc.groupBy { case (_, q) =>
      if (q <= cutTail) "tail" else if (q <= cutMid) "middle" else "head" }
    assert(rows.map(_.getAs[String]("bucket")).toSet == byBucket.keySet)
    rows.foreach { r =>
      val g = byBucket(r.getAs[String]("bucket"))
      assert(r.getAs[Long]("n_docs") == g.length.toLong)
      assert(r.getAs[Long]("sum_bigrams") == g.map(_._1).sum)
      assert(r.getAs[Long]("min_qscore") == g.map(_._2).min)
      assert(r.getAs[Long]("max_qscore") == g.map(_._2).max)
      assert(r.getAs[Long]("share_ppm") == g.length.toLong * 1000000L / tot)
    }
    // the tail third reaches at least a third of the corpus (nearest
    // rank overshoots only by grid ties), and buckets are ordered
    assert(byBucket("tail").length.toLong * 3 >= tot)
  }

  test("dq14: reconciliation replays from a local stabilized per-order fold") {
    val rows = SparkEntry.queries("dq14_order_reconciliation")(spark, sf0001)
      .collect()
    assert(rows.nonEmpty)
    val rec = Tables.lineitem(spark, sf0001)
      .selectExpr("l_orderkey",
        "(l_extendedprice * (1 - l_discount)) * (1 + l_tax) AS x")
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
      .groupBy(_._1).map { case (k, xs) =>
        // the dsum contract: each term rounds onto DECIMAL(38,6), the
        // sum is exact decimal, the result casts back to double
        k -> xs.map(x => java.math.BigDecimal.valueOf(x._2)
            .setScale(6, java.math.RoundingMode.HALF_UP))
          .reduce(_.add(_)).doubleValue
      }
    val orders = Tables.orders(spark, sf0001)
      .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
      .collect()
      .map(r => (r.getAs[String]("o_orderstatus"),
        rec.get(r.getAs[Long]("o_orderkey"))
          .map(x => math.floor(math.abs(x - r.getAs[Double]("o_totalprice"))
            * 100).toLong)))
    val byStatus = orders.groupBy(_._1)
    assert(rows.length == byStatus.size)
    rows.foreach { r =>
      val g = byStatus(r.getAs[String]("o_orderstatus")).map(_._2)
      assert(r.getAs[Long]("n_orders") == g.length.toLong)
      assert(r.getAs[Long]("n_no_lines") == g.count(_.isEmpty).toLong)
      assert(r.getAs[Long]("n_exact") == g.count(_.contains(0L)).toLong)
      assert(r.getAs[Long]("n_drift") == g.count(_.exists(_ >= 1L)).toLong)
      assert(r.getAs[Long]("max_delta_cents") ==
        (0L +: g.flatten).max)
      assert(r.getAs[Long]("sum_delta_cents") == g.flatten.sum)
    }
  }

  test("d41: frequency cap replays from cc1 labels with the md5 keeper pick") {
    val rows = SparkEntry.queries("d41_frequency_cap")(spark, sf0001).collect()
    assert(rows.nonEmpty)
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    def h52(s: String): Long = java.lang.Long.parseLong(md5hex(s).take(13), 16)
    val M = BigInt(2305843009213693951L)
    val labels = SparkEntry.queries("cc1_dup_clusters")(spark, sf0001)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val allIds = Tables.documents(spark, sf0001).select($"doc_id")
      .collect().map(_.getLong(0))
    val clusters = allIds.groupBy(id => labels.getOrElse(id, id)).values.map {
      members =>
        val kept = members.sortBy(id => (h52(id.toString), id)).take(2)
        (members.length.toLong, kept.length.toLong,
          kept.map(BigInt(_)).sum)
    }
    val byBucket = clusters.groupBy { case (sz, _, _) =>
      java.lang.Long.toBinaryString(sz).length.toLong }
    assert(rows.map(_.getAs[Long]("bucket")).toSet == byBucket.keySet)
    assert(rows.map(_.getAs[Long]("n_docs")).sum == allIds.length.toLong)
    rows.foreach { r =>
      val g = byBucket(r.getAs[Long]("bucket")).toSeq
      assert(r.getAs[Long]("n_clusters") == g.length.toLong)
      assert(r.getAs[Long]("n_docs") == g.map(_._1).sum)
      assert(r.getAs[Long]("n_kept") == g.map(_._2).sum)
      assert(r.getAs[Long]("n_dropped") == g.map(x => x._1 - x._2).sum)
      assert(r.getAs[Long]("drop_ppm") ==
        g.map(x => x._1 - x._2).sum * 1000000L / g.map(_._1).sum)
      assert(BigInt(r.getAs[Long]("kept_id_fp")) == g.map(_._3).sum.mod(M),
        s"bucket ${r.getAs[Long]("bucket")} keeper fingerprint")
    }
    // the cap bites: some family bigger than 2 exists and drops mass
    assert(rows.exists(_.getAs[Long]("n_dropped") > 0L),
      "no cluster exceeded the cap — fixture vacuous for d41")
  }

  test("dq15: user-rate fence replays from a local median/MAD fold") {
    val rows = SparkEntry.queries("dq15_user_rate_outliers")(spark, sf0001)
      .collect()
    assert(rows.nonEmpty)
    val counts = Tables.events(spark, sf0001)
      .select($"event_type", $"user_id").collect()
      .map(r => (r.getString(0), r.getLong(1)))
      .groupBy(identity).toSeq.map { case ((t, _), g) => (t, g.length.toLong) }
      .groupBy(_._1).map { case (t, g) => t -> g.map(_._2).sorted }
    assert(rows.length == counts.size)
    // nearest-rank lower median of a sorted multiset: rank (n+1) div 2
    def medOf(xs: Seq[Long]): Long = xs(((xs.length + 1) / 2 - 1))
    rows.foreach { r =>
      val t = r.getAs[String]("event_type")
      val ns = counts(t)
      val med = medOf(ns)
      val mad = medOf(ns.map(n => math.abs(n - med)).sorted)
      assert(r.getAs[Long]("n_users") == ns.length.toLong, s"$t users")
      assert(r.getAs[Long]("med_events") == med, s"$t median")
      assert(r.getAs[Long]("mad_events") == mad, s"$t mad")
      assert(r.getAs[Long]("max_events") == ns.max, s"$t max")
      val flagged = ns.count(n => n - med > mad * 5 && n - med >= 5).toLong
      assert(r.getAs[Long]("n_flagged") == flagged, s"$t flagged")
      assert(r.getAs[Long]("flagged_ppm") ==
        flagged * 1000000L / ns.length, s"$t ppm")
    }
  }

  test("t37: code-switch verdicts replay from a local profile fold") {
    val rows = SparkEntry.queries("t37_code_switch_segments")(spark, sf0001)
      .collect()
    assert(rows.nonEmpty)
    // normalized doc text and p3-grain segments from the SAME Spark
    // expressions the query uses; profile + argmax replayed in the JVM
    val norm = Tables.documents(spark, sf0001)
      .selectExpr("lang", "regexp_replace(lower(text), '\\\\s+', ' ') AS t")
      .collect().map(r => (r.getString(0), r.getString(1)))
    def grams(t: String): Seq[String] =
      if (t.length < 3) Seq.empty else (1 to t.length - 2).map(i => t.substring(i - 1, i + 2))
    val profile: Map[String, Set[String]] = norm.groupBy(_._1).map { case (l, g) =>
      val counts = g.flatMap(x => grams(x._2)).groupBy(identity)
        .map { case (gr, v) => (gr, v.length) }
      l -> counts.toSeq.sortBy { case (gr, c) => (-c, gr) }.take(200)
        .map(_._1).toSet
    }
    val langs = profile.keys.toSeq.sorted
    val segs = graft.queries.LlmPipeline.segmentize(
        Tables.documents(spark, sf0001), Seq("doc_id", "lang"))
      .collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("lang"),
        r.getAs[Int]("seg_idx"), r.getAs[String]("seg")))
    val verdicts = segs.filter(_._4.length >= 3).flatMap {
      case (doc, lang, _, seg) =>
        val gs = grams(seg)
        val hits = langs.map(l => l -> gs.count(profile(l))).filter(_._2 > 0)
        if (hits.isEmpty) None
        else Some((doc, lang, hits.minBy { case (l, h) => (-h, l) }._1))
    }
    val byLang = verdicts.groupBy(_._2)
    assert(rows.length == byLang.size)
    rows.foreach { r =>
      val g = byLang(r.getAs[String]("lang"))
      assert(r.getAs[Long]("n_docs") == g.map(_._1).distinct.length.toLong)
      assert(r.getAs[Long]("n_segments") == g.length.toLong)
      val foreign = g.filter(x => x._3 != x._2)
      assert(r.getAs[Long]("n_foreign") == foreign.length.toLong)
      assert(r.getAs[Long]("docs_with_foreign") ==
        foreign.map(_._1).distinct.length.toLong)
      assert(r.getAs[Long]("foreign_ppm") ==
        foreign.length.toLong * 1000000L / g.length)
    }
  }

  test("q78: streak spectrum replays from a local gaps-and-islands fold") {
    val rows = SparkEntry.queries("q78_activity_streaks")(spark, sf0001).collect()
    assert(rows.nonEmpty)
    val days = Tables.events(spark, sf0001)
      .selectExpr("user_id", "unix_micros(ts) div 86400000000 AS day")
      .collect().map(r => (r.getLong(0), r.getLong(1))).distinct
    val streaks: Seq[(Long, Long)] = days.groupBy(_._1).toSeq.flatMap {
      case (u, g) =>
        val ds = g.map(_._2).sorted
        // island id: day − 1-based index is constant along consecutive runs
        ds.zipWithIndex.groupBy { case (d, i) => d - i }
          .values.toSeq.map(run => (u, run.length.toLong))
    }
    val h1 = streaks.groupBy(_._2).map { case (l, g) => l -> g.size.toLong }
    val h2 = streaks.groupBy(_._1).map { case (_, g) => g.map(_._2).max }
      .groupBy(identity).map { case (l, g) => l -> g.size.toLong }
    assert(rows.map(_.getAs[Long]("streak_len")).toSet == h1.keySet)
    rows.foreach { r =>
      val len = r.getAs[Long]("streak_len")
      assert(r.getAs[Long]("n_streaks") == h1(len), s"len $len streaks")
      assert(r.getAs[Long]("n_users_best") == h2.getOrElse(len, 0L),
        s"len $len personal bests")
    }
    // totals: every streak counted once; every user counted in one bucket
    assert(rows.map(_.getAs[Long]("n_streaks")).sum == streaks.size.toLong)
    assert(rows.map(_.getAs[Long]("n_users_best")).sum ==
      days.map(_._1).distinct.size.toLong)
  }

  test("t38: novelty curve replays from a local first-occurrence fold") {
    val rows = SparkEntry.queries("t38_ngram_novelty")(spark, sf0001).collect()
    assert(rows.length == 10)
    val docs = Tables.documents(spark, sf0001)
      .selectExpr("doc_id", "split(lower(text), '\\\\s+') AS toks")
      .collect().map(r => (r.getLong(0), r.getSeq[String](1)))
      .filter(_._2.length >= 8)
    val mx = docs.map(_._1).max
    val sliceGrams: Seq[(Long, String)] = docs.flatMap { case (id, toks) =>
      val slice = math.min(9L, id * 10 / (mx + 1))
      toks.sliding(8).map(w => slice -> w.mkString(" ")).toSeq.distinct
    }.distinct
    val firstSlice = sliceGrams.groupBy(_._2).map { case (g, s) => g -> s.map(_._1).min }
    val bySlice = sliceGrams.groupBy(_._1)
    val docsPerSlice = docs.groupBy { case (id, _) => math.min(9L, id * 10 / (mx + 1)) }
    var cum = 0L
    rows.sortBy(_.getAs[Long]("slice")).foreach { r =>
      val sl = r.getAs[Long]("slice")
      val grams = bySlice.getOrElse(sl, Seq.empty).map(_._2)
      val novel = grams.count(g => firstSlice(g) == sl).toLong
      assert(r.getAs[Long]("n_docs") ==
        docsPerSlice.get(sl).map(_.length).getOrElse(0).toLong, s"slice $sl docs")
      assert(r.getAs[Long]("n_gram_types") == grams.size.toLong, s"slice $sl types")
      assert(r.getAs[Long]("n_novel") == novel, s"slice $sl novel")
      assert(r.getAs[Long]("novelty_ppm") ==
        (if (grams.isEmpty) 0L else novel * 1000000L / grams.size), s"slice $sl ppm")
      cum += novel
      assert(r.getAs[Long]("cum_gram_types") == cum, s"slice $sl cum")
    }
    // saturation identity: the last cum equals the global distinct gram count
    assert(cum == sliceGrams.map(_._2).distinct.size.toLong)
  }

  test("sel8: anneal schedule replays from local integer bp arithmetic") {
    val rows = SparkEntry.queries("sel8_mixture_anneal")(spark, sf0001).collect()
    assert(rows.nonEmpty)
    val n = Tables.documents(spark, sf0001)
      .selectExpr("source", "CAST(size(split(lower(text), '\\\\s+')) AS LONG) AS nt")
      .collect().map(r => (r.getString(0), r.getLong(1)))
      .groupBy(_._1).map { case (s0, g) => s0 -> g.map(_._2).sum }
    val tot = n.values.sum
    val k = n.size.toLong
    assert(rows.length == n.size * 5)
    rows.foreach { r =>
      val e = r.getAs[Long]("epoch")
      val nat = n(r.getAs[String]("source")) * 10000L / tot
      val uni = 10000L / k
      val w = ((4 - e) * nat + e * uni) / 4
      assert(r.getAs[Long]("n_tokens") == n(r.getAs[String]("source")))
      assert(r.getAs[Long]("natural_bp") == nat)
      assert(r.getAs[Long]("uniform_bp") == uni)
      assert(r.getAs[Long]("weight_bp") == w)
      assert(r.getAs[Long]("planned_tokens") == 100000L * w / 10000L)
    }
    // endpoints: epoch 0 is the natural mixture, epoch 4 the uniform one
    rows.filter(_.getAs[Long]("epoch") == 0L).foreach { r =>
      assert(r.getAs[Long]("weight_bp") == r.getAs[Long]("natural_bp"))
    }
    rows.filter(_.getAs[Long]("epoch") == 4L).foreach { r =>
      assert(r.getAs[Long]("weight_bp") == r.getAs[Long]("uniform_bp"))
    }
  }

  test("r12 session-2 additions: no cartesian products in the plans") {
    for (q <- Seq("dq13_k_anonymity", "c4_grid_density",
        "p10_epoch_shuffle_plan", "t36_perplexity_buckets",
        "s20_stream_centroid_route", "dq14_order_reconciliation",
        "ml2_knn_label_eval", "d41_frequency_cap",
        "e9_pq_rate_distortion", "dq15_user_rate_outliers",
        "t37_code_switch_segments")) {
      val df = SparkEntry.queries(q)(spark, sf0001)
      df.collect()
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.contains("CartesianProduct"), s"$q: $plan")
    }
  }

  test("saltedJoin produces exactly the plain join result") {
    val li = Tables.lineitem(spark, sf0001).select($"l_orderkey", $"l_quantity")
    val o = Tables.orders(spark, sf0001).select($"o_orderkey", $"o_orderpriority")
    val plain = li.join(o, $"l_orderkey" === $"o_orderkey")
      .groupBy($"o_orderpriority").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val salted = Salt.saltedJoin(li, o.withColumnRenamed("o_orderkey", "l_orderkey"),
        "l_orderkey", salts = 4)
      .groupBy($"o_orderpriority").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(salted == plain)
  }

  test("saltedJoin rejects join types that would duplicate unmatched dim rows") {
    val li = Tables.lineitem(spark, sf0001).select($"l_orderkey", $"l_quantity")
    val o = Tables.orders(spark, sf0001)
      .select($"o_orderkey".as("l_orderkey"), $"o_orderpriority")
    // the dim side is replicated per salt: right/full outer would emit
    // every unmatched dim row `salts` times — must be rejected up front
    Seq("right_outer", "full", "full_outer", "cross").foreach { jt =>
      val e = intercept[IllegalArgumentException] {
        Salt.saltedJoin(li, o, "l_orderkey", salts = 4, joinType = jt)
      }
      assert(e.getMessage.contains("duplicate"), s"$jt: ${e.getMessage}")
    }
  }

  test("saltedAgg two-stage aggregation equals direct aggregation") {
    val ev = Tables.events(spark, sf0001)
    val direct = ev.groupBy($"event_type").agg(count(lit(1)).as("n"), sum($"value").as("s"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    val salted = Salt.saltedAgg(ev, $"event_type", salts = 8,
        partials = Seq(count(lit(1)).as("pn"), sum($"value").as("ps")),
        finals = Seq(sum($"pn").as("n"), sum($"ps").as("s")))
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(salted == direct)
  }

  test("d7 IVF returns results when every cell exceeds the size cap") {
    // regression guard: at sf0.1 (2000 vectors, 16 centroids) every cell
    // holds >100 members; the round-4 whole-cell-drop cap zeroed the
    // query here. List truncation must keep the search alive.
    val n = SparkEntry.queries("d7_ann_ivf")(spark, sf01).count()
    assert(n > 0, "d7 must not collapse to zero rows when cells outgrow the cap")
    assert(n <= 2000, s"at most one neighbor row per query vector, got $n")
  }

  test("partitioned layout enables partition pruning at the scan") {
    val dir = java.nio.file.Files.createTempDirectory("graft_part").toString
    Tables.lineitem(spark, sf0001)
      .write.partitionBy("l_returnflag").mode("overwrite").parquet(dir)
    val df = spark.read.parquet(dir).filter($"l_returnflag" === "A")
      .select($"l_orderkey")
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(l_returnflag"),
      "partition filter must prune directories: " + plan)
    assert(df.count() ==
      Tables.lineitem(spark, sf0001).filter($"l_returnflag" === "A").count())
  }

  test("range-clustered layout gives pairwise-disjoint per-file ranges") {
    // the q42 layout property: after repartitionByRange + in-partition
    // sort on l_shipdate, every parquet file holds a disjoint shipdate
    // range — the precondition for footer min/max pruning to skip
    // ~(N-1)/N of the files on a time-window scan at 100 TB
    val dir = java.nio.file.Files.createTempDirectory("graft_clust_spec").toString
    Tables.lineitem(spark, sf0001)
      .repartitionByRange(4, $"l_shipdate")
      .sortWithinPartitions($"l_shipdate", $"l_orderkey")
      .write.mode("overwrite").parquet(dir)
    val files = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.toString).toSeq
    assert(files.size > 1, s"need multiple files to prove disjointness: $files")
    val ranges = files.map { f =>
      // TIMESTAMP_NTZ won't cast to a numeric — ISO-formatted strings
      // order lexicographically, which is all disjointness needs
      val r = spark.read.parquet(f)
        .agg(min($"l_shipdate").cast("string"), max($"l_shipdate").cast("string"))
        .head()
      (r.getString(0), r.getString(1))
    }.sortBy(_._1)
    ranges.sliding(2).foreach {
      case Seq((_, e1), (s2, _)) =>
        assert(e1 <= s2, s"file ranges overlap: $ranges")
      case _ =>
    }
  }

  test("bucketed tables join without a shuffle exchange") {
    val s = spark.newSession() // warehouse dir set via -D in build.sbt
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ path
    // idempotence across JVMs: the metastore is per-JVM derby, but the
    // warehouse directories survive — clear both table and location
    Seq("li_b", "o_b").foreach { t =>
      s.sql(s"DROP TABLE IF EXISTS $t")
      val loc = java.nio.file.Paths.get(s"/tmp/graft_warehouse/$t")
      if (java.nio.file.Files.exists(loc)) {
        import scala.jdk.CollectionConverters._
        java.nio.file.Files.walk(loc).iterator().asScala.toSeq.reverse
          .foreach(java.nio.file.Files.deleteIfExists(_))
      }
    }
    Tables.lineitem(s, sf0001).select(col("l_orderkey"), col("l_quantity"))
      .write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .mode("overwrite").saveAsTable("li_b")
    Tables.orders(s, sf0001).select(col("o_orderkey"), col("o_totalprice"))
      .write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .mode("overwrite").saveAsTable("o_b")
    val joined = s.table("li_b").join(s.table("o_b"),
      col("l_orderkey") === col("o_orderkey"))
    joined.collect()
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      "bucketed co-located join must not shuffle: " + plan)
    assert(joined.count() == Tables.lineitem(s, sf0001).count())
  }

  test("reliable-checkpoint Materialize branch produces identical results") {
    // graft.checkpoint.reliable=true is the documented 100 TB
    // executor-loss posture (Materialize switches localCheckpoint →
    // reliable df.checkpoint); exercise it on two checkpoint-heavy
    // queries and require bit-identical output vs the default branch.
    def canon(name: String, s: org.apache.spark.sql.SparkSession): Seq[String] =
      SparkEntry.queries(name)(s, sf0001).collect()
        .map(_.toSeq.map(String.valueOf).mkString("\u0001")).sorted.toSeq
    val baseline = Seq("d2_dedup_ngram_jaccard", "cc1_dup_clusters")
      .map(q => q -> canon(q, spark)).toMap
    val s = spark.newSession()
    val ckpt = java.nio.file.Files.createTempDirectory("graft_reliable_ckpt")
    s.conf.set("graft.checkpoint.reliable", "true")
    s.sparkContext.setCheckpointDir(ckpt.toString)
    try {
      baseline.foreach { case (q, want) =>
        assert(canon(q, s) == want, s"$q diverged under reliable checkpoint")
      }
      // the branch actually ran: reliable checkpoints write RDD dirs
      import scala.jdk.CollectionConverters._
      val wrote = java.nio.file.Files.walk(ckpt).iterator().asScala
        .exists(p => p.getFileName.toString.startsWith("rdd-"))
      assert(wrote, s"no reliable checkpoint data written under $ckpt")
    } finally {
      s.conf.unset("graft.checkpoint.reliable")
      // drop the checkpoint payload (full RDD data); the dir setting
      // left on the shared context is inert while the flag is off
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(ckpt).iterator().asScala.toSeq.reverse
        .foreach(p => java.nio.file.Files.deleteIfExists(p))
    }
  }

  test("q60 z-order bounds BOTH dims per file: a partkey band touches a strict " +
      "subset of z-files but every file of the 1-D shipdate layout") {
    val dir = "/root/testdata/sf0.01" // sf0.001's partkey domain is too
    // narrow for a band that is selective in BOTH corpora
    // materialize both layout copies via their queries
    SparkEntry.queries("q60_zorder_layout")(spark, dir).collect()
    SparkEntry.queries("q42_clustered_layout")(spark, dir).collect()
    val zDir = graft.ops.Scratch.dir("graft_zorder", dir) + "/out"
    val cDir = graft.ops.Scratch.dir("graft_clust", dir) + "/out"

    def filesTouched(path: String): (Long, Long) = {
      val df = spark.read.parquet(path)
      val total = df.select(input_file_name()).distinct().count()
      val touched = df.filter(col("l_partkey").between(100, 299))
        .select(input_file_name()).distinct().count()
      (touched, total)
    }
    val (zT, zN) = filesTouched(zDir)
    val (cT, cN) = filesTouched(cDir)
    info(s"partkey band 100-299 touches $zT/$zN z-ordered files vs $cT/$cN " +
      "shipdate-clustered files")
    // 1-D time clustering gives partkey no locality at all…
    assert(cT == cN, s"expected the partkey band to hit every 1-D file ($cT/$cN)")
    // …the curve confines the band to at most half the files (the
    // 100-299 band is ~10% of the partkey domain; top-2 curve bits per
    // dim alone cage it into 1-2 of 4 partkey quarters)
    assert(zT * 2 <= zN, s"z-order gave no partkey locality: $zT of $zN files")
  }

  test("dq1 profiles all columns from ONE table pass (single scan + melt)") {
    val df = SparkEntry.queries("dq1_profile")(spark, sf0001)
    df.collect()
    // AdaptiveSparkPlan.toString prints the final plan FOLLOWED by the
    // initial plan — count scans in the executed (final) section only
    val plan = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    val scans = "Scan parquet".r.findAllIn(plan).length
    assert(scans == 1,
      s"the profile must melt one scan, not loop per column — found $scans scans: " + plan)
  }

  test("dq6 Benford: integer ppm partitions the mass; expectations sum to 10^6") {
    val df = SparkEntry.queries("dq6_benford")(spark, sf0001)
    val rows = df.collect()
    assert(rows.map(_.getInt(0)).toSeq == (1 to 9),
      "sf0.001 prices must populate all nine leading digits")
    // exp_ppm is a hard-constant partition of unity
    assert(rows.map(_.getAs[Long]("exp_ppm")).sum == 1000000L)
    // obs_ppm floors, so the sum can fall short only by < 9 ppm
    val obsSum = rows.map(_.getAs[Long]("obs_ppm")).sum
    assert(obsSum > 999991L && obsSum <= 1000000L, s"obs_ppm sum $obsSum")
    assert(rows.map(_.getAs[Long]("n")).sum ==
      graft.sources.Tables.lineitem(spark, sf0001).count())
    // dev_ppm is consistent with its own definition
    rows.foreach { r =>
      assert(r.getAs[Long]("dev_ppm") ==
        r.getAs[Long]("obs_ppm") - r.getAs[Long]("exp_ppm"))
    }
  }

  test("gr5/d31/s14 plans: no cartesian, split label-join broadcasts, rank is TopKPerKey") {
    val g = SparkEntry.queries("gr5_bfs_hops")(spark, sf0001)
    g.collect()
    assert(!g.queryExecution.executedPlan.toString.contains("CartesianProduct"))
    val d = SparkEntry.queries("d31_leakfree_split")(spark, sf0001)
    d.collect()
    val dp = d.queryExecution.executedPlan.toString
    assert(!dp.contains("CartesianProduct"), dp)
    assert(dp.contains("BroadcastHashJoin"),
      "the edge-cover-sized label frame must broadcast over the corpus: " + dp)
    val s = SparkEntry.queries("s14_trending_topk")(spark, sf0001)
    assert(s.queryExecution.executedPlan.toString.contains("TopKPerKey"),
      "the per-window rank must run as the map-side-heap operator")
  }

  test("p5 composition: rate table broadcasts, no cartesian, stages stay fused") {
    val df = SparkEntry.queries("p5_full_pipeline")(spark, sf0001)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan)
    assert(plan.contains("BroadcastHashJoin"),
      "the per-source rate table must broadcast over the sampled corpus: " + plan)
    // sanity against the standalone mixture: p5 samples the CLEAN
    // corpus, so its source set is a subset of p4's (src0 and any
    // fully-cleaned source may drop out; nothing new can appear) and
    // sampling can never keep more docs than the clean pool has
    val p5 = df.collect().map(r =>
      (r.getString(0), r.getAs[Long]("rate_bp"), r.getAs[Long]("n_docs_kept"))).toSeq
    val p4srcs = SparkEntry.queries("p4_apply_mixture")(spark, sf0001)
      .collect().map(_.getString(0)).toSet
    assert(p5.nonEmpty)
    p5.foreach { case (src, rate, kept) =>
      assert(p4srcs.contains(src), s"p5 source $src missing from p4")
      assert(src != "src0", "the benchmark source must never be sampled")
      assert(rate >= 0L && rate <= 10000L && kept > 0L)
    }
  }

  test("e3 int8 audit: error bounded by half a step; extremes saturate") {
    val rows = SparkEntry.queries("e3_int8_quantization_audit")(spark, sf0001)
      .collect()
    assert(rows.length == 64)
    rows.foreach { r =>
      val (dmin, dmax) = (r.getAs[Double]("dmin"), r.getAs[Double]("dmax"))
      val err = r.getAs[Double]("max_abs_err")
      if (dmax > dmin) {
        val step = (dmax - dmin) / 255.0
        assert(err <= step / 2.0 * (1 + 1e-9),
          s"dim ${r.getAs[Long]("dim")}: err $err > step/2 ${step / 2}")
        // the min and max values quantize to the end codes exactly
        assert(r.getAs[Long]("n_lo") >= 1L && r.getAs[Long]("n_hi") >= 1L)
      }
    }
  }

  test("q66 transitions: row mass accounts for every non-initial event") {
    val rows = SparkEntry.queries("q66_session_transitions")(spark, sf0001).collect()
    assert(rows.nonEmpty)
    // per source row the ppm shares can only undershoot by < #cells
    rows.groupBy(_.getString(0)).foreach { case (prev, cells) =>
      val ppm = cells.map(_.getAs[Long]("p_ppm")).sum
      assert(ppm <= 1000000L && ppm > 1000000L - cells.length,
        s"$prev: ppm mass $ppm over ${cells.length} cells")
    }
    // total transitions = events - session starts (each session
    // contributes length-1 transitions)
    val nTrans = rows.map(_.getAs[Long]("n")).sum
    val sess = SparkEntry.queries("s3_session")(spark, sf0001).collect()
    val nEvents = graft.sources.Tables.events(spark, sf0001).count()
    assert(nTrans == nEvents - sess.length,
      s"$nTrans transitions vs $nEvents events - ${sess.length} sessions")
  }

  test("dq7: imputed rows carry the group median, observed rows untouched") {
    import org.apache.spark.sql.functions._
    val rows = SparkEntry.queries("dq7_impute_median")(spark, sf0001).collect()
    assert(rows.nonEmpty)
    assert(rows.exists(_.getAs[Boolean]("was_imputed")),
      "the synthesized missingness must hit the sample")
    // recompute the medians over the same synthesized-missing frame
    val meds = graft.sources.Tables.events(spark, sf0001)
      .select(col("event_type"),
        when(col("event_id") % 13 === 0, lit(null).cast("double"))
          .otherwise(col("value")).as("v"))
      .filter(col("v").isNotNull)
      .groupBy(col("event_type")).agg(expr("median(v)").as("med"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val raw = graft.sources.Tables.events(spark, sf0001)
      .select(col("event_id"), col("value"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    rows.foreach { r =>
      val (id, tpe, v, imp) = (r.getAs[Long]("event_id"), r.getString(1),
        r.getAs[Double]("v_imputed"), r.getAs[Boolean]("was_imputed"))
      if (imp) assert(v == meds(tpe), s"event $id: $v != median ${meds(tpe)}")
      else assert(v == raw(id), s"event $id: observed value mutated")
      assert(imp == (id % 13 == 0))
    }
  }

  test("m11 patchify: pixel mass conserved, grid dims match ceil(w/4)*ceil(h/4)") {
    val rows = SparkEntry.queries("m11_image_patchify")(spark, sf0001).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getAs[Long]("doc_id")).foreach { case (id, patches) =>
      val w = 8 + (id % 16).toInt
      val h = 8 + (id % 11).toInt
      assert(patches.map(_.getAs[Long]("n_px")).sum == w.toLong * h,
        s"doc $id: pixel mass lost")
      val expGrid = ((w + 3) / 4) * ((h + 3) / 4)
      assert(patches.length == expGrid, s"doc $id: ${patches.length} != $expGrid")
    }
  }

  test("t31 savings: kept side equals cc2's surviving corpus per language") {
    val t31 = SparkEntry.queries("t31_dedup_savings")(spark, sf0001).collect()
      .map(r => r.getString(0) -> r.getAs[Long]("n_docs_kept")).toMap
    val cc2 = SparkEntry.queries("cc2_cluster_resolve")(spark, sf0001).collect()
      .groupBy(_.getString(1)).view.mapValues(_.length.toLong).toMap
    assert(t31.nonEmpty && t31 == cc2.filter { case (l, _) => t31.contains(l) })
    SparkEntry.queries("t31_dedup_savings")(spark, sf0001).collect().foreach { r =>
      assert(r.getAs[Long]("tokens_kept") <= r.getAs[Long]("tokens_raw"))
      assert(r.getAs[Long]("savings_ppm") >= 0L)
    }
  }

  test("m12 segmentation: frame grid intact through the codec; runs match the mask") {
    val rows = SparkEntry.queries("m12_audio_energy_segments")(spark, sf0001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      val gid = (id % 16).toInt
      val nf = 12 + gid % 5
      assert(r.getAs[Long]("n_frames") == nf.toLong,
        s"doc $id: codec shifted the frame grid")
      // replay the activity mask and its runs locally
      val mask = (0 until nf).map(f => (gid * 7 + f * 3) % 5 < 2)
      assert(r.getAs[Long]("active_frames") == mask.count(identity).toLong)
      val runs = mask.foldLeft(List.empty[Int]) {
        case (acc, true) if acc.nonEmpty && acc.head > 0 => (acc.head + 1) :: acc.tail
        case (acc, true)                                 => 1 :: acc
        case (acc, false) if acc.nonEmpty && acc.head > 0 => 0 :: acc
        case (acc, false)                                => acc
      }.filter(_ > 0)
      assert(r.getAs[Long]("n_segments") == runs.length.toLong, s"doc $id runs")
      assert(r.getAs[Long]("longest_run") == runs.max.toLong, s"doc $id longest")
      assert(r.getAs[Long]("total_energy") > 0L)
    }
  }

  test("t32 boilerplate: removal bounded by totals; high-DF rule replayed") {
    val rows = SparkEntry.queries("t32_boilerplate_strip")(spark, sf0001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val tot = r.getAs[Long]("total_tokens"); val rem = r.getAs[Long]("removed_tokens")
      assert(rem >= 0L && rem <= tot)
      assert(r.getAs[Long]("docs_affected") <= r.getAs[Long]("n_docs"))
      assert(r.getAs[Long]("removed_ppm") == rem * 1000000L / tot)
    }
    // local replay of the within-source df>=5 rule at the segment grain
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
      .selectExpr("source", "doc_id", "lower(text) AS t").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2)))
    def segsOf(t: String): Seq[String] =
      t.split("\\s+").toSeq.grouped(10).map(_.mkString(" ")).toSeq
    val perSrc = docs.groupBy(_._1)
    val expRemoved = perSrc.map { case (src, ds) =>
      val df = ds.flatMap { case (_, id, t) => segsOf(t).distinct.map(_ -> id) }
        .groupBy(_._1).view.mapValues(_.map(_._2).distinct.size).toMap
      val bp = df.filter(_._2 >= 5).keySet
      src -> ds.map { case (_, _, t) =>
        segsOf(t).filter(bp).map(_.split(" ").length.toLong).sum
      }.sum
    }
    rows.foreach { r =>
      assert(r.getAs[Long]("removed_tokens") == expRemoved(r.getAs[String]("source")),
        s"${r.getAs[String]("source")}: removed mismatch vs local replay")
    }
  }

  test("q67: cents are exact, shares bounded, top-3 replayed locally") {
    val rows = SparkEntry.queries("q67_revenue_concentration")(spark, sf0001).collect()
    assert(rows.nonEmpty)
    // local replay in exact cents
    val orders = spark.read.parquet(s"$sf0001/orders.parquet")
      .selectExpr("o_custkey", "CAST(round(o_totalprice * 100) AS BIGINT) AS cents")
      .collect().map(r => r.getLong(0) -> r.getLong(1))
    val cust = spark.read.parquet(s"$sf0001/customer.parquet")
      .selectExpr("CAST(c_custkey AS BIGINT)", "CAST(c_nationkey AS BIGINT)")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val perCust = orders.groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    val byNation = perCust.toSeq.flatMap { case (ck, c) =>
      cust.get(ck).map(n => (n, ck, c))
    }.groupBy(_._1)
    rows.foreach { r =>
      val total = r.getAs[Long]("total_cents"); val top3 = r.getAs[Long]("top3_cents")
      assert(top3 >= 0L && top3 <= total)
      assert(r.getAs[Long]("top3_share_ppm") == top3 * 1000000L / total)
    }
    val spark3 = rows.map(r => r.getAs[String]("nation") -> r.getAs[Long]("top3_cents")).toMap
    val nationName = spark.read.parquet(s"$sf0001/nation.parquet")
      .selectExpr("CAST(n_nationkey AS BIGINT)", "n_name").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    byNation.foreach { case (nk, cs) =>
      val exp = cs.map(t => (t._3, t._2)).sortBy { case (c, ck) => (-c, ck) }
        .take(3).map(_._1).sum
      assert(spark3(nationName(nk)) == exp, s"nation $nk: top-3 cents mismatch")
    }
  }

  test("t33 fertility: per-lang totals reconcile with t19's per-doc tokenization") {
    val t33 = SparkEntry.queries("t33_tokenizer_fertility")(spark, sf0001).collect()
    assert(t33.nonEmpty)
    t33.foreach { r =>
      // every word is at least one symbol, so fertility >= 1.0 (1e6 ppm)
      assert(r.getAs[Long]("fertility_ppm") >= 1000000L)
      assert(r.getAs[Long]("bpe_tokens") >= r.getAs[Long]("ws_tokens"))
    }
    val t19tot = SparkEntry.queries("t19_bpe_tokenize")(spark, sf0001)
      .agg(org.apache.spark.sql.functions.sum("bpe_tokens"))
      .collect().head.getLong(0)
    assert(t33.map(_.getAs[Long]("bpe_tokens")).sum == t19tot,
      "lang-level and doc-level BPE token mass disagree")
  }

  test("dq8 Spearman: rho equals a local replay under the same tie-break") {
    val rows = SparkEntry.queries("dq8_spearman_corr")(spark, sf0001).collect()
    assert(rows.length == 3)
    // order-grain integer aggregates: l_orderkey is the unique key the
    // rank total-order hangs off (line-level rows are NOT unique here)
    val sample = spark.read.parquet(s"$sf0001/lineitem.parquet")
      .filter("l_orderkey % 10 = 0")
      .groupBy("l_orderkey")
      .agg(
        org.apache.spark.sql.functions.expr("SUM(CAST(round(l_quantity) AS BIGINT))").as("quantity"),
        org.apache.spark.sql.functions.expr("SUM(CAST(round(l_extendedprice * 100) AS BIGINT))").as("extendedprice"),
        org.apache.spark.sql.functions.expr("SUM(CAST(round(l_discount * 10000) AS BIGINT))").as("discount"))
      .selectExpr("CAST(l_orderkey AS BIGINT) AS ok", "quantity", "extendedprice", "discount")
      .collect()
    def ranks(metric: String): Map[Long, Long] =
      sample.map(r => (r.getAs[Long]("ok"), r.getAs[Long](metric)))
        .sortBy { case (ok, v) => (v, ok) }
        .zipWithIndex.map { case ((k, _), i) => k -> (i + 1).toLong }.toMap
    rows.foreach { r =>
      val rx = ranks(r.getAs[String]("metric_x")); val ry = ranks(r.getAs[String]("metric_y"))
      val n = sample.length.toLong
      val d2 = rx.map { case (k, v) => (v - ry(k)) * (v - ry(k)) }.sum
      assert(r.getAs[Long]("n") == n)
      assert(r.getAs[Long]("sum_d2") == d2, s"${r.getAs[String]("metric_x")}: d2 mismatch")
      val rho = r.getAs[Double]("rho")
      assert(rho >= -1.0 && rho <= 1.0)
    }
  }

  test("p6 card: doc masses cover the corpus; dup totals equal cc1's losers") {
    val rows = SparkEntry.queries("p6_dataset_card")(spark, sf0001).collect()
    assert(rows.nonEmpty)
    val corpusDocs = spark.read.parquet(s"$sf0001/documents.parquet").count()
    assert(rows.map(_.getAs[Long]("n_docs")).sum == corpusDocs)
    val losers = SparkEntry.queries("cc1_dup_clusters")(spark, sf0001).collect()
      .count(r => r.getLong(0) != r.getLong(1)).toLong
    assert(rows.map(_.getAs[Long]("dup_docs")).sum == losers)
    rows.foreach { r =>
      assert(r.getAs[Long]("dup_ppm") ==
        r.getAs[Long]("dup_docs") * 1000000L / r.getAs[Long]("n_docs"))
      assert(r.getAs[Long]("n_langs") >= 1L)
    }
  }

  test("e5 drift: cohort masses cover the corpus; ppm and deltas reconcile") {
    val rows = SparkEntry.queries("e5_embedding_drift")(spark, sf0001).collect()
    assert(rows.nonEmpty)
    val n = spark.read.parquet(s"$sf0001/embeddings.parquet").count()
    assert(rows.map(_.getAs[Long]("n_ref")).sum + rows.map(_.getAs[Long]("n_new")).sum == n)
    val totRef = rows.map(_.getAs[Long]("n_ref")).sum
    val totNew = rows.map(_.getAs[Long]("n_new")).sum
    rows.foreach { r =>
      assert(r.getAs[Long]("ppm_ref") ==
        (if (totRef == 0) 0L else r.getAs[Long]("n_ref") * 1000000L / totRef))
      assert(r.getAs[Long]("ppm_new") ==
        (if (totNew == 0) 0L else r.getAs[Long]("n_new") * 1000000L / totNew))
      assert(r.getAs[Long]("drift_ppm") ==
        r.getAs[Long]("ppm_new") - r.getAs[Long]("ppm_ref"))
    }
    // floor-division undershoot is bounded by the cell count
    assert(math.abs(rows.map(_.getAs[Long]("ppm_ref")).sum - 1000000L) <= rows.length)
    assert(math.abs(rows.map(_.getAs[Long]("ppm_new")).sum - 1000000L) <= rows.length)
  }

  test("d37 sweep: survivors monotonically shrink as the threshold rises") {
    val rows = SparkEntry.queries("d37_jaccard_threshold_sweep")(spark, sf0001)
      .collect().sortBy(_.getAs[Long]("t100"))
    assert(rows.map(_.getAs[Long]("t100")).toSeq == Seq(30L, 50L, 70L, 90L))
    rows.zip(rows.tail).foreach { case (lo, hi) =>
      assert(lo.getAs[Long]("n_pairs") >= hi.getAs[Long]("n_pairs"),
        "a higher threshold admitted more pairs")
      assert(lo.getAs[Long]("n_docs") >= hi.getAs[Long]("n_docs"),
        "a higher threshold touched more docs")
    }
    rows.foreach { r =>
      // each surviving pair touches at most 2 distinct docs
      assert(r.getAs[Long]("n_docs") <= 2L * r.getAs[Long]("n_pairs"))
    }
    assert(rows.head.getAs[Long]("n_pairs") > 0L, "fixture must have near-dups at 0.3")
  }

  test("q68 TWA: bounded by held extremes and equal to a local replay") {
    val rows = SparkEntry.queries("q68_time_weighted_avg")(spark, sf0001).collect()
    assert(rows.nonEmpty)
    val events = graft.sources.Tables.events(spark, sf0001)
      .selectExpr("user_id", "unix_micros(ts) AS us", "event_id",
        "CAST(round(value * 100) AS BIGINT) AS cents")
      .collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("us"),
        r.getAs[Long]("event_id"), r.getAs[Long]("cents")))
      .groupBy(_._1)
    rows.foreach { r =>
      val uid = r.getAs[Long]("user_id")
      val seq = events(uid).sortBy(t => (t._2, t._3))
      val holds = seq.zip(seq.tail).map { case (a, b) => (a._4, b._2 - a._2) }
      val den = holds.map(_._2).sum
      val num = holds.map { case (c, dt) => c * dt }.sum
      assert(r.getAs[Long]("twa_den") == den, s"user $uid den")
      assert(r.getAs[Long]("twa_num") == num, s"user $uid num")
      val held = holds.filter(_._2 > 0).map(_._1)
      val twa = r.getAs[Double]("twa_cents")
      assert(twa >= held.min - 1e-9 && twa <= held.max + 1e-9,
        s"user $uid: TWA $twa outside held range [${held.min}, ${held.max}]")
    }
  }

  test("sel5 frontier: bigger budgets keep more and admit lower floors") {
    val rows = SparkEntry.queries("sel5_budget_frontier")(spark, sf0001).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getAs[String]("lang")).foreach { case (lang, rs) =>
      val seq = rs.sortBy(_.getAs[Long]("budget_ppm"))
      seq.zip(seq.tail).foreach { case (lo, hi) =>
        assert(lo.getAs[Long]("n_kept") <= hi.getAs[Long]("n_kept"), s"$lang docs")
        assert(lo.getAs[Long]("tokens_kept") <= hi.getAs[Long]("tokens_kept"), s"$lang toks")
        assert(lo.getAs[Long]("floor_ttr_ppm") >= hi.getAs[Long]("floor_ttr_ppm"),
          s"$lang: smaller budget admitted a lower-quality doc")
      }
    }
    // budget respected against the corpus's own language masses
    val tot = spark.read.parquet(s"$sf0001/documents.parquet")
      .selectExpr("lang", "CAST(size(split(lower(text), '\\\\s+')) AS BIGINT) AS nt")
      .groupBy("lang").agg(org.apache.spark.sql.functions.sum("nt").as("tot"))
      .collect().map(r => r.getString(0) -> r.getAs[Long]("tot")).toMap
    rows.foreach { r =>
      val budget = tot(r.getAs[String]("lang")) * r.getAs[Long]("budget_ppm") / 1000000L
      assert(r.getAs[Long]("tokens_kept") <= budget,
        s"${r.getAs[String]("lang")}@${r.getAs[Long]("budget_ppm")}: budget exceeded")
    }
  }

  test("m13 router: sniffed formats match the writer; pixels survive both containers") {
    val rows = SparkEntry.queries("m13_format_router")(spark, sf0001).collect()
    assert(rows.nonEmpty)
    assert(rows.exists(_.getAs[String]("format") == "png") &&
      rows.exists(_.getAs[String]("format") == "bmp"),
      "fixture must exercise both containers")
    rows.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      assert(r.getAs[String]("format") == (if (id % 2 == 0) "png" else "bmp"),
        s"doc $id: magic-byte sniff disagrees with the writer")
      val w = 8 + (id % 9).toInt; val h = 8 + (id % 7).toInt
      assert(r.getAs[Long]("w") == w.toLong && r.getAs[Long]("h") == h.toLong)
      val exp = (for (x <- 0 until w; y <- 0 until h)
        yield (((id % 16) * 37 + x * 31 + y * 17) % 200)).sum
      assert(r.getAs[Long]("gray_sum") == exp, s"doc $id: container corrupted pixels")
    }
  }

  test("gr12: two-hop reach equals a local FoF replay; direct excluded") {
    val rows = SparkEntry.queries("gr12_two_hop_reach")(spark, sf0001).collect()
    assert(rows.nonEmpty)
    val adj = graft.queries.Graph.cachedEdges(
        spark, sf0001, minShared = 5, maxDf = 100)
      .collect().flatMap(e => Seq(e.getLong(0) -> e.getLong(1), e.getLong(1) -> e.getLong(0)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    rows.foreach { r =>
      val a = r.getAs[Long]("doc_id")
      val direct = adj(a)
      val fof = direct.flatMap(adj(_)) -- direct - a
      assert(r.getAs[Long]("n_direct") == direct.size.toLong, s"node $a direct")
      assert(r.getAs[Long]("n_fof") == fof.size.toLong, s"node $a fof")
    }
  }

  test("q69 slope: regression stats equal a local replay in exact cents") {
    val rows = SparkEntry.queries("q69_trend_slope")(spark, sf0001).collect()
    assert(rows.length == 25)
    val nat = spark.read.parquet(s"$sf0001/nation.parquet")
      .selectExpr("CAST(n_nationkey AS BIGINT)", "n_name").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val cust = spark.read.parquet(s"$sf0001/customer.parquet")
      .selectExpr("CAST(c_custkey AS BIGINT)", "CAST(c_nationkey AS BIGINT)")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val monthly = spark.read.parquet(s"$sf0001/orders.parquet")
      .selectExpr("o_custkey",
        "CAST((year(o_orderdate) - 1995) * 12 + month(o_orderdate) - 1 AS BIGINT) AS mx",
        "CAST(round(o_totalprice * 100) AS BIGINT) AS cents")
      .collect()
      .flatMap(r => cust.get(r.getLong(0)).map(nk => ((nk, r.getLong(1)), r.getLong(2))))
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    val byNation = monthly.toSeq.map { case ((nk, mx), y) => (nk, mx, y) }.groupBy(_._1)
    rows.foreach { r =>
      val nk = nat.find(_._2 == r.getAs[String]("nation")).get._1
      val ms = byNation(nk)
      val n = ms.size.toLong
      val sx = ms.map(_._2).sum; val sxx = ms.map(t => t._2 * t._2).sum
      val sy = ms.map(_._3).sum; val sxy = ms.map(t => t._2 * t._3).sum
      assert(r.getAs[Long]("n_months") == n)
      assert(r.getAs[Long]("slope_num") == n * sxy - sx * sy, s"nation $nk num")
      assert(r.getAs[Long]("slope_den") == n * sxx - sx * sx, s"nation $nk den")
    }
  }

  test("d38 spans: run algebra consistent; planted near-dups carry long runs") {
    val rows = SparkEntry.queries("d38_dup_substring_spans")(spark, sf0001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val nw = r.getAs[Long]("n_windows"); val dw = r.getAs[Long]("dup_windows")
      val ns = r.getAs[Long]("n_spans"); val lr = r.getAs[Long]("longest_run")
      assert(dw <= nw)
      assert((dw == 0L) == (ns == 0L), "span count disagrees with dup mass")
      assert(lr <= dw, "a run cannot exceed the duplicated window count")
      assert(ns == 0L || lr >= (dw + ns - 1) / ns,
        "longest run below the pigeonhole mean of spans")
      assert(r.getAs[Long]("dup_ppm") == dw * 1000000L / nw)
    }
    // the fixture's planted near-dup families must surface as real spans
    assert(rows.exists(_.getAs[Long]("longest_run") >= 5L),
      "no doc with a >=5-window duplicated span — detector likely broken")
  }

  test("e6: norm buckets cover every vector and land in a sane band") {
    val rows = SparkEntry.queries("e6_norm_histogram")(spark, sf0001).collect()
    val n = spark.read.parquet(s"$sf0001/embeddings.parquet").count()
    assert(rows.map(_.getAs[Long]("n")).sum == n, "histogram lost vectors")
    rows.foreach(r => assert(r.getAs[Long]("bucket") >= 0L))
  }

  test("m14: cuts land exactly where the planted jump is; smooth frames stay uncut") {
    val rows = SparkEntry.queries("m14_scene_change")(spark, sf0001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      val gid = (id % 16).toInt
      val f = r.getAs[Long]("frame_idx")
      // replay the paint formula and diff locally
      val w = 12 + gid % 5; val h = 10 + gid % 7
      def v(x: Int, y: Int, fr: Long): Int = {
        val jump = if (gid % 2 == 0 && fr >= 2) 97 else 0
        ((gid * 37 + x * 31 + y * 17 + fr * 11 + jump) % 200).toInt
      }
      val exp = (for (x <- 0 until w; y <- 0 until h)
        yield math.abs(v(x, y, f) - v(x, y, f - 1)).toLong).sum
      assert(r.getAs[Long]("diff_sum") == exp, s"doc $id frame $f: codec diff drift")
      assert(r.getAs[Boolean]("is_cut") == (exp > 40L * w * h))
      // the planted jump sits at frame 2 of even-gid docs only
      if (gid % 2 == 1)
        assert(!r.getAs[Boolean]("is_cut"), s"doc $id: smooth motion read as a cut")
    }
    val cuts = rows.filter(_.getAs[Boolean]("is_cut"))
    assert(cuts.nonEmpty && cuts.forall(r =>
      r.getAs[Long]("frame_idx") == 2L && (r.getAs[Long]("doc_id") % 16) % 2 == 0),
      "cuts must appear exactly at the planted jump")
  }

  test("p7: majority row closes at 1e6; LF agreement bounded by coverage overlap") {
    val rows = SparkEntry.queries("p7_weak_label_diagnostics")(spark, sf0001)
      .collect().map(r => r.getAs[String]("lf") -> r).toMap
    assert(rows.keySet == Set("lf_len", "lf_rep", "lf_ttr", "majority"))
    assert(rows("majority").getAs[Long]("majority_agree_ppm") == 1000000L)
    rows.values.foreach { r =>
      assert(r.getAs[Long]("keep_ppm") >= 0L && r.getAs[Long]("keep_ppm") <= 1000000L)
      assert(r.getAs[Long]("majority_agree_ppm") >= 0L &&
        r.getAs[Long]("majority_agree_ppm") <= 1000000L)
    }
    // 2-of-3 majority: the three LFs' agreement rates must sum to >= 2e6
    val lfAgree = Seq("lf_len", "lf_rep", "lf_ttr")
      .map(rows(_).getAs[Long]("majority_agree_ppm")).sum
    assert(lfAgree >= 2000000L - 3L,
      s"three-way agreement mass $lfAgree below the 2-of-3 floor")
  }

  test("m15: every visual class collapses across containers at sf0.01") {
    // sf0.01: the %5 sample covers all 16 classes in BOTH parities, so
    // every cluster must contain PNG and BMP members — the container-
    // invariance claim under test (sf0.001's 12-id sample cannot)
    val rows = SparkEntry.queries("m15_cross_format_dedup")(
      spark, "/root/testdata/sf0.01").collect()
    assert(rows.length == 16, s"expected 16 visual classes, got ${rows.length}")
    rows.foreach { r =>
      assert(r.getAs[Boolean]("cross_format"),
        s"keeper ${r.getAs[Long]("keeper")}: dHash failed container invariance")
      assert(r.getAs[Long]("n_png") + r.getAs[Long]("n_bmp") ==
        r.getAs[Long]("n_members"))
    }
  }

  test("dq9: the audit flags the known non-unique key and clears the real keys") {
    val rows = SparkEntry.queries("dq9_key_uniqueness")(spark, sf0001)
      .collect().map(r => r.getAs[String]("candidate_key") -> r).toMap
    val li = rows("lineitem(l_orderkey,l_linenumber)")
    assert(!li.getAs[Boolean]("is_unique"),
      "the fixture's duplicated line keys must be flagged")
    assert(li.getAs[Long]("dup_rows") > 0L)
    Seq("customer(c_custkey)", "documents(doc_id)", "events(event_id)",
      "orders(o_orderkey)").foreach { k =>
      assert(rows(k).getAs[Boolean]("is_unique"), s"$k wrongly flagged")
      assert(rows(k).getAs[Long]("dup_rows") == 0L)
    }
    rows.values.foreach { r =>
      assert(r.getAs[Long]("dup_ppm") ==
        r.getAs[Long]("dup_rows") * 1000000L / r.getAs[Long]("n_rows"))
      assert(r.getAs[Long]("n_keys") <= r.getAs[Long]("n_rows"))
    }
  }

  test("q70 nearest as-of: every match is the true nearest click within tolerance") {
    val rows = SparkEntry.queries("q70_asof_nearest")(spark, sf0001).collect()
    assert(rows.nonEmpty)
    val ev = graft.sources.Tables.events(spark, sf0001)
      .selectExpr("user_id", "unix_micros(ts) AS us", "event_id", "event_type")
      .collect().map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("us"),
        r.getAs[Long]("event_id"), r.getAs[String]("event_type")))
    val clicks = ev.filter(_._4 == "click").groupBy(_._1)
    val purch = ev.filter(_._4 == "purchase")
      .map(e => e._3 -> (e._1, e._2)).toMap
    val matched = rows.map(_.getAs[Long]("event_id")).toSet
    rows.foreach { r =>
      val (uid, pus) = purch(r.getAs[Long]("event_id"))
      val gap = r.getAs[Long]("gap_us")
      assert(gap >= 0L && gap <= 1800000000L)
      // no click of this user can be strictly nearer than the reported gap
      val best = clicks.getOrElse(uid, Array.empty).map(c => math.abs(c._2 - pus))
      assert(best.nonEmpty && best.min == gap,
        s"purchase ${r.getAs[Long]("event_id")}: gap $gap but nearest ${best.min}")
    }
    // completeness: every purchase with a click in tolerance is matched
    purch.foreach { case (pid, (uid, pus)) =>
      val near = clicks.getOrElse(uid, Array.empty)
        .exists(c => math.abs(c._2 - pus) <= 1800000000L)
      assert(near == matched.contains(pid), s"purchase $pid coverage mismatch")
    }
  }

  test("q71 native session_window agrees row-for-row with s3's window algebra") {
    val a = SparkEntry.queries("q71_native_session_window")(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .sortBy(t => (t._1, t._2))
    val b = SparkEntry.queries("s3_session")(spark, sf0001)
      .collect().map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("session_start_us"),
        r.getAs[Long]("n_events"), r.getAs[Double]("sum_val")))
      .sortBy(t => (t._1, t._2))
    assert(a.length == b.length, s"${a.length} native vs ${b.length} hand-rolled sessions")
    a.zip(b).foreach { case (x, y) => assert(x == y, s"session diverged: $x vs $y") }
  }

  test("b2 curve: every merge strictly compresses; baseline closes at 1e6 ppm") {
    val rows = SparkEntry.queries("b2_bpe_compression_curve")(spark, sf0001)
      .collect().sortBy(_.getAs[Long]("after_merges"))
    assert(rows.map(_.getAs[Long]("after_merges")).toSeq == (0L to 5L))
    assert(rows.head.getAs[Long]("compression_ppm") == 1000000L)
    rows.zip(rows.tail).foreach { case (a, b) =>
      assert(b.getAs[Long]("total_syms") < a.getAs[Long]("total_syms"),
        s"merge ${b.getAs[Long]("after_merges")} did not compress")
    }
    val base = rows.head.getAs[Long]("total_syms")
    rows.foreach(r => assert(r.getAs[Long]("compression_ppm") ==
      r.getAs[Long]("total_syms") * 1000000L / base))
  }

  test("s17: bounded disorder lands in the partial-loss regime, not 0% or ~100%") {
    val rows = SparkEntry.queries("s17_watermark_audit")(spark, sf0001).collect()
    assert(rows.nonEmpty)
    val dropped = rows.map(_.getAs[Long]("n_dropped")).sum
    val total = rows.map(_.getAs[Long]("n_events")).sum
    assert(dropped > 0L, "no drops — the jitter model is vacuous")
    assert(dropped * 2 < total, "over half dropped — disorder model too adversarial")
    rows.foreach { r =>
      assert(r.getAs[Long]("n_dropped") <= r.getAs[Long]("n_events"))
      assert(r.getAs[Long]("drop_ppm") ==
        r.getAs[Long]("n_dropped") * 1000000L / r.getAs[Long]("n_events"))
    }
  }

  test("d26 PQ: codebook and LUT broadcast; the ADC scan never shuffles codes") {
    val df = SparkEntry.queries("d26_ann_pq")(spark, sf0001)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"),
      "ADC scan must be a broadcast pass of the LUT maps over the codes, " +
        "not a cartesian shuffle: " + plan)
    // the only sanctioned non-equi join is the LUT-over-codes scan with
    // the per-query lookup maps (n_q rows) broadcast
    assert(plan.contains("BroadcastNestedLoopJoin"),
      "the per-query LUT frame must broadcast over the code table: " + plan)
  }

  test("d20 semDedup pairs meet via a cid equi-join, never a global cross join") {
    val df = SparkEntry.queries("d20_semdedup")(spark, sf0001)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"),
      "semDedup pair join must be cid-keyed, not cartesian: " + plan)
    // the kmeans assignment crossJoin against the broadcast centroid set
    // is the only sanctioned non-equi join; it must be broadcast-nested,
    // with the centroids (small side) broadcast
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastExchange"),
      "centroid scoring must broadcast the k-row side: " + plan)
  }

  test("t20 BM25: the df table joins broadcast; the corpus is scanned, not crossed") {
    val df = SparkEntry.queries("t20_bm25")(spark, sf0001)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      "3-row df table must broadcast onto the tf frame: " + plan)
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("t24 CMS: the sketch is a single-group aggregate probed via broadcast") {
    val df = SparkEntry.queries("t24_cms_heavy_hitters")(spark, sf0001)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    // the sketch side reaches the probe join as a broadcast (1 row);
    // the probe join itself must not shuffle the distinct-terms side
    // against the sketch
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastExchange"),
      "1-row sketch must broadcast to the probes: " + plan)
    assert(plan.contains("CountMinAgg") || plan.contains("countminagg"),
      "the native TypedImperativeAggregate must appear in the plan: " + plan)
  }

  test("q53 LATERAL decorrelates to a rank join with map-side group-limit pruning") {
    val df = SparkEntry.queries("q53_lateral_topk")(spark, sf0001)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"),
      "LATERAL must decorrelate, not nest-loop the outer table: " + plan)
    // Catalyst rewrites the correlated ORDER BY/LIMIT into a window rank;
    // WindowGroupLimit prunes to top-2 per order BEFORE the exchange
    assert(plan.contains("WindowGroupLimit"),
      "per-order LIMIT must run as a group-limit, not a full sort: " + plan)
  }

  test("t23 winnowing window is doc-keyed; d21 overlap joins by term, never cross") {
    val t23 = SparkEntry.queries("t23_winnowing")(spark, sf0001)
    t23.collect()
    val p23 = t23.queryExecution.executedPlan.toString
    // the fingerprint-selection window must partition by doc_id — a
    // global (unpartitioned) window would serialize the corpus through
    // one task
    assert(p23.contains("windowspecdefinition(doc_id"),
      "winnowing window must be doc_id-partitioned: " + p23)
    val d21 = SparkEntry.queries("d21_source_overlap")(spark, sf0001)
    d21.collect()
    val p21 = d21.queryExecution.executedPlan.toString
    assert(!p21.contains("CartesianProduct"),
      "vocabulary self-join must be term-keyed: " + p21)
  }

  test("q58 fact scan carries a runtime dynamicpruning partition filter") {
    val df = SparkEntry.queries("q58_dynamic_partition_pruning")(spark, sf0001)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    // the lang partitions to read are only known from the dim's filter:
    // Catalyst must inject a dynamic pruning subquery into the fact
    // scan's PartitionFilters (reusing the dim broadcast) — a literal
    // pruning (q41) or none at all would read every partition
    assert(plan.contains("dynamicpruning"),
      "fact scan must be runtime-pruned by the dim filter: " + plan)
  }

  test("q59 probe-side scan is pruned by a runtime bloom filter") {
    val df = SparkEntry.queries("q59_bloom_join_filter")(spark, sf0001)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("might_contain") || plan.contains("bloom_filter"),
      "lineitem side must carry the injected bloom-filter predicate: " + plan)
  }

  test("pr1 and d25 candidate joins are key-equi, never cartesian") {
    for (q <- Seq("pr1_pagerank", "d25_winnow_match")) {
      val df = SparkEntry.queries(q)(spark, sf0001)
      df.collect()
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.contains("CartesianProduct"),
        s"$q must join by key (node/fingerprint), not cross: " + plan)
    }
  }

  test("d24 containment prune keeps survivors proportional to emitted pairs") {
    // the prune bound (ri + min(h)) / min(n) >= tau is the one place a
    // loose bound could balloon the verify stage at scale: assert the
    // candidate frame that reaches the exact verify is (a) a vanishing
    // fraction of the all-pairs space and (b) within a small multiple
    // of the pairs actually emitted — i.e. the prune does its job
    val docs = Tables.documents(spark, sf0001)
    val sh = graft.queries.LlmPipeline.withCorpusDf(
      graft.queries.LlmPipeline.shingleIndex(docs)
        .select($"doc_id", xxhash64($"shingle").as("shingle")))
    val (_, pruned) =
      graft.queries.LlmPipeline.containmentParts(sh, maxDf = 100, tau = 0.5)
    val survivors = pruned.count()
    val emitted = graft.queries.LlmPipeline
      .containmentPairs(sh, maxDf = 100, tau = 0.5)
      .select($"contained", $"container").count()
    val n = docs.count()
    val allPairs = n * (n - 1) / 2
    assert(survivors <= allPairs / 100,
      s"prune must kill >=99% of the pair space: $survivors of $allPairs")
    assert(survivors <= 8 * math.max(1L, emitted),
      s"verify volume $survivors should track emitted pairs $emitted")
  }

  test("p3 first-occurrence rule partial-aggregates; t25 joins broadcast, no cartesian") {
    // p3's corpus-wide first-occurrence MIN must combine map-side (a
    // boilerplate segment repeated millions of times arrives at the
    // exchange as one partial row per task, not one row per occurrence)
    val p3 = SparkEntry.queries("p3_segment_dedup")(spark, sf0001)
    p3.collect()
    val p3plan = p3.queryExecution.executedPlan.toString
    assert(p3plan.contains("partial_min"),
      "first-occurrence min must partial-aggregate below the exchange: " + p3plan)
    assert(!p3plan.contains("CartesianProduct"), p3plan)
    // t25's term statistics and query mapping are broadcast-joined; the
    // corpus is never crossed
    val t25 = SparkEntry.queries("t25_hybrid_rrf")(spark, sf0001)
    t25.collect()
    val t25plan = t25.queryExecution.executedPlan.toString
    assert(t25plan.contains("BroadcastHashJoin"), t25plan)
    assert(!t25plan.contains("CartesianProduct"), t25plan)
  }

  test("q63: AQE detects and splits the skewed join partition at sf0.1") {
    // sf0.1 so the hot partition actually exceeds the demo threshold;
    // the final adaptive plan marks the split SMJ with skew=true
    val df = SparkEntry.queries("q63_aqe_skew_join")(spark, sf01)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("SortMergeJoin"), p)
    assert(p.contains("skew=true"), "AQE skew split missing from final plan: " + p)
  }

  test("q57 sketch union estimates within 5% of exact distinct counts") {
    import org.apache.spark.sql.functions._
    val est = SparkEntry.queries("q57_hll_sketch_union")(spark, sf0001)
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    val exact = graft.sources.Tables.events(spark, sf0001)
      .groupBy(col("event_type"))
      .agg(countDistinct(col("user_id")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(est.keySet == exact.keySet)
    for ((t, e) <- exact) {
      val a = est(t).toDouble
      assert(math.abs(a - e) / e <= 0.05,
        s"$t: sketch estimate $a vs exact $e exceeds 5% error")
    }
  }

  test("dq10: chi-square cells replay locally; margins and total are consistent") {
    val rows = SparkEntry.queries("dq10_chisq_independence")(spark, sf0001).collect()
    assert(rows.nonEmpty)
    val docs = graft.sources.Tables.documents(spark, sf0001)
      .selectExpr("lang", "source").collect()
      .map(r => (r.getString(0), r.getString(1)))
    val n = docs.length.toLong
    val obs = docs.groupBy(identity).map { case (k, v) => k -> v.length.toLong }
    val rowT = docs.groupBy(_._1).map { case (k, v) => k -> v.length.toLong }
    val colT = docs.groupBy(_._2).map { case (k, v) => k -> v.length.toLong }
    // dense grid: every margin cross appears exactly once
    assert(rows.length == rowT.size * colT.size, "grid not dense")
    var terms = List.empty[Double]
    rows.foreach { r =>
      val (l, src) = (r.getAs[String]("lang"), r.getAs[String]("source"))
      val o = r.getAs[Long]("observed")
      assert(o == obs.getOrElse((l, src), 0L), s"($l,$src) observed")
      assert(r.getAs[Long]("row_tot") == rowT(l) && r.getAs[Long]("col_tot") == colT(src))
      assert(r.getAs[Long]("n") == n)
      val dev = o * n - rowT(l) * colT(src)
      assert(r.getAs[Long]("dev") == dev, s"($l,$src) dev")
      val term = (dev.toDouble * dev.toDouble) /
        (n.toDouble * rowT(l).toDouble * colT(src).toDouble)
      assert(r.getAs[Double]("chi_term") == term, s"($l,$src) term")
      terms ::= term
      assert(r.getAs[Long]("dof") == (rowT.size - 1L) * (colT.size - 1L))
    }
    // the reported total is the dyadic-grid fold of exactly these terms
    val grid = terms.map(t => math.round(t * 1073741824.0)).sum
    assert(rows.head.getAs[Double]("chi2") == grid.toDouble / 1073741824.0,
      "chi2 total not on the fsum grid")
    // observed marginal mass conservation: each row's cells sum to row_tot
    rows.groupBy(_.getAs[String]("lang")).foreach { case (l, rs) =>
      assert(rs.map(_.getAs[Long]("observed")).sum == rowT(l), s"$l row mass")
    }
  }

  test("p8: manifest replays locally (splits, shards, additive fingerprint)") {
    val rows = SparkEntry.queries("p8_shard_manifest")(spark, sf0001).collect()
    assert(rows.nonEmpty)
    // local replay: union-find clusters → d31 split rule → md5 shard/fp
    val pairs = graft.queries.Graph.cachedEdges(spark, sf0001, minShared = 5, maxDf = 100)
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
    def md5hex(s: String): String = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val docs = graft.sources.Tables.documents(spark, sf0001)
      .selectExpr("doc_id", "n_chars",
        "CAST(size(split(lower(text), '\\\\s+')) AS LONG) AS nt")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    case class Agg(var n: Long = 0, var nt: Long = 0, var ch: Long = 0,
      var mn: Long = Long.MaxValue, var mx: Long = Long.MinValue,
      var fp: BigInt = BigInt(0))
    val acc = scala.collection.mutable.Map.empty[(String, Long), Agg]
    docs.foreach { case (id, nc, nt) =>
      val cluster = if (parent.contains(id)) find(id) else id
      val h = md5hex(cluster.toString).charAt(0)
      val split = if (h < 'c') "train" else if (h < 'e') "val" else "test"
      val dh = java.lang.Long.parseLong(md5hex(id.toString).take(13), 16)
      val a = acc.getOrElseUpdate((split, dh % 4), Agg())
      a.n += 1; a.nt += nt; a.ch += nc
      a.mn = math.min(a.mn, id); a.mx = math.max(a.mx, id); a.fp += dh
    }
    assert(rows.length == acc.size, s"${rows.length} cells vs local ${acc.size}")
    rows.foreach { r =>
      val key = (r.getAs[String]("split"), r.getAs[Long]("shard"))
      val a = acc(key)
      assert(r.getAs[Long]("n_docs") == a.n, s"$key n_docs")
      assert(r.getAs[Long]("n_tokens") == a.nt, s"$key n_tokens")
      assert(r.getAs[Long]("total_chars") == a.ch, s"$key total_chars")
      assert(r.getAs[Long]("min_doc_id") == a.mn && r.getAs[Long]("max_doc_id") == a.mx)
      // exported cell is the exact sum folded mod 2^61-1 (BIGINT both
      // engines — the r12 portability contract)
      assert(r.getAs[Long]("content_fp") ==
        (a.fp mod BigInt(2305843009213693951L)).toLong, s"$key fingerprint")
    }
    assert(rows.map(_.getAs[Long]("n_docs")).sum == docs.length.toLong)
    assert(rows.map(_.getAs[String]("split")).distinct.sorted.sameElements(
      Array("test", "train", "val")), "a split is empty")
  }

  test("dq11: log2 buckets replay locally; bucket bounds bracket powers of two") {
    val rows = SparkEntry.queries("dq11_gap_histogram")(spark, sf0001).collect()
    assert(rows.nonEmpty)
    val ev = graft.sources.Tables.events(spark, sf0001)
      .selectExpr("user_id", "unix_micros(ts) AS us", "event_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val gaps = ev.groupBy(_._1).values.flatMap { es =>
      val s = es.sortBy(t => (t._2, t._3)).map(_._2)
      s.zip(s.tail).map { case (a, b) => b - a }
    }.toSeq
    assert(rows.map(_.getAs[Long]("n_gaps")).sum == gaps.length.toLong)
    rows.foreach { r =>
      val bk = r.getAs[Long]("bucket").toInt
      val inB = gaps.filter(g => java.lang.Long.toBinaryString(g).length == bk)
      assert(r.getAs[Long]("n_gaps") == inB.length.toLong, s"bucket $bk count")
      assert(r.getAs[Long]("min_gap_us") == inB.min && r.getAs[Long]("max_gap_us") == inB.max)
      // the bucket is a true log2 cell: [2^(b-1), 2^b) for b >= 2
      if (bk >= 2) {
        assert(r.getAs[Long]("min_gap_us") >= (1L << (bk - 1)))
        assert(r.getAs[Long]("max_gap_us") < (1L << bk))
      }
      assert(r.getAs[Long]("share_ppm") ==
        r.getAs[Long]("n_gaps") * 1000000L / gaps.length)
    }
  }

  test("q77: centered frame shrinks at series edges; stats are internally consistent") {
    val rows = SparkEntry.queries("q77_rolling_stats")(spark, sf0001).collect()
    assert(rows.nonEmpty)
    val byUser = rows.groupBy(_.getAs[Long]("user_id"))
    byUser.foreach { case (u, rs) =>
      val n = rs.length
      // min_periods semantics: the first/last rows see a shrunken frame
      val counts = rs.map(_.getAs[Long]("roll_n"))
      if (n >= 5) {
        assert(counts.min == 3L, s"user $u: edge frame should hold 3 rows")
        assert(counts.max == 5L, s"user $u: interior frame should hold 5 rows")
      }
      assert(counts.forall(c => c >= 1L && c <= 5L))
      rs.foreach { r =>
        val (mn, mx, sm, c) = (r.getAs[Long]("roll_min"), r.getAs[Long]("roll_max"),
          r.getAs[Long]("roll_sum"), r.getAs[Long]("roll_n"))
        val mean = r.getAs[Double]("roll_mean")
        assert(mean == sm.toDouble / c.toDouble)
        assert(mean >= mn.toDouble - 1e-9 && mean <= mx.toDouble + 1e-9)
        assert(mn <= r.getAs[Long]("cents") && r.getAs[Long]("cents") <= mx,
          "the row's own value must sit inside its centered frame")
      }
    }
  }

  test("q76: continuous percentiles equal a local sorted interpolation") {
    val rows = SparkEntry.queries("q76_percentile_cont")(spark, sf0001).collect()
    assert(rows.nonEmpty)
    val byFlag = graft.sources.Tables.lineitem(spark, sf0001)
      .selectExpr("l_returnflag", "CAST(round(l_extendedprice * 100) AS BIGINT) AS cents")
      .collect().map(r => (r.getString(0), r.getLong(1)))
      .groupBy(_._1).map { case (f, v) => f -> v.map(_._2).sorted }
    assert(rows.map(_.getAs[String]("flag")).distinct.sorted.sameElements(
      byFlag.keys.toArray.sorted))
    rows.foreach { r =>
      val vals = byFlag(r.getAs[String]("flag"))
      val n = vals.length.toLong
      assert(r.getAs[Long]("n") == n)
      val k = r.getAs[Long]("pct") / 25L
      val pos4 = (n - 1) * k
      val lo = (pos4 / 4).toInt
      val rem = pos4 % 4
      val hi = if (rem > 0) lo + 1 else lo
      assert(r.getAs[Long]("v_lo") == vals(lo))
      assert(r.getAs[Long]("v_hi") == vals(hi))
      val want = (vals(lo) * (4 - rem) + vals(hi) * rem).toDouble / 4.0
      assert(r.getAs[Double]("pctl_cents") == want,
        s"${r.getAs[String]("flag")} p${r.getAs[Long]("pct")}")
      // order-statistic sandwich
      assert(want >= vals(lo) && want <= vals(hi))
    }
  }

  test("q75: top paths equal a local sessionized replay") {
    val rows = SparkEntry.queries("q75_top_paths")(spark, sf0001).collect()
    assert(rows.nonEmpty && rows.length <= 10)
    val ev = graft.sources.Tables.events(spark, sf0001)
      .selectExpr("user_id", "event_type", "unix_micros(ts) AS us", "event_id")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    val triples = scala.collection.mutable.Map.empty[(String, String, String), Long]
    ev.groupBy(_._1).values.foreach { es =>
      val seq = es.sortBy(t => (t._3, t._4))
      var sid = 0L; var prev = Long.MinValue
      val withSid = seq.map { e =>
        if (prev == Long.MinValue || e._3 - prev >= 1800000000L) sid += 1
        prev = e._3
        (sid, e._2)
      }
      withSid.groupBy(_._1).values.foreach { ses =>
        val types = ses.map(_._2)
        types.sliding(3).filter(_.length == 3).foreach { w =>
          val k = (w(0), w(1), w(2))
          triples(k) = triples.getOrElse(k, 0L) + 1L
        }
      }
    }
    val want = triples.toSeq
      .sortBy { case ((a, b, c), n) => (-n, a, b, c) }.take(10)
    rows.zip(want).foreach { case (r, ((a, b, c), n)) =>
      assert(r.getAs[String]("step1") == a && r.getAs[String]("step2") == b &&
        r.getAs[String]("step3") == c, s"path order mismatch")
      assert(r.getAs[Long]("n") == n)
    }
  }

  test("q74: split points replay locally; ranges are contiguous and balanced") {
    val rows = SparkEntry.queries("q74_range_partition_histogram")(spark, sf0001)
      .collect().sortBy(_.getAs[Long]("range_id"))
    assert(rows.map(_.getAs[Long]("range_id")).toSeq == (0L to 7L))
    val vals = graft.sources.Tables.lineitem(spark, sf0001)
      .selectExpr("CAST(round(l_extendedprice) AS BIGINT) AS d")
      .collect().map(_.getLong(0)).sorted
    val tot = vals.length.toLong
    assert(rows.map(_.getAs[Long]("n_rows")).sum == tot)
    // local nearest-rank split points on the same dollar grain
    val hist = vals.groupBy(identity).map { case (v, c) => v -> c.length.toLong }
      .toSeq.sortBy(_._1)
    val cums = hist.scanLeft((0L, 0L)) { case ((_, c), (v, n)) => (v, c + n) }.drop(1)
    val bounds = (1 to 7).map(i => cums.find(_._2 * 8 >= tot * i).get._1)
    rows.foreach { r =>
      val rid = r.getAs[Long]("range_id").toInt
      val inRange = hist.filter { case (v, _) => bounds.count(v >= _) == rid }
      assert(r.getAs[Long]("n_rows") == inRange.map(_._2).sum, s"range $rid rows")
      assert(r.getAs[Long]("lo_dollars") == inRange.map(_._1).min, s"range $rid lo")
      assert(r.getAs[Long]("hi_dollars") == inRange.map(_._1).max, s"range $rid hi")
      assert(r.getAs[Long]("load_x_ideal_ppm") ==
        r.getAs[Long]("n_rows") * 8L * 1000000L / tot)
    }
    // contiguity + rough balance at the dollar grain
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(a.getAs[Long]("hi_dollars") < b.getAs[Long]("lo_dollars"))
    }
    rows.foreach { r =>
      val load = r.getAs[Long]("load_x_ideal_ppm")
      assert(load > 300000L && load < 3000000L,
        s"range ${r.getAs[Long]("range_id")} load $load wildly unbalanced")
    }
  }

  test("q73: cover-expansion WAU equals brute-force trailing-7-day distinct") {
    val rows = SparkEntry.queries("q73_rolling_active_users")(spark, sf0001).collect()
    assert(rows.nonEmpty)
    val act = graft.sources.Tables.events(spark, sf0001)
      .selectExpr("unix_micros(ts) div 86400000000 AS day", "user_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).distinct
    val mxd = act.map(_._1).max
    val days = rows.map(_.getAs[Long]("day"))
    assert(days.max == mxd && days.min == act.map(_._1).min)
    rows.foreach { r =>
      val d = r.getAs[Long]("day")
      val dau = act.filter(_._1 == d).map(_._2).distinct.length.toLong
      val wau = act.filter(a => a._1 <= d && a._1 >= d - 6)
        .map(_._2).distinct.length.toLong
      assert(r.getAs[Long]("dau") == dau, s"day $d dau")
      assert(r.getAs[Long]("wau_7d") == wau, s"day $d wau")
      assert(wau >= dau)
    }
  }

  test("q72: netted sweep-line equals brute-force interval stabbing") {
    val rows = SparkEntry.queries("q72_max_concurrency")(spark, sf0001).collect()
    assert(rows.nonEmpty)
    val tol = 1800000000L
    val byType = graft.sources.Tables.events(spark, sf0001)
      .selectExpr("event_type", "unix_micros(ts) AS us")
      .collect().map(r => (r.getString(0), r.getLong(1)))
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).sorted }
    assert(rows.map(_.getAs[String]("event_type")).toSet == byType.keySet)
    rows.foreach { r =>
      val t = r.getAs[String]("event_type")
      val starts = byType(t)
      assert(r.getAs[Long]("n_intervals") == starts.length.toLong)
      // brute force: concurrency at instant q = #intervals with
      // s <= q < s+tol; candidates are exactly the start instants
      def conc(q: Long): Int = starts.count(s => s <= q && q < s + tol)
      val brute = starts.map(s => s -> conc(s))
      val mx = brute.map(_._2).max
      assert(r.getAs[Long]("max_concurrent") == mx.toLong,
        s"$t: max ${r.getAs[Long]("max_concurrent")} vs brute $mx")
      // the first peak the sweep reports attains the max and is the
      // earliest START instant doing so (peaks begin at a start)
      val peak = r.getAs[Long]("first_peak_us")
      assert(conc(peak) == mx, s"$t: reported peak instant not at max")
      assert(brute.filter(_._2 == mx).map(_._1).min == peak,
        s"$t: an earlier instant already attains the max")
    }
  }

  test("r13 session-2 additions: no cartesian products in any plan") {
    for (q <- Seq("d42_dfcap_sweep", "ml3_knn_calibration",
        "e10_margin_mining", "m19_palette_quantization",
        "dq16_field_quality_drift", "t39_sentence_profile",
        "m20_audio_gain", "s21_session_outcomes",
        "t40_rule_cofailure", "gr17_knn_reciprocity",
        "e11_sq_bitwidth_sweep")) {
      val df = SparkEntry.queries(q)(spark, sf0001)
      df.collect()
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.contains("CartesianProduct"), s"$q: $plan")
    }
  }

  test("r14 additions: no cartesian products in any plan") {
    for (q <- Seq("p11_token_budget_pack", "m21_image_dhash",
        "m22_audio_silence_trim", "e12_recall_at_k")) {
      val df = SparkEntry.queries(q)(spark, sf0001)
      df.collect()
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.contains("CartesianProduct"), s"$q: $plan")
    }
  }

  test("e12: recall@k curve is monotone-sane and anchored to the truth set") {
    val rows = SparkEntry.queries("e12_recall_at_k")(spark, sf0001).collect()
      .sortBy(_.getAs[Long]("k"))
    assert(rows.map(_.getAs[Long]("k")).toSeq == Seq(1L, 3L, 5L))
    rows.foreach { r =>
      val k = r.getAs[Long]("k")
      assert(r.getAs[Long]("n_overlap") <= k * r.getAs[Long]("n_queries"))
      assert(r.getAs[Long]("recall_ppm") <= 1000000L)
    }
    // sanity anchor, not a quality gate (the DuckDB oracle pins the
    // exact value): at sf0.001 nprobe=2/16 visits ~12% of a 200-vector
    // corpus, which bills ~0.4 recall@1 honestly — the floor exists so
    // a bucketing bug that routes queries to empty/wrong cells (recall
    // ≈ 0) fails loudly
    assert(rows.head.getAs[Long]("recall_ppm") >= 250000L,
      s"recall@1 collapsed: ${rows.head.getAs[Long]("recall_ppm")} ppm")
  }

  test("m21: dHash groups recover brightness-shifted families") {
    val rows = SparkEntry.queries("m21_image_dhash")(spark, sf0001).collect()
    assert(rows.nonEmpty && rows.length <= 97) // ≤ one group per family
    // replay one family's hash from the paint formula (delta-free: the
    // uniform shift must cancel in every neighbor comparison)
    def hashOf(fam: Int): (Long, Long) = {
      def v(x: Int, y: Int) =
        60 + ((fam * 31 + x * x * 7 + y * 11 + x * y * (fam % 5)) % 136)
      var lo = 0L; var hi = 0L
      for (y <- 0 until 8; x <- 0 until 8) {
        val bit = if (v(x + 1, y) > v(x, y)) 1L else 0L
        val k = y * 8 + x
        if (k < 32) lo |= bit << k else hi |= bit << (k - 32)
      }
      (hi, lo)
    }
    val byHash = rows.map(r => (r.getAs[Long]("dhash_hi"),
      r.getAs[Long]("dhash_lo")) -> r).toMap
    // family of doc 0 is 0; its group must carry doc 0 and >1 variant
    // (sf0.001 has 500 docs ⇒ ~5 members per family, distinct deltas)
    val g0 = byHash(hashOf(0))
    assert(g0.getAs[Long]("min_doc_id") == 0L)
    assert(g0.getAs[Long]("n_images") > 1L)
    assert(g0.getAs[Long]("n_variants") > 1L,
      "group members must be different images, not byte re-encodes")
  }

  test("m22: trim bounds replay from the synth formula") {
    val rows = SparkEntry.queries("m22_audio_silence_trim")(spark, sf0001)
      .collect()
    assert(rows.nonEmpty)
    rows.take(100).foreach { r =>
      val id = r.getAs[Long]("doc_id")
      assert(r.getAs[Long]("lead_trim") == id % 37)
      assert(r.getAs[Long]("trail_trim") == id % 23)
      assert(r.getAs[Long]("n_span") == 64 + id % 64)
      assert(r.getAs[Long]("n_samples") ==
        id % 37 + id % 23 + 64 + id % 64)
      val e = (0 until (64 + id % 64).toInt)
        .map(t => 100L + ((id * 31L + t * 17L) % 199L)).sum
      assert(r.getAs[Long]("abs_sum") == e)
    }
  }

  test("p11: packing audit is internally consistent") {
    val rows = SparkEntry.queries("p11_token_budget_pack")(spark, sf0001)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val tok = r.getAs[Long]("n_tokens"); val seqs = r.getAs[Long]("n_seqs")
      assert(tok <= seqs * 2048L, "token mass exceeds sequence capacity")
      assert(tok + r.getAs[Long]("tail_waste") == seqs * 2048L,
        "waste must be exactly the unfilled capacity")
      assert(r.getAs[Long]("n_boundary_docs") <= r.getAs[Long]("n_docs"))
      assert(r.getAs[Long]("n_crossings") >= r.getAs[Long]("n_boundary_docs"))
      assert(r.getAs[Long]("fill_ppm") <= 1000000L)
    }
  }

  test("r14 session-2 additions: no cartesian products in any plan") {
    for (q <- Seq("gr18_rng_prune", "dq17_cusum_drift",
        "p12_span_corruption_plan", "d43_shingle_width_sweep",
        "m23_image_letterbox", "e13_binary_sign_hamming")) {
      val df = SparkEntry.queries(q)(spark, sf0001)
      df.collect()
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.contains("CartesianProduct"), s"$q: $plan")
    }
  }

  test("gr18: rank-1 edges are never occluded; kept counts are sane") {
    val rows = SparkEntry.queries("gr18_rng_prune")(spark, sf0001).collect()
      .sortBy(_.getAs[Long]("rn"))
    assert(rows.map(_.getAs[Long]("rn")).toSeq == Seq(1L, 2L, 3L, 4L, 5L))
    // rank 1 has no higher-ranked neighbor to occlude it
    assert(rows.head.getAs[Long]("kept_ppm") == 1000000L)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_kept") <= r.getAs[Long]("n_edges"))
      assert(r.getAs[Long]("kept_ppm") <= 1000000L)
    }
    // every query contributes one edge per rank (sf0.001 corpus >> 5)
    assert(rows.map(_.getAs[Long]("n_edges")).distinct.length == 1)
    // occlusion must actually fire somewhere or the audit is vacuous
    assert(rows.exists(_.getAs[Long]("n_kept") < rows.head.getAs[Long]("n_edges")),
      "no rank was ever pruned — occlusion rule inert")
  }

  test("p12: span plan replays from the md5 position lottery") {
    val rows = SparkEntry.queries("p12_span_corruption_plan")(spark, sf0001)
      .collect()
    assert(rows.nonEmpty)
    val md = java.security.MessageDigest.getInstance("MD5")
    def sel(id: Long, pos: Long): Boolean = {
      val h = md.digest(s"$id:$pos".getBytes("UTF-8"))
        .take(1).map("%02x".format(_)).mkString
      h < "27"
    }
    rows.take(150).foreach { r =>
      val id = r.getAs[Long]("doc_id"); val n = r.getAs[Long]("n_tokens")
      val picks = (0L until n).map(sel(id, _))
      val masked = picks.count(identity).toLong
      val runs = picks.foldLeft(List.empty[Int]) {
        case (acc, true) if acc.nonEmpty && acc.head > 0 => (acc.head + 1) :: acc.tail
        case (acc, true)  => 1 :: acc
        case (acc, false) => 0 :: acc
      }.filter(_ > 0)
      assert(r.getAs[Long]("n_masked") == masked, s"doc $id masked")
      assert(r.getAs[Long]("n_spans") == runs.length.toLong, s"doc $id spans")
      assert(r.getAs[Long]("max_span") ==
        (if (runs.isEmpty) 0L else runs.max.toLong), s"doc $id max span")
    }
    // corpus-level mask rate must sit near the 39/256 lottery odds
    val tot = rows.map(_.getAs[Long]("n_tokens")).sum
    val msk = rows.map(_.getAs[Long]("n_masked")).sum
    assert(msk * 1000L / tot > 100L && msk * 1000L / tot < 210L,
      s"mask rate off lottery odds: $msk/$tot")
  }

  test("dq17: closed prefix form equals the literal CUSUM recursion") {
    val rows = SparkEntry.queries("dq17_cusum_drift")(spark, sf0001).collect()
    assert(rows.nonEmpty)
    // replay the textbook recursion S_d = max(0, S_{d-1} + y_d) from the
    // raw events and compare against the window-closed-form output
    val daily = graft.sources.Tables.events(spark, sf0001)
      .selectExpr("event_type", "unix_micros(ts) div 86400000000 AS day")
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val d0 = daily.map(_._2).min; val d1 = daily.map(_._2).max
    val byType = daily.groupBy(_._1)
    rows.foreach { r =>
      val t = r.getAs[String]("event_type")
      val cnt = byType(t).groupBy(_._2).map { case (d, g) => d -> g.size.toLong }
      val xs = (d0 to d1).map(d => cnt.getOrElse(d, 0L))
      val ref14 = xs.take(14).sum
      var s = 0L; var mx = 0L; var alarms = 0L; var first = -1L
      for ((x, i) <- xs.drop(14).zipWithIndex) {
        s = math.max(0L, s + 14L * x - (ref14 + ref14 / 10))
        if (s > mx) mx = s
        if (s > ref14) { alarms += 1; if (first < 0) first = d0 + 14 + i }
      }
      assert(r.getAs[Long]("ref14") == ref14, s"$t ref14")
      assert(r.getAs[Long]("max_cusum") == mx, s"$t max_cusum")
      assert(r.getAs[Long]("n_alarm_days") == alarms, s"$t alarms")
      assert(r.getAs[Long]("first_alarm_day") == first, s"$t first alarm")
    }
  }

  test("d43: width arms are complete and dups never exceed candidates") {
    val rows = SparkEntry.queries("d43_shingle_width_sweep")(spark, sf0001)
      .collect().sortBy(_.getAs[Long]("w"))
    assert(rows.map(_.getAs[Long]("w")).toSeq == Seq(2L, 3L, 5L, 8L))
    rows.foreach { r =>
      assert(r.getAs[Long]("n_dups") <= r.getAs[Long]("n_candidates"))
      assert(r.getAs[Long]("n_shingles") > 0L)
    }
    // the knob must move: candidate volume at w=2 strictly above w=8
    // (short windows repeat across docs; 8-gram shingles rarely do)
    assert(rows.head.getAs[Long]("n_candidates") >
      rows.last.getAs[Long]("n_candidates"), "width knob inert")
  }

  test("e13: sign-Hamming stays inside [0, 64] and the curve is anchored") {
    val rows = SparkEntry.queries("e13_binary_sign_hamming")(spark, sf0001)
      .collect().sortBy(_.getAs[Long]("rn"))
    assert(rows.map(_.getAs[Long]("rn")).toSeq == Seq(1L, 2L, 3L, 4L, 5L))
    rows.foreach { r =>
      assert(r.getAs[Long]("ham_sum") <= 64L * r.getAs[Long]("n_edges"))
      assert(r.getAs[Long]("ham_ppm") <= 1000000L)
    }
    // neighbors must beat random sign agreement (~32/64 = 500000 ppm)
    // or the 1-bit pre-filter premise is dead and the audit is noise
    assert(rows.head.getAs[Long]("ham_ppm") < 500000L,
      s"rank-1 Hamming at chance: ${rows.head.getAs[Long]("ham_ppm")} ppm")
  }

  test("m23: letterbox detection replays from the paint formula") {
    val rows = SparkEntry.queries("m23_image_letterbox")(spark, sf0001)
      .collect()
    assert(rows.nonEmpty)
    rows.take(200).foreach { r =>
      val id = r.getAs[Long]("doc_id")
      val b = id % 4; val fam = id % 91
      assert(r.getAs[Long]("top_bars") == b, s"doc $id top")
      assert(r.getAs[Long]("bottom_bars") == b, s"doc $id bottom")
      assert(r.getAs[Long]("bar_val") == (if (b > 0) 12L else -1L), s"doc $id")
      val inner = (for (y <- b until (12 - b); x <- 0 until 16)
        yield 40L + ((x * 7 + y * 13 + fam) % 151)).sum
      assert(r.getAs[Long]("inner_px_sum") == inner, s"doc $id inner sum")
    }
  }

  test("m19: palette replays from the painted-pixel formula") {
    val rows = SparkEntry.queries("m19_palette_quantization")(spark, sf0001)
      .collect()
    assert(rows.nonEmpty)
    rows.take(200).foreach { r =>
      val id = r.getAs[Long]("doc_id")
      val w = 8 + (id % 16).toInt; val h = 8 + (id % 11).toInt
      val qcs = for (x <- 0 until w; y <- 0 until h) yield {
        val p = ((id * 2654435761L + x * 31L + y * 17L) & 0xffffffL).toInt
        (((p >> 16) & 255) >> 4 << 8) |
          (((p >> 8) & 255) >> 4 << 4) | ((p & 255) >> 4)
      }
      val counts = qcs.groupBy(identity).map { case (c, g) => (c, g.size) }
      val (tc, tn) = counts.toSeq.minBy { case (c, n) => (-n, c) }
      assert(r.getAs[Long]("width") == w.toLong, s"doc $id width")
      assert(r.getAs[Long]("height") == h.toLong, s"doc $id height")
      assert(r.getAs[Long]("n_colors") == counts.size.toLong, s"doc $id")
      assert(r.getAs[Long]("top_color") == tc.toLong, s"doc $id top")
      assert(r.getAs[Long]("top_count") == tn.toLong, s"doc $id count")
    }
  }

  // local exact-kNN (d5's fold order: left-to-right dot, norms
  // multiplied then divided) shared by the ml3/e10 replays
  private def localKnn(sf: String): (Map[Long, Long], Map[Long, Seq[(Long, Double)]]) = {
    val e = graft.sources.Tables.embeddings(spark, sf)
      .selectExpr("vec_id", "transform(embedding, x -> CAST(x AS DOUBLE)) AS v",
        "CAST(label AS LONG) AS label")
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1).toArray, r.getLong(2)))
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) { s += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      s / (math.sqrt(na) * math.sqrt(nb))
    }
    val labels = e.map(x => x._1 -> x._3).toMap
    val knn = e.map { case (id, v, _) =>
      id -> e.filter(_._1 != id).map(o => (o._1, cos(v, o._2)))
        .sortBy { case (n, c) => (-c, n) }.take(5).toSeq
    }.toMap
    (labels, knn)
  }

  test("ml3: calibration bins replay from a local exact-kNN vote") {
    val rows = SparkEntry.queries("ml3_knn_calibration")(spark, sf0001).collect()
    assert(rows.nonEmpty)
    val (labels, knn) = localKnn(sf0001)
    val binned = knn.toSeq.map { case (id, ns) =>
      val votes = ns.groupBy(p => labels(p._1)).map { case (l, g) => (l, g.size) }
      val (pl, pc) = votes.toSeq.minBy { case (l, n) => (-n, l) }
      (pc.toLong, pl == labels(id))
    }
    val byBin = binned.groupBy(_._1)
    assert(rows.map(_.getAs[Long]("conf_votes")).toSet == byBin.keySet)
    rows.foreach { r =>
      val b = r.getAs[Long]("conf_votes")
      val g = byBin(b)
      val acc = g.count(_._2).toLong * 1000000L / g.size
      assert(r.getAs[Long]("n_vecs") == g.size.toLong, s"bin $b")
      assert(r.getAs[Long]("n_correct") == g.count(_._2).toLong, s"bin $b")
      assert(r.getAs[Long]("acc_ppm") == acc, s"bin $b")
      assert(r.getAs[Long]("conf_ppm") == b * 200000L, s"bin $b")
      assert(r.getAs[Long]("gap_ppm") == acc - b * 200000L, s"bin $b")
    }
    // every vector lands in exactly one bin
    assert(rows.map(_.getAs[Long]("n_vecs")).sum == knn.size.toLong)
  }

  test("e10: margin mining replays from a local exact-kNN calibration") {
    val rows = SparkEntry.queries("e10_margin_mining")(spark, sf0001).collect()
    assert(rows.nonEmpty)
    val (_, knn) = localKnn(sf0001)
    val c6 = knn.map { case (id, ns) =>
      id -> ns.map { case (n, c) => (n, math.floor(c * 1e6).toLong) }
    }
    val cal = c6.map { case (id, ns) => id -> ns.map(_._2).sum }
    val mined = c6.toSeq.flatMap { case (src, ns) =>
      if (src % 2 == 0)
        ns.filter(_._1 % 2 == 1).map { case (dst, cc) =>
          (src, dst, cc, cc * 10 - (cal(src) + cal(dst)))
        }
      else Seq.empty
    }.filter(_._4 > 0)
      .sortBy { case (s, d, _, m) => (-m, s, d) }.take(100)
    assert(rows.length == mined.length)
    rows.zip(mined).foreach { case (r, (s, d, cc, m)) =>
      assert(r.getAs[Long]("src") == s && r.getAs[Long]("dst") == d,
        s"pair ($s,$d)")
      assert(r.getAs[Long]("cos6") == cc, s"pair ($s,$d) cos")
      assert(r.getAs[Long]("margin_u7") == m, s"pair ($s,$d) margin")
    }
  }

  test("dq16: drift report replays from a local era-conditioned fold") {
    val rows = SparkEntry.queries("dq16_field_quality_drift")(spark, sf0001)
      .collect()
    assert(rows.nonEmpty)
    val ev = graft.sources.Tables.events(spark, sf0001)
      .selectExpr("event_type", "unix_micros(ts) AS us", "props", "value")
      .collect().map(r => (r.getString(0), r.getLong(1),
        Option(r.getString(2)),
        if (r.isNullAt(3)) None else Some(r.getDouble(3))))
    val cut = (ev.map(_._2).min + ev.map(_._2).max) / 2
    val byType = ev.groupBy(_._1)
    assert(rows.map(_.getAs[String]("event_type")).toSet == byType.keySet)
    rows.foreach { r =>
      val g = byType(r.getAs[String]("event_type"))
      val (late, early) = g.partition(_._2 >= cut)
      def emp(x: (String, Long, Option[String], Option[Double])) =
        x._3.forall(_ == "")
      def np(x: (String, Long, Option[String], Option[Double])) =
        x._4.forall(_ <= 0.0)
      def ppm(n: Int, d: Int) = if (d == 0) 0L else n.toLong * 1000000L / d
      val (ee, le) = (ppm(early.count(emp), early.size), ppm(late.count(emp), late.size))
      val (en, ln) = (ppm(early.count(np), early.size), ppm(late.count(np), late.size))
      assert(r.getAs[Long]("n_early") == early.size.toLong)
      assert(r.getAs[Long]("n_late") == late.size.toLong)
      assert(r.getAs[Long]("empty_early_ppm") == ee)
      assert(r.getAs[Long]("empty_late_ppm") == le)
      assert(r.getAs[Long]("empty_drift_ppm") == le - ee)
      assert(r.getAs[Long]("nonpos_early_ppm") == en)
      assert(r.getAs[Long]("nonpos_late_ppm") == ln)
      assert(r.getAs[Long]("nonpos_drift_ppm") == ln - en)
    }
  }

  test("t39: sentence profile replays from a local regex fold") {
    val rows = SparkEntry.queries("t39_sentence_profile")(spark, sf0001).collect()
    assert(rows.nonEmpty)
    // Spark's trim() strips 0x20 only and split keeps trailing empties
    // (java limit -1) — replicate exactly, not with Scala's defaults
    def sparkTrim(s: String) = s.replaceAll("^ +| +$", "")
    val sents = graft.sources.Tables.documents(spark, sf0001)
      .selectExpr("lang", "text").collect()
      .filter(!_.isNullAt(1))
      .flatMap { r =>
        r.getString(1).split("[.!?]+", -1).map(sparkTrim).filter(_.nonEmpty)
          .map(s => (r.getString(0), s.split("\\s+", -1).length.toLong))
      }
    val agg = sents.groupBy { case (l, n) => (l, math.min(n / 8, 3L)) }
    assert(rows.length == agg.size)
    rows.foreach { r =>
      val k = (r.getAs[String]("lang"), r.getAs[Long]("tier"))
      val g = agg(k)
      assert(r.getAs[Long]("n_sentences") == g.length.toLong, s"$k")
      assert(r.getAs[Long]("sum_tokens") == g.map(_._2).sum, s"$k")
      assert(r.getAs[Long]("max_tokens") == g.map(_._2).max, s"$k")
    }
  }

  test("gr17: reciprocity curve replays from the local exact kNN") {
    val rows = SparkEntry.queries("gr17_knn_reciprocity")(spark, sf0001).collect()
    assert(rows.length == 5)
    val (_, knn) = localKnn(sf0001)
    val edgeSet = knn.toSeq.flatMap { case (id, ns) => ns.map(n => (id, n._1)) }.toSet
    val byRank = knn.toSeq.flatMap { case (id, ns) =>
      ns.zipWithIndex.map { case ((nbr, _), i) => (i + 1L, (id, nbr)) }
    }.groupBy(_._1)
    rows.foreach { r =>
      val rn = r.getAs[Long]("rn")
      val g = byRank(rn).map(_._2)
      val mut = g.count { case (a, b) => edgeSet.contains((b, a)) }.toLong
      assert(r.getAs[Long]("n_edges") == g.size.toLong, s"rn $rn edges")
      assert(r.getAs[Long]("n_mutual") == mut, s"rn $rn mutual")
      assert(r.getAs[Long]("mutual_ppm") == mut * 1000000L / g.size, s"rn $rn ppm")
    }
  }

  test("t40: co-failure matrix replays from local rule flags") {
    val rows = SparkEntry.queries("t40_rule_cofailure")(spark, sf0001).collect()
    assert(rows.length == 10)
    val flags = graft.sources.Tables.documents(spark, sf0001)
      .selectExpr("split(lower(text), '\\\\s+') AS toks").collect()
      .map { r =>
        val toks = r.getSeq[String](0)
        val n = toks.length.toDouble
        val sumLen = toks.map(_.length).sum.toDouble
        val topC = toks.groupBy(identity).values.map(_.size).max.toDouble
        val nDist = toks.distinct.length.toDouble
        val nStop = toks.count(t => t == "the" || t == "a").toDouble
        Map(
          "len" -> (n < 15.0 || n > 500.0),
          "wordlen" -> (sumLen / n < 3.0 || sumLen / n > 10.0),
          "toptoken" -> (topC / n > 0.15),
          "ttr" -> (nDist / n < 0.4),
          "stop" -> (nStop / n < 0.02))
      }
    rows.foreach { r =>
      val (a, b) = (r.getAs[String]("rule_i"), r.getAs[String]("rule_j"))
      val fi = flags.count(_(a)).toLong
      val fj = flags.count(_(b)).toLong
      val both = flags.count(f => f(a) && f(b)).toLong
      assert(r.getAs[Long]("n_fail_i") == fi, s"($a,$b) i")
      assert(r.getAs[Long]("n_fail_j") == fj, s"($a,$b) j")
      assert(r.getAs[Long]("n_both") == both, s"($a,$b) both")
      val denom = fi + fj - both
      assert(r.getAs[Long]("cofail_jaccard_ppm") ==
        (if (denom == 0) 0L else both * 1000000L / denom), s"($a,$b) ppm")
    }
  }

  test("e11: bit-width distortion replays from a local affine quantize") {
    val rows = SparkEntry.queries("e11_sq_bitwidth_sweep")(spark, sf0001).collect()
    assert(rows.length == 3)
    val cells = graft.sources.Tables.embeddings(spark, sf0001)
      .selectExpr("transform(embedding, x -> CAST(x AS DOUBLE)) AS v")
      .collect().map(_.getSeq[Double](0))
    val dims = cells.head.length
    val ranges = (0 until dims).map { d =>
      val col = cells.map(_(d)); (col.min, col.max)
    }
    rows.foreach { r =>
      val b = r.getAs[Long]("bits").toInt
      val lv = (1 << b) - 1
      var grid = 0L; var n = 0L
      cells.foreach { v =>
        (0 until dims).foreach { d =>
          val (mn, mx) = ranges(d)
          val err =
            if (mx > mn) {
              val q = math.round((v(d) - mn) * lv / (mx - mn)).toDouble
              v(d) - (mn + q * (mx - mn) / lv)
            } else 0.0
          grid += math.round(err * err * 1073741824.0)
          n += 1
        }
      }
      assert(r.getAs[Long]("levels") == lv.toLong, s"bits $b")
      assert(r.getAs[Long]("n_cells") == n, s"bits $b cells")
      assert(r.getAs[Long]("distortion_grid") == grid, s"bits $b grid")
    }
    // rate-distortion monotonicity: more bits never hurts
    val byBits = rows.map(r => r.getAs[Long]("bits") -> r.getAs[Long]("distortion_grid")).toMap
    assert(byBits(2L) >= byBits(4L) && byBits(4L) >= byBits(8L))
  }

  test("s21: session outcomes replay from a local gap fold") {
    val rows = SparkEntry.queries("s21_session_outcomes")(spark, sf0001).collect()
    assert(rows.nonEmpty)
    val ev = graft.sources.Tables.events(spark, sf0001)
      .selectExpr("user_id", "event_id", "event_type", "unix_micros(ts) AS us")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
    val per = ev.groupBy(_._1).toSeq.flatMap { case (_, g) =>
      val sorted = g.sortBy(x => (x._4, x._2))
      // islands: a gap >= 30 min starts a new session
      var sid = 0L; var prev = Long.MinValue
      sorted.map { x =>
        if (prev == Long.MinValue || x._4 - prev >= 1800000000L) sid += 1
        prev = x._4
        (sid, x._3, x._4)
      }.groupBy(_._1).values.map { ss =>
        (ss.map(_._3).min, ss.size.toLong,
          ss.exists(_._2 == "purchase"), ss.exists(_._2 == "error"))
      }
    }
    val byHour = per.groupBy { case (start, _, _, _) => (start / 3600000000L) % 24 }
    assert(rows.map(_.getAs[Long]("hour_of_day")).toSet == byHour.keySet)
    rows.foreach { r =>
      val g = byHour(r.getAs[Long]("hour_of_day"))
      val ab = g.count(!_._3).toLong
      val er = g.count(_._4).toLong
      assert(r.getAs[Long]("n_sessions") == g.size.toLong)
      assert(r.getAs[Long]("n_events") == g.map(_._2).sum)
      assert(r.getAs[Long]("n_abandoned") == ab)
      assert(r.getAs[Long]("abandoned_ppm") == ab * 1000000L / g.size)
      assert(r.getAs[Long]("n_error") == er)
      assert(r.getAs[Long]("error_ppm") == er * 1000000L / g.size)
    }
    // conservation: every event is in exactly one session
    assert(rows.map(_.getAs[Long]("n_events")).sum == ev.length.toLong)
  }

  test("m20: gain normalization replays from the synth formula") {
    val rows = SparkEntry.queries("m20_audio_gain")(spark, sf0001).collect()
    assert(rows.nonEmpty)
    rows.take(100).foreach { r =>
      val id = r.getAs[Long]("doc_id")
      val n = 256 + (id % 256).toInt
      val vs = (0 until n).map(i => ((id * 31 + i * 17) % 65536) - 32768)
      val peak = vs.map(math.abs).max
      val g256 = if (peak == 0) 256L else 24576L * 256L / peak
      val v2 = vs.map { v =>
        val mag = math.min(32767L, math.abs(v) * g256 / 256L)
        if (v < 0) -mag else mag
      }
      assert(r.getAs[Long]("n_samples") == n.toLong, s"doc $id n")
      assert(r.getAs[Long]("peak_in") == peak, s"doc $id peak")
      assert(r.getAs[Long]("gain_x256") == g256, s"doc $id gain")
      assert(r.getAs[Long]("peak_out") == v2.map(math.abs).max, s"doc $id out")
      assert(r.getAs[Long]("abs_sum_out") == v2.map(math.abs).sum, s"doc $id mass")
      // the normalization contract itself: output peak lands at the
      // 24576 target give-or-take one fixed-point step
      assert(math.abs(r.getAs[Long]("peak_out") - 24576L) <= peak / 256 + 1,
        s"doc $id target")
    }
  }

  test("d42: df-cap sweep replays from a local posting fold") {
    val rows = SparkEntry.queries("d42_dfcap_sweep")(spark, sf0001).collect()
    assert(rows.length == 4)
    val docs = graft.sources.Tables.documents(spark, sf0001)
      .selectExpr("doc_id", "split(lower(text), '\\\\s+') AS toks")
      .collect().map(r => (r.getLong(0), r.getSeq[String](1)))
      .filter(_._2.length >= 3)
    val sh: Seq[(Long, String)] = docs.flatMap { case (id, toks) =>
      toks.sliding(3).map(w => id -> w.mkString(" ")).toSeq.distinct
    }
    val df = sh.groupBy(_._2).map { case (g, s) => g -> s.size }
    val sets = sh.groupBy(_._1).map { case (id, s) => id -> s.map(_._2).toSet }
    // pairs reachable at cap 128, keyed by cheapest shared shingle df;
    // corpus-level df, pair universe = the deterministic 1-in-4 sample
    val under = sh.filter(p => df(p._2) <= 128 && p._1 % 4 == 0)
    val mdf = under.groupBy(_._2).toSeq.flatMap { case (g, ps) =>
      val ids = ps.map(_._1).sorted
      for (i <- ids.indices; j <- (i + 1) until ids.length)
        yield ((ids(i), ids(j)), df(g).toLong)
    }.groupBy(_._1).map { case (k, v) => k -> v.map(_._2).min }
    def jac(a: Long, b: Long): Double = {
      val (sa, sb) = (sets(a), sets(b))
      val i = (sa intersect sb).size
      i.toDouble / (sa.size + sb.size - i)
    }
    val dups = mdf.filter { case ((a, b), _) => jac(a, b) >= 0.5 }
    val caps = Seq(16L, 32L, 64L, 128L)
    val td = dups.size.toLong
    rows.sortBy(_.getAs[Long]("cap")).zip(caps).foreach { case (r, c) =>
      val nc = mdf.values.count(_ <= c).toLong
      val nd = dups.values.count(_ <= c).toLong
      assert(r.getAs[Long]("cap") == c)
      assert(r.getAs[Long]("n_candidates") == nc, s"cap $c candidates")
      assert(r.getAs[Long]("n_dups") == nd, s"cap $c dups")
      assert(r.getAs[Long]("recall_ppm") ==
        (if (td == 0) 0L else nd * 1000000L / td), s"cap $c recall")
    }
  }
}
