package graft

import org.apache.spark.sql.functions._

import graft.functions.DistinctBigrams

/** DistinctBigrams must agree exactly with the HOF formulation it
  * replaced (transform+array_distinct), which the DuckDB oracle mirrors. */
class TextKernelSpec extends SparkTestBase {

  test("kernel matches the transform+array_distinct formulation on random docs") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    val words = Vector("a", "b", "spark", "join", "the", "x")
    val docs = (0 until 200).map { i =>
      (i.toLong, Seq.fill(rnd.nextInt(30))(words(rnd.nextInt(words.size))).mkString(" "))
    } :+ ((200L, "one")) :+ ((201L, "")) :+ ((202L, "a a a a a a"))
    val df = docs.toDF("id", "text")
      .select($"id", split(lower($"text"), "\\s+").as("toks"))
    // equality on the >=2-token population (what p1/t7 filter on; below
    // 2 tokens the HOF "bigram" degenerates to a 1-token slice)
    val strict = df.filter(size($"toks") >= 2).select(
        DistinctBigrams($"toks").as("kernel"),
        size(array_distinct(expr(
          "transform(sequence(0, size(toks)-2), i -> concat_ws(' ', slice(toks, i+1, 2)))")))
          .cast("long").as("hof"))
      .collect()
    assert(strict.nonEmpty)
    strict.foreach(r => assert(r.getLong(0) === r.getLong(1), r))
  }

  test("degenerate inputs: empty and single-token arrays count zero") {
    import spark.implicits._
    val df = Seq(Seq.empty[String], Seq("only")).toDF("toks")
    val out = df.select(DistinctBigrams($"toks")).collect().map(_.getLong(0))
    assert(out.toSeq === Seq(0L, 0L))
  }

  test("all-identical bigrams count once") {
    import spark.implicits._
    val df = Seq(Seq("a", "a", "a", "a")).toDF("toks")
    assert(df.select(DistinctBigrams($"toks")).head().getLong(0) === 1L)
  }

  test("CountMin sketch: estimates dominate true counts and merge across partitions") {
    import spark.implicits._
    val (d, w) = (4, 64)
    val rnd = new scala.util.Random(7)
    val words = Vector("a", "b", "c", "spark", "join", "the", "x", "heavy")
    val toks = Seq.fill(5000)(words(rnd.nextInt(words.size))) ++ Seq.fill(2000)("heavy")
    // 16 partitions force real partial-buffer merges at the exchange
    val df = toks.toDF("t").repartition(16)
    def bucket(j: String) =
      s"CAST(CAST(conv(substr(md5(concat($j, ':', t)), 1, 8), 16, 10) AS BIGINT) % $w AS INT)"
    val sketch = df
      .select(expr(s"transform(sequence(0, ${d - 1}), j -> ${bucket("CAST(j AS STRING)")})").as("bs"))
      .agg(graft.functions.CountMin($"bs", d, w).as("cms"))
    val est = df.distinct()
      .crossJoin(broadcast(sketch))
      .select($"t", array_min(expr(
        s"transform(sequence(0, ${d - 1}), j -> element_at(cms, j*$w + ${bucket("CAST(j AS STRING)")} + 1))"))
        .as("est"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val truth = toks.groupBy(identity).view.mapValues(_.size.toLong).toMap
    words.foreach { t =>
      assert(est(t) >= truth(t), s"CMS must never underestimate: $t ${est(t)} < ${truth(t)}")
    }
    // total mass is conserved per sketch row: sum of any row == stream size
    val row0 = sketch.select(expr(s"aggregate(slice(cms, 1, $w), 0L, (a, x) -> a + x)"))
      .head().getLong(0)
    assert(row0 == toks.size.toLong)
  }

  test("t29: Gopher n-gram repetition fractions equal a local replay") {
    val out = SparkEntry.queries("t29_gopher_ngram_repetition")(spark, sf0001)
      .collect()
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1))).toMap
    assert(out.length == docs.size, s"one row per doc: ${out.length} vs ${docs.size}")
    out.foreach { r =>
      val (id, text) = (r.getLong(0), docs(r.getLong(0)))
      val toks = text.toLowerCase.split("\\s+").toSeq
      val nc = text.length.toLong
      def topRepChars(n: Int): Long = {
        val grams = toks.sliding(n).map(_.mkString(" ")).toSeq
        val (g, tf) = grams.groupBy(identity).view.mapValues(_.size)
          .toSeq.minBy { case (g0, c) => (-c, g0) }
        tf.toLong * g.length
      }
      val (rc2, rc3, rc4) = (topRepChars(2), topRepChars(3), topRepChars(4))
      val l5 = toks.sliding(5).map(_.mkString(" ")).toSeq
      val (tot5, dis5) = (l5.size.toLong, l5.distinct.size.toLong)
      assert(r.getDouble(1) == rc2.toDouble / nc, s"doc $id top2")
      assert(r.getDouble(2) == rc3.toDouble / nc, s"doc $id top3")
      assert(r.getDouble(3) == rc4.toDouble / nc, s"doc $id top4")
      assert(r.getDouble(4) == (tot5 - dis5).toDouble / tot5, s"doc $id dup5")
      val keep = rc2 * 5 <= nc && rc3 * 50 <= nc * 9 && rc4 * 25 <= nc * 4 &&
        (tot5 - dis5) * 20 <= tot5 * 3
      assert(r.getBoolean(5) == keep, s"doc $id keep")
    }
    // the gate is non-vacuous on the fixture: both verdicts occur at
    // sf0.01+ (sf0.001 may be single-sided; assert the fractions are
    // non-degenerate instead)
    assert(out.exists(_.getDouble(1) > 0.0), "top2_frac all zero")
  }

  test("t34: coverage replays from local term counts; informative and monotone") {
    val dir = "/root/testdata/sf0.001"
    val rows = graft.SparkEntry.queries("t34_vocab_coverage")(spark, dir)
      .collect().sortBy(_.getAs[Long]("k"))
    assert(rows.map(_.getAs[Long]("k")).toSeq == Seq(5L, 10L, 20L, 1000L))
    val tf = graft.sources.Tables.documents(spark, dir)
      .selectExpr("explode(split(lower(text), '\\\\s+')) AS term")
      .where("length(term) >= 1").collect().map(_.getString(0))
      .groupBy(identity).map { case (t, v) => t -> v.length.toLong }
    val ranked = tf.toSeq.sortBy { case (t, c) => (-c, t) }
    val total = tf.values.sum
    rows.foreach { r =>
      val k = r.getAs[Long]("k").toInt
      assert(r.getAs[Long]("n_vocab") == tf.size.toLong)
      assert(r.getAs[Long]("total_tokens") == total)
      val covered = ranked.take(k).map(_._2).sum
      assert(r.getAs[Long]("covered_tokens") == covered, s"k=$k covered")
      assert(r.getAs[Long]("coverage_ppm") == covered * 1000000L / total)
      assert(r.getAs[Long]("oov_ppm") == 1000000L - covered * 1000000L / total)
    }
    // non-vacuous: the smallest budget must NOT already cover everything
    // (the m15 lesson — a saturated table proves nothing), and coverage
    // must be monotone in k with the big budget fully saturated
    assert(rows.head.getAs[Long]("coverage_ppm") < 1000000L, "k=5 saturated")
    assert(rows.head.getAs[Long]("coverage_ppm") > 0L)
    val cov = rows.map(_.getAs[Long]("coverage_ppm"))
    assert(cov.zip(cov.tail).forall { case (a, b) => a <= b }, "not monotone")
    assert(rows.last.getAs[Long]("covered_tokens") == total, "k=1000 must saturate")
  }

  test("t35: per-language trigram profile equals a local replay") {
    val dir = "/root/testdata/sf0.001"
    val rows = graft.SparkEntry.queries("t35_char_trigram_profile")(spark, dir)
      .collect()
    assert(rows.nonEmpty)
    val local = graft.sources.Tables.documents(spark, dir)
      .selectExpr("lang", "regexp_replace(lower(text), '\\\\s+', ' ') AS t")
      .collect().map(r => (r.getString(0), r.getString(1)))
      .filter(_._2.length >= 3)
      .flatMap { case (l, t) => (0 to t.length - 3).map(i => (l, t.substring(i, i + 3))) }
    val counts = local.groupBy(identity).map { case (k, v) => k -> v.length.toLong }
    val tots = local.groupBy(_._1).map { case (l, v) => l -> v.length.toLong }
    rows.groupBy(_.getAs[String]("lang")).foreach { case (l, rs) =>
      val sorted = rs.sortBy(_.getAs[Long]("rk"))
      assert(sorted.map(_.getAs[Long]("rk")).toSeq == (1L to sorted.length))
      val want = counts.filter(_._1._1 == l).toSeq
        .sortBy { case ((_, g), c) => (-c, g) }.take(5)
      sorted.zip(want).foreach { case (r, ((_, g), c)) =>
        assert(r.getAs[String]("gram") == g, s"$l rank ${r.getAs[Long]("rk")} gram")
        assert(r.getAs[Long]("cnt") == c)
        assert(r.getAs[Long]("freq_ppm") == c * 1000000L / tots(l))
      }
    }
  }
}
