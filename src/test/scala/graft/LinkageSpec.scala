package graft

import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Entity-resolution family: blocking soundness, survivorship rules,
  * and local brute-force replays of the blocked fuzzy joins. */
class LinkageSpec extends SparkTestBase {

  private def lev(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1)((i, j) =>
      if (i == 0) j else if (j == 0) i else 0)
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }

  test("er1: blocked pairs equal a local all-pairs replay within blocks") {
    val rows = SparkEntry.queries("er1_blocked_name_linkage")(spark, sf0001)
      .collect()
    assert(rows.nonEmpty)
    val dict = Tables.part(spark, sf0001)
      .groupBy(col("p_name")).agg(count(lit(1)).as("cnt"))
      .collect().map(r => r.getString(0) -> r.getLong(1))
    val byNoun = dict.groupBy(_._1.split(" ")(1))
    val expected = byNoun.map { case (noun, names) =>
      val pairs = for {
        (a, ca) <- names; (b, cb) <- names
        if a < b && lev(a, b) <= 3
      } yield (lev(a, b), ca * cb)
      noun -> pairs
    }.filter(_._2.nonEmpty)
    assert(rows.map(_.getAs[String]("noun")).toSet == expected.keySet)
    rows.foreach { r =>
      val e = expected(r.getAs[String]("noun"))
      assert(r.getAs[Long]("n_pairs") == e.size.toLong)
      assert(r.getAs[Int]("min_dist") == e.map(_._1).min)
      assert(r.getAs[Long]("sum_dist") == e.map(_._1.toLong).sum)
      assert(r.getAs[Long]("pair_mass") == e.map(_._2).sum)
    }
  }

  test("er2: survivorship rules replay row-by-row") {
    val rows = SparkEntry.queries("er2_survivorship_merge")(spark, sf0001)
      .collect()
    val parts = Tables.part(spark, sf0001)
      .select("p_name", "p_partkey", "p_brand", "p_type", "p_retailprice", "p_size")
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2), r.getString(3),
        r.getDouble(4), r.getInt(5)))
    val byName = parts.groupBy(_._1)
    assert(rows.length == byName.size)
    rows.foreach { r =>
      val g = byName(r.getAs[String]("name"))
      assert(r.getAs[Long]("golden_key") == g.map(_._2).min)
      assert(r.getAs[Long]("n_records") == g.length.toLong)
      assert(r.getAs[Long]("n_brands") == g.map(_._3).distinct.length.toLong)
      // argmax: highest price, ties -> lowest partkey
      val surv = g.maxBy(x => (x._5, -x._2))
      assert(r.getAs[String]("surviving_brand") == surv._3)
      // majority vote, ties -> lexicographic smallest
      val vote = g.groupBy(_._4).toSeq.map { case (t, xs) => (xs.length, t) }
      val maj = vote.sortBy { case (n, t) => (-n, t) }.head._2
      assert(r.getAs[String]("majority_type") == maj)
      assert(r.getAs[Double]("max_price") == g.map(_._5).max)
      assert(r.getAs[Long]("total_size") == g.map(_._6.toLong).sum)
    }
  }

  test("er3: dual blocking is SOUND — equals unblocked all-pairs lev<=1") {
    val rows = SparkEntry.queries("er3_vocab_reconcile")(spark, sf0001)
      .collect()
    val docTok = Tables.documents(spark, sf0001)
      .select(explode(split(lower(col("text")), "\\s+")).as("t"))
      .where(length(col("t")) >= 2)
      .groupBy("t").agg(count(lit(1)).as("f"))
      .collect().map(r => r.getString(0) -> r.getLong(1))
    val partTok = Tables.part(spark, sf0001)
      .select(explode(split(col("p_name"), " ")).as("t"))
      .where(length(col("t")) >= 2).distinct()
      .collect().map(_.getString(0))
    assert(rows.map(_.getAs[String]("ptok")).toSet == partTok.toSet,
      "one row per part token, zero-match rows included")
    rows.foreach { r =>
      val p = r.getAs[String]("ptok")
      // UNBLOCKED brute force — proves the first-char/last-char union
      // blocking lost nothing at lev<=1
      val m = docTok.filter { case (d, _) => lev(p, d) <= 1 }
      assert(r.getAs[Long]("n_exact") == m.count { case (d, _) => d == p }.toLong)
      assert(r.getAs[Long]("n_near") == m.count { case (d, _) => d != p }.toLong)
      assert(r.getAs[Long]("mass_matched") == m.map(_._2).sum)
    }
  }

  test("er3 blocking lemma: lev<=1 strings (len>=2) share first or last char") {
    // property over the FULL cross product of 'abcd'-alphabet strings of
    // length 2..4 (4^2+4^3+4^4 = 336) — not just distinct-character
    // permutations, so repeated-letter cases ('aa'/'ab', 'aba'/'ba')
    // exercise the lemma's whole claimed domain
    val alpha = "abcd".toSeq.map(_.toString)
    def words(n: Int): Seq[String] =
      if (n == 0) Seq("") else for (w <- words(n - 1); c <- alpha) yield w + c
    val all = (2 to 4).flatMap(words)
    for (a <- all; b <- all if a != b && lev(a, b) <= 1)
      assert(a.head == b.head || a.last == b.last, s"counterexample: $a / $b")
  }
}
