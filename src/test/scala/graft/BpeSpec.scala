package graft

import org.apache.spark.sql.Row

import graft.queries.LlmPipeline

/** Unit semantics for the distributed BPE trainer (t18): greedy
  * left-to-right merge parity, frequency weighting, and the
  * (cnt DESC, lhs ASC, rhs ASC) tie rule — each against hand-computed
  * merge tables on corpora small enough to verify on paper. */
class BpeSpec extends SparkTestBase {
  import spark.implicits._

  private def train(texts: Seq[String], steps: Int): Seq[(Int, String, String, Long)] =
    LlmPipeline.bpeTrain(texts.toDF("text"), steps)
      .collect().toSeq.map {
        case Row(step: Int, l: String, r: String, c: Long) => (step, l, r, c)
      }

  test("greedy non-overlapping merge: 'aaaa' yields (a,a)x3 then (aa,aa)x1") {
    // naive overlapping counting would see (aa,a)/(a,aa) pairs after
    // step 1 instead of (aa,aa) — this pins the [aa,aa] segmentation
    assert(train(Seq("aaaa"), 2) ==
      Seq((1, "a", "a", 3L), (2, "aa", "aa", 1L)))
  }

  test("frequency weighting and lhs-asc tie-break on 'the the cat'") {
    // step 1: th=2 he=2 ca=1 at=1 — tie between (t,h) and (h,e) breaks
    // to the lexicographically smaller lhs 'h'; step 2 merges t+he;
    // step 3 ties (c,a)/(a,t) -> (a,t)
    assert(train(Seq("the the cat"), 3) ==
      Seq((1, "h", "e", 2L), (2, "t", "he", 2L), (3, "a", "t", 1L)))
  }

  test("word-boundary isolation: pairs never span words") {
    // 'ab' + 'ba': pairs are only (a,b) and (b,a), each cnt 1; the
    // cross-word 'b a' junction must not count. Tie-break picks (a,b).
    assert(train(Seq("ab ba"), 1) == Seq((1, "a", "b", 1L)))
  }

  test("merged symbols participate in later pair statistics") {
    // 'abab abab': step 1 (a,b) cnt 4 (two per word, two words);
    // step 2 (ab,ab) cnt 2
    assert(train(Seq("abab abab"), 2) ==
      Seq((1, "a", "b", 4L), (2, "ab", "ab", 2L)))
  }

  test("steps beyond pair exhaustion emit no further merge rows") {
    // single two-char word: one merge exists; extra steps add nothing
    assert(train(Seq("ab"), 3) == Seq((1, "a", "b", 1L)))
  }

  test("pair exhaustion leaves the symbol table intact (not empty)") {
    // regression: an empty rule frame once crossJoined the symbol table
    // down to zero rows, so bpeSegment after exhaustion returned nothing
    // and tokenization dropped every document
    val counts = LlmPipeline.bpeSegment(Seq("ab").toDF("text"), 3)
      .groupBy($"word").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts == Map("ab" -> 1L))
  }

  test("random corpora match an in-memory reference BPE trainer") {
    // adversarial check of the windows-only greedy-merge formulation
    // (islands + rank parity) against a direct sequential scan
    def refBpe(texts: Seq[String], steps: Int): Seq[(Int, String, String, Long)] = {
      val freq = texts.flatMap(_.split("\\s+")).filter(_.nonEmpty)
        .groupBy(identity).view.mapValues(_.size.toLong).toMap
      var syms: Map[String, Vector[String]] =
        freq.keys.map(w => w -> w.map(_.toString).toVector).toMap
      val rules = Seq.newBuilder[(Int, String, String, Long)]
      for (k <- 1 to steps) {
        val counts = scala.collection.mutable.Map.empty[(String, String), Long]
        syms.foreach { case (w, ss) =>
          ss.indices.dropRight(1).foreach { i =>
            val p = (ss(i), ss(i + 1))
            counts(p) = counts.getOrElse(p, 0L) + freq(w)
          }
        }
        if (counts.nonEmpty) {
          val ((l, r), c) = counts.toSeq.minBy { case ((a, b), n) => (-n, a, b) }
          rules += ((k, l, r, c))
          syms = syms.map { case (w, ss) =>
            val out = Vector.newBuilder[String]
            var i = 0
            while (i < ss.length) {
              if (i + 1 < ss.length && ss(i) == l && ss(i + 1) == r) {
                out += l + r; i += 2
              } else { out += ss(i); i += 1 }
            }
            w -> out.result()
          }
        }
      }
      rules.result()
    }
    for (seed <- Seq(7, 23, 101)) {
      val rnd = new scala.util.Random(seed)
      val corpus = Seq.fill(2)(
        Seq.fill(12)(Seq.fill(1 + rnd.nextInt(6))(
          ('a' + rnd.nextInt(3)).toChar).mkString).mkString(" "))
      assert(train(corpus, 4) == refBpe(corpus, 4), s"seed $seed: $corpus")
    }
  }

  test("bpeSegment: merged vocab symbol counts drive tokenization (t19)") {
    // 'ab ab cd': step 1 merges (a,b) [cnt 2 beats (c,d) cnt 1], so
    // 'ab' segments to one symbol and 'cd' stays two
    val counts = LlmPipeline.bpeSegment(Seq("ab ab cd").toDF("text"), 1)
      .groupBy($"word").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts == Map("ab" -> 1L, "cd" -> 2L))
  }

  test("b3: survival mass is consistent with the artifacts; one row per rule") {
    val dir = "/root/testdata/sf0.001"
    val rows = graft.SparkEntry.queries("b3_bpe_rule_survival")(spark, dir)
      .collect().sortBy(_.getAs[Int]("step"))
    assert(rows.map(_.getAs[Int]("step").toLong).toSeq == (1L to rows.length),
      "one row per trained step, in order")
    assert(rows.nonEmpty)
    // replay against the corpus: a rule's surviving words are exactly
    // the distinct words whose FINAL tokenization (t19's word->syms
    // view) contains the merged symbol
    val docs = graft.sources.Tables.documents(spark, dir)
      .selectExpr("explode(split(lower(text), '\\\\s+')) AS word")
      .where("length(word) >= 1").collect().map(_.getString(0))
    val occ = docs.groupBy(identity).map { case (w, v) => w -> v.length.toLong }
    val tot = docs.length.toLong
    val symsByWord = graft.queries.LlmPipeline
      .bpeSegment(graft.sources.Tables.documents(spark, dir), 5)
      .groupBy(org.apache.spark.sql.functions.col("word"))
      .agg(org.apache.spark.sql.functions.collect_set(
        org.apache.spark.sql.functions.col("sym")).as("ss"))
      .collect().map(r => r.getAs[String]("word") -> r.getSeq[String](1).toSet)
      .toMap
    rows.foreach { r =>
      val msym = r.getAs[String]("msym")
      assert(msym.length >= 2, "merged symbol must be a real merge")
      val words = symsByWord.filter(_._2.contains(msym)).keys.toSeq
      assert(r.getAs[Long]("n_words_surviving") == words.length.toLong,
        s"step ${r.getAs[Int]("step")} words")
      assert(r.getAs[Long]("occ_surviving") == words.map(occ).sum,
        s"step ${r.getAs[Int]("step")} occ")
      assert(r.getAs[Long]("surv_ppm") ==
        r.getAs[Long]("occ_surviving") * 1000000L / tot)
      assert(r.getAs[Long]("train_cnt") > 0L)
    }
  }
}
