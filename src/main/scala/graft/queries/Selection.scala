package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VecSqDist
import graft.ops.Materialize
import graft.sources.Tables

/** Data-SELECTION operators — the "which rows are worth training on"
  * family that sits between dedup (d*) and mixture execution (p4):
  * weight-aware sampling with unbiased estimators, and geometric
  * coverage (coreset) selection over the embedding space.
  *
  * Both are deterministic end-to-end (hash-derived uniforms, first-by-id
  * seeds, id tie-breaks, IEEE-exact arithmetic in a fixed order), so the
  * ENTIRE pipeline is hash-gated by a DuckDB replay — no rows-only
  * escape hatch.
  */
object Selection {

  /** Sample size for d28 (and the τ index is sampleN+1). */
  private val sampleN = 100

  /** k for the k-center coreset. */
  private val kCenters = 8

  /** Hash-derived uniform in (0, 1]: the first 8 md5 hex digits of the
    * key as an integer v ∈ [0, 2³²), then (v+1)/2³². Pure integer
    * derivation + one exact-rounded division — bit-identical in any
    * IEEE-754 engine, and reproducible across runs/reshards (p4's
    * membership idiom, widened from a bucket test to a full uniform). */
  private def uniformSql(keyExpr: String): String =
    // CAST AS DOUBLE, not a `4294967296.0` literal: Spark parses that
    // literal as DECIMAL(11,1), silently turning the division into
    // scale-12 decimal arithmetic (u rounded at 1e-12 — enough to flip
    // the τ-rank ordering vs the oracle's double division)
    s"(CAST(conv(substr(md5($keyExpr), 1, 8), 16, 10) AS BIGINT) + 1) / CAST(4294967296 AS DOUBLE)"

  /** DuckDB equivalent of [[uniformSql]] (no `conv`; fold hex digits). */
  private def duckUniform(keyExpr: String): String =
    s"""(list_reduce(list_transform(range(8),
       |      d -> strpos('0123456789abcdef', substr(md5($keyExpr), d+1, 1)) - 1),
       |      (acc, v) -> acc*16 + v)::BIGINT + 1) / 4294967296.0""".stripMargin

  /** Hashed-feature bucket for sel2: the first 3 md5 hex digits of the
    * token as an integer ∈ [0, 4096) — the md5-derived idiom (p4's
    * membership hash, d10's gram keys) applied to DSIR's hashed n-gram
    * features. DuckDB side folds the same 3 hex digits. */
  private def duckBucket(keyExpr: String): String =
    s"""list_reduce(list_transform(range(3),
       |      dd -> strpos('0123456789abcdef', substr(md5($keyExpr), dd+1, 1)) - 1),
       |      (acc, v) -> acc*16 + v)::BIGINT""".stripMargin

  /** One k-center round's min-distance update: fold a ONE-ROW center
    * frame (`cv` column) into the corpus frame's running distance `d`.
    * Exposed for the plan audit in SelectionSpec: the center arrives by
    * broadcast (BroadcastNestedLoopJoin over one row), never a shuffle
    * or cartesian of the corpus. */
  private[graft] def kcenterUpdate(cur: DataFrame, center: DataFrame): DataFrame =
    cur.crossJoin(broadcast(center))
      .select(col("vec_id"), col("v"),
        least(col("d"), VecSqDist(col("v"), col("cv"))).as("d"))

  /** DuckDB squared-L2 with VecOps.sqDist's exact add order (left fold;
    * the implicit 0.0 seed is additively exact). */
  private def duckSq(a: String, b: String): String =
    s"list_reduce(list_transform(range(len($a)), i -> ($a[i+1]-$b[i+1])*($a[i+1]-$b[i+1])), (x, y) -> x + y)"

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // PRIORITY SAMPLING (Duffield–Lund–Thorup): a weighted sample of n
    // documents with an UNBIASED subset-sum estimator — the way a
    // pipeline takes a token-budget-aware sample whose aggregate
    // statistics still extrapolate to the full corpus. Weight = token
    // count (sampling ∝ training cost), priority q = w/u with a
    // hash-derived uniform, keep the n largest priorities, and each
    // kept document's estimator weight is max(w, τ) where τ is the
    // (n+1)-th priority — E[Σ est over sample] = Σ w exactly.
    // Scale shape: the top-(n+1) is TakeOrderedAndProject (per-partition
    // heaps, merge of n+1 rows — the corpus is never globally sorted),
    // and the windows run over the (n+1)-row survivor frame only.
    "d28_priority_sample" -> ((s, dir) => {
      import s.implicits._
      val pri = Tables.documents(s, dir)
        // row-universe contract (e1's posture): a NULL text would give
        // Spark size(NULL) = -1 (negative weight) but vanish from the
        // DuckDB ranking (len(NULL) = NULL) — exclude it in BOTH
        .filter($"text".isNotNull)
        .select($"doc_id",
          size(split(lower($"text"), "\\s+")).cast("double").as("w"),
          expr(uniformSql("CAST(doc_id AS STRING)")).as("u"))
        .withColumn("q", $"w" / $"u")
      val top = pri.orderBy($"q".desc, $"doc_id".asc).limit(sampleN + 1)
      val wOrd = Window.orderBy($"q".desc, $"doc_id".asc)
      val wAll = Window.partitionBy(lit(1))
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      top
        .withColumn("rn", row_number().over(wOrd))
        .withColumn("cnt", count(lit(1)).over(wAll))
        .withColumn("tau", min($"q").over(wAll))
        .filter($"rn" <= sampleN)
        .select($"doc_id", $"w",
          when($"cnt" === sampleN + 1, greatest($"w", $"tau"))
            .otherwise($"w").as("est"))
        .orderBy($"doc_id")
    }),

    // TOKEN-BUDGET GREEDY SELECTION: per language, admit documents in
    // (n_chars DESC, doc_id) order while the running token sum stays
    // inside a 20 000-token budget — the quota pass that turns "rank
    // the corpus by quality" into "this is what fits the training
    // budget, per language" (d16 keeps a COUNT per stratum; this keeps
    // a COST — the constraint training actually has). Deterministic
    // total order and integer cumulative sums, so the gate is exact.
    // Scale shape: one per-language window (the t9 packing posture —
    // partitioned by the stratum key, never a global sort) and a
    // map-side-combining per-language rollup; the budget comparison
    // prunes everything past the prefix before the aggregate.
    "sel3_token_budget" -> ((s, dir) => {
      import s.implicits._
      val d = graft.ops.Spread.fanout(Tables.documents(s, dir))
        .filter($"text".isNotNull)
        .select($"doc_id", $"lang", $"n_chars",
          size(split(lower($"text"), "\\s+")).cast("long").as("nt"))
      val w = Window.partitionBy($"lang").orderBy($"n_chars".desc, $"doc_id".asc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      d.withColumn("cum", sum($"nt").over(w))
        .filter($"cum" <= 20000L)
        .groupBy($"lang")
        .agg(count(lit(1)).as("n_docs_kept"),
          sum($"nt").as("tokens_kept"),
          max($"cum").as("budget_used"))
        .select($"lang", $"n_docs_kept", $"tokens_kept", $"budget_used",
          expr("tokens_kept * 1000000 div 20000").as("util_ppm"))
        .orderBy($"lang")
    }),

    // BUDGET→QUALITY FRONTIER: sel3 fills ONE budget; this sweeps the
    // budget axis (25/50/75% of each language's token mass) and reports
    // what each budget BUYS — kept docs/tokens and the quality floor
    // (minimum ttr admitted) — the curve a data lead reads to pick the
    // compute point before committing a full pass. Greedy by the same
    // integer quality key as sel4 (ttr_ppm DESC, doc_id ASC — a total
    // order, so the prefix is deterministic); admission is cum ≤
    // total·ppm/10⁶ on exact integers. Shape: ONE ranked-cumsum window
    // pass over the corpus projection; the 3-row budget table
    // broadcasts and each budget is a re-filter of the same cumsum —
    // never a re-sort.
    "sel5_budget_frontier" -> ((s, dir) => {
      import s.implicits._
      val d = graft.ops.Spread.fanout(Tables.documents(s, dir))
        .filter($"text".isNotNull)
        .select($"doc_id", $"lang", split(lower($"text"), "\\s+").as("toks"))
        .select($"doc_id", $"lang",
          size($"toks").cast("long").as("nt"),
          size(array_distinct($"toks")).cast("long").as("nd"))
        .withColumn("ttr_ppm", expr("nd * 1000000 div nt"))
      val w = Window.partitionBy($"lang").orderBy($"ttr_ppm".desc, $"doc_id".asc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val cum = d.withColumn("cum", sum($"nt").over(w))
        .withColumn("tot", sum($"nt").over(Window.partitionBy($"lang")))
      val budgets = Seq(250000L, 500000L, 750000L).toDF("budget_ppm")
      cum.crossJoin(broadcast(budgets))
        .filter($"cum" * 1000000L <= $"tot" * $"budget_ppm")
        .groupBy($"lang", $"budget_ppm")
        .agg(count(lit(1)).as("n_kept"), sum($"nt").as("tokens_kept"),
          min($"ttr_ppm").as("floor_ttr_ppm"))
        .orderBy($"lang", $"budget_ppm")
    }),

    // MIXTURE TEMPERATURE SWEEP — t13 fixes α=0.5; this is the tuning
    // table across the temperature axis (α ∈ {0.25, 0.5, 1.0}: flat →
    // proportional) a mixture owner reads before committing sampling
    // rates. Every α is a composition of CORRECTLY-ROUNDED primitives
    // (sqrt, sqrt∘sqrt, identity — pow() is NOT portable across libms,
    // which is why the grid sticks to square roots), the weighted terms
    // ride Num.fquant's dyadic grid, and each α-group normalizes by its
    // own exact DECIMAL(38,0) sum — t13's machinery with the window
    // partitioned by α instead of the constant. Shape: one source-level
    // aggregate melted ×3; everything downstream is |sources|·3 rows.
    "sel6_temperature_sweep" -> ((s, dir) => {
      import s.implicits._
      val n = Tables.documents(s, dir)
        .select($"source", size(split(lower($"text"), "\\s+")).cast("long").as("nt"))
        .groupBy($"source").agg(sum($"nt").as("n_tokens"))
      val melted = n.select($"source", $"n_tokens", expr(
        "stack(3, 25, CAST(n_tokens AS DOUBLE), 50, CAST(n_tokens AS DOUBLE), " +
          "100, CAST(n_tokens AS DOUBLE)) AS (alpha_pct, x)"))
      val powed = melted.withColumn("wraw",
        when($"alpha_pct" === 25, sqrt(sqrt($"x")))
          .when($"alpha_pct" === 50, sqrt($"x"))
          .otherwise($"x"))
      val q = powed.withColumn("sqq", graft.ops.Num.fquant($"wraw"))
      val w = Window.partitionBy($"alpha_pct")
      q.withColumn("weight", $"sqq".cast("double") /
          sum($"sqq".cast(org.apache.spark.sql.types.DecimalType(38, 0)))
            .over(w).cast("double"))
        .select($"alpha_pct".cast("long").as("alpha_pct"), $"source",
          $"n_tokens", $"weight")
        .orderBy($"alpha_pct", $"source")
    }),

    // MIXTURE ANNEALING SCHEDULE — the per-epoch companion to sel6's
    // per-α sweep: a 5-epoch linear interpolation from the NATURAL
    // source mixture (epoch 0: sample in proportion to token mass)
    // toward the UNIFORM mixture (epoch 4: every source equally),
    // the "rebalance toward rare/high-quality sources late in
    // training" schedule mixture owners commit to a run config. The
    // whole schedule is integer basis-point arithmetic — w_bp(e) =
    // ((4−e)·natural_bp + e·uniform_bp) div 4 — plus the planned
    // per-epoch token draw under a fixed 100k-token epoch budget, so
    // every cell is engine-invariant BIGINT (bp rounding is the
    // documented semantics, not drift). Shape: ONE source-level
    // aggregate; the totals row and the 5-row epoch spine broadcast
    // onto the |sources| frame — nothing corpus-sized moves after
    // the token count.
    "sel8_mixture_anneal" -> ((s, dir) => {
      import s.implicits._
      val n = Tables.documents(s, dir)
        .select($"source", size(split(lower($"text"), "\\s+")).cast("long").as("nt"))
        .groupBy($"source").agg(sum($"nt").as("n_tokens"))
      val tot = n.agg(sum($"n_tokens").as("tot"), count(lit(1)).as("k"))
      val epochs = s.range(5).select($"id".as("epoch"))
      n.crossJoin(broadcast(tot)).crossJoin(broadcast(epochs))
        .withColumn("natural_bp", expr("n_tokens * 10000 div tot"))
        .withColumn("uniform_bp", expr("10000 div k"))
        .withColumn("weight_bp",
          expr("((4 - epoch) * natural_bp + epoch * uniform_bp) div 4"))
        .withColumn("planned_tokens", expr("100000 * weight_bp div 10000"))
        .select($"epoch", $"source", $"n_tokens", $"natural_bp",
          $"uniform_bp", $"weight_bp", $"planned_tokens")
        .orderBy($"epoch", $"source")
    }),

    // GREEDY K-CENTER CORESET (farthest-first / Gonzalez): k documents'
    // embeddings that 2-approximate the optimal k-center cover — the
    // geometric "coverage" selection a pipeline uses to pick maximally
    // diverse exemplars (prototypes for inspection, seeds for active
    // learning) rather than frequency-weighted ones. Seed = min vec_id;
    // each round adds the point FARTHEST from the chosen set (tie: min
    // id) and folds the new center into a running min-distance column.
    // Scale shape per round: one broadcast of ONE center row over the
    // corpus (BroadcastNestedLoopJoin, k rows total ever broadcast), a
    // single-column least() update, and a TakeOrderedAndProject argmax
    // — the corpus is never reshuffled and never collected; the running
    // frame is checkpointed per round so round t+1 does not replay
    // round t (Lloyd's idiom from Clustering.centroids). Emitted dist
    // is the covering radius sequence: dist at round t = max over the
    // corpus of min-distance to the first t centers.
    "sel1_kcenter_coreset" -> ((s, dir) => {
      import s.implicits._
      val e = graft.ops.Spread.fanout(Tables.embeddings(s, dir))
        .select($"vec_id", expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("v"))
      val c0 = e.orderBy($"vec_id".asc).limit(1)
        .select($"vec_id".as("cid"), $"v".as("cv"), lit(0.0).as("cd"))
      var cur = Materialize(
        e.crossJoin(broadcast(c0.select($"cv")))
          .select($"vec_id", $"v", VecSqDist($"v", $"cv").as("d")))
      var rounds: Seq[DataFrame] =
        Seq(c0.select(lit(0).as("round"), $"cid".as("vec_id"), $"cd".as("dist")))
      for (t <- 1 until kCenters) {
        val ct = Materialize(
          cur.orderBy($"d".desc, $"vec_id".asc).limit(1)
            .select($"vec_id".as("cid"), $"v".as("cv"), $"d".as("cd")))
        rounds = rounds :+
          ct.select(lit(t).as("round"), $"cid".as("vec_id"), $"cd".as("dist"))
        if (t < kCenters - 1)
          cur = Materialize(kcenterUpdate(cur, ct.select($"cv")))
      }
      rounds.reduce(_ union _).orderBy($"round")
    }),

    // DSIR-style IMPORTANCE RESAMPLING (Xie et al. 2023, "Data Selection
    // for Language Models via Importance Resampling"): score every raw
    // document by how target-like its hashed-unigram feature profile is
    // — target = the corpus's benchmark/quality source src0 (d10/d12/t22's
    // convention), features = tokens hashed into 4096 md5 buckets, and
    // each bucket carries an add-one-smoothed target/raw frequency-ratio
    // score. EXACT-ARITHMETIC VARIANT: the per-bucket score is the
    // INTEGER ppm ratio ((cnt_t+1)·10⁶ div (cnt_r+1)) and a document's
    // score is the exact BIGINT sum over its token positions (DSIR's
    // log-ratio sum is not bit-portable across libm implementations;
    // the ratio-sum keeps the same "more target-mass ⇒ higher score"
    // monotonicity per feature and hash-gates end-to-end). The per-token
    // normalization w = score/n_tokens is ONE correctly-rounded division
    // of exact ints (score < 2⁵³ while max-doc-tokens × per-bucket ppm
    // ratio < 2⁵³ — at any realistic skew the ratio is ≤ 10⁶·target
    // bucket mass; the CAST(SUM AS BIGINT) on the oracle side overflows
    // loudly, Num.fsumSql's posture). Scale shape: bucket tables are
    // ≤ 4096 rows — the score table BROADCASTS to the token stream, the
    // only corpus-sized shuffles are the two map-side-combining bucket
    // counts and the per-doc score agg; top-100 is
    // TakeOrderedAndProject (per-partition heaps, no global sort).
    "sel2_dsir_importance" -> ((s, dir) => {
      import s.implicits._
      val docs = Tables.documents(s, dir)
        .filter($"text".isNotNull)
        .select($"doc_id", $"source",
          split(lower($"text"), "\\s+").as("toks"))
      def stream(df: DataFrame): DataFrame = df
        .select(col("doc_id"), explode(col("toks")).as("t"))
        .withColumn("b", conv(substring(md5(col("t")), 1, 3), 16, 10).cast("long"))
      val tgt = stream(docs.filter($"source" === "src0"))
        .groupBy($"b").agg(count(lit(1)).as("cnt_t"))
      // ONE pass over the raw token stream (opt r16): the old shape
      // re-ran the explode+md5 stream twice — once for the global
      // bucket counts, once for the per-doc scores. The (doc, bucket)
      // count frame is ≤ |docs|·4096 rows and serves both exactly:
      // cnt_r = Σ_doc c, n_tokens = Σ_b c, score = Σ_b c·s_b (the same
      // per-occurrence integer sum, grouped). Checkpointed because the
      // score table derives from it AND joins back onto it.
      val pb = graft.ops.Materialize(
        stream(docs.filter($"source" =!= "src0"))
          .groupBy($"doc_id", $"b").agg(count(lit(1)).as("c")))
      val rawCnt = pb.groupBy($"b").agg(sum($"c").as("cnt_r"))
      val scoreTbl = rawCnt.join(tgt, Seq("b"), "left")
        .select($"b",
          expr("((coalesce(cnt_t, 0L) + 1L) * 1000000L) div (cnt_r + 1L)").as("s_b"))
      val perDoc = pb.join(broadcast(scoreTbl), "b")
        .groupBy($"doc_id")
        .agg(sum($"c").as("n_tokens"), sum($"c" * $"s_b").as("score"))
        .withColumn("w", $"score".cast("double") / $"n_tokens")
      val top = perDoc.orderBy($"w".desc, $"doc_id".asc).limit(100)
      top.withColumn("rnk",
          row_number().over(Window.orderBy($"w".desc, $"doc_id".asc)))
        .select($"rnk", $"doc_id", $"n_tokens", $"score", $"w")
        .orderBy($"rnk")
    }),

    // CURRICULUM STAGING: order each source's documents by a quality
    // key and cut the ordering into 3 equal tranches — stage 1 is the
    // cleanest third a curriculum schedule trains first, stage 3 the
    // tail it anneals in late (or drops). The quality key is the
    // type-token ratio held on INTEGERS (distinct·10⁶ div total — no
    // float reaches the ordering or the gate) with doc_id as the total-
    // order tie-break, so NTILE is deterministic; the report is the
    // per-(source, stage) manifest a scheduler consumes: doc count,
    // token mass, and the tranche's ttr span. Scale shape: the ntile
    // window partitions by source — per-source ordering shuffles only
    // that source's (id, key) pairs, the full text never rides the
    // exchange; the stage manifest is a bounded |sources|·3-row frame.
    "sel4_curriculum_stages" -> ((s, dir) => {
      import s.implicits._
      val d = Tables.documents(s, dir)
        .filter($"text".isNotNull)
        .select($"doc_id", $"source", split(lower($"text"), "\\s+").as("toks"))
        .select($"doc_id", $"source",
          size($"toks").cast("long").as("nt"),
          size(array_distinct($"toks")).cast("long").as("nd"))
        .withColumn("ttr_ppm", expr("nd * 1000000 div nt"))
      val w = Window.partitionBy($"source")
        .orderBy($"ttr_ppm".desc, $"doc_id".asc)
      d.withColumn("stage", ntile(3).over(w))
        .groupBy($"source", $"stage")
        .agg(count(lit(1)).as("n_docs"), sum($"nt").as("total_tokens"),
          min($"ttr_ppm").as("min_ttr_ppm"), max($"ttr_ppm").as("max_ttr_ppm"))
        .select($"source", $"stage".cast("long").as("stage"), $"n_docs",
          $"total_tokens", $"min_ttr_ppm", $"max_ttr_ppm")
        .orderBy($"source", $"stage")
    }),

    // DEDUP-AWARE BUDGET FILL — the composition a real pipeline runs
    // and the one interaction sel3 alone can't show: filling a token
    // budget from the RAW corpus wastes budget on near-duplicate
    // copies, filling it from cc1's SURVIVORS admits deeper into the
    // unique corpus. Both fills ride ONE ranked-cumsum window (same
    // n_chars DESC, doc_id ASC greedy order as sel3): the dedup-aware
    // cumsum is a conditional sum over the same sort — no second
    // shuffle, no second sort. Per lang: kept docs/tokens under the
    // raw fill vs the dedup fill, plus the duplicate-doc mass the raw
    // fill admitted (the budget it burned on copies). Exact integers
    // throughout; loser set = cc1's non-representatives (edge-cover-
    // sized, broadcasts under AQE onto the corpus join).
    "sel7_dedup_aware_budget" -> ((s, dir) => {
      import s.implicits._
      val losers = graft.ops.ConnectedComponents
        .run(Graph.cachedEdges(s, dir, minShared = 5, maxDf = 100), "d1", "d2")
        .filter($"node" =!= $"label")
        .select($"node".as("doc_id"), lit(true).as("is_dup"))
      val d = graft.ops.Spread.fanout(Tables.documents(s, dir))
        .filter($"text".isNotNull)
        .select($"doc_id", $"lang", $"n_chars",
          size(split(lower($"text"), "\\s+")).cast("long").as("nt"))
        .join(losers, Seq("doc_id"), "left")
        .withColumn("is_dup", coalesce($"is_dup", lit(false)))
      val w = Window.partitionBy($"lang").orderBy($"n_chars".desc, $"doc_id".asc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val cum = d
        .withColumn("cum_raw", sum($"nt").over(w))
        .withColumn("cum_dedup", sum(when(!$"is_dup", $"nt").otherwise(0L)).over(w))
      cum.groupBy($"lang").agg(
          sum(when($"cum_raw" <= 20000L, 1L).otherwise(0L)).as("n_kept_raw"),
          sum(when($"cum_raw" <= 20000L, $"nt").otherwise(0L)).as("tokens_raw"),
          sum(when($"cum_raw" <= 20000L && $"is_dup", $"nt").otherwise(0L))
            .as("dup_tokens_in_raw"),
          sum(when(!$"is_dup" && $"cum_dedup" <= 20000L, 1L).otherwise(0L))
            .as("n_kept_dedup"),
          sum(when(!$"is_dup" && $"cum_dedup" <= 20000L, $"nt").otherwise(0L))
            .as("tokens_dedup"))
        .orderBy($"lang")
    }),
  )

  val oracleSql: Map[String, String] = Map(

    "sel3_token_budget" ->
      """WITH d AS (
        |  SELECT doc_id, lang, n_chars,
        |    CAST(len(string_split_regex(lower(text), '\s+')) AS BIGINT) AS nt
        |  FROM documents WHERE text IS NOT NULL
        |),
        |c AS (
        |  SELECT lang, nt,
        |    SUM(nt) OVER (PARTITION BY lang ORDER BY n_chars DESC, doc_id ASC
        |                  ROWS UNBOUNDED PRECEDING) AS cum
        |  FROM d
        |)
        |SELECT lang, COUNT(*) AS n_docs_kept,
        |  CAST(SUM(nt) AS BIGINT) AS tokens_kept,
        |  CAST(MAX(cum) AS BIGINT) AS budget_used,
        |  CAST(SUM(nt) AS BIGINT) * 1000000 // 20000 AS util_ppm
        |FROM c WHERE cum <= 20000
        |GROUP BY lang ORDER BY lang""".stripMargin,

    "d28_priority_sample" ->
      s"""WITH pri AS (
         |  SELECT doc_id,
         |    len(string_split_regex(lower(text), '\\s+'))::DOUBLE AS w,
         |    ${duckUniform("CAST(doc_id AS VARCHAR)")} AS u
         |  FROM documents WHERE text IS NOT NULL
         |),
         |qq AS (SELECT doc_id, w, w/u AS q FROM pri),
         |ranked AS (
         |  SELECT doc_id, w, q,
         |    ROW_NUMBER() OVER (ORDER BY q DESC, doc_id) AS rn
         |  FROM qq
         |),
         |top AS (SELECT * FROM ranked WHERE rn <= ${sampleN + 1}),
         |tstats AS (SELECT count(*) AS cnt, min(q) AS tau FROM top)
         |SELECT doc_id, w,
         |  CASE WHEN cnt = ${sampleN + 1} THEN greatest(w, tau) ELSE w END AS est
         |FROM top, tstats WHERE rn <= $sampleN ORDER BY doc_id""".stripMargin,

    "sel1_kcenter_coreset" -> {
      val sb = new StringBuilder
      sb ++= """WITH e AS (
               |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
               |  FROM embeddings
               |),
               |c0 AS (SELECT vec_id AS cid, v AS cv, 0.0 AS cd FROM e ORDER BY vec_id LIMIT 1),
               |""".stripMargin
      sb ++= s"d0 AS (SELECT e.vec_id, e.v, ${duckSq("e.v", "c0.cv")} AS d FROM e CROSS JOIN c0)"
      for (t <- 1 until kCenters) {
        sb ++= s",\nc$t AS (SELECT vec_id AS cid, v AS cv, d AS cd FROM d${t - 1} ORDER BY d DESC, vec_id LIMIT 1)"
        if (t < kCenters - 1)
          sb ++= s",\nd$t AS (SELECT p.vec_id, p.v, LEAST(p.d, ${duckSq("p.v", s"c$t.cv")}) AS d FROM d${t - 1} p CROSS JOIN c$t)"
      }
      sb ++= "\nSELECT 0 AS round, cid AS vec_id, cd AS dist FROM c0"
      for (t <- 1 until kCenters)
        sb ++= s"\nUNION ALL SELECT $t, cid, cd FROM c$t"
      sb ++= "\nORDER BY round"
      sb.toString
    },

    "sel2_dsir_importance" ->
      s"""WITH docs AS (
         |  SELECT doc_id, source, string_split_regex(lower(text), '\\s+') AS toks
         |  FROM documents WHERE text IS NOT NULL
         |),
         |tstream AS (
         |  SELECT ${duckBucket("t")} AS b
         |  FROM (SELECT unnest(toks) AS t FROM docs WHERE source = 'src0')
         |),
         |tgt AS (SELECT b, COUNT(*) AS cnt_t FROM tstream GROUP BY b),
         |rstream AS (
         |  SELECT doc_id, ${duckBucket("t")} AS b
         |  FROM (SELECT doc_id, unnest(toks) AS t FROM docs WHERE source <> 'src0')
         |),
         |rawc AS (SELECT b, COUNT(*) AS cnt_r FROM rstream GROUP BY b),
         |sc AS (
         |  SELECT r.b, ((COALESCE(t.cnt_t, 0) + 1) * 1000000) // (r.cnt_r + 1) AS s_b
         |  FROM rawc r LEFT JOIN tgt t USING (b)
         |),
         |perdoc AS (
         |  SELECT doc_id, COUNT(*) AS n_tokens, CAST(SUM(s_b) AS BIGINT) AS score
         |  FROM rstream JOIN sc USING (b) GROUP BY doc_id
         |),
         |wd AS (SELECT doc_id, n_tokens, score,
         |         CAST(score AS DOUBLE) / n_tokens AS w FROM perdoc),
         |ranked AS (
         |  SELECT *, ROW_NUMBER() OVER (ORDER BY w DESC, doc_id ASC) AS rnk FROM wd
         |)
         |SELECT rnk, doc_id, n_tokens, score, w
         |FROM ranked WHERE rnk <= 100 ORDER BY rnk""".stripMargin,

    // t13's rounding chain (sqq = round(w·2^30); HUGEINT→BIGINT→DOUBLE
    // for the group sum), window partitioned by α
    "sel6_temperature_sweep" ->
      """WITH n AS (
        |  SELECT source, SUM(len(string_split_regex(lower(text), '\s+'))) AS n_tokens
        |  FROM documents GROUP BY source
        |),
        |m AS (
        |  SELECT 25 AS alpha_pct, source, n_tokens,
        |    sqrt(sqrt(CAST(n_tokens AS DOUBLE))) AS wraw FROM n
        |  UNION ALL SELECT 50, source, n_tokens, sqrt(CAST(n_tokens AS DOUBLE)) FROM n
        |  UNION ALL SELECT 100, source, n_tokens, CAST(n_tokens AS DOUBLE) FROM n
        |),
        |s AS (
        |  SELECT alpha_pct, source, n_tokens,
        |    CAST(round(wraw * 1073741824) AS BIGINT) AS sqq
        |  FROM m
        |)
        |SELECT CAST(alpha_pct AS BIGINT) AS alpha_pct, source,
        |  CAST(n_tokens AS BIGINT) AS n_tokens,
        |  CAST(sqq AS DOUBLE) /
        |    CAST(CAST(SUM(sqq) OVER (PARTITION BY alpha_pct) AS BIGINT) AS DOUBLE) AS weight
        |FROM s ORDER BY alpha_pct, source""".stripMargin,

    // the same integer bp interpolation over the 5-epoch spine
    "sel8_mixture_anneal" ->
      """WITH n AS (
        |  SELECT source, SUM(len(string_split_regex(lower(text), '\s+'))) AS n_tokens
        |  FROM documents GROUP BY source
        |),
        |tot AS (SELECT SUM(n_tokens) AS tot, COUNT(*) AS k FROM n),
        |ep AS (SELECT unnest(range(5)) AS epoch),
        |b AS (
        |  SELECT epoch, source, n_tokens,
        |    n_tokens * 10000 // tot AS natural_bp,
        |    10000 // k AS uniform_bp
        |  FROM n CROSS JOIN tot CROSS JOIN ep
        |),
        |w AS (
        |  SELECT epoch, source, n_tokens, natural_bp, uniform_bp,
        |    ((4 - epoch) * natural_bp + epoch * uniform_bp) // 4 AS weight_bp
        |  FROM b
        |)
        |SELECT CAST(epoch AS BIGINT) AS epoch, source,
        |  CAST(n_tokens AS BIGINT) AS n_tokens,
        |  CAST(natural_bp AS BIGINT) AS natural_bp,
        |  CAST(uniform_bp AS BIGINT) AS uniform_bp,
        |  CAST(weight_bp AS BIGINT) AS weight_bp,
        |  CAST(100000 * weight_bp // 10000 AS BIGINT) AS planned_tokens
        |FROM w ORDER BY epoch, source""".stripMargin,

    // the same ranked cumsum; admission by integer cross-multiplication
    "sel5_budget_frontier" ->
      """WITH d AS (
        |  SELECT doc_id, lang, string_split_regex(lower(text), '\s+') AS toks
        |  FROM documents WHERE text IS NOT NULL
        |),
        |k AS (
        |  SELECT doc_id, lang,
        |    CAST(len(toks) AS BIGINT) AS nt,
        |    CAST(len(list_distinct(toks)) AS BIGINT) AS nd
        |  FROM d
        |),
        |q AS (SELECT doc_id, lang, nt, nd * 1000000 // nt AS ttr_ppm FROM k),
        |c AS (
        |  SELECT lang, nt, ttr_ppm,
        |    SUM(nt) OVER (PARTITION BY lang ORDER BY ttr_ppm DESC, doc_id ASC
        |                  ROWS UNBOUNDED PRECEDING) AS cum,
        |    SUM(nt) OVER (PARTITION BY lang) AS tot
        |  FROM q
        |),
        |b(budget_ppm) AS (VALUES (CAST(250000 AS BIGINT)),
        |                         (CAST(500000 AS BIGINT)),
        |                         (CAST(750000 AS BIGINT)))
        |SELECT lang, budget_ppm, CAST(COUNT(*) AS BIGINT) AS n_kept,
        |  CAST(SUM(nt) AS BIGINT) AS tokens_kept,
        |  CAST(MIN(ttr_ppm) AS BIGINT) AS floor_ttr_ppm
        |FROM c CROSS JOIN b
        |WHERE cum * 1000000 <= tot * budget_ppm
        |GROUP BY lang, budget_ppm
        |ORDER BY lang, budget_ppm""".stripMargin,

    // integer ttr key + NTILE over the same (key DESC, doc_id ASC)
    // total order — deterministic tranche cuts on both engines
    "sel4_curriculum_stages" ->
      """WITH d AS (
        |  SELECT doc_id, source,
        |    string_split_regex(lower(text), '\s+') AS toks
        |  FROM documents WHERE text IS NOT NULL
        |),
        |k AS (
        |  SELECT doc_id, source,
        |    CAST(len(toks) AS BIGINT) AS nt,
        |    CAST(len(list_distinct(toks)) AS BIGINT) AS nd
        |  FROM d
        |),
        |q AS (
        |  SELECT doc_id, source, nt, nd * 1000000 // nt AS ttr_ppm,
        |    NTILE(3) OVER (PARTITION BY source ORDER BY nd * 1000000 // nt DESC, doc_id ASC) AS stage
        |  FROM k
        |)
        |SELECT source, CAST(stage AS BIGINT) AS stage,
        |  CAST(COUNT(*) AS BIGINT) AS n_docs,
        |  CAST(SUM(nt) AS BIGINT) AS total_tokens,
        |  CAST(MIN(ttr_ppm) AS BIGINT) AS min_ttr_ppm,
        |  CAST(MAX(ttr_ppm) AS BIGINT) AS max_ttr_ppm
        |FROM q GROUP BY source, stage
        |ORDER BY source, stage""".stripMargin,

    // cc1's recursive transitive closure names the losers; the same
    // one-sort two-cumsum fill algebra on top
    "sel7_dedup_aware_budget" ->
      """WITH RECURSIVE docs AS (
        |  SELECT doc_id, string_split_regex(lower(text), '\s+') AS toks FROM documents
        |),
        |sh AS (
        |  SELECT DISTINCT doc_id,
        |    unnest(list_transform(range(len(toks)-2), i -> array_to_string(toks[i+1:i+3], ' '))) AS shingle
        |  FROM docs WHERE len(toks) >= 3
        |),
        |ok AS (SELECT shingle FROM sh GROUP BY shingle HAVING count(*) <= 100),
        |prs AS (
        |  SELECT a.doc_id AS d1, b.doc_id AS d2
        |  FROM sh a JOIN ok o ON a.shingle = o.shingle
        |  JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2 HAVING count(*) >= 5
        |),
        |edges AS (SELECT d1 AS a, d2 AS b FROM prs UNION SELECT d2, d1 FROM prs),
        |reach(node, lbl) AS (
        |  SELECT a, a FROM edges
        |  UNION
        |  SELECT e.a, r.lbl FROM edges e JOIN reach r ON e.b = r.node
        |),
        |losers AS (
        |  SELECT node AS doc_id FROM reach GROUP BY node HAVING node <> MIN(lbl)
        |),
        |base AS (
        |  SELECT d.doc_id, d.lang, d.n_chars,
        |    CAST(len(string_split_regex(lower(d.text), '\s+')) AS BIGINT) AS nt,
        |    EXISTS (SELECT 1 FROM losers l WHERE l.doc_id = d.doc_id) AS is_dup
        |  FROM documents d WHERE d.text IS NOT NULL
        |),
        |c AS (
        |  SELECT *,
        |    SUM(nt) OVER (PARTITION BY lang ORDER BY n_chars DESC, doc_id ASC
        |                  ROWS UNBOUNDED PRECEDING) AS cum_raw,
        |    SUM(CASE WHEN is_dup THEN 0 ELSE nt END)
        |      OVER (PARTITION BY lang ORDER BY n_chars DESC, doc_id ASC
        |            ROWS UNBOUNDED PRECEDING) AS cum_dedup
        |  FROM base
        |)
        |SELECT lang,
        |  CAST(SUM(CASE WHEN cum_raw <= 20000 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept_raw,
        |  CAST(SUM(CASE WHEN cum_raw <= 20000 THEN nt ELSE 0 END) AS BIGINT) AS tokens_raw,
        |  CAST(SUM(CASE WHEN cum_raw <= 20000 AND is_dup THEN nt ELSE 0 END) AS BIGINT) AS dup_tokens_in_raw,
        |  CAST(SUM(CASE WHEN NOT is_dup AND cum_dedup <= 20000 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept_dedup,
        |  CAST(SUM(CASE WHEN NOT is_dup AND cum_dedup <= 20000 THEN nt ELSE 0 END) AS BIGINT) AS tokens_dedup
        |FROM c GROUP BY lang
        |ORDER BY lang""".stripMargin,
  )
}
