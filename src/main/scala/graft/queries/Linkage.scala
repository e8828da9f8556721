package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** ENTITY RESOLUTION / RECORD LINKAGE — the fuzzy-matching family a
  * production catalog or crawl-metadata pipeline runs to reconcile
  * free-text names: blocked pair generation, edit-distance matching,
  * survivorship (golden-record) merge, and cross-source vocabulary
  * reconciliation.
  *
  * The 100 TB posture for every query here is the same dictionary
  * trick: fuzzy matching NEVER runs over base rows. The distinct-value
  * dictionary (names, tokens) is orders of magnitude smaller than the
  * fact table — 64 names over 200k part rows in this fixture, a few
  * million names over trillions of rows in production — so each
  * operator (1) collapses the base table to a weighted dictionary with
  * one map-side-combinable aggregate, (2) does the quadratic-ish fuzzy
  * work on the dictionary under a BLOCKING key that bounds candidate
  * volume, and (3) joins match verdicts back (or carries row weights
  * through) instead of re-scanning. Edit distance itself is Spark's
  * codegen'd `levenshtein` — no UDFs.
  */
object Linkage {

  /** Distinct part-name dictionary with per-name row counts — the
    * weighted dictionary every query here starts from. */
  private def nameDict(s: SparkSession, dir: String): DataFrame =
    Tables.part(s, dir)
      .groupBy(col("p_name").as("name"))
      .agg(count(lit(1)).as("cnt"),
           min(col("p_partkey")).as("min_key"))

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // -----------------------------------------------------------------
    // er1: BLOCKED fuzzy self-linkage over the name dictionary.
    // Names are "adjective noun"; the block key is the noun, so the
    // quadratic pair expansion is bounded by the largest block (8 names
    // here; production caps the block like d2 caps df). levenshtein<=3
    // over the FULL string links names that share the noun and have
    // nearby adjectives. pair_mass = sum(cnt_a*cnt_b) prices what the
    // linkage means at ROW grain without ever joining base rows.
    // -----------------------------------------------------------------
    "er1_blocked_name_linkage" -> ((s, dir) => {
      val d = nameDict(s, dir)
        .withColumn("noun", split(col("name"), " ").getItem(1))
      val a = d.select(col("noun"), col("name").as("name_a"), col("cnt").as("cnt_a"))
      val b = d.select(col("noun"), col("name").as("name_b"), col("cnt").as("cnt_b"))
      val pairs = a.join(b, Seq("noun"))
        .where(col("name_a") < col("name_b"))
        .withColumn("dist", levenshtein(col("name_a"), col("name_b")))
        .where(col("dist") <= 3)
      pairs.groupBy(col("noun"))
        .agg(count(lit(1)).as("n_pairs"),
             min(col("dist")).cast("int").as("min_dist"),
             sum(col("dist")).cast("long").as("sum_dist"),
             sum(col("cnt_a") * col("cnt_b")).cast("long").as("pair_mass"))
        .orderBy(col("noun"))
    }),

    // -----------------------------------------------------------------
    // er2: SURVIVORSHIP (golden-record merge). After linkage groups
    // records into an entity (exact name here — er1's fuzzy pairs feed
    // the same merge in production), each output field survives by an
    // explicit rule: golden key = min key; brand = from the record with
    // the highest retail price (ties -> lowest partkey) — the argmax
    // rule, computed as ONE max(struct(price, -key, brand)) so the
    // whole merge is a single map-side-combinable aggregate, no window,
    // no self-join; type = majority vote (mode, ties -> lexicographic
    // smallest), a two-level aggregate on (name, type) counts.
    // -----------------------------------------------------------------
    "er2_survivorship_merge" -> ((s, dir) => {
      val p = Tables.part(s, dir)
      val base = p.groupBy(col("p_name").as("name"))
        .agg(min(col("p_partkey")).cast("long").as("golden_key"),
             count(lit(1)).cast("long").as("n_records"),
             countDistinct(col("p_brand")).cast("long").as("n_brands"),
             max(struct(col("p_retailprice").as("price"),
                        (-col("p_partkey")).as("negkey"),
                        col("p_brand").as("brand"))).getField("brand")
               .as("surviving_brand"),
             max(col("p_retailprice")).as("max_price"),
             sum(col("p_size")).cast("long").as("total_size"))
      val votes = p.groupBy(col("p_name").as("name"), col("p_type").as("ptype"))
        .agg(count(lit(1)).as("votes"))
      val majority = votes
        .groupBy(col("name"))
        .agg(min(struct((-col("votes")).as("negv"),
                        // min over (-votes, type) = (max votes, then
                        // lexicographic-smallest type) in ONE
                        // associative aggregate — no window.
                        col("ptype"))).getField("ptype").as("majority_type"))
      base.join(majority, Seq("name"))
        .orderBy(col("name"))
    }),

    // -----------------------------------------------------------------
    // er3: cross-source VOCABULARY RECONCILIATION with provably-sound
    // dual blocking. Matches the part-name token dictionary against the
    // document token dictionary at levenshtein<=1. Blocking: a pair of
    // strings (both length>=2) within edit distance 1 ALWAYS shares its
    // first character or its last character — a single edit at position
    // i>0 preserves the first char; an edit at i<len-1 preserves the
    // last; an insert/delete at either end preserves the other end — so
    // the union of the two single-char equi-joins (plus a +-1 length
    // guard) has 100% recall: blocked-but-exact, the same sound-prune
    // posture as d24's ubi bound. Each arm is an equi-join on one char
    // against a BROADCAST part-token dictionary.
    // -----------------------------------------------------------------
    "er3_vocab_reconcile" -> ((s, dir) => {
      val docTok = Tables.documents(s, dir)
        .select(explode(split(lower(col("text")), "\\s+")).as("dtok"))
        .where(length(col("dtok")) >= 2)
        .groupBy(col("dtok")).agg(count(lit(1)).as("freq"))
        .withColumn("dlen", length(col("dtok")))
      val partTok = Tables.part(s, dir)
        .select(explode(split(col("p_name"), " ")).as("ptok"))
        .where(length(col("ptok")) >= 2)
        .distinct()
        .withColumn("plen", length(col("ptok")))
      val lenGuard = abs(col("dlen") - col("plen")) <= 1
      val armF = docTok.join(
        broadcast(partTok),
        substring(col("dtok"), 1, 1) === substring(col("ptok"), 1, 1) && lenGuard)
      val armL = docTok.join(
        broadcast(partTok),
        substring(col("dtok"), -1, 1) === substring(col("ptok"), -1, 1) && lenGuard)
      val matches = armF.unionByName(armL)
        .select(col("ptok"), col("dtok"), col("freq"))
        .distinct()
        .withColumn("dist", levenshtein(col("ptok"), col("dtok")))
        .where(col("dist") <= 1)
      val agg = matches.groupBy(col("ptok"))
        .agg(sum(when(col("dist") === 0, 1).otherwise(0)).cast("long").as("n_exact"),
             sum(when(col("dist") === 1, 1).otherwise(0)).cast("long").as("n_near"),
             sum(col("freq")).cast("long").as("mass_matched"))
      partTok.select(col("ptok"))
        .join(agg, Seq("ptok"), "left")
        .select(col("ptok"),
                coalesce(col("n_exact"), lit(0L)).as("n_exact"),
                coalesce(col("n_near"), lit(0L)).as("n_near"),
                coalesce(col("mass_matched"), lit(0L)).as("mass_matched"))
        .orderBy(col("ptok"))
    }),
  )

  def oracleSql: Map[String, String] = Map(

    "er1_blocked_name_linkage" ->
      """WITH d AS (
        |  SELECT p_name AS name, COUNT(*) AS cnt,
        |         string_split(p_name, ' ')[2] AS noun
        |  FROM part GROUP BY 1, 3
        |),
        |pairs AS (
        |  SELECT a.noun, levenshtein(a.name, b.name) AS dist,
        |         a.cnt * b.cnt AS mass
        |  FROM d a JOIN d b ON a.noun = b.noun AND a.name < b.name
        |  WHERE levenshtein(a.name, b.name) <= 3
        |)
        |SELECT noun, CAST(COUNT(*) AS BIGINT) AS n_pairs,
        |       CAST(MIN(dist) AS INTEGER) AS min_dist,
        |       CAST(SUM(dist) AS BIGINT) AS sum_dist,
        |       CAST(SUM(mass) AS BIGINT) AS pair_mass
        |FROM pairs GROUP BY noun ORDER BY noun""".stripMargin,

    "er2_survivorship_merge" ->
      """WITH ranked AS (
        |  SELECT p_name AS name, p_brand,
        |    ROW_NUMBER() OVER (PARTITION BY p_name
        |                       ORDER BY p_retailprice DESC, p_partkey ASC) AS rn
        |  FROM part
        |),
        |base AS (
        |  SELECT p_name AS name,
        |    CAST(MIN(p_partkey) AS BIGINT) AS golden_key,
        |    CAST(COUNT(*) AS BIGINT) AS n_records,
        |    CAST(COUNT(DISTINCT p_brand) AS BIGINT) AS n_brands,
        |    MAX(p_retailprice) AS max_price,
        |    CAST(SUM(p_size) AS BIGINT) AS total_size
        |  FROM part GROUP BY 1
        |),
        |votes AS (
        |  SELECT p_name AS name, p_type, COUNT(*) AS v FROM part GROUP BY 1, 2
        |),
        |vr AS (
        |  SELECT name, p_type,
        |    ROW_NUMBER() OVER (PARTITION BY name
        |                       ORDER BY v DESC, p_type ASC) AS rn
        |  FROM votes
        |)
        |SELECT b.name, b.golden_key, b.n_records, b.n_brands,
        |       r.p_brand AS surviving_brand, b.max_price, b.total_size,
        |       v.p_type AS majority_type
        |FROM base b
        |JOIN ranked r ON r.name = b.name AND r.rn = 1
        |JOIN vr v     ON v.name = b.name AND v.rn = 1
        |ORDER BY b.name""".stripMargin,

    "er3_vocab_reconcile" ->
      """WITH dt AS (
        |  SELECT tok AS dtok, COUNT(*) AS freq, LENGTH(tok) AS dlen
        |  FROM (
        |    SELECT unnest(string_split_regex(lower(text), '\s+')) AS tok
        |    FROM documents
        |  ) WHERE LENGTH(tok) >= 2 GROUP BY 1, 3
        |),
        |pt AS (
        |  SELECT DISTINCT tok AS ptok, LENGTH(tok) AS plen
        |  FROM (
        |    SELECT unnest(string_split(p_name, ' ')) AS tok FROM part
        |  ) WHERE LENGTH(tok) >= 2
        |),
        |cand AS (
        |  SELECT pt.ptok, dt.dtok, dt.freq FROM dt JOIN pt
        |    ON substr(dt.dtok, 1, 1) = substr(pt.ptok, 1, 1)
        |   AND abs(dt.dlen - pt.plen) <= 1
        |  UNION
        |  SELECT pt.ptok, dt.dtok, dt.freq FROM dt JOIN pt
        |    ON substr(dt.dtok, -1, 1) = substr(pt.ptok, -1, 1)
        |   AND abs(dt.dlen - pt.plen) <= 1
        |),
        |m AS (
        |  SELECT ptok, dtok, freq, levenshtein(ptok, dtok) AS dist
        |  FROM cand WHERE levenshtein(ptok, dtok) <= 1
        |),
        |agg AS (
        |  SELECT ptok,
        |    CAST(SUM(CASE WHEN dist = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_exact,
        |    CAST(SUM(CASE WHEN dist = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_near,
        |    CAST(SUM(freq) AS BIGINT) AS mass_matched
        |  FROM m GROUP BY 1
        |)
        |SELECT p.ptok,
        |       CAST(COALESCE(a.n_exact, 0) AS BIGINT) AS n_exact,
        |       CAST(COALESCE(a.n_near, 0) AS BIGINT) AS n_near,
        |       CAST(COALESCE(a.mass_matched, 0) AS BIGINT) AS mass_matched
        |FROM pt p LEFT JOIN agg a ON a.ptok = p.ptok
        |ORDER BY p.ptok""".stripMargin,
  )
}
