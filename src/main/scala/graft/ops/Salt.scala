package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation utilities (SURVEY.md §2.5 scale posture).
  *
  * AQE's skew-join handling covers sort-merge joins at runtime; these
  * cover the planning-time cases it cannot: a broadcast-ineligible
  * dimension with a few hot keys, and high-cardinality aggregations with
  * hot groups.
  */
object Salt {

  /** Salted equi-join for skewed fact keys: the fact side gets a random
    * salt in [0, salts); the (small but not broadcastable) dimension side
    * is replicated once per salt value, so a hot key's rows spread over
    * `salts` shuffle partitions instead of one.
    *
    * `dim` grows by a factor of `salts` — use for dimension tables only.
    */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String,
                 salts: Int, joinType: String = "inner"): DataFrame = {
    require(salts > 0, "salts must be positive")
    // the dim side is REPLICATED once per salt: under right/full outer an
    // unmatched dim row would surface `salts` times — silently corrupt
    val jt = joinType.toLowerCase.replaceAll("[_-]", "")
    // "semi"/"anti" are Spark's own aliases for leftsemi/leftanti
    require(Set("inner", "left", "leftouter", "leftsemi", "leftanti", "semi", "anti")(jt),
      s"saltedJoin replicates the dimension side per salt; join type '$joinType' " +
      "would duplicate unmatched dimension rows — use inner/left/left_semi/left_anti")
    val saltedFact = fact.withColumn("__salt",
      (rand(seed = 42) * salts).cast("int"))
    val saltedDim = dim.withColumn("__salt",
      explode(array((0 until salts).map(lit): _*)))
    saltedFact.join(saltedDim,
        saltedFact(key) === saltedDim(key) &&
        saltedFact("__salt") === saltedDim("__salt"),
        joinType)
      .drop(saltedDim(key)).drop("__salt")
  }

  /** Two-stage aggregation for hot groups: aggregate by (key, salt)
    * first (spreads a hot key over `salts` reducers), then re-aggregate
    * by key. `partials` maps each input column to its partial aggregate;
    * `finals` must re-combine the partial columns (sum→sum, count→sum,
    * min→min, …). */
  def saltedAgg(df: DataFrame, key: Column, salts: Int,
                partials: Seq[Column], finals: Seq[Column]): DataFrame = {
    require(salts > 0, "salts must be positive")
    df.withColumn("__salt", (rand(seed = 42) * salts).cast("int"))
      .groupBy(key.as("__key"), col("__salt"))
      .agg(partials.head, partials.tail: _*)
      .groupBy(col("__key"))
      .agg(finals.head, finals.tail: _*)
      .withColumnRenamed("__key", "key")
  }
}
