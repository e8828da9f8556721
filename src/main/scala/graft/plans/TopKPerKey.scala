package graft.plans

import scala.collection.mutable

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Expression, RowOrdering, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.graft.{ColumnBridge, DatasetBridge}

/** Grouped top-k as a first-class operator (SURVEY.md §2.5 "sorts /
  * top-k" at scale).
  *
  * The composable alternative — `row_number() OVER (PARTITION BY key
  * ORDER BY ord) <= k` — shuffles EVERY row of the input before any
  * pruning. This operator plans as two physical stages:
  *
  *   1. partial: per-partition bounded heaps keep at most k rows per key
  *      (map-side pruning, exactly like partial aggregation);
  *   2. final: the same pruning after a clustered exchange on the key —
  *      which now carries at most k·partitions rows per key instead of
  *      all of them.
  *
  * At 100 TB this is the difference between shuffling the table and
  * shuffling k rows per key per map task. Registered through
  * `SparkSessionExtensions` ([[GraftExtensions]]) — the brief's
  * option (c) extension path: LogicalPlan + Strategy + SparkPlan.
  */
case class TopKPerKey(
    groupExprs: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    child: LogicalPlan) extends UnaryNode {
  override def output: Seq[Attribute] = child.output
  override protected def withNewChildInternal(c: LogicalPlan): TopKPerKey =
    copy(child = c)
}

case class TopKPerKeyExec(
    partial: Boolean,
    groupExprs: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output

  override def requiredChildDistribution: Seq[Distribution] =
    if (partial) Seq(UnspecifiedDistribution)
    else Seq(ClusteredDistribution(groupExprs))

  // pruning is per-partition (preservesPartitioning below): advertise the
  // child's partitioning so a downstream window/join clustered on the same
  // keys reuses the exchange instead of shuffling the survivors again
  override def outputPartitioning: Partitioning = child.outputPartitioning

  override protected def doExecute(): RDD[InternalRow] = {
    val (g, o, kk, schema) = (groupExprs, order, k, child.output)
    child.execute().mapPartitions({ iter =>
      val ordering = RowOrdering.create(o, schema)
      val keyProj = UnsafeProjection.create(g, schema)
      // PriorityQueue dequeues the MAX w.r.t. the sort order = the worst
      // kept row; a new row replaces it when it sorts strictly earlier.
      val heaps = mutable.LinkedHashMap.empty[InternalRow, mutable.PriorityQueue[InternalRow]]
      iter.foreach { row =>
        val heap = heaps.getOrElseUpdate(
          keyProj(row).copy(),
          mutable.PriorityQueue.empty(ordering))
        if (heap.size < kk) heap += row.copy()
        else if (ordering.compare(row, heap.head) < 0) {
          heap.dequeue(); heap += row.copy()
        }
      }
      heaps.valuesIterator.flatMap(_.iterator)
    }, preservesPartitioning = true)
  }

  override protected def withNewChildInternal(c: SparkPlan): TopKPerKeyExec =
    copy(child = c)
}

object TopKStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerKey(g, o, k, child) =>
      val partialStage: SparkPlan =
        TopKPerKeyExec(partial = true, g, o, k, planLater(child))
      TopKPerKeyExec(partial = false, g, o, k, partialStage) :: Nil
    case _ => Nil
  }
}

/** Register with `spark.sql.extensions=graft.plans.GraftExtensions`.
  *
  * Besides the TopK strategy, this surfaces Spark's internal
  * `BloomFilterMightContain` (the probe half of the engine's own
  * runtime-filter machinery; the build half, `bloom_filter_agg`, is
  * already SQL-registered) as a `might_contain` function so the
  * Bloom-prefiltered decontamination path can keep its membership probe
  * inside whole-stage codegen with the filter bytes arriving via a
  * scalar subquery — never as a megabyte plan literal, which Catalyst
  * would content-hash on every plan-map. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectPlannerStrategy(_ => TopKStrategy)
    e.injectFunction((
      new org.apache.spark.sql.catalyst.FunctionIdentifier("might_contain"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain].getName,
        "might_contain"),
      (exprs: Seq[Expression]) => {
        require(exprs.length == 2, "might_contain(bloomFilterBinary, xxhash64Value)")
        org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(exprs(0), exprs(1))
      }))
    e.injectFunction((
      new org.apache.spark.sql.catalyst.FunctionIdentifier("bloom_filter_agg"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate].getName,
        "bloom_filter_agg"),
      (exprs: Seq[Expression]) => {
        import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
        exprs match {
          case Seq(c)       => new BloomFilterAggregate(c).toAggregateExpression()
          case Seq(c, n)    => new BloomFilterAggregate(c, n).toAggregateExpression()
          case Seq(c, n, b) => new BloomFilterAggregate(c, n, b).toAggregateExpression()
          case _ => throw new IllegalArgumentException(
            "bloom_filter_agg(xxhash64Value[, estimatedNumItems[, numBits]])")
        }
      }))
    // graft_dot(a, b): the engine's codegen'd sequential-fold dot
    // product ([[graft.functions.VecDot]]) exposed to SQL — unlike the
    // macro below this registers a CUSTOM NATIVE EXPRESSION, so a SQL
    // user gets the same single-static-call codegen the DataFrame
    // queries use (the higher-order aggregate(zip_with(...)) spelling
    // evaluates interpreted per element — measured ~20× slower on the
    // brute-force cosine join).
    e.injectFunction((
      new org.apache.spark.sql.catalyst.FunctionIdentifier("graft_dot"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[graft.functions.VecDot].getName, "graft_dot"),
      (exprs: Seq[Expression]) => {
        require(exprs.length == 2, "graft_dot(arrayA, arrayB)")
        graft.functions.VecDot(exprs(0), exprs(1))
      }))
    // graft_ngrams(text, n): whitespace-tokenized lowercase n-grams as
    // array<string> — a SQL MACRO, not a UDF: the builder expands to a
    // tree of BUILT-IN expressions (split/transform/slice/concat_ws),
    // so the SQL surface gets the engine's n-gram semantics with full
    // whole-stage codegen and no interpreted function-call boundary.
    // `n` must be a literal: it shapes the expression tree itself.
    e.injectFunction((
      new org.apache.spark.sql.catalyst.FunctionIdentifier("graft_ngrams"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[GraftExtensions].getName, "graft_ngrams"),
      (exprs: Seq[Expression]) => {
        import org.apache.spark.sql.catalyst.expressions.Literal
        import org.apache.spark.sql.functions._
        // arity first (its own message — "n must be a literal" would
        // mislead on graft_ngrams(text)); then accept INT or BIGINT
        // literals (SQL `3L`/bigint-typed 3 shape the same tree)
        require(exprs.length == 2,
          s"graft_ngrams(text, n) takes exactly 2 arguments; got ${exprs.length}")
        val n = exprs(1) match {
          case Literal(v: Int, org.apache.spark.sql.types.IntegerType) if v >= 1 => v
          case Literal(v: Long, org.apache.spark.sql.types.LongType)
            if v >= 1 && v <= Int.MaxValue => v.toInt
          case _ => throw new IllegalArgumentException(
            "graft_ngrams(text, n) — n must be a positive integer literal " +
              "(INT or BIGINT; it shapes the expression tree, so it cannot be a column)")
        }
        val text = ColumnBridge.column(exprs.head)
        val toks = split(lower(text), "\\s+")
        // n is a literal, so the gram can be a DIRECT element concat —
        // no per-gram slice array allocation in the hot loop (t5's
        // measured trade: slice+concat_ws billed ~2.5x this form)
        def gramAt(i: Column): Column = concat(
          (1 to n).flatMap { j =>
            element_at(toks, i + lit(j)) :: (if (j < n) List(lit(" ")) else Nil)
          }: _*)
        // SQL null propagation: NULL text → NULL (like every built-in
        // string function), explicitly — not via the accident of
        // size(NULL)'s config-dependent (-1 vs NULL) behavior
        val grams = when(text.isNull, lit(null).cast("array<string>"))
          .when(size(toks) >= n,
            transform(sequence(lit(0), size(toks) - n), gramAt(_)))
          .otherwise(array().cast("array<string>"))
        ColumnBridge.catalystExpression(grams)
      }))
  }
}

object TopK {
  /** Top-k rows per key. `order` takes Columns as `.asc`/`.desc` sort
    * specifications (bare columns sort ascending); pass resolved columns
    * (`df("c")`) or names. */
  def perKey(df: DataFrame, keys: Seq[Column], order: Seq[Column], k: Int): DataFrame = {
    require(k > 0, "k must be positive")
    val child = df.queryExecution.analyzed
    def resolve(e: Expression): Expression = e transformUp {
      case u: org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute =>
        child.output.find(a => df.sparkSession.sessionState.conf.resolver(a.name, u.name))
          .getOrElse(throw new IllegalArgumentException(s"no such column: ${u.name}"))
    }
    val g = keys.map(c => resolve(ColumnBridge.catalystExpression(c)))
    val o = order.map(c => ColumnBridge.catalystExpression(c) match {
      case s: SortOrder => s.copy(child = resolve(s.child))
      case e            => SortOrder(resolve(e), Ascending)
    })
    DatasetBridge.ofRows(df.sparkSession, TopKPerKey(g, o, k, child))
  }
}
