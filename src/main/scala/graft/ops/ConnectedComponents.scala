package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.CheckpointBridge

/** Distributed connected components by iterative min-label propagation
  * with pointer jumping — the step a dedup pipeline runs AFTER near-dup
  * pair generation, to collapse pairwise matches (A~B, B~C) into
  * clusters (A,B,C share one representative) so exactly one document
  * per duplicate cluster survives.
  *
  * Algorithm (public star-contraction family — Kiveris et al.,
  * "Connected Components in MapReduce and Beyond", SoCC'14):
  * every node starts labeled with its own id; each round a node takes
  * the minimum label among itself and its neighbors, then "pointer
  * jumps" (adopts its label-node's label). Neighbor-min alone needs
  * O(diameter) rounds; the jump step contracts label chains
  * logarithmically, so convergence is O(log d) shuffle rounds — at
  * 100 TB a duplicate-cluster graph has small components and this
  * terminates in a handful of rounds regardless of total edge count.
  * The fixpoint is unique (min node id per component), so the result
  * does not depend on the round count — safe to compare bit-for-bit
  * against a transitive-closure oracle.
  *
  * Each round is two shuffle joins + an aggregation, all on node-id
  * keys; the per-round result is materialized (see [[Materialize]]) to
  * truncate the otherwise exponentially growing lineage.
  */
object ConnectedComponents {

  /** Label every node of `edges` (cols `src`, `dst`) with the minimum
    * node id reachable from it. Returns (`node`, `label`).
    *
    * Nodes appearing in NO edge (self-loops count as no edge) are
    * absent from the result unless `nodes` is given: pass the full
    * node universe (first column is the id) and isolated nodes come
    * back labeled with themselves — the posture a dedup pipeline wants,
    * where a never-matched document is its own singleton cluster.
    *
    * Each superseded round's checkpoint blocks are freed eagerly
    * (see [[org.apache.spark.sql.graft.CheckpointBridge]]) so long
    * component chains hold at most two rounds of blocks at a time
    * instead of accumulating one set per round until a GC. */
  def run(edges: DataFrame, src: String, dst: String, maxIter: Int = 50,
          nodes: Option[DataFrame] = None): DataFrame = {
    val e = edges.select(col(src).as("a"), col(dst).as("b")).filter(col("a") =!= col("b"))
    // symmetrize once; every round joins against it
    val sym = Materialize(e.union(e.select(col("b"), col("a"))))
    // fused round 0: label = min(self, direct neighbors) PLUS one
    // pointer jump, all in the single materialized plan — no convergence
    // bookkeeping needed yet, and the jump resolves distance-2 chains
    // immediately, so dense duplicate clusters converge at round 0 and
    // the loop's first iteration is already the fixpoint verification
    val base = sym.groupBy(col("a").as("node")).agg(min(col("b")).as("mb"))
      .select(col("node"), least(col("node"), col("mb")).as("label"))
    var labels = Materialize(
      base.as("x")
        .join(base.select(col("node").as("l"), col("label").as("ll")).as("y"),
          col("x.label") === col("y.l"), "left")
        .select(col("x.node").as("node"),
          coalesce(col("y.ll"), col("x.label")).as("label")))
    var changed = 1L
    var rounds = 0
    while (changed > 0 && rounds < maxIter) {
      val nbrMin = sym
        .join(labels.select(col("node").as("b"), col("label").as("nl")), "b")
        .groupBy(col("a").as("node")).agg(min(col("nl")).as("cand"))
      // carry the previous label so convergence detection is a filter
      // over the materialized round result, not another join
      val stepped = labels.join(nbrMin, Seq("node"), "left")
        .select(col("node"), col("label").as("old"),
          least(col("label"), coalesce(col("cand"), col("label"))).as("label"))
      val jumped = stepped.as("x")
        .join(stepped.select(col("node").as("l"), col("label").as("ll")).as("y"),
          col("x.label") === col("y.l"), "left")
        .select(col("x.node").as("node"), col("x.old").as("old"),
          coalesce(col("y.ll"), col("x.label")).as("label"))
      val next = Materialize(jumped)
      changed = next.filter(col("label") =!= col("old")).count()
      CheckpointBridge.free(labels) // superseded round, safe: next is materialized
      labels = next.select(col("node"), col("label"))
      rounds += 1
    }
    if (changed > 0)
      throw new IllegalStateException(
        s"connected components did not converge in $maxIter rounds")
    CheckpointBridge.free(sym) // labels is checkpointed; sym is no longer needed
    nodes match {
      case Some(n) =>
        val universe = n.select(col(n.columns.head).as("node"))
        val singletons = universe.join(labels, Seq("node"), "left_anti")
          .select(col("node"), col("node").as("label"))
        labels.union(singletons)
      case None => labels
    }
  }
}
