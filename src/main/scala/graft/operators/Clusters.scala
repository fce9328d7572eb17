package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Cluster formation over a near-duplicate pair list — the step AFTER pair
  * generation in every dedup pipeline: x17/x18/x20-style operators emit
  * (a, b) edges; keeping one representative per duplicate CLASS requires the
  * connected components of that graph (near-dup similarity is not
  * transitive, so classes are components, not cliques).
  *
  * Algorithm: iterative min-label propagation (each node repeatedly adopts
  * the smallest label in its neighborhood) — the standard Pregel-style
  * formulation, expressed as DataFrame joins so Catalyst/AQE plan every
  * round. Converges in O(component diameter) rounds; near-dup components
  * are shallow (dup classes, not social graphs), so the diameter is small
  * in practice. At adversarial scale the round count can be driven to
  * O(log n) with the large-star/small-star transform (Kiveris et al.,
  * "Connected Components in MapReduce and Beyond", SoCC'14) — same
  * join-per-round skeleton, different message rule.
  *
  * Scale posture: each round shuffles (node, label) pairs — two longs — and
  * the edge list once. The label state is locally checkpointed every round:
  * an iterative plan that references its previous state twice (message join
  * + union) otherwise doubles its logical plan per round — 2^rounds nodes,
  * a driver OOM long before the data is the problem. Checkpointing is the
  * standard fixpoint pattern (GraphX does the same); each round's join/agg
  * is still a fully Catalyst-planned query over the materialized state. The
  * driver holds ONE boolean per round (did any label change), never the
  * graph.
  */
object Clusters {

  /** Hard ceiling on propagation rounds: a component with diameter beyond
    * this indicates a pathological graph (or a bug); fail loudly rather
    * than loop. */
  val MaxRounds: Int = 64

  /** Connected components of the undirected graph given by `edges` (columns
    * `a`, `b`). Returns (node, cluster) where cluster = the smallest node id
    * in the component — deterministic regardless of partitioning or
    * iteration order. Nodes with no edges are absent (callers union
    * singletons back if needed). */
  def connectedComponents(edges: DataFrame, maxRounds: Int = MaxRounds): DataFrame = {
    val sym = edges.select(col("a").as("src"), col("b").as("dst"))
      .union(edges.select(col("b").as("src"), col("a").as("dst")))
      .localCheckpoint()
    var labels = sym.select(col("src").as("node")).distinct()
      .select(col("node"), col("node").as("label"))
      .localCheckpoint()
    var rounds = 0
    var converged = false
    while (!converged && rounds < maxRounds) {
      val msgs = sym.join(labels, sym("src") === labels("node"))
        .select(col("dst").as("node"), col("label"))
      val next = labels.union(msgs)
        .groupBy("node").agg(min("label").as("label"))
        .localCheckpoint()
      // labels only ever decrease, so "any strictly smaller" == "changed";
      // limit(1) lets the probe short-circuit
      val changed = next.as("n").join(labels.as("o"), "node")
        .where(col("n.label") < col("o.label")).limit(1).count() > 0
      labels = next
      converged = !changed
      rounds += 1
    }
    if (!converged)
      throw new IllegalStateException(
        s"connectedComponents: no fixpoint after $maxRounds rounds — " +
          "component diameter exceeds the bound; raise maxRounds or switch " +
          "the message rule to large-star/small-star.")
    labels.select(col("node"), col("label").as("cluster"))
  }
}
