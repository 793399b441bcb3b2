package graft.spark

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed connected components over an undirected edge list
  * (`src: string, dst: string`).
  *
  * Each round combines one hop of neighbor min-label propagation with one
  * pointer-jumping step (label := label's label), so label paths halve per
  * round and convergence needs O(log diameter) rounds instead of
  * O(diameter). Convergence is detected by an order-independent label
  * fingerprint (sum of per-row hashes) — one cheap aggregate per round
  * instead of a self-join diff.
  *
  * Driver-controlled loop with `localCheckpoint` per round (flat lineage),
  * the pattern SURVEY.md §4.2 calls out for iteration Catalyst cannot fuse.
  */
object ConnectedComponents {

  /** @return (node, component) where component = min node id reachable. */
  def run(edges: DataFrame, maxIterations: Int = 25): DataFrame = {
    // symmetrize once; dedup to keep join sides lean
    val sym = edges.select(col("src"), col("dst"))
      .union(edges.select(col("dst").as("src"), col("src").as("dst")))
      .distinct()
      .localCheckpoint()

    var labels = sym.select(col("src").as("node")).distinct()
      .withColumn("component", col("node"))
      .localCheckpoint()

    def fingerprint(df: DataFrame): java.math.BigDecimal =
      df.select(sum(xxhash64(col("node"), col("component")).cast("decimal(38,0)")).as("f"))
        .head().getDecimal(0)

    var prev = fingerprint(labels)
    var iter = 0
    var converged = false
    while (!converged && iter < maxIterations) {
      iter += 1
      // (1) neighbor propagation: dst observes src's label
      val neighborLabels = sym
        .join(labels, sym("src") === labels("node"))
        .select(col("dst").as("node"), col("component"))
      val hop = labels.select(col("node"), col("component"))
        .union(neighborLabels)
        .groupBy(col("node"))
        .agg(min(col("component")).as("component"))
      // (2) pointer jumping: component := component's component
      val jumped = hop.as("a")
        .join(hop.select(col("node").as("jnode"), col("component").as("jcomp")).as("b"),
          col("a.component") === col("jnode"), "left")
        .select(col("a.node").as("node"),
          least(coalesce(col("jcomp"), col("a.component")), col("a.component")).as("component"))
        .localCheckpoint()
      val f = fingerprint(jumped)
      labels = jumped
      if (f == prev) converged = true else prev = f
    }
    labels
  }
}
