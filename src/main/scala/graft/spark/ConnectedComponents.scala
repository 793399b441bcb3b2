package graft.spark

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed connected components over an undirected edge list
  * (`src: string, dst: string`) by iterative min-label propagation:
  * every node repeatedly adopts the smallest label among itself and its
  * neighbors until a fixpoint. Converges in O(diameter) rounds — entity
  * mention graphs are shallow (mentions ↔ blocking keys), so rounds stay
  * single-digit; each round is one co-partitioned join + partial-agg min.
  *
  * Driver-controlled loop with `localCheckpoint` per round (flat lineage),
  * the pattern SURVEY.md §4.2 calls out for iteration Catalyst cannot fuse.
  */
object ConnectedComponents {

  /** @return (node, component) where component = min node id reachable. */
  def run(edges: DataFrame, maxIterations: Int = 20): DataFrame = {
    // symmetrize once; dedup to keep join sides lean
    val sym = edges.select(col("src"), col("dst"))
      .union(edges.select(col("dst").as("src"), col("src").as("dst")))
      .distinct()
      .localCheckpoint()

    var labels = sym.select(col("src").as("node")).distinct()
      .withColumn("component", col("node"))
      .localCheckpoint()

    var iter = 0
    var converged = false
    while (!converged && iter < maxIterations) {
      iter += 1
      // neighbor labels: for each edge (src,dst), dst observes src's label
      val neighborLabels = sym
        .join(labels, sym("src") === labels("node"))
        .select(col("dst").as("node"), col("component"))
      val next = labels.select(col("node"), col("component"))
        .union(neighborLabels)
        .groupBy(col("node"))
        .agg(min(col("component")).as("component"))
        .localCheckpoint()
      val changed = next.as("n")
        .join(labels.as("o"), col("n.node") === col("o.node"))
        .filter(col("n.component") =!= col("o.component"))
        .limit(1).count() > 0
      labels = next
      converged = !changed
    }
    labels
  }
}
