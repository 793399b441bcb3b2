package graft.spark

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed connected components over an undirected edge list
  * (`src: string, dst: string`).
  *
  * Each round fuses one hop of neighbor min-label propagation with one
  * pointer-jumping step (label := label's label), so label paths halve per
  * round and convergence needs O(log diameter) rounds instead of
  * O(diameter). Initialization already folds the first hop
  * (label₀ = min(self, neighbors)), saving a full round.
  *
  * Round cost (the round-1 version spent ~3 jobs/round and detected
  * convergence with a collision-prone hash-sum fingerprint):
  *  - the previous label rides along on each node's self row, so
  *    convergence is an EXACT check — `filter(changed).limit(1).isEmpty`
  *    over the just-materialized round output (a trivial scan of cached
  *    blocks with early exit), never a hash fingerprint that can collide
  *    into a silent wrong answer;
  *  - lineage is truncated every round via localCheckpoint; when the
  *    session has a reliable checkpoint dir configured
  *    (`sc.setCheckpointDir`), every `checkpointInterval`-th round uses a
  *    reliable `checkpoint()` instead, so executor loss on a real cluster
  *    replays at most k rounds (localCheckpoint blocks die with their
  *    executor).
  */
object ConnectedComponents {

  /** @return (node, component) where component = min node id reachable. */
  def run(edges: DataFrame, maxIterations: Int = 25,
          checkpointInterval: Int = 5): DataFrame = {
    val sc = edges.sparkSession.sparkContext
    // symmetrize once; dedup to keep join sides lean
    val sym = edges.select(col("src"), col("dst"))
      .union(edges.select(col("dst").as("src"), col("src").as("dst")))
      .distinct()
      .localCheckpoint()

    // init = identity folded with the first propagation hop
    var labels = sym.groupBy(col("src").as("node"))
      .agg(least(min(col("dst")), col("src")).as("component"))
      .localCheckpoint()

    var iter = 0
    var converged = false
    while (!converged && iter < maxIterations) {
      iter += 1
      // (1) neighbor propagation: dst observes src's label; each node's
      // self row carries its previous label (`old`) through the aggregate
      // so the convergence check needs no extra join
      val msgs = sym.join(labels, sym("src") === labels("node"))
        .select(col("dst").as("node"), col("component"),
          lit(null).cast(labels.schema("component").dataType).as("old"))
      val hop = labels.select(col("node"), col("component"), col("component").as("old"))
        .union(msgs)
        .groupBy(col("node"))
        .agg(min(col("component")).as("comp"), max(col("old")).as("old"))
      // (2) pointer jumping: component := component's component
      val newComp = least(coalesce(col("jc"), col("a.comp")), col("a.comp"))
      val jumped = hop.as("a")
        .join(hop.select(col("node").as("jn"), col("comp").as("jc")).as("b"),
          col("a.comp") === col("jn"), "left")
        .select(col("a.node").as("node"), newComp.as("component"),
          (col("a.old") =!= newComp).as("changed"))
      val next =
        if (iter % checkpointInterval == 0 && sc.getCheckpointDir.isDefined)
          jumped.checkpoint()
        else jumped.localCheckpoint()
      // exact convergence: early-exit scan of the materialized blocks
      converged = next.filter(col("changed")).limit(1).isEmpty
      labels = next.select(col("node"), col("component"))
    }
    labels
  }
}
