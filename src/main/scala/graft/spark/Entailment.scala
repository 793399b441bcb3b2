package graft.spark

import graft.model.Triple
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Distributed OWL-RL-subset entailment: rules prp-spo1, prp-eqp1, prp-eqp2
  * (the reference's Expansion module,
  * /root/reference/lib/rdf/microdata/expansion.rb:123-139), re-expressed as
  * DataFrame joins against a broadcast schema-edge table.
  *
  * Where the reference re-runs every rule over the whole repository until
  * the count stops growing (naive fixpoint, expansion.rb:145-162 — fine at
  * page scale, quadratic at ours), this is a TRUE **semi-naive** loop:
  *
  *  - iteration i derives only from the PREVIOUS DELTA joined with the
  *    (tiny, broadcast) schema edges — never re-deriving from the full
  *    accumulated set;
  *  - the one case naive re-derivation would catch — a derived triple that
  *    is itself a new schema edge — is handled incrementally: new edges are
  *    diffed out of the delta and joined against `all` once;
  *  - the novelty check is a null-safe `left_anti` join on the six identity
  *    columns (round 1 used `except`, which distincts and compares the full
  *    row width every iteration).
  *
  * Per-iteration cost is O(|Δ| + |all ⋈ Δedges|), not O(|all|): the loop
  * stays flat as the graph accumulates.
  */
object Entailment {
  val SubPropertyOf = "http://www.w3.org/2000/01/rdf-schema#subPropertyOf"
  val EquivalentProperty = "http://www.w3.org/2002/07/owl#equivalentProperty"

  /** (e_p1, e_p2) rewrite edges from a triple set: p1 ⊑ p2 forward, plus
    * both directions of ≡. Vocabulary-sized by construction → broadcast.
    */
  private def schemaEdges(ds: Dataset[Triple]): DataFrame = {
    val spo = ds.filter(col("pred") === SubPropertyOf && col("obj_iri").isNotNull)
      .select(col("subj").as("e_p1"), col("obj_iri").as("e_p2"))
    val eqp = ds.filter(col("pred") === EquivalentProperty && col("obj_iri").isNotNull)
    spo
      .union(eqp.select(col("subj").as("e_p1"), col("obj_iri").as("e_p2")))
      .union(eqp.select(col("obj_iri").as("e_p1"), col("subj").as("e_p2")))
      .distinct()
  }

  /** x p1 y ∧ (p1 → p2) ⇒ x p2 y, lineage nulled (derived facts have no
    * single witness turn).
    */
  private def derive(facts: Dataset[Triple], edges: DataFrame): DataFrame =
    facts.join(broadcast(edges), col("pred") === col("e_p1"))
      .select(col("subj"), col("e_p2").as("pred"), col("obj_iri"),
        col("obj_lexical"), col("obj_datatype"), col("obj_lang"),
        lit(null).cast("string").as("conv_id"), lit(-1).as("turn_idx"))

  /** Fixpoint-expand a triple set. Returns base ∪ derived, deduplicated on
    * triple identity.
    *
    * The novelty anti-join never touches the whole accumulated graph: a
    * derived triple's predicate is always a rewrite TARGET (some e_p2), so
    * it can only collide with the target-predicate slice of the graph.
    * `seen` holds exactly that slice (base slice + every accepted delta)
    * and is the only thing shuffled per iteration — at corpus scale that is
    * a small fraction of the graph.
    */
  def owlEntail(triples: Dataset[Triple], maxIterations: Int = 20): Dataset[Triple] = {
    val spark = triples.sparkSession
    import spark.implicits._
    val antiCond = Triple.identityCols
      .map(c => col(s"d.$c") <=> col(s"a.$c")).reduce(_ && _)

    def targetSlice(ds: Dataset[Triple], edges: DataFrame): Dataset[Triple] =
      ds.join(broadcast(edges.select(col("e_p2")).distinct()),
          col("pred") === col("e_p2"), "left_semi")
        .as[Triple]

    val base = triples.dropDuplicates(Triple.identityCols).localCheckpoint()
    var result = base
    var delta = base
    var edges = schemaEdges(base).localCheckpoint()
    var seen = targetSlice(base, edges).localCheckpoint()
    var iter = 0
    while (iter < maxIterations && !delta.isEmpty) {
      iter += 1
      // edges introduced by the last delta (empty on the first iteration,
      // where delta == base and `edges` already covers everything); the
      // rare nonEmpty case widens the target set, so `seen` is rebuilt
      val newEdges =
        if (iter == 1) None
        else {
          val ne = schemaEdges(delta).as("d")
            .join(edges.as("a"),
              col("d.e_p1") === col("a.e_p1") && col("d.e_p2") === col("a.e_p2"),
              "left_anti")
            .localCheckpoint()
          if (ne.isEmpty) None else Some(ne)
        }
      val derived = newEdges match {
        case None => derive(delta, edges)
        case Some(ne) =>
          edges = edges.union(ne).distinct().localCheckpoint()
          seen = targetSlice(result, edges).localCheckpoint()
          derive(delta, edges).union(derive(result, ne))
      }
      val newDelta = derived
        .dropDuplicates(Triple.identityCols)
        .as("d")
        .join(seen.as("a"), antiCond, "left_anti")
        .as[Triple]
        .localCheckpoint()
      // accepted deltas are disjoint from everything seen, so plain unions
      // stay duplicate-free; only `seen` needs re-materializing per round
      seen = seen.union(newDelta).localCheckpoint()
      result = result.union(newDelta)
      delta = newDelta
    }
    // a non-empty delta at the iteration cap means the closure is
    // INCOMPLETE — returning it silently would hand downstream a wrong
    // graph (same invariant ConnectedComponents enforces on its loop)
    if (!delta.isEmpty)
      throw new IllegalStateException(
        s"entailment fixpoint not reached in $maxIterations iterations — " +
          "the closure is incomplete; raise maxIterations")
    result
  }
}
