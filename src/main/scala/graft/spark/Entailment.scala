package graft.spark

import graft.model.Triple
import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Distributed OWL-RL-subset entailment: rules prp-spo1, prp-eqp1, prp-eqp2
  * (the reference's Expansion module,
  * /root/reference/lib/rdf/microdata/expansion.rb:123-139), re-expressed as
  * DataFrame self-joins.
  *
  * Where the reference re-runs every rule over the whole repository until
  * the count stops growing (naive fixpoint, expansion.rb:145-162 — fine at
  * page scale, quadratic at ours), this is a **semi-naive** loop: each
  * iteration joins only against the schema-edge side (tiny, broadcast) and
  * adds only the delta (`except` previous), with `localCheckpoint` per
  * iteration to keep lineage flat. Schema edges are re-derived per iteration
  * so rule output that is itself a subPropertyOf/equivalentProperty edge
  * feeds back, exactly like the reference's whole-repo iteration.
  */
object Entailment {
  val SubPropertyOf = "http://www.w3.org/2000/01/rdf-schema#subPropertyOf"
  val EquivalentProperty = "http://www.w3.org/2002/07/owl#equivalentProperty"

  /** Fixpoint-expand a triple set. Returns base ∪ derived, deduplicated on
    * triple identity.
    */
  def owlEntail(triples: Dataset[Triple], maxIterations: Int = 20): Dataset[Triple] = {
    val spark = triples.sparkSession
    import spark.implicits._
    val idCols = Triple.identityCols.map(col)

    var all = triples.dropDuplicates(Triple.identityCols).localCheckpoint()
    var iter = 0
    var done = false
    while (!done && iter < maxIterations) {
      iter += 1
      // schema edges: vocabulary-sized by construction → broadcast side
      val spo = all.filter(col("pred") === SubPropertyOf && col("obj_iri").isNotNull)
        .select(col("subj").as("e_p1"), col("obj_iri").as("e_p2"))
      val eqp = all.filter(col("pred") === EquivalentProperty && col("obj_iri").isNotNull)
        .select(col("subj").as("e_p1"), col("obj_iri").as("e_p2"))
      // prp-spo1: x p1 y ∧ p1 ⊑ p2 ⇒ x p2 y ; prp-eqp1/eqp2: both directions
      val fwd = spo.union(eqp) // pred == e_p1 ⇒ emit e_p2
      val bwd = eqp.select(col("e_p2").as("e_p1"), col("e_p1").as("e_p2")) // pred == old e_p2 ⇒ emit e_p1
      val edges = broadcast(fwd.union(bwd).distinct())
      val derived = all.join(edges, col("pred") === col("e_p1"))
        .select(col("subj"), col("e_p2").as("pred"), col("obj_iri"),
          col("obj_lexical"), col("obj_datatype"), col("obj_lang"),
          col("conv_id"), col("turn_idx"))
        .as[Triple]
      val delta = derived
        .select(idCols: _*)
        .except(all.select(idCols: _*))
        .withColumn("conv_id", lit(null).cast("string"))
        .withColumn("turn_idx", lit(-1))
        .as[Triple]
        .localCheckpoint()
      if (delta.isEmpty) done = true
      else all = all.union(delta).localCheckpoint()
    }
    all
  }
}
