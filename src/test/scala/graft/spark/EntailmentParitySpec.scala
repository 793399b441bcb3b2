package graft.spark

import graft.model.Triple
import org.scalatest.funsuite.AnyFunSuite

/** The rewrite fixpoint has two physical strategies (single in-memory task
  * under [[Entailment.SingleTaskMaxFacts]], distributed semi-naive above).
  * This spec pins the SINGLE-TASK path's rule semantics against
  * hand-checked expectations (every rule kind, chained targets, literal
  * carry, derived-schema-edge replay, incremental == scratch);
  * [[DistributedPathParitySpec]] forces the distributed strategies via
  * the threshold seams and asserts the two paths agree bit-for-bit.
  */
class EntailmentParitySpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def t(s: String, p: String, o: String): Triple =
    Triple(s, p, o, null, null, null, "c", 0)
  private def lit(s: String, p: String, v: String): Triple =
    Triple(s, p, null, v, null, null, "c", 0)

  private def ids(ds: org.apache.spark.sql.Dataset[Triple]) =
    ds.collect().map(x =>
      (x.subj, x.pred, x.obj_iri, x.obj_lexical, x.obj_datatype, x.obj_lang)).toSet

  test("single-task fixpoint: every rule kind, chained targets, literal carry") {
    val facts = Seq(
      t("x", "p", "y"), lit("x", "p", "42"),
      t("p", Entailment.SubPropertyOf, "q"),
      t("q", Entailment.EquivalentProperty, "r"),
      t("x", Entailment.RdfType, "A"),
      t("A", Entailment.SubClassOf, "B"),
      t("B", Entailment.EquivalentClass, "C"),
      t("x", "inv1", "y"),
      t("inv1", Entailment.InverseOf, "vni"),
      t("s", Entailment.RdfType, Entailment.SymmetricProperty),
      t("m", "s", "n")).toDS()
    val out = ids(Entailment.owlEntail(facts))
    // pred chain p ⊑ q ≡ r (both directions of ≡)
    assert(out.contains(("x", "q", "y", null, null, null)))
    assert(out.contains(("x", "r", "y", null, null, null)))
    assert(out.contains(("x", "q", null, "42", null, null))) // literal rides pred rewrites
    assert(out.contains(("x", "r", null, "42", null, null)))
    // class chain A ⊑ B ≡ C
    assert(out.contains(("x", Entailment.RdfType, "B", null, null, null)))
    assert(out.contains(("x", Entailment.RdfType, "C", null, null, null)))
    // inverse + symmetric
    assert(out.contains(("y", "vni", "x", null, null, null)))
    assert(out.contains(("n", "s", "m", null, null, null)))
  }

  test("single-task fixpoint: a DERIVED schema edge replays the standing graph") {
    // q ⊑ subPropertyOf-of-r arrives only through a rewrite: meta ⊑ spo
    // makes (q meta r) derive (q subPropertyOf r), which must then rewrite
    // the standing fact (x q y) into (x r y) — the new-edge replay path
    val facts = Seq(
      t("x", "q", "y"),
      t("q", "meta", "r"),
      t("meta", Entailment.SubPropertyOf, Entailment.SubPropertyOf)).toDS()
    val out = ids(Entailment.owlEntail(facts))
    assert(out.contains(("q", Entailment.SubPropertyOf, "r", null, null, null)))
    assert(out.contains(("x", "r", "y", null, null, null)))
  }

  test("incremental equals from-scratch through both physical shapes") {
    val base = Seq(
      t("x", "p", "y"), t("y", "p", "z"), lit("z", "name", "Zed"),
      t("x", Entailment.RdfType, "A")).toDS()
    val delta = Seq(
      t("p", Entailment.SubPropertyOf, "q"),
      t("A", Entailment.SubClassOf, "B")).toDS()
    val closed = Entailment.owlEntail(base)
    val incr = ids(Entailment.owlEntailIncremental(closed, delta))
    val scratch = ids(Entailment.owlEntail(base.union(delta)))
    assert(incr == scratch)
    assert(incr.contains(("x", "q", "y", null, null, null)))
    assert(incr.contains(("x", Entailment.RdfType, "B", null, null, null)))
  }
}
