package graft.spark

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Basic-graph-pattern (BGP) querying over the extracted triple table —
  * the consumer-side role RDF.rb's `Queryable#query` plays for the
  * reference reader's output (reference: rdf-microdata feeds RDF.rb
  * repositories; spec/reader_spec.rb exercises `parse(...).query`-style
  * matching via graph equivalence).
  *
  * A pattern is a (subject, predicate, object) triple of terms; each term
  * is a constant ([[GraphQuery.C]]) or a named variable ([[GraphQuery.V]]).
  * `bgp` returns the DISTINCT variable bindings satisfying every pattern.
  *
  * Spark-first shape — the whole query stays declarative so Catalyst does
  * the planning:
  *  - each pattern compiles to a filtered projection of the triple table;
  *    constant terms become pushable predicates (`PushedFilters` reach the
  *    parquet scan — a `?s rdf:type :Person` pattern never reads
  *    non-type rows);
  *  - patterns join pairwise on their shared variables (equi-joins on
  *    binding columns — co-partitioned shuffles, or BroadcastHashJoin when
  *    a selective pattern leaves a small side; AQE re-plans at runtime);
  *  - pattern order is chosen greedily for connectivity, so no join is
  *    ever a cartesian product: a disconnected pattern set is rejected
  *    instead of silently exploding (at 100 TB a cartesian between
  *    pattern frames is the scale-killer this operator must never emit).
  *
  * Object bindings surface as `coalesce(obj_iri, obj_lexical)` — IRIs and
  * literal lexical forms share one binding domain, mirroring how the
  * fixtures compare term values.
  */
object GraphQuery {

  sealed trait Term
  /** Named variable; equal names unify across (and within) patterns. */
  final case class V(name: String) extends Term
  /** Constant IRI or literal lexical form. */
  final case class C(value: String) extends Term

  /** Solve the basic graph pattern over (subj, pred, obj_iri, obj_lexical,
    * ...) triples; returns one column per distinct variable name.
    */
  def bgp(triples: DataFrame, patterns: Seq[(Term, Term, Term)]): DataFrame = {
    require(patterns.nonEmpty, "empty BGP")
    require(patterns.forall(p => Seq(p._1, p._2, p._3).exists(_.isInstanceOf[V])),
      "variable-free patterns (pure existence checks) are not supported: " +
        "they cannot join on a shared variable — evaluate the constant " +
        "triple separately and gate the query on its result")
    val frames = patterns.map(compile(triples, _))

    // greedy connected join order: always join a pattern sharing ≥1
    // variable with the bindings accumulated so far
    val remaining = scala.collection.mutable.ArrayBuffer(frames: _*)
    var acc = remaining.remove(0)
    while (remaining.nonEmpty) {
      val i = remaining.indexWhere(f => f._2.exists(acc._2.contains))
      require(i >= 0,
        s"disconnected BGP: patterns over ${remaining.map(_._2).mkString(",")} share no " +
          s"variable with {${acc._2.mkString(",")}} — a cartesian product is refused")
      val next = remaining.remove(i)
      val shared = next._2.filter(acc._2.contains)
      acc = (acc._1.join(next._1, shared), (acc._2 ++ next._2).distinct)
    }
    // variables surface in first-mention order regardless of join order
    acc._1.select(acc._2.map(col): _*).distinct()
  }

  /** One pattern → (bindings frame, variable names). Constants filter (and
    * push down); a variable repeated inside one pattern becomes an equality
    * filter (e.g. `?x :sameAs ?x`).
    */
  private def compile(triples: DataFrame, p: (Term, Term, Term)): (DataFrame, Seq[String]) = {
    val slots = Seq("subj" -> p._1, "pred" -> p._2, "obj" -> p._3)
    var df = triples.select(col("subj"), col("pred"),
      coalesce(col("obj_iri"), col("obj_lexical")).as("obj"))
    slots.foreach {
      case (c, C(v)) => df = df.filter(col(c) === v)
      case _ => ()
    }
    val varSlots = slots.collect { case (c, V(n)) => (c, n) }
    varSlots.groupBy(_._2).foreach { case (_, cs) =>
      cs.drop(1).foreach { case (c, _) => df = df.filter(col(c) === col(cs.head._1)) }
    }
    val names = varSlots.map(_._2).distinct
    (df.select(names.map(n => col(varSlots.find(_._2 == n).get._1).as(n)): _*), names)
  }
}
