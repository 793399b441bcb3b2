package graft.model

import org.apache.spark.sql.types._

/** Input row shape, per BASELINE.json input_hint: one turn of a multi-turn
  * conversation / agent transcript.
  */
final case class Turn(
    conv_id: String,
    turn_idx: Int,
    role: String,
    text: String,
    tool: String,
    ts: java.sql.Timestamp)

object Turn {
  /** Authoritative input schema (BASELINE.json input_hint). */
  val schema: StructType = StructType(Seq(
    StructField("conv_id", StringType),
    StructField("turn_idx", IntegerType),
    StructField("role", StringType),
    StructField("text", StringType),
    StructField("tool", StringType),
    StructField("ts", TimestampType)))
}

/** One emitted RDF triple, lexical-form-preserving.
  *
  * The reference keeps the verbatim lexical form of typed literals (e.g.
  * `"1.1e1"^^xsd:double`, /root/reference/spec/reader_spec.rb:199-201), so the
  * object is carried as (iri | lexical + datatype + lang) rather than a
  * converted native value.
  *
  * `conv_id`/`turn_idx` are lineage columns (north rule: per-partition
  * lineage); they are not part of triple identity.
  */
final case class Triple(
    subj: String,
    pred: String,
    obj_iri: String,       // null when the object is a literal
    obj_lexical: String,   // null when the object is an IRI / skolem
    obj_datatype: String,  // null for plain literals
    obj_lang: String,      // null when no language
    conv_id: String,
    turn_idx: Int)

object Triple {
  /** Columns that define triple identity (lineage excluded). */
  val identityCols: Seq[String] =
    Seq("subj", "pred", "obj_iri", "obj_lexical", "obj_datatype", "obj_lang")

  /** Null-safe identity equality between two aliased frames — the ONE
    * definition every identity join/anti-join shares (entailment novelty,
    * graph diff), so a change to [[identityCols]] cannot drift.
    */
  def identityCond(leftAlias: String, rightAlias: String): org.apache.spark.sql.Column =
    identityCols.map(c =>
      org.apache.spark.sql.functions.col(s"$leftAlias.$c") <=>
        org.apache.spark.sql.functions.col(s"$rightAlias.$c")).reduce(_ && _)
}

/** An RDF term produced by extraction (row-local, pre-Spark). */
sealed trait Term
object Term {
  /** IRI (absolute or relative-resolved); also used for skolemized bnodes. */
  final case class Iri(value: String) extends Term
  /** Literal with verbatim lexical form. */
  final case class Lit(lexical: String, datatype: String = null, lang: String = null) extends Term
}

/** A triple before lineage is attached (extractor output). */
final case class RawTriple(subj: String, pred: String, obj: Term)
