package graft.functions

import graft.core.NTriples
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Row-level N-Triples escaping, shared by the interpreted and generated
  * paths of [[NTriplesEscapeExpr]]. The common case (no character needs
  * escaping — true for almost every IRI and most lexical forms) is a single
  * pass over the RAW UTF-8 bytes returning the input untouched: every
  * character either escape profile rewrites is ASCII, and in UTF-8 no byte
  * of a multi-byte character falls in the ASCII range, so an unsigned byte
  * scan is an exact needs-escape test with no decode. Only rows that
  * actually contain an escapable character pay the String round-trip
  * through the core [[graft.core.NTriples]] escapers — the single source of
  * truth the golden suite pins (reference: RDF.rb NTriples writer
  * ESCAPE_CHARS; /root/reference/script/parse:23-31 prints this format).
  */
object NtEscapeFns {
  /** STRING_LITERAL_QUOTE content: `\` `"` named, \n \r \t named, other
    * chars < 0x20 as \uXXXX ([[NTriples.escape]]).
    */
  def escapeLit(s: UTF8String): UTF8String = {
    val n = s.numBytes
    var i = 0
    while (i < n) {
      val ub = s.getByte(i) & 0xff
      if (ub < 0x20 || ub == '"' || ub == '\\')
        return UTF8String.fromString(NTriples.escape(s.toString))
      i += 1
    }
    s
  }

  /** IRIREF content: controls, space, `<>"{}|^` backtick and backslash as
    * \uXXXX UCHARs ([[NTriples.escapeIri]]).
    */
  def escapeIri(s: UTF8String): UTF8String = {
    val n = s.numBytes
    var i = 0
    while (i < n) {
      val ub = s.getByte(i) & 0xff
      if (ub <= 0x20 || ub == '<' || ub == '>' || ub == '"' || ub == '{' ||
          ub == '}' || ub == '|' || ub == '^' || ub == '`' || ub == '\\')
        return UTF8String.fromString(NTriples.escapeIri(s.toString))
      i += 1
    }
    s
  }
}

/** Native Catalyst N-Triples escape over a STRING column.
  *
  * The composable alternative — one `regexp_replace` per escapable
  * character — needs ~40 chained replaces per term position; across the
  * four IRI positions and the lexical form of a serialized triple that is
  * ~200 stateful regex matchers in ONE generated method, which blows
  * janino's 64 KB method limit and silently drops the whole sink projection
  * to interpreted mode (observed: `CodeGenerator: failed to compile …
  * Code grows beyond 64 KB` with the regex-chain implementation). This
  * expression generates a single static call, so the serialization stage
  * stays inside whole-stage codegen; per row the clean common case is one
  * branchless byte scan instead of ~40 regex probes.
  */
case class NTriplesEscapeExpr(child: Expression, iri: Boolean)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"$prettyName expects STRING input, got $t")
  }
  override def dataType: DataType = StringType
  override def prettyName: String = if (iri) "nt_escape_iri" else "nt_escape_lit"

  override protected def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String]
    if (iri) NtEscapeFns.escapeIri(s) else NtEscapeFns.escapeLit(s)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val fn = if (iri) "escapeIri" else "escapeLit"
    defineCodeGen(ctx, ev, c => s"graft.functions.NtEscapeFns.$fn($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): NTriplesEscapeExpr =
    copy(child = newChild)
}

object NTriplesEscapeExpr {
  /** Literal-content escape as a Column. */
  def literal(c: Column): Column =
    ColumnBridge.column(NTriplesEscapeExpr(ColumnBridge.expression(c), iri = false))

  /** IRIREF-content escape as a Column. */
  def iri(c: Column): Column =
    ColumnBridge.column(NTriplesEscapeExpr(ColumnBridge.expression(c), iri = true))
}
