package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst char-fold hash `h = (h·mult + c) mod p` over a string —
  * the codegen twin of [[graft.ops.PortableHash.charFold]]'s composable
  * form `aggregate(split(s, ""), 0L, (acc, c) => pmod(acc*mult+ascii(c), p))`.
  *
  * The composable form is built from higher-order functions, which are
  * CodegenFallback in Spark: every character costs an interpreted lambda
  * step plus a per-character UTF8String allocation from the split. This
  * expression folds the SAME values in one tight loop inside whole-stage
  * codegen. Per-character value parity with the composable form:
  * `split(s, "")` element boundaries are Java-regex zero-width matches,
  * which advance by CODEPOINT (surrogate pairs stay one element), and
  * `ascii(elem)` returns the element's full first CODEPOINT (probed:
  * ascii('😀') = 128512). The loop below walks codepoints and folds each
  * codepoint value to match exactly (spec-asserted against the composable
  * form, including astral/empty/null inputs).
  *
  * `mult`/`p` are trusted literals from PortableHash (acc < p and
  * acc·mult + 0x10FFFF < 2^63 by the callers' modulus choices, so plain
  * `%` on non-negative longs equals pmod).
  */
case class CharFold(child: Expression, mult: Long, p: Long)
    extends UnaryExpression {

  require(mult > 0 && p > 1 && (p - 1) <= (Long.MaxValue - 0x110000L) / mult,
    s"charFold constants overflow: mult=$mult p=$p")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"char_fold expects a STRING input, got ${child.dataType}")

  override def dataType: DataType = LongType
  override def prettyName: String = "char_fold"

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    var acc = 0L
    var i = 0
    val n = s.length
    while (i < n) {
      val cp = s.codePointAt(i)
      acc = (acc * mult + cp) % p
      i += Character.charCount(cp)
    }
    acc
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val s = ctx.freshName("s")
      val acc = ctx.freshName("acc")
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val cp = ctx.freshName("cp")
      s"""
         |java.lang.String $s = $c.toString();
         |long $acc = 0L;
         |int $i = 0;
         |final int $n = $s.length();
         |while ($i < $n) {
         |  final int $cp = $s.codePointAt($i);
         |  $acc = ($acc * ${mult}L + $cp) % ${p}L;
         |  $i += java.lang.Character.charCount($cp);
         |}
         |${ev.value} = $acc;
         |""".stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): CharFold =
    copy(child = newChild)
}

object CharFold {
  def apply(s: Column, mult: Long, p: Long): Column =
    ColumnBridge.column(CharFold(ColumnBridge.expression(s), mult, p))
}
