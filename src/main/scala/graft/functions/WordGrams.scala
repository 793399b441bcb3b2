package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst in-order word n-gram windows over a token array — the
  * codegen twin of the composable form
  * `when(size(t) >= n, transform(sequence(0, size(t)-n), i -> concat_ws(" ", slice(t, i+1, n)))).otherwise(array())`.
  *
  * The composable form pays interpreted higher-order lambda steps plus a
  * slice-array allocation and a concat_ws evaluation per window
  * (CodegenFallback) — the dominant CPU of the shingle/dedup family. This
  * expression emits every window in one tight codegen loop with identical
  * output: windows are `concat_ws(" ", tokens[i..i+n-1])` (null elements
  * skipped without a separator, exactly concat_ws's contract), a NULL or
  * shorter-than-n array yields the EMPTY array (never null) — matching
  * the `when/otherwise` guard. Spec-asserted against the composable form.
  */
case class WordGrams(child: Expression, n: Int) extends UnaryExpression {

  require(n >= 1, "n-gram width must be >= 1")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"word_grams expects ARRAY<STRING>, got $other")
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "word_grams"
  // null input maps to the empty array (the when/otherwise guard's shape)
  override def nullable: Boolean = false

  private val space = UTF8String.fromString(" ")

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) return new GenericArrayData(Array.empty[Any])
    val arr = v.asInstanceOf[ArrayData]
    val m = arr.numElements()
    if (m < n) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](m - n + 1)
    val win = new Array[UTF8String](n)
    var i = 0
    while (i <= m - n) {
      var j = 0
      while (j < n) {
        win(j) = if (arr.isNullAt(i + j)) null else arr.getUTF8String(i + j)
        j += 1
      }
      out(i) = UTF8String.concatWs(space, win: _*)
      i += 1
    }
    new GenericArrayData(out)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val childGen = child.genCode(ctx)
    val sep = ctx.addReferenceObj("sep", space, classOf[UTF8String].getName)
    val m = ctx.freshName("m")
    val out = ctx.freshName("out")
    val win = ctx.freshName("win")
    val i = ctx.freshName("i")
    val j = ctx.freshName("j")
    val u = classOf[UTF8String].getName
    val gad = classOf[GenericArrayData].getName
    val body =
      s"""
         |${childGen.code}
         |Object[] $out;
         |if (${childGen.isNull} || ${childGen.value}.numElements() < $n) {
         |  $out = new Object[0];
         |} else {
         |  final int $m = ${childGen.value}.numElements();
         |  $out = new Object[$m - $n + 1];
         |  final $u[] $win = new $u[$n];
         |  for (int $i = 0; $i <= $m - $n; $i++) {
         |    for (int $j = 0; $j < $n; $j++) {
         |      $win[$j] = ${childGen.value}.isNullAt($i + $j) ? null : ${childGen.value}.getUTF8String($i + $j);
         |    }
         |    $out[$i] = $u.concatWs($sep, $win);
         |  }
         |}
         |final $gad ${ev.value} = new $gad($out);
         |""".stripMargin
    ev.copy(code = code"$body", isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): WordGrams =
    copy(child = newChild)
}

object WordGrams {
  def apply(tokens: Column, n: Int): Column =
    ColumnBridge.column(WordGrams(ColumnBridge.expression(tokens), n))
}
