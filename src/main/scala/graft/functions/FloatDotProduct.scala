package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native Catalyst dot product over two `ARRAY<FLOAT|DOUBLE>` columns (each
  * side independently typed — a stored model side is double), in double
  * precision, sequential index-order accumulation.
  *
  * The composable alternative (`aggregate(zip_with(a, b, _*_), 0d, _+_)`)
  * materializes an intermediate array per row-pair; for all-pairs similarity
  * that allocation dominates. This expression generates a tight primitive
  * loop inside whole-stage codegen — same result bit-for-bit (same
  * accumulation order), no intermediates — INCLUDING the degenerate-input
  * semantics: length-mismatched arrays and null elements yield NULL (the
  * zip_with form pads/propagates null), never a silently truncated or
  * zero-filled sum. The per-element null check is only generated when the
  * child schema says elements CAN be null.
  */
case class FloatDotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(t: DataType) = t match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"float_dot expects ARRAY<FLOAT|DOUBLE> inputs, got ${left.dataType} / ${right.dataType}")
  }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "float_dot"
  // null also for ragged / null-element inputs, not just null inputs
  override def nullable: Boolean = true

  private def elementsNullable: Boolean = Seq(left, right).exists(_.dataType match {
    case ArrayType(_, containsNull) => containsNull
    case _ => false
  })

  // each side is float OR double (a stored model side is double); a float
  // element is widened exactly, so mixed-type accumulation is bit-identical
  // to the all-double composable form. Element types are fixed per plan —
  // lazy vals, not per-row dataType pattern matches in the eval loop.
  private lazy val aD: Boolean = isDouble(left)
  private lazy val bD: Boolean = isDouble(right)
  private def isDouble(e: Expression): Boolean = e.dataType match {
    case ArrayType(DoubleType, _) => true
    case _ => false
  }

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = a.numElements()
    if (b.numElements() != n) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val x = if (aD) a.getDouble(i) else a.getFloat(i).toDouble
      val y = if (bD) b.getDouble(i) else b.getFloat(i).toDouble
      acc += x * y
      i += 1
    }
    acc
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      // fresh identifiers: two instances of this expression can land in the
      // same codegen scope (both children non-nullable ⇒ no brace-scoped
      // null guard), where fixed names would declare duplicate locals and
      // force a silent interpreted fallback
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      val i = ctx.freshName("i")
      val nullCheck =
        if (elementsNullable)
          s"if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }"
        else ""
      val getA = if (isDouble(left)) s"$a.getDouble($i)" else s"(double)$a.getFloat($i)"
      val getB = if (isDouble(right)) s"$b.getDouble($i)" else s"(double)$b.getFloat($i)"
      s"""
         |int $n = $a.numElements();
         |if ($b.numElements() != $n) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $nullCheck
         |    $acc += $getA * $getB;
         |  }
         |  if (!${ev.isNull}) { ${ev.value} = $acc; }
         |}
         |""".stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): FloatDotProduct =
    copy(left = newLeft, right = newRight)
}

object FloatDotProduct {
  def apply(a: Column, b: Column): Column =
    ColumnBridge.column(
      FloatDotProduct(ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
