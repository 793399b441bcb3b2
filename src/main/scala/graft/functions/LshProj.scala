package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, IntegerType, LongType}

/** Native Catalyst signed hyperplane projection — the codegen twin of
  * [[graft.ops.PortableHash.lshProj]]'s composable form
  * `aggregate(transform(emb, (x, i) => x.cast(double) * plane(k, i)), 0.0, _+_)`.
  *
  * The composable form pays an interpreted lambda step AND a full LCG
  * re-derivation per element per hyperplane (higher-order functions are
  * CodegenFallback); across an LSH bucketing pass that is
  * nTables·nBits·dim interpreted steps per row — the dominant cost of the
  * portable-LCG path. This expression runs the identical arithmetic in
  * one codegen'd loop: per dimension d,
  * `plane = ((((k % 1000003)·8191 + d)·1103515245 + 12345) % 2000 − 1000) / 1000`
  * (all intermediates non-negative for k ≥ 0, so `%` equals pmod), and
  * `acc += (double) emb[d] · plane` in the same sequential index order —
  * bit-identical doubles, spec-asserted against the composable form. Null
  * array or null element ⇒ NULL, exactly like the transform/aggregate
  * null propagation.
  */
case class LshProj(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val arrOk = left.dataType match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
      case _ => false
    }
    val kOk = right.dataType == LongType || right.dataType == IntegerType
    if (arrOk && kOk) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"lsh_proj expects (ARRAY<FLOAT|DOUBLE>, BIGINT) inputs, got " +
        s"${left.dataType} / ${right.dataType}")
  }

  override def dataType: DataType = DoubleType
  override def prettyName: String = "lsh_proj"
  // null also for null-element inputs, not just null inputs
  override def nullable: Boolean = true

  private def isDouble: Boolean = left.dataType match {
    case ArrayType(DoubleType, _) => true
    case _ => false
  }
  private def elementsNullable: Boolean = left.dataType match {
    case ArrayType(_, containsNull) => containsNull
    case _ => false
  }
  private def kIsLong: Boolean = right.dataType == LongType

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val k = if (kIsLong) r.asInstanceOf[Long] else r.asInstanceOf[Int].toLong
    // pmod, not %: parity with the composable form for any k sign
    val kRed = ((k % 1000003L + 1000003L) % 1000003L) * 8191L
    val n = a.numElements()
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i)) return null
      val x = if (isDouble) a.getDouble(i) else a.getFloat(i).toDouble
      val v = ((kRed + i) * 1103515245L + 12345L) % 2000L
      acc += x * ((v.toDouble - 1000.0) / 1000.0)
      i += 1
    }
    acc
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, k) => {
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      val i = ctx.freshName("i")
      val kRed = ctx.freshName("kRed")
      val v = ctx.freshName("v")
      val nullCheck =
        if (elementsNullable)
          s"if ($a.isNullAt($i)) { ${ev.isNull} = true; break; }"
        else ""
      val getX = if (isDouble) s"$a.getDouble($i)" else s"(double)$a.getFloat($i)"
      s"""
         |final int $n = $a.numElements();
         |final long $kRed = ((((long) $k) % 1000003L + 1000003L) % 1000003L) * 8191L;
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $nullCheck
         |  final long $v = (($kRed + $i) * 1103515245L + 12345L) % 2000L;
         |  $acc += $getX * ((((double) $v) - 1000.0) / 1000.0);
         |}
         |if (!${ev.isNull}) { ${ev.value} = $acc; }
         |""".stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): LshProj =
    copy(left = newLeft, right = newRight)
}

object LshProj {
  def apply(emb: Column, k: Column): Column =
    ColumnBridge.column(
      LshProj(ColumnBridge.expression(emb), ColumnBridge.expression(k)))
}
