package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}
import scala.collection.mutable.ArrayBuffer

/** Bounded top-k aggregate: `top_k_by_score(score: double, payload: string, k)`
  * → `array<struct<score: double, payload: string>>`, sorted by
  * (score desc, payload asc) — fully deterministic, ties included.
  *
  * The composable alternative (`slice(sort_array(collect_list(...)), 1, k)`)
  * buffers EVERY group row before truncating — at 10^12 rows a hot group
  * OOMs its reducer. This TypedImperativeAggregate keeps at most 2k entries
  * per partial buffer (compacting on overflow), so map-side partials and the
  * final merge are O(k) memory regardless of group size.
  */
case class TopKByScore(
    scoreExpr: Expression,
    payloadExpr: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[ArrayBuffer[(Double, UTF8String)]] {

  require(k > 0, "k must be positive")

  override def children: Seq[Expression] = Seq(scoreExpr, payloadExpr)

  override def checkInputDataTypes(): TypeCheckResult =
    if (scoreExpr.dataType == DoubleType && payloadExpr.dataType == StringType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"top_k_by_score expects (DOUBLE, STRING), got (${scoreExpr.dataType}, ${payloadExpr.dataType})")

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("score", DoubleType, nullable = false),
    StructField("payload", StringType, nullable = false))), containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "top_k_by_score"

  // (score desc, payload asc); payload copied so unsafe-row memory can't alias.
  // Double.compare (not >/==) keeps this a total order on NaN inputs —
  // raw comparisons treat NaN as "equal to everything", which violates
  // sortWith's strict-weak-ordering contract and can make TimSort throw.
  private def lt(a: (Double, UTF8String), b: (Double, UTF8String)): Boolean = {
    val c = java.lang.Double.compare(b._1, a._1)
    c < 0 || (c == 0 && a._2.compareTo(b._2) < 0)
  }

  private def compact(buf: ArrayBuffer[(Double, UTF8String)]): Unit =
    if (buf.length > k) {
      val top = buf.sortWith(lt).take(k)
      buf.clear()
      buf ++= top
    }

  override def createAggregationBuffer(): ArrayBuffer[(Double, UTF8String)] =
    ArrayBuffer.empty

  override def update(buf: ArrayBuffer[(Double, UTF8String)],
                      input: InternalRow): ArrayBuffer[(Double, UTF8String)] = {
    val s = scoreExpr.eval(input)
    val p = payloadExpr.eval(input)
    if (s != null && p != null) {
      buf += ((s.asInstanceOf[Double], p.asInstanceOf[UTF8String].clone()))
      if (buf.length >= 2 * k) compact(buf)
    }
    buf
  }

  override def merge(buf: ArrayBuffer[(Double, UTF8String)],
                     other: ArrayBuffer[(Double, UTF8String)]): ArrayBuffer[(Double, UTF8String)] = {
    buf ++= other
    compact(buf)
    buf
  }

  override def eval(buf: ArrayBuffer[(Double, UTF8String)]): Any = {
    compact(buf)
    val sorted = buf.sortWith(lt)
    new GenericArrayData(sorted.map(t => InternalRow(t._1, t._2)).toArray[Any])
  }

  override def serialize(buf: ArrayBuffer[(Double, UTF8String)]): Array[Byte] = {
    compact(buf)
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.length)
    buf.foreach { case (s, p) =>
      out.writeDouble(s)
      val b = p.getBytes
      out.writeInt(b.length)
      out.write(b)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): ArrayBuffer[(Double, UTF8String)] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = ArrayBuffer.empty[(Double, UTF8String)]
    var i = 0
    while (i < n) {
      val s = in.readDouble()
      val len = in.readInt()
      val b = new Array[Byte](len)
      in.readFully(b)
      buf += ((s, UTF8String.fromBytes(b)))
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKByScore =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKByScore =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): TopKByScore =
    copy(scoreExpr = newChildren(0), payloadExpr = newChildren(1))
}

object TopKByScore {
  def apply(score: Column, payload: Column, k: Int): Column =
    ColumnBridge.column(
      TopKByScore(ColumnBridge.expression(score), ColumnBridge.expression(payload), k)
        .toAggregateExpression())
}
