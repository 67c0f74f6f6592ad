package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Bounded bottom-k buffer over (order, payload) long pairs: keeps the
  * k pairs with the smallest (order, payload). Flat primitive arrays,
  * no boxing; replacement scans linearly (k is small — tens to
  * hundreds — so a heap's constant factors lose to the scan). */
final class BottomKBuffer(val k: Int) {
  val ord = new Array[Long](k)
  val pay = new Array[Long](k)
  var n = 0

  private def less(o1: Long, p1: Long, o2: Long, p2: Long): Boolean =
    o1 < o2 || (o1 == o2 && p1 < p2)

  def add(o: Long, p: Long): Unit =
    if (n < k) { ord(n) = o; pay(n) = p; n += 1 }
    else {
      var worst = 0
      var i = 1
      while (i < n) { if (less(ord(worst), pay(worst), ord(i), pay(i))) worst = i; i += 1 }
      if (less(o, p, ord(worst), pay(worst))) { ord(worst) = o; pay(worst) = p }
    }

  /** payloads sorted by (order, payload) ascending */
  def sortedPayloads: Array[Long] = {
    val idx = (0 until n).sortBy(i => (ord(i), pay(i)))
    idx.map(pay).toArray
  }
}

/** Top-k-per-group as an AGGREGATE (TypedImperativeAggregate — the
  * custom-UDAF extension route, SURVEY §2.10): `bottom_k(order,
  * payload, k)` returns the payloads of the k smallest (order,
  * payload) pairs per group, in order.
  *
  * Versus the `row_number() OVER (...) <= k` formulation this is
  * partial+final: every map task keeps at most k pairs per group and
  * the shuffle moves k-bounded buffers, not all rows — a window must
  * shuffle and sort the whole partition (WindowGroupLimit trims but
  * only after the exchange). The specialization to primitive longs
  * keeps update/merge allocation-free.
  *
  * Deterministic when (order, payload) pairs are distinct — payload is
  * the tie-break, so ordering by a hash column gives consistent
  * per-group sampling (q87).
  */
case class BottomK(
    orderChild: Expression,
    payloadChild: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[BottomKBuffer] with BinaryLike[Expression] {

  require(k >= 1 && k <= (1 << 20), "bottom_k: k must be in [1, 2^20]")

  override def left: Expression = orderChild
  override def right: Expression = payloadChild
  override def prettyName: String = "bottom_k"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult =
    (orderChild.dataType, payloadChild.dataType) match {
      case (LongType, LongType) => TypeCheckResult.TypeCheckSuccess
      case (o, p) => TypeCheckResult.TypeCheckFailure(
        s"bottom_k requires (bigint, bigint), got ($o, $p)")
    }

  override def createAggregationBuffer(): BottomKBuffer = new BottomKBuffer(k)

  override def update(buf: BottomKBuffer, input: InternalRow): BottomKBuffer = {
    val o = orderChild.eval(input)
    val p = payloadChild.eval(input)
    if (o != null && p != null) buf.add(o.asInstanceOf[Long], p.asInstanceOf[Long])
    buf
  }

  override def merge(buf: BottomKBuffer, other: BottomKBuffer): BottomKBuffer = {
    var i = 0
    while (i < other.n) { buf.add(other.ord(i), other.pay(i)); i += 1 }
    buf
  }

  override def eval(buf: BottomKBuffer): Any = new GenericArrayData(buf.sortedPayloads)

  override def serialize(buf: BottomKBuffer): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 16 * buf.n)
    bb.putInt(buf.n)
    var i = 0
    while (i < buf.n) { bb.putLong(buf.ord(i)); bb.putLong(buf.pay(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): BottomKBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new BottomKBuffer(k)
    var i = 0
    while (i < n) { val o = bb.getLong; val p = bb.getLong; buf.add(o, p); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): BottomK =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BottomK =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BottomK =
    copy(orderChild = newLeft, payloadChild = newRight)
}

object BottomK {
  import org.apache.spark.sql.Column
  import org.apache.spark.sql.graft.ColumnBridge

  /** bottom_k as a Column aggregate. */
  def of(order: Column, payload: Column, k: Int): Column =
    ColumnBridge.column(
      BottomK(ColumnBridge.expression(order), ColumnBridge.expression(payload), k)
        .toAggregateExpression())
}
