package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{BinaryType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.CountMinSketch

/** Point query against a serialized count-min sketch (the binary
  * produced by Spark's `count_min_sketch` aggregate): estimated count
  * of `item`, guaranteed >= the true count and, with the sketch's
  * confidence, <= true + eps * totalCount.
  *
  * Spark ships the CMS *build* side as an aggregate but no expression
  * to *query* the sketch — estimates normally require collecting the
  * blob to the driver. This expression closes the loop so
  * sketch-vs-candidates stays a distributed dataflow (the one-row
  * sketch frame broadcast-joins the candidate set).
  *
  * The sketch is added with UTF8String bytes on the aggregate side
  * (StringType input), so the probe hashes the same bytes
  * (`estimateCount(byte[])`).
  *
  * CodegenFallback deliberately: a sketch probe runs once per
  * CANDIDATE (tens of rows after the heavy-hitter cut), never in a
  * per-token hot loop — deserialization caching matters (a ~MB blob
  * per evaluation otherwise), codegen does not.
  */
case class CmsEstimate(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

  override def prettyName: String = "cms_estimate"
  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, StringType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"cms_estimate requires (binary sketch, string item), got ($l, $r)")
    }

  // Deserialized-sketch cache: the same broadcast blob arrives for
  // every candidate row. Content equality, not reference — unsafe rows
  // may hand out fresh copies.
  @transient private var lastBytes: Array[Byte] = _
  @transient private var lastSketch: CountMinSketch = _

  override protected def nullSafeEval(sketchBytes: Any, item: Any): Any = {
    val bytes = sketchBytes.asInstanceOf[Array[Byte]]
    if (lastSketch == null || !java.util.Arrays.equals(bytes, lastBytes)) {
      lastSketch = CountMinSketch.readFrom(bytes)
      lastBytes = bytes
    }
    lastSketch.estimateCount(item.asInstanceOf[UTF8String].getBytes)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object CmsEstimate {
  /** Column-level wrapper. */
  def apply(sketch: Column, item: Column): Column =
    ColumnBridge.column(
      CmsEstimate(ColumnBridge.expression(sketch), ColumnBridge.expression(item)))
}
