package graft.functions

import java.io.ByteArrayInputStream

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftExpressionBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.CountMinSketch

/** Point-query estimator over a serialized `count_min_sketch(...)`
  * aggregate — Spark ships the CMS AGGREGATE but no SQL-level reader for
  * the binary it produces, so the sketch is write-only from a plan's
  * point of view; this expression closes that gap and lets the
  * frequency-sketch path be verified in-plan like the HLL++ and GK twins
  * (urlcount_approx_distinct / text_len_quantiles).
  *
  * String items are probed as their UTF-8 bytes, matching how Spark's
  * CountMinSketchAgg feeds string columns into the sketch (addBinary on
  * the UTF8String bytes) — probing with a Java String would hash
  * differently and silently read garbage.
  */
object CmsSketch {
  def estimate(sketch: Array[Byte], item: UTF8String): Long =
    CountMinSketch.readFrom(new ByteArrayInputStream(sketch))
      .estimateCount(item.getBytes)
}

/** `cms_estimate(sketch, item)` — see CmsSketch.estimate. The
  * deserialization is per evaluated row: correct anywhere, intended for
  * the handful-of-probes shape (a broadcast one-row sketch joined to a
  * small probe set), not a per-corpus-row probe — for that, re-aggregate
  * instead.
  */
case class CmsEstimateExpr(left: Expression, right: Expression)
  extends BinaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "cms_estimate"
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, StringType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (binary sketch, string item), got ($l, $r)")
    }
  override protected def nullSafeEval(s: Any, i: Any): Any =
    CmsSketch.estimate(s.asInstanceOf[Array[Byte]], i.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (s, i) => s"graft.functions.CmsSketch.estimate($s, $i)")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CmsEstimateExpr =
    copy(left = newLeft, right = newRight)
}

object CmsColumns {
  def cmsEstimate(sketch: Column, item: Column): Column =
    GraftExpressionBridge.column(
      CmsEstimateExpr(GraftExpressionBridge.expression(sketch),
        GraftExpressionBridge.expression(item)))
}
