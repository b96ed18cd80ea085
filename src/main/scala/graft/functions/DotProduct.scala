package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native Catalyst expression: sequential-fold dot product of two
  * ARRAY<DOUBLE> columns.
  *
  * This is the codegen'd replacement for the
  * `aggregate(zip_with(a, b, _*_), 0.0, _+_)` formulation used by the
  * similarity operators: Spark's higher-order functions are
  * CodegenFallback (interpreted lambda dispatch per element, with boxed
  * intermediates), which showed up as the hot path in the similarity
  * suite. `doGenCode` emits a tight primitive loop instead — the
  * preference order the engine follows everywhere: builtin function >
  * native codegen Expression > UDF.
  *
  * Semantics match the higher-order formulation EXACTLY: a left fold in
  * index order over IEEE doubles (addition is not associative, and the
  * DuckDB oracle's list_dot_product folds the same way), summing
  * min(len(a), len(b)) terms. Null input (either side) -> null; null
  * ELEMENTS are not expected from the embeddings source and would fail —
  * by design, the same as the zip_with form's NPE-on-null-element.
  */
case class DotProduct(left: Expression, right: Expression)
  extends BinaryExpression {

  override def nullIntolerant: Boolean = true

  // explicit check instead of ExpectsInputTypes (whose AbstractDataType
  // signature is private[sql]): both children must be ARRAY<DOUBLE> —
  // callers cast (e.g. transform(v, _.cast("double"))) before dotting
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (array<double>, array<double>), got ($l, $r)")
    }

  override def dataType: DataType = DoubleType

  override def prettyName: String = "graft_dot"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val xs = a.asInstanceOf[ArrayData]
    val ys = b.asInstanceOf[ArrayData]
    val n = math.min(xs.numElements(), ys.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += xs.getDouble(i) * ys.getDouble(i)
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += $a.getDouble($i) * $b.getDouble($i);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}
