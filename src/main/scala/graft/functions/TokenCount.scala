package graft.functions

import java.util.regex.Pattern

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftExpressionBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native token counting: the number of non-empty fields of
  * `split(s, sep, -1)`, computed in one matcher pass with NO field-array
  * materialization — the codegen'd replacement for the
  * `size(filter(split(text, sep), t -> length(t) > 0))` idiom, whose
  * higher-order filter Spark evaluates as an interpreted per-element
  * lambda over an allocated array.
  *
  * Equivalence to the idiom holds for any separator regex that cannot
  * match the empty string (zero-width separators change Java's split
  * segmentation; the optimizer rule that introduces this expression
  * guards on exactly that — see graft.plans.TokenCountRewrite).
  */
object TokenCount {

  // compiled per distinct separator, shared across rows and tasks —
  // codegen calls the static method, so the cache lives here rather
  // than on the expression instance (same pattern as TextShingles)
  private val patternCache =
    new java.util.concurrent.ConcurrentHashMap[String, Pattern]()
  private def pattern(sep: String): Pattern =
    patternCache.computeIfAbsent(sep, Pattern.compile(_))

  /** Count of non-empty split fields: segments strictly between
    * separator matches, plus the tail after the last match.
    */
  def countTokens(s: UTF8String, sep: String): Int = {
    val str = s.toString
    val m = pattern(sep).matcher(str)
    var count = 0
    var last = 0
    while (m.find()) {
      if (m.start() > last) count += 1
      last = m.end()
    }
    if (str.length > last) count += 1
    count
  }
}

/** `token_count(text, sep)` — see TokenCount.countTokens. IntegerType,
  * matching the `size(...)` it substitutes for.
  */
case class TokenCountExpr(child: Expression, sep: String) extends UnaryExpression {
  override def dataType: DataType = IntegerType
  override def prettyName: String = "token_count"
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"$prettyName requires STRING")
  override protected def nullSafeEval(v: Any): Any =
    TokenCount.countTokens(v.asInstanceOf[UTF8String], sep)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val sepRef = ctx.addReferenceObj("tokenCountSep", sep, "java.lang.String")
    defineCodeGen(ctx, ev, c => s"graft.functions.TokenCount.countTokens($c, $sepRef)")
  }
  override protected def withNewChildInternal(newChild: Expression): TokenCountExpr =
    copy(child = newChild)
}

object TokenCountColumns {
  def tokenCount(text: Column, sep: String): Column =
    GraftExpressionBridge.column(
      TokenCountExpr(GraftExpressionBridge.expression(text), sep))
}
