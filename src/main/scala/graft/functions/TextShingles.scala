package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftExpressionBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native text-sharding expressions for the dedup/fingerprint suite.
  *
  * Both replace higher-order-function formulations
  * (`transform(sequence(...), i => ...)` chains) that Spark evaluates as
  * interpreted per-element lambdas — per gram that meant substr + md5 +
  * hex-string + conv-parse allocations. These run the same math in one
  * tight JVM loop per row and are wired into whole-stage codegen via a
  * static call (the StaticInvoke pattern), so the surrounding stage
  * keeps its codegen span.
  *
  * Semantics are bit-identical to the SQL formulations (and therefore
  * to the DuckDB oracles) — string positions are CODE POINTS (what both
  * engines' length()/substr() count), hashes are the md5-derived
  * h60/h32 of OracleHash.
  */
object TextShingles {

  /** Word shingles: lowercase, split on the single space character, drop
    * empty tokens, emit all n-token shingles joined by one space.
    * Returns an empty array when fewer than n tokens exist (the SQL
    * filter(size >= n) equivalent: explode emits nothing).
    */
  def computeShingles(text: UTF8String, n: Int): GenericArrayData =
    computeShingles(text, n, false)

  /** As above; `dedup = true` additionally keeps only the FIRST
    * occurrence of each shingle (one hash-set pass in-row — O(m), where
    * Spark's own array_distinct over a STRING array falls back to an
    * O(m^2) pairwise scan). A doc's shingles all originate in its one
    * source row, so this IS the (doc_id, shingle) DISTINCT the dedup
    * ladder needs, computed with no exchange.
    */
  def computeShingles(text: UTF8String, n: Int, dedup: Boolean): GenericArrayData = {
    if (dedup) {
      val all = computeShingles(text, n, false)
      val m = all.numElements()
      if (m == 0) return all
      val seen = new java.util.LinkedHashSet[Any](m * 2)
      var i = 0
      while (i < m) { seen.add(all.array(i)); i += 1 }
      if (seen.size == m) return all
      val out = new Array[Any](seen.size)
      val it = seen.iterator()
      var j = 0
      while (it.hasNext) { out(j) = it.next(); j += 1 }
      return new GenericArrayData(out)
    }
    // Locale.ROOT: locale-independent Unicode folding, matching DuckDB's
    // lower(). UTF8String.toLowerCase would fall back to the DEFAULT JVM
    // locale for non-ASCII input (a Turkish-locale JVM folds I -> ı and
    // breaks oracle parity) — ADVICE r3.
    val s = text.toString.toLowerCase(java.util.Locale.ROOT)
    val toks = new java.util.ArrayList[String]()
    var start = 0
    var i = 0
    while (i <= s.length) {
      if (i == s.length || s.charAt(i) == ' ') {
        if (i > start) toks.add(s.substring(start, i))
        start = i + 1
      }
      i += 1
    }
    val m = toks.size
    if (m < n) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](m - n + 1)
    var j = 0
    while (j <= m - n) {
      val sb = new java.lang.StringBuilder()
      var t = 0
      while (t < n) {
        if (t > 0) sb.append(' ')
        sb.append(toks.get(j + t))
        t += 1
      }
      out(j) = UTF8String.fromString(sb.toString)
      j += 1
    }
    new GenericArrayData(out)
  }

  private val md5Local: ThreadLocal[MessageDigest] =
    ThreadLocal.withInitial(() => MessageDigest.getInstance("MD5"))

  // "i:" slot prefixes, memoized per k: computeMinhashArray runs per ROW
  // on the streaming ingest hot path, so rebuilding the k byte arrays
  // every call is k allocations/row for constants (ADVICE r4 — the same
  // pattern MinHashSketchAgg.md5Prefixes already hoists). Keyed map (not
  // an expression field) because codegen calls the static method.
  private val prefixCache =
    new java.util.concurrent.ConcurrentHashMap[Int, Array[Array[Byte]]]()
  private def md5Prefixes(k: Int): Array[Array[Byte]] =
    prefixCache.computeIfAbsent(k,
      kk => Array.tabulate(kk)(i => (i.toString + ":").getBytes("UTF-8")))

  /** Per-row k-minima minhash sketch of a string array: slot i = min
    * over elements e of h60(md5("i:" + e)) — BIT-IDENTICAL to the md5
    * family of MinHashSketchAgg (and so to the DuckDB oracle), but
    * computed in one tight loop per row for the streaming ingest path,
    * where a per-doc aggregation doesn't exist and the HOF formulation
    * (transform/sequence/array_min) pays interpreted lambda dispatch
    * per (element, slot). Empty input -> empty array (no sketch).
    */
  def computeMinhashArray(arr: org.apache.spark.sql.catalyst.util.ArrayData,
                          k: Int): GenericArrayData = {
    val n = arr.numElements()
    if (n == 0) return new GenericArrayData(Array.empty[Any])
    val mins = Array.fill(k)(Long.MaxValue)
    val prefixes = md5Prefixes(k)
    val d = md5Local.get()
    var j = 0
    while (j < n) {
      val bytes = arr.getUTF8String(j).getBytes
      var i = 0
      while (i < k) {
        // two-step update — md5(prefix || bytes) without a concat buffer
        d.reset()
        d.update(prefixes(i))
        d.update(bytes)
        val digest = d.digest()
        var be = 0L
        var b = 0
        while (b < 8) { be = (be << 8) | (digest(b) & 0xffL); b += 1 }
        val h = be >>> 4 // h60: first 15 hex chars == top 60 bits
        if (h < mins(i)) mins(i) = h
        i += 1
      }
      j += 1
    }
    new GenericArrayData(mins.map(v => v: Any))
  }

  /** Winnowing fingerprints of an (already normalized) string: h60 of
    * every k-code-point gram, then the minimum of each w-wide window of
    * gram hashes, in window order (duplicates included — the caller
    * applies DISTINCT). Empty array when no full window exists.
    */
  def computeWinnow(norm: UTF8String, k: Int, w: Int): GenericArrayData = {
    val cps = norm.toString.codePoints().toArray
    val nGrams = cps.length - k + 1
    val nWin = nGrams - w + 1
    if (nWin < 1) return new GenericArrayData(Array.empty[Any])
    val d = md5Local.get()
    val hashes = new Array[Long](nGrams)
    var i = 0
    while (i < nGrams) {
      val gram = new String(cps, i, k)
      d.reset()
      val digest = d.digest(gram.getBytes("UTF-8"))
      var be = 0L
      var j = 0
      while (j < 8) { be = (be << 8) | (digest(j) & 0xffL); j += 1 }
      hashes(i) = be >>> 4 // h60: first 15 hex chars == top 60 bits
      i += 1
    }
    val out = new Array[Any](nWin)
    var p = 0
    while (p < nWin) {
      var mn = hashes(p)
      var q = 1
      while (q < w) { if (hashes(p + q) < mn) mn = hashes(p + q); q += 1 }
      out(p) = mn
      p += 1
    }
    new GenericArrayData(out)
  }
}

/** `word_shingles(text, n)` — see TextShingles.computeShingles. */
case class WordShinglesExpr(child: Expression, n: Int,
                            dedup: Boolean = false) extends UnaryExpression {
  require(n > 0)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "word_shingles"
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"$prettyName requires STRING")
  override protected def nullSafeEval(v: Any): Any =
    TextShingles.computeShingles(v.asInstanceOf[UTF8String], n, dedup)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextShingles.computeShingles($c, $n, $dedup)")
  override protected def withNewChildInternal(newChild: Expression): WordShinglesExpr =
    copy(child = newChild)
}

/** `winnow_fps(norm, k, w)` — see TextShingles.computeWinnow. */
case class WinnowFpsExpr(child: Expression, k: Int, w: Int) extends UnaryExpression {
  require(k > 0 && w > 0)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "winnow_fps"
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"$prettyName requires STRING")
  override protected def nullSafeEval(v: Any): Any =
    TextShingles.computeWinnow(v.asInstanceOf[UTF8String], k, w)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextShingles.computeWinnow($c, $k, $w)")
  override protected def withNewChildInternal(newChild: Expression): WinnowFpsExpr =
    copy(child = newChild)
}

/** `minhash_array(shingles, k)` — see TextShingles.computeMinhashArray. */
case class MinHashArrayExpr(child: Expression, k: Int) extends UnaryExpression {
  require(k > 0)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_array"
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(s"$prettyName requires ARRAY<STRING>")
  }
  override protected def nullSafeEval(v: Any): Any =
    TextShingles.computeMinhashArray(
      v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData], k)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextShingles.computeMinhashArray($c, $k)")
  override protected def withNewChildInternal(newChild: Expression): MinHashArrayExpr =
    copy(child = newChild)
}

object ShingleColumns {
  def wordShingles(text: Column, n: Int): Column =
    GraftExpressionBridge.column(
      WordShinglesExpr(GraftExpressionBridge.expression(text), n))
  /** First-occurrence-distinct shingles (in-row hash-set dedup). */
  def wordShinglesDistinct(text: Column, n: Int): Column =
    GraftExpressionBridge.column(
      WordShinglesExpr(GraftExpressionBridge.expression(text), n, dedup = true))
  def winnowFps(norm: Column, k: Int, w: Int): Column =
    GraftExpressionBridge.column(
      WinnowFpsExpr(GraftExpressionBridge.expression(norm), k, w))
  def minhashArray(shingles: Column, k: Int): Column =
    GraftExpressionBridge.column(
      MinHashArrayExpr(GraftExpressionBridge.expression(shingles), k))
}
