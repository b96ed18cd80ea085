package graft.functions

import java.nio.ByteBuffer
import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftExpressionBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** One-pass MinHash sketch as a custom TypedImperativeAggregate: per
  * group, the k-element array of minima min_i over values v of
  * hash_i(v), i in [0, k).
  *
  * This replaces the explode-by-k + groupBy(doc, i) formulation: the
  * aggregation buffer is a single long[k] updated in place, so the
  * shuffle carries |groups| sketch rows instead of |groups| x k
  * signature rows, and the band/scoring stages downstream become narrow
  * array expressions instead of additional shuffles — the SURVEY §7
  * "custom TypedImperativeAggregate[MinHashSketch]" upgrade path.
  *
  * Two hash families:
  *  - "md5": member i = integer value of the first 15 hex chars of
  *    md5("i:" + v) — BIT-IDENTICAL to OracleHash.h60i, so the DuckDB
  *    oracle reproduces every signature exactly (the correctness gate).
  *    The first 15 hex chars are the top 60 bits of the 128-bit digest:
  *    big-endian first 8 bytes >>> 4.
  *  - "xxh64": member i = XXH64(bytes of v, seed = i) — the production
  *    family (no cryptographic hash per row); sketch math identical,
  *    not oracle-reproducible.
  */
case class MinHashSketchAgg(
    child: Expression,
    k: Int,
    family: String,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  require(k > 0, "k must be positive")
  require(family == "md5" || family == "xxh64", s"unknown family: $family")

  override def children: Seq[Expression] = Seq(child)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a STRING column, got ${child.dataType}")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_minhash_sketch"

  override def createAggregationBuffer(): Array[Long] =
    Array.fill(k)(Long.MaxValue)

  // MessageDigest is not thread-safe and allocation is per-call overhead;
  // one instance per task thread
  @transient private lazy val md5Local: ThreadLocal[MessageDigest] =
    ThreadLocal.withInitial(() => MessageDigest.getInstance("MD5"))

  // the "i:" prefixes are constant per hash index — precomputed once so
  // the hot update() loop allocates only the concatenated buffer
  // (ADVICE r3: was 2 allocations per row per hash index)
  @transient private lazy val md5Prefixes: Array[Array[Byte]] =
    Array.tabulate(k)(i => (i.toString + ":").getBytes("UTF-8"))

  private def h60md5(prefixed: Array[Byte]): Long = {
    val d = md5Local.get()
    d.reset()
    val digest = d.digest(prefixed)
    var be = 0L
    var j = 0
    while (j < 8) { be = (be << 8) | (digest(j) & 0xffL); j += 1 }
    be >>> 4 // first 15 hex chars == top 60 bits
  }

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val s = v.asInstanceOf[UTF8String]
      if (family == "md5") {
        val bytes = s.getBytes
        var i = 0
        while (i < k) {
          // "i:" + v, matching OracleHash.h60i's concat exactly
          val prefix = md5Prefixes(i)
          val prefixed = new Array[Byte](prefix.length + bytes.length)
          System.arraycopy(prefix, 0, prefixed, 0, prefix.length)
          System.arraycopy(bytes, 0, prefixed, prefix.length, bytes.length)
          val h = h60md5(prefixed)
          if (h < buf(i)) buf(i) = h
          i += 1
        }
      } else {
        var i = 0
        while (i < k) {
          val h = org.apache.spark.sql.catalyst.expressions.XXH64
            .hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, i.toLong)
          if (h < buf(i)) buf(i) = h
          i += 1
        }
      }
    }
    buf
  }

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
    var i = 0
    while (i < k) { if (b2(i) < b1(i)) b1(i) = b2(i); i += 1 }
    b1
  }

  override def eval(buf: Array[Long]): Any =
    if (buf.forall(_ == Long.MaxValue)) null // no non-null input rows
    else new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 * k)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(k)(bb.getLong())
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MinHashSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MinHashSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): MinHashSketchAgg =
    copy(child = newChildren.head)
}

object MinHashSketch {
  /** Aggregate Column: k-minima sketch of a string column. */
  def sketch(valueCol: Column, k: Int, family: String = "md5"): Column =
    GraftExpressionBridge.column(
      MinHashSketchAgg(GraftExpressionBridge.expression(valueCol), k, family)
        .toAggregateExpression())
}
