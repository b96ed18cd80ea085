package graft.functions

import java.nio.ByteBuffer
import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftExpressionBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** One-pass 32-bit SimHash as a custom TypedImperativeAggregate: the
  * buffer is the 32 per-bit weight sums; each input value contributes
  * +1 to bit j's weight if bit j of h32(value) is set, else -1; the
  * final sketch sets bit j iff its weight sum is positive.
  *
  * Replaces the explode-by-32 formulation (|values| x 32 rows through a
  * (group, j) aggregation, then a second per-group aggregation) with a
  * single aggregation whose buffer is long[32] — same two-shuffle
  * reduction as MinHashSketchAgg.
  *
  * h32(v) = integer value of the first 8 hex chars of md5(v) — the top
  * 32 bits of the digest, BIT-IDENTICAL to OracleHash.h32, so the
  * DuckDB oracle reproduces every sketch exactly.
  */
case class SimHashSketchAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  private val bits = 32

  override def children: Seq[Expression] = Seq(child)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a STRING column, got ${child.dataType}")

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_simhash_sketch"

  override def createAggregationBuffer(): Array[Long] = new Array[Long](bits)

  @transient private lazy val md5Local: ThreadLocal[MessageDigest] =
    ThreadLocal.withInitial(() => MessageDigest.getInstance("MD5"))

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val d = md5Local.get()
      d.reset()
      val digest = d.digest(v.asInstanceOf[UTF8String].getBytes)
      // first 8 hex chars == top 32 bits of the digest (h32)
      var h = 0L
      var j = 0
      while (j < 4) { h = (h << 8) | (digest(j) & 0xffL); j += 1 }
      var bit = 0
      while (bit < bits) {
        buf(bit) += (if (((h >>> bit) & 1L) == 1L) 1L else -1L)
        bit += 1
      }
    }
    buf
  }

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
    var i = 0
    while (i < bits) { b1(i) += b2(i); i += 1 }
    b1
  }

  override def eval(buf: Array[Long]): Any = {
    var sketch = 0L
    var bit = 0
    while (bit < bits) {
      if (buf(bit) > 0) sketch |= (1L << bit)
      bit += 1
    }
    sketch
  }

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 * bits)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(bits)(bb.getLong())
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): SimHashSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): SimHashSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): SimHashSketchAgg =
    copy(child = newChildren.head)
}

object SimHashSketch {
  /** Aggregate Column: 32-bit simhash of a string column (BIGINT). */
  def sketch(valueCol: Column): Column =
    GraftExpressionBridge.column(
      SimHashSketchAgg(GraftExpressionBridge.expression(valueCol))
        .toAggregateExpression())
}
