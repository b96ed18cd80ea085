package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftExpressionBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Top-k (count, tag) entries as a custom TypedImperativeAggregate —
  * the aggregate form of "rank-per-group, keep k" that replaces the
  * window formulation's per-group SORT with a bounded k-entry buffer:
  *
  *   window form:  Exchange(group) -> Sort(group, ord desc) -> rank filter
  *   this form:    partial top-k map-side -> Exchange carrying k rows
  *                 per group -> merge
  *
  * At 100 TB the difference is what crosses the wire: |groups| x k
  * entries instead of every (group, tag) row, and no per-group sort at
  * all — the buffer keeps the k best seen via O(k) insertion (k is
  * single-digit; a heap would only help for large k).
  *
  * Total order: higher ord wins, ties to the LEXICALLY SMALLER tag —
  * identical to the window twin's (n DESC, tag ASC) rank so the two
  * formulations are row-for-row equal (EventWindowsSpec pins it, and
  * ev_daily_top_agg shares ev_daily_top's oracle).
  */
case class TopKTagAgg(
    ord: Expression,
    tag: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKTagAgg.Buffer] {

  import TopKTagAgg.{Buffer, Entry}

  require(k > 0, "k must be positive")

  override def children: Seq[Expression] = Seq(ord, tag)

  override def checkInputDataTypes(): TypeCheckResult =
    if (ord.dataType == LongType && tag.dataType == StringType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (BIGINT, STRING), got (${ord.dataType}, ${tag.dataType})")

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("n", LongType, nullable = false),
      StructField("tag", StringType, nullable = false))),
    containsNull = false)

  override def nullable: Boolean = false
  override def prettyName: String = "graft_top_k"

  override def createAggregationBuffer(): Buffer = new Buffer

  /** a strictly better than b: higher count, ties to smaller tag. */
  private def better(aN: Long, aTag: UTF8String, bN: Long, bTag: UTF8String): Boolean =
    aN > bN || (aN == bN && aTag.compareTo(bTag) < 0)

  private def insert(buf: Buffer, n: Long, tag: UTF8String): Unit = {
    if (buf.entries.length < k) {
      buf.entries += Entry(n, tag)
    } else {
      // find the worst resident entry; replace it if the candidate beats it
      var worst = 0
      var i = 1
      while (i < buf.entries.length) {
        val e = buf.entries(i)
        val w = buf.entries(worst)
        if (better(w.n, w.tag, e.n, e.tag)) worst = i
        i += 1
      }
      val w = buf.entries(worst)
      if (better(n, tag, w.n, w.tag)) buf.entries(worst) = Entry(n, tag)
    }
  }

  override def update(buf: Buffer, input: InternalRow): Buffer = {
    val o = ord.eval(input)
    val t = tag.eval(input)
    if (o != null && t != null) {
      // clone: the UTF8String from eval may alias a reused row buffer
      insert(buf, o.asInstanceOf[Long], t.asInstanceOf[UTF8String].clone())
    }
    buf
  }

  override def merge(b1: Buffer, b2: Buffer): Buffer = {
    b2.entries.foreach(e => insert(b1, e.n, e.tag))
    b1
  }

  override def eval(buf: Buffer): Any = {
    val sorted = buf.entries.sortWith((a, b) => better(a.n, a.tag, b.n, b.tag))
    new GenericArrayData(sorted.map(e =>
      new GenericInternalRow(Array[Any](e.n, e.tag))).toArray[Any])
  }

  override def serialize(buf: Buffer): Array[Byte] = {
    val bytes = buf.entries.map(e => e.tag.getBytes)
    val bb = ByteBuffer.allocate(4 + bytes.map(b => 12 + b.length).sum)
    bb.putInt(buf.entries.length)
    buf.entries.zip(bytes).foreach { case (e, tb) =>
      bb.putLong(e.n); bb.putInt(tb.length); bb.put(tb)
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Buffer = {
    val bb = ByteBuffer.wrap(bytes)
    val buf = new Buffer
    val n = bb.getInt()
    var i = 0
    while (i < n) {
      val cnt = bb.getLong()
      val len = bb.getInt()
      val tb = new Array[Byte](len)
      bb.get(tb)
      buf.entries += Entry(cnt, UTF8String.fromBytes(tb))
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKTagAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKTagAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKTagAgg =
    copy(ord = newChildren(0), tag = newChildren(1))
}

object TopKTagAgg {
  case class Entry(n: Long, tag: UTF8String)
  final class Buffer {
    val entries: scala.collection.mutable.ArrayBuffer[Entry] =
      scala.collection.mutable.ArrayBuffer.empty
  }
}

object TopKSketch {
  /** Aggregate Column: top-k (n, tag) structs ordered (n desc, tag asc). */
  def topK(ordCol: Column, tagCol: Column, k: Int): Column =
    GraftExpressionBridge.column(
      TopKTagAgg(
        GraftExpressionBridge.expression(ordCol),
        GraftExpressionBridge.expression(tagCol), k)
        .toAggregateExpression())
}
