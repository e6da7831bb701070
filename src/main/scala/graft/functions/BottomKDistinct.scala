package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Bounded KMV buffer: the k smallest DISTINCT longs, O(k) state.
  *
  * This is the k-minimum-values sketch's native aggregation shape: a
  * sorted bounded set, O(log k) insert, merge = absorb. The previous
  * formulation (`distinct()` then a top-k over the deduped rows) paid a
  * full extra exchange just to dedup before the bounded aggregation;
  * set semantics inside the buffer make the dedup free and keep the
  * whole pass ONE partial-aggregated job (guide §2.3: aggregate before
  * you shuffle — only O(k) state per group ever crosses the wire). */
final class BottomKSet(val k: Int) {
  private[functions] val set = new java.util.TreeSet[java.lang.Long]()

  def add(v: Long): Unit = {
    if (set.size < k) { set.add(v); () }
    else if (v < set.last()) {
      if (set.add(v)) { set.remove(set.last()); () }
    }
  }

  def absorb(other: BottomKSet): Unit = {
    val it = other.set.iterator()
    while (it.hasNext) add(it.next())
  }

  /** Ascending — the KMV canonical order (m_k is the last element). */
  def sortedAsc: Array[Long] = {
    val out = new Array[Long](set.size)
    val it = set.iterator()
    var i = 0
    while (it.hasNext) { out(i) = it.next(); i += 1 }
    out
  }

  def toBytes: Array[Byte] = {
    val vs = sortedAsc
    val bb = ByteBuffer.allocate(4 + 8 * vs.length)
    bb.putInt(vs.length)
    vs.foreach(bb.putLong)
    bb.array()
  }
}

object BottomKSet {
  def fromBytes(k: Int, bytes: Array[Byte]): BottomKSet = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val s = new BottomKSet(k)
    var i = 0
    while (i < n) { s.add(bb.getLong); i += 1 }
    s
  }
}

/** Native per-group bottom-k-distinct aggregate:
  * `bottomk_distinct(value, k)` → ascending `array<bigint>` of the k
  * smallest distinct non-null values. Nulls are skipped (a KMV sketch
  * speaks only for present values; the null count is a separate stat). */
case class BottomKDistinct(value: Expression, k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[BottomKSet] {

  require(k > 0, s"bottomk_distinct needs k > 0, got $k")

  override def children: Seq[Expression] = Seq(value)
  override def nullable: Boolean = false
  override def prettyName: String = "bottomk_distinct"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis
      .TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
    if (value.dataType != LongType)
      TypeCheckResult.TypeCheckFailure(
        s"bottomk_distinct value must be BIGINT, got " +
          value.dataType.simpleString)
    else TypeCheckResult.TypeCheckSuccess
  }

  override def dataType: DataType =
    ArrayType(LongType, containsNull = false)

  override def createAggregationBuffer(): BottomKSet = new BottomKSet(k)

  override def update(buf: BottomKSet, input: InternalRow): BottomKSet = {
    val v = value.eval(input)
    if (v != null) buf.add(v.asInstanceOf[Long])
    buf
  }

  override def merge(buf: BottomKSet, other: BottomKSet): BottomKSet = {
    buf.absorb(other); buf
  }

  override def eval(buf: BottomKSet): Any =
    new GenericArrayData(buf.sortedAsc)

  override def serialize(buf: BottomKSet): Array[Byte] = buf.toBytes

  override def deserialize(bytes: Array[Byte]): BottomKSet =
    BottomKSet.fromBytes(k, bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): BottomKDistinct =
    copy(mutableAggBufferOffset = newOffset)

  override def withNewInputAggBufferOffset(newOffset: Int): BottomKDistinct =
    copy(inputAggBufferOffset = newOffset)

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): BottomKDistinct =
    copy(value = newChildren(0))
}

object BottomKDistinct {
  def column(value: Column, k: Int): Column =
    GraftSqlBridge.column(BottomKDistinct(
      GraftSqlBridge.expression(value), k).toAggregateExpression())
}
