package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Bounded top-k buffer: the k best (score, id) pairs under
  * "higher score wins, ties to the LOWER id", held as a binary min-heap
  * whose root is the WORST kept pair — O(log k) per accepted row, O(1)
  * per rejected row (one compare against the root), O(k) state.
  *
  * Primitive parallel arrays, no boxing: this buffer lives on the
  * aggregation hot path of every ANN query (one `add` per scored
  * corpus×query pair). */
final class TopKHeap(val k: Int) {
  private val scores = new Array[Double](math.max(k, 1))
  private val ids = new Array[Long](math.max(k, 1))
  private var n = 0

  /** Is (sa, ia) strictly worse than (sb, ib)? Worse = lower score, or
    * equal score with the higher id (ids never repeat within a key).
    * Scores compare via Double.compare — the EXACT mirror of
    * [[sortedDesc]]'s emission comparator: a primitive `<` is false for
    * NaN on either side, so once the heap held k entries a NaN score
    * (cosine of a zero-norm vector) could never be admitted even though
    * the window/sort oracle ranks NaN above every finite score, and
    * -0.0/0.0 ties would break by id instead of sign. */
  @inline private def worse(sa: Double, ia: Long, sb: Double, ib: Long): Boolean = {
    val c = java.lang.Double.compare(sa, sb)
    c < 0 || (c == 0 && ia > ib)
  }

  private def siftUp(start: Int): Unit = {
    var i = start
    while (i > 0) {
      val p = (i - 1) >> 1
      // heap property: parent is worse-or-equal vs children (root = worst)
      if (worse(scores(i), ids(i), scores(p), ids(p))) {
        val s = scores(i); val d = ids(i)
        scores(i) = scores(p); ids(i) = ids(p)
        scores(p) = s; ids(p) = d
        i = p
      } else return
    }
  }

  private def siftDown(start: Int): Unit = {
    var i = start
    while (true) {
      val l = 2 * i + 1
      val r = l + 1
      var w = i
      if (l < n && worse(scores(l), ids(l), scores(w), ids(w))) w = l
      if (r < n && worse(scores(r), ids(r), scores(w), ids(w))) w = r
      if (w == i) return
      val s = scores(i); val d = ids(i)
      scores(i) = scores(w); ids(i) = ids(w)
      scores(w) = s; ids(w) = d
      i = w
    }
  }

  def add(s: Double, i: Long): Unit =
    if (k > 0) {
      if (n < k) { scores(n) = s; ids(n) = i; n += 1; siftUp(n - 1) }
      else if (worse(scores(0), ids(0), s, i)) {
        scores(0) = s; ids(0) = i; siftDown(0)
      }
    }

  def absorb(other: TopKHeap): Unit = {
    var i = 0
    while (i < other.n) { add(other.scores(i), other.ids(i)); i += 1 }
  }

  /** Kept pairs, best-first (score DESC, id ASC) — the emission order. */
  def sortedDesc: Array[(Double, Long)] = {
    val out = Array.tabulate(n)(i => (scores(i), ids(i)))
    java.util.Arrays.sort(out, (a: (Double, Long), b: (Double, Long)) => {
      val c = java.lang.Double.compare(b._1, a._1)
      if (c != 0) c else java.lang.Long.compare(a._2, b._2)
    })
    out
  }

  def toBytes: Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 16 * n)
    bb.putInt(n)
    var i = 0
    while (i < n) { bb.putDouble(scores(i)); bb.putLong(ids(i)); i += 1 }
    bb.array()
  }
}

object TopKHeap {
  def fromBytes(k: Int, bytes: Array[Byte]): TopKHeap = {
    val bb = ByteBuffer.wrap(bytes)
    val m = bb.getInt
    val h = new TopKHeap(k)
    var i = 0
    while (i < m) { h.add(bb.getDouble, bb.getLong); i += 1 }
    h
  }
}

/** Native per-group top-k aggregate: `topk_pairs(score, id, k)` →
  * `array<struct<score double, id bigint>>`, best-first (score DESC,
  * id ASC on ties).
  *
  * Replaces the typed `Aggregator`/`groupByKey` formulation on the ANN
  * hot path (VERDICT r10 item 2): the typed form routes every scored row
  * through `as[(Long, Long, Double)]` — deserializing each Tungsten row
  * into a JVM tuple and cutting whole-stage codegen at the aggregation
  * boundary. As a `TypedImperativeAggregate` the input side stays
  * codegen'd InternalRows (the upstream projection fuses into the
  * ObjectHashAggregate's child stage), `update` reads two primitive
  * fields per row, and partial buffers ship as compact binary —
  * O(k) state per key through partial aggregation, identical plan shape
  * (ObjectHashAggregate pair, no window, no sort exchange — the
  * ScaleSpecs pin).
  *
  * The window-function formulation (`row_number() OVER (PARTITION BY key
  * ORDER BY score)`) must shuffle and SORT every scored row into |keys|
  * reducers — with a handful of queries over a 100 TB corpus, a
  * per-query single-reducer sort of the whole corpus. This carries at
  * most k pairs per key per map task.
  */
case class TopKPairs(score: Expression, id: Expression, k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKHeap] {

  require(k > 0, s"topk_pairs needs k > 0, got $k")

  override def children: Seq[Expression] = Seq(score, id)
  override def nullable: Boolean = false
  override def prettyName: String = "topk_pairs"

  // update() reads the inputs as primitive Double/Long; without this an
  // e.g. FloatType score or IntegerType id column would surface as an
  // executor-side ClassCastException instead of an analysis-time error
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis
      .TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
    if (score.dataType != DoubleType)
      TypeCheckResult.TypeCheckFailure(
        s"topk_pairs score must be DOUBLE, got ${score.dataType.simpleString}")
    else if (id.dataType != LongType)
      TypeCheckResult.TypeCheckFailure(
        s"topk_pairs id must be BIGINT, got ${id.dataType.simpleString}")
    else TypeCheckResult.TypeCheckSuccess
  }

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("score", DoubleType, nullable = false),
    StructField("id", LongType, nullable = false))), containsNull = false)

  override def createAggregationBuffer(): TopKHeap = new TopKHeap(k)

  override def update(buf: TopKHeap, input: InternalRow): TopKHeap = {
    val s = score.eval(input)
    val i = id.eval(input)
    if (s != null && i != null)
      buf.add(s.asInstanceOf[Double], i.asInstanceOf[Long])
    buf
  }

  override def merge(buf: TopKHeap, other: TopKHeap): TopKHeap = {
    buf.absorb(other); buf
  }

  override def eval(buf: TopKHeap): Any =
    new GenericArrayData(buf.sortedDesc.map { case (s, i) =>
      InternalRow(s, i)
    })

  override def serialize(buf: TopKHeap): Array[Byte] = buf.toBytes

  override def deserialize(bytes: Array[Byte]): TopKHeap =
    TopKHeap.fromBytes(k, bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKPairs =
    copy(mutableAggBufferOffset = newOffset)

  override def withNewInputAggBufferOffset(newOffset: Int): TopKPairs =
    copy(inputAggBufferOffset = newOffset)

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKPairs =
    copy(score = newChildren(0), id = newChildren(1))
}

object TopKPairs {
  /** Column-API entry point: aggregate `array<struct<score,id>>`. */
  def column(score: Column, id: Column, k: Int): Column =
    GraftSqlBridge.column(TopKPairs(GraftSqlBridge.expression(score),
      GraftSqlBridge.expression(id), k).toAggregateExpression())
}
