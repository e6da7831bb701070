package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Typed per-key top-k aggregator: keeps the k highest-scoring (score, id)
  * pairs per group in a bounded buffer.
  *
  * The window-function formulation (`row_number() OVER (... ORDER BY score)
  * WHERE rn <= k`) must shuffle and SORT every row of every key; this
  * aggregator carries O(k) state per key through partial aggregation, so
  * the shuffle moves at most k pairs per key per map task — the right
  * shape when k ≪ rows-per-key at 100 TB. Custom-aggregation machinery per
  * SURVEY §7 (`Aggregator[IN, BUF, OUT]`).
  *
  * Ordering: higher score first, then lower id (deterministic ties).
  */
final class TopKAggregator[IN](k: Int, score: IN => Double, id: IN => Long)
    extends Aggregator[IN, Seq[(Double, Long)], Seq[(Double, Long)]]
    with Serializable {

  // Amortized bound: the buffer grows by O(1) Vector appends up to
  // `cap`, then one O(cap log cap) sort trims it back to k — a sort per
  // row (the naive shrink-on-reduce) costs O(k log k) PER INPUT ROW on
  // the hot path. State stays O(k)-bounded for the shuffle either way:
  // partial buffers ship at most cap = max(4k, k+8) pairs.
  private val cap = math.max(4 * k, k + 8)

  private def shrink(buf: Seq[(Double, Long)]): Seq[(Double, Long)] =
    buf.sortBy { case (s, i) => (-s, i) }.take(k)

  private def vec(buf: Seq[(Double, Long)]): Vector[(Double, Long)] =
    buf match {
      case v: Vector[(Double, Long)] => v
      case s => s.toVector
    }

  override def zero: Seq[(Double, Long)] = Vector.empty

  override def reduce(buf: Seq[(Double, Long)], in: IN): Seq[(Double, Long)] = {
    val appended = vec(buf) :+ ((score(in), id(in)))
    if (appended.length > cap) shrink(appended) else appended
  }

  override def merge(a: Seq[(Double, Long)], b: Seq[(Double, Long)]): Seq[(Double, Long)] =
    shrink(a ++ b)

  override def finish(buf: Seq[(Double, Long)]): Seq[(Double, Long)] = shrink(buf)

  // ExpressionEncoder (array<struct<double,bigint>>), not kryo: partial-agg
  // buffers stay Tungsten-columnar instead of opaque serialized blobs, so
  // the shuffle writes compact rows and merge avoids deserialize/reserialize
  // round-trips.
  override def bufferEncoder: Encoder[Seq[(Double, Long)]] =
    TopKAggregator.pairSeqEncoder

  override def outputEncoder: Encoder[Seq[(Double, Long)]] =
    TopKAggregator.pairSeqEncoder
}

object TopKAggregator {
  private val pairSeqEncoder: Encoder[Seq[(Double, Long)]] =
    ExpressionEncoder[Seq[(Double, Long)]]()
}
