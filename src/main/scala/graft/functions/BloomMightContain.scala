package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BooleanType, DataType, LongType}
import org.apache.spark.util.sketch.BloomFilter

/** Native Catalyst predicate: membership probe of a long key against a
  * pre-built, serialized [[org.apache.spark.util.sketch.BloomFilter]] —
  * the apply side of semi-join reduction ([[graft.operators.BloomSemiJoin]]).
  *
  * The filter travels to executors as the expression's `bloomBytes` field
  * (task-serialized once per stage, like any literal) and is deserialized
  * lazily once per JVM instance of the expression — NOT per row. Codegen
  * references the deserialized sketch via `addReferenceObj`, so the hot
  * path inside whole-stage codegen is a single virtual call on the probe
  * key: the expression composes into scan-adjacent Filters without
  * breaking the codegen span, which is the entire point — the probe must
  * run below the shuffle it is there to shrink.
  *
  * May return false positives (by bloom contract), never false negatives;
  * callers must keep an exact join above it. Null keys probe to null,
  * which a Filter drops — matching inner-join semantics on null keys.
  */
case class BloomMightContain(child: Expression, bloomBytes: Array[Byte])
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"bloom_might_contain expects a LONG key, got ${child.dataType}")

  override def dataType: DataType = BooleanType

  override def prettyName: String = "bloom_might_contain"

  @transient private lazy val bloom: BloomFilter =
    BloomFilter.readFrom(new java.io.ByteArrayInputStream(bloomBytes))

  override def nullSafeEval(key: Any): Any =
    bloom.mightContainLong(key.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bloom", bloom,
      classOf[BloomFilter].getName)
    nullSafeCodeGen(ctx, ev, x => s"${ev.value} = $ref.mightContainLong($x);")
  }

  override protected def withNewChildInternal(newChild: Expression): BloomMightContain =
    copy(child = newChild)
}

object BloomMightContain {
  /** Column-API entry point; `key` must be LONG. */
  def apply(key: Column, bloom: BloomFilter): Column = {
    val bos = new java.io.ByteArrayOutputStream(1024)
    bloom.writeTo(bos)
    GraftSqlBridge.column(
      BloomMightContain(GraftSqlBridge.expression(key), bos.toByteArray))
  }
}
