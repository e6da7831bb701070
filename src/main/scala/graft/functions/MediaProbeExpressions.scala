package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** Native codegen'd container-probe expressions — the expression-path form
  * of the q73 metadata scan (VERDICT_r06 task 6): the marker/chunk/box
  * walks ([[graft.multimodal.ImageHeaders]] and siblings) run as bounded
  * loops behind a static call INSIDE the generated stage, the same shape
  * [[NfcNormalize]] uses for `java.text.Normalizer`. This removes the
  * object-serialization boundary a `mapPartitions` probe pays —
  * DeserializeToObject/SerializeFromObject break whole-stage codegen and
  * force every row through an encoder — while keeping the parser logic in
  * one audited place shared with the interpreted eval path.
  *
  * Output is a non-null-field struct that is NULL as a whole when the
  * payload is not the probed container (the parsers' total never-throw
  * contract), so `coalesce`/field-access compose in plain Column algebra.
  */
sealed abstract class MediaProbeExpression extends UnaryExpression {

  /** Static method on [[graft.multimodal.MediaRows]] the generated code
    * calls; the interpreted eval calls the same method. */
  protected def helper: String
  protected def fields: Seq[(String, DataType)]

  override def dataType: DataType =
    StructType(fields.map { case (n, t) => StructField(n, t, nullable = false) })

  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires BINARY input, got ${child.dataType.sql}")

  protected def probe(p: Array[Byte]): Any

  override def nullSafeEval(input: Any): Any =
    probe(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val r = ctx.freshName("probe")
      s"""
         |org.apache.spark.sql.catalyst.InternalRow $r =
         |  graft.multimodal.MediaRows.$helper($c);
         |if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = $r; }
       """.stripMargin
    })
}

/** struct(format, width, height) for PNG/GIF/JPEG payloads, else NULL —
  * includes the variable-length JPEG marker scan as a codegen'd bounded
  * loop (the fixed-offset-only `pngDimsCol` covers just PNG). */
case class ImageDimsExpr(child: Expression) extends MediaProbeExpression {
  override def prettyName: String = "image_dims"
  override protected def helper: String = "imageDims"
  override protected def fields: Seq[(String, DataType)] =
    Seq("format" -> StringType, "width" -> LongType, "height" -> LongType)
  override protected def probe(p: Array[Byte]): Any =
    graft.multimodal.MediaRows.imageDims(p)
  override protected def withNewChildInternal(newChild: Expression): ImageDimsExpr =
    copy(child = newChild)
}

/** struct(sample_rate, channels, duration_ms) for RIFF/WAVE, else NULL. */
case class WavInfoExpr(child: Expression) extends MediaProbeExpression {
  override def prettyName: String = "wav_info"
  override protected def helper: String = "wavInfo"
  override protected def fields: Seq[(String, DataType)] =
    Seq("sample_rate" -> LongType, "channels" -> LongType,
      "duration_ms" -> LongType)
  override protected def probe(p: Array[Byte]): Any =
    graft.multimodal.MediaRows.wavInfo(p)
  override protected def withNewChildInternal(newChild: Expression): WavInfoExpr =
    copy(child = newChild)
}

/** struct(timescale, duration_units, duration_ms) for ISO-BMFF, else NULL. */
case class Mp4InfoExpr(child: Expression) extends MediaProbeExpression {
  override def prettyName: String = "mp4_info"
  override protected def helper: String = "mp4Info"
  override protected def fields: Seq[(String, DataType)] =
    Seq("timescale" -> LongType, "duration_units" -> LongType,
      "duration_ms" -> LongType)
  override protected def probe(p: Array[Byte]): Any =
    graft.multimodal.MediaRows.mp4Info(p)
  override protected def withNewChildInternal(newChild: Expression): Mp4InfoExpr =
    copy(child = newChild)
}

/** Deterministic gate-corpus payload from a doc id — lets the whole q73
  * probe (synthesis included) run inside one codegen stage. */
case class MediaSynthPayloadExpr(child: Expression) extends UnaryExpression {
  override def prettyName: String = "media_synth_payload"
  override def dataType: DataType = BinaryType

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires BIGINT input, got ${child.dataType.sql}")

  override def nullSafeEval(input: Any): Any =
    graft.multimodal.MediaRows.synthPayload(input.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.multimodal.MediaRows.synthPayload($c)")

  override protected def withNewChildInternal(newChild: Expression): MediaSynthPayloadExpr =
    copy(child = newChild)
}

object MediaProbeExpressions {
  def imageDims(payload: Column): Column =
    GraftSqlBridge.column(ImageDimsExpr(GraftSqlBridge.expression(payload)))
  def wavInfo(payload: Column): Column =
    GraftSqlBridge.column(WavInfoExpr(GraftSqlBridge.expression(payload)))
  def mp4Info(payload: Column): Column =
    GraftSqlBridge.column(Mp4InfoExpr(GraftSqlBridge.expression(payload)))
  def synthPayload(docId: Column): Column =
    GraftSqlBridge.column(MediaSynthPayloadExpr(GraftSqlBridge.expression(docId)))
}
