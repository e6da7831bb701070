package graft.multimodal

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.unsafe.types.UTF8String

/** Catalyst-row adapters over the container parsers — the static call
  * surface of the codegen'd probe expressions
  * ([[graft.functions.MediaProbeExpression]]): generated Java calls these
  * forwarders directly inside the stage loop, exactly how built-ins call
  * into `UTF8String`/`Normalizer`. Null = unrecognized/corrupt payload
  * (the parsers' total contract), which the expression's null-safe wrapper
  * turns into a NULL struct. */
object MediaRows {

  /** (format, width, height) for PNG/GIF/JPEG, else null. */
  def imageDims(p: Array[Byte]): InternalRow =
    ImageHeaders.dims(p) match {
      case Some((f, w, h)) => new GenericInternalRow(
        Array[Any](UTF8String.fromString(f), w.toLong, h.toLong))
      case None => null
    }

  /** (sample_rate, channels, duration_ms) for RIFF/WAVE, else null. */
  def wavInfo(p: Array[Byte]): InternalRow =
    AudioHeaders.wavInfo(p) match {
      case Some(w) => new GenericInternalRow(
        Array[Any](w.sampleRate.toLong, w.channels.toLong, w.durationMs))
      case None => null
    }

  /** (timescale, duration_units, duration_ms) for ISO-BMFF, else null. */
  def mp4Info(p: Array[Byte]): InternalRow =
    VideoHeaders.mp4Info(p) match {
      case Some(m) => new GenericInternalRow(
        Array[Any](m.timescale, m.durationUnits, m.durationMs))
      case None => null
    }

  /** Deterministic gate-corpus payload for a doc id ([[MediaSynth]]). */
  def synthPayload(id: Long): Array[Byte] = MediaSynth.payload(id)
}
