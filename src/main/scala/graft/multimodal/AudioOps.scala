package graft.multimodal

import AudioHeaders.{PcmAudio, WavInfo}

/** Sample-domain PCM operations — real audio kernels over decoded 16-bit
  * samples ([[AudioHeaders.pcm16]]), all in exact integer arithmetic so
  * the driver gate can replay every output value in SQL (q92/q93):
  * decimation (the integer-factor downsample a corpus pipeline runs to
  * normalize sample rates before feature extraction) and a symmetric WAV
  * writer so transformed audio round-trips through the container format
  * the way [[PngCodec.encode]] closes the image loop.
  *
  * Deliberate subset honesty: plain decimation aliases — a production
  * resampler low-pass filters first. The filterless form is kept BECAUSE
  * it is exactly replayable (`out frame f = in frame f·k`); a windowed-
  * sinc variant would be FP-heavy and is the documented next step, not a
  * hidden limitation.
  */
object AudioOps {

  /** Serialize PCM back to a canonical 44-byte-header WAV — the inverse
    * of [[AudioHeaders.pcm16]] (decode(encode(a)) == a, spec-pinned). */
  def wavBytes(info: WavInfo, samples: Array[Short], channels: Int): Array[Byte] = {
    val dataBytes = samples.length * 2
    val bb = java.nio.ByteBuffer.allocate(44 + dataBytes)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataBytes)
      .put("WAVE".getBytes("US-ASCII"))
    bb.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(channels.toShort)
      .putInt(info.sampleRate).putInt(info.sampleRate * channels * 2)
      .putShort((channels * 2).toShort).putShort(16)
    bb.put("data".getBytes("US-ASCII")).putInt(dataBytes)
    samples.foreach(bb.putShort)
    bb.array()
  }

  /** Keep every `factor`-th frame (all its channels): frames 0, k, 2k, …
    * The output sample rate divides by `factor`; output frame count is
    * `ceil(frames / factor)`. */
  def decimate(a: PcmAudio, channels: Int, factor: Int): PcmAudio = {
    require(factor >= 1 && a.info.sampleRate % factor == 0,
      s"factor $factor must divide ${a.info.sampleRate}")
    val frames = a.samples.length / channels
    val outFrames = (frames + factor - 1) / factor
    val out = new Array[Short](outFrames * channels)
    var f = 0
    while (f < outFrames) {
      var c = 0
      while (c < channels) {
        out(f * channels + c) = a.samples(f * factor * channels + c)
        c += 1
      }
      f += 1
    }
    val rate = a.info.sampleRate / factor
    val byteRate = rate.toLong * channels * 2
    PcmAudio(WavInfo(rate, channels,
      outFrames.toLong * channels * 2 * 1000L / byteRate), out)
  }

  final case class WindowEnergy(
      window_id: Int,
      nFrames: Int,
      sumSq: Long, // Σ v² over all samples in the window — exact
      nNeg: Long) // negative-sample count (cheap polarity/activity proxy)

  /** Non-overlapping `windowFrames`-frame energy windows — the integer
    * skeleton of RMS/VAD feature extraction: per window, the exact sum of
    * squared samples and the negative-sample count. RMS/loudness are a
    * downstream `sqrt(sumSq/n)` away; keeping integers here is what lets
    * the gate hash-compare the feature tensor exactly. */
  def windowedEnergy(a: PcmAudio, channels: Int,
      windowFrames: Int): Seq[WindowEnergy] = {
    val frames = a.samples.length / channels
    (0 until frames by windowFrames).zipWithIndex.map { case (f0, w) =>
      val f1 = math.min(f0 + windowFrames, frames)
      var sumSq = 0L
      var neg = 0L
      var i = f0 * channels
      while (i < f1 * channels) {
        val v = a.samples(i).toLong
        sumSq += v * v
        if (v < 0) neg += 1
        i += 1
      }
      WindowEnergy(w, f1 - f0, sumSq, neg)
    }
  }
}
