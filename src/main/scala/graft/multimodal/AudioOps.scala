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
  * it is exactly replayable (`out frame f = in frame f·k`); the filtered
  * successor is [[halfbandDownsample]], whose integer-tap polyphase form
  * (taps ×32, floor-rounded accumulator) keeps the anti-aliased path
  * exactly replayable too (q151).
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

  /** Fixed-point divisor offset: shifts the accumulator nonnegative so
    * truncating and floor division agree in every engine that replays
    * this kernel (Scala, SQL). 65536·32 ≫ max |accumulator| (≈1.2M). */
  private val HbOffset = 65536

  /** Anti-aliased downsample by 2 — the filtered successor to
    * [[decimate]] (q151): a 7-tap symmetric halfband FIR with INTEGER
    * coefficients (×32) `[-1, 0, 9, 16, 9, 0, -1]`, the classic
    * quarter-band-flat halfband whose odd taps vanish (the polyphase
    * property: only the center odd tap is nonzero, so per output frame
    * the filter touches 5 samples, not 7). Output frame n centers on
    * input frame 2n; edges replicate the boundary frame. The accumulator
    * rounds by `floor((acc + 16) / 32)` in EXACT integer arithmetic —
    * computed as truncating division on an offset-nonnegative value so
    * the DuckDB oracle replays every output sample bit-for-bit — then
    * clamps to 16-bit (gain can exceed unity by 36/32 at Nyquist-free
    * extremes). Per-channel; interleaving preserved. */
  def halfbandDownsample(a: PcmAudio, channels: Int): PcmAudio = {
    require(a.info.sampleRate % 2 == 0,
      s"rate ${a.info.sampleRate} must be even")
    val frames = a.samples.length / channels
    val outFrames = (frames + 1) / 2
    val out = new Array[Short](outFrames * channels)
    def in(f: Int, c: Int): Int = {
      val fc = if (f < 0) 0 else if (f >= frames) frames - 1 else f
      a.samples(fc * channels + c).toInt
    }
    var n = 0
    while (n < outFrames) {
      var c = 0
      while (c < channels) {
        val f = 2 * n
        val acc = -in(f - 3, c) + 9 * in(f - 1, c) + 16 * in(f, c) +
          9 * in(f + 1, c) - in(f + 3, c)
        val v = (acc + 16 + HbOffset * 32) / 32 - HbOffset
        out(n * channels + c) =
          (if (v > 32767) 32767 else if (v < -32768) -32768 else v).toShort
        c += 1
      }
      n += 1
    }
    val rate = a.info.sampleRate / 2
    val byteRate = rate.toLong * channels * 2
    PcmAudio(WavInfo(rate, channels,
      outFrames.toLong * channels * 2 * 1000L / byteRate), out)
  }

  /** RATIONAL polyphase resample by `up`/`down` (q275 — the
    * arbitrary-ratio generalization of [[halfbandDownsample]]'s ÷2):
    * conceptually upsample by L=`up`, FIR low-pass, keep every
    * M=`down`-th fine-grid sample — implemented directly as the
    * polyphase product-sum (output n touches only the O(K/L) input
    * frames within the kernel's support, no fine grid materializes).
    *
    * Kernel: the TRIANGULAR (linear B-spline) kernel of fine half-width
    * `K = L·ceil(max(L,M)/L)` — wide enough to anti-alias a downsample
    * (support scales with M) and chosen over a windowed sinc for one
    * decisive property: K is a multiple of L, so the hat function's
    * partition of unity makes EVERY polyphase branch's taps sum to
    * exactly `D = K²/L`. DC gain is therefore exactly 1 in INTEGER
    * arithmetic — no per-phase gain ripple to hide, and the rounding
    * `floor((acc + D/2)/D)` replays bit-exact in any engine via the
    * offset-nonnegative division trick ([[halfbandDownsample]]'s
    * discipline). L==M degenerates to the identity (single tap D),
    * pure upsample (M=1) to exact linear interpolation with original
    * samples passed through untouched — both spec-pinned. Edges
    * replicate the boundary frame, which preserves the per-branch tap
    * sum, so DC stays exact at the edges too.
    *
    * Declared subset: a triangle's stopband is gentler than a long
    * windowed sinc's — this is the integer-exact skeleton; a sharper
    * kernel drops in by changing T(·) as long as each branch's tap sum
    * stays constant. Output rate `rate·L/M` must be integral. */
  def polyphaseResample(a: PcmAudio, channels: Int, up: Int,
      down: Int): PcmAudio = {
    require(up >= 1 && down >= 1, s"ratio $up/$down must be positive")
    require((a.info.sampleRate.toLong * up) % down == 0,
      s"rate ${a.info.sampleRate}·$up/$down is not integral")
    val L = up
    val M = down
    val K = L * ((math.max(L, M) + L - 1) / L)
    val D = (K.toLong * K / L).toInt // exact: L | K by construction
    val frames = a.samples.length / channels
    val rate = (a.info.sampleRate.toLong * L / M).toInt
    if (frames == 0)
      return PcmAudio(WavInfo(rate, channels, 0L), Array.empty[Short])
    val outFrames = ((frames - 1).toLong * L / M).toInt + 1
    val out = new Array[Short](outFrames * channels)
    def in(f: Long, c: Int): Int = {
      val fc = if (f < 0) 0 else if (f >= frames) frames - 1 else f.toInt
      a.samples(fc * channels + c).toInt
    }
    val off = HbOffset.toLong * D // acc ≥ −D·32768 > −off: stays nonneg
    var n = 0
    while (n < outFrames) {
      val pos = n.toLong * M // position on the ×L fine grid
      val iLo = Math.floorDiv(pos - K, L)
      val iHi = Math.floorDiv(pos + K, L)
      var c = 0
      while (c < channels) {
        var acc = 0L
        var i = iLo
        while (i <= iHi) {
          val t = K - Math.abs(pos - i * L) // triangle tap, ≥ 0 in range
          if (t > 0) acc += t * in(i, c)
          i += 1
        }
        val v = ((acc + D / 2 + off) / D - HbOffset).toInt
        out(n * channels + c) =
          (if (v > 32767) 32767 else if (v < -32768) -32768 else v).toShort
        c += 1
      }
      n += 1
    }
    val byteRate = rate.toLong * channels * 2
    PcmAudio(WavInfo(rate, channels,
      outFrames.toLong * channels * 2 * 1000L / byteRate), out)
  }

  final case class WindowEnergy(
      window_id: Int,
      nFrames: Int,
      sumSq: Long, // Σ v² over all samples in the window — exact
      nNeg: Long) // negative-sample count (cheap polarity/activity proxy)

  /** 6-bit quantized cosine table over 1/16-turn steps:
    * round(cos(2πi/16)·64). Hardcoded (not computed) so BOTH engines use
    * the identical integers with zero trig/rounding boundary risk — the
    * fixed-point-twiddle discipline of integer DSP. Q=64 also bounds the
    * spectral sums so re²+im² stays exact in a 64-bit long:
    * |re| ≤ 16·32768·64 = 2²⁵, energy < 2⁵¹. */
  val QCos16: Array[Int] = Array(
    64, 59, 45, 24, 0, -24, -45, -59, -64, -59, -45, -24, 0, 24, 45, 59)

  @inline private def qcos(i: Int): Int = QCos16(((i % 16) + 16) % 16)
  // sin(x) = cos(x − π/2): four table steps back
  @inline private def qsin(i: Int): Int = qcos(i - 4)

  final case class SpectralBin(
      window_id: Int,
      bin: Int,
      reQ: Long, // Σ v·qcos(2π·bin·n/16) — exact integer
      imQ: Long) // −Σ v·qsin(2π·bin·n/16)

  /** Integer-DFT energy bins over the [[windowedEnergy]] windows — the
    * MFCC-skeleton step after raw energy: per non-overlapping
    * `windowFrames`-frame window, the DFT of the channel-0 samples at
    * bins 1..`nBins`, computed with the EXACT fixed-point [[QCos16]]
    * twiddles (the Goertzel/integer-DFT form an embedded DSP runs —
    * Goertzel's recurrence and the direct product-sum are algebraically
    * the same sums; the direct form is what a column engine replays).
    * Every output is a pure integer product-sum, so the oracle
    * hash-compares the whole spectral tensor bitwise. */
  def spectralBins(a: PcmAudio, channels: Int, windowFrames: Int,
      nBins: Int): Seq[SpectralBin] = {
    val frames = a.samples.length / channels
    (0 until frames by windowFrames).zipWithIndex.flatMap { case (f0, w) =>
      val f1 = math.min(f0 + windowFrames, frames)
      (1 to nBins).map { k =>
        var re = 0L
        var im = 0L
        var f = f0
        while (f < f1) {
          val n = f - f0
          val v = a.samples(f * channels).toLong // channel 0 (mono view)
          re += v * qcos(k * n)
          im -= v * qsin(k * n)
          f += 1
        }
        SpectralBin(w, k, re, im)
      }
    }
  }

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
