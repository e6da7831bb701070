package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

import AudioHeaders.{PcmAudio, WavInfo}

/** [[AudioOps.halfbandDownsample]] filter-theory pins: the properties that
  * distinguish a real anti-aliasing filter from q92's bare decimation.
  * The q151 gate replays every output sample against DuckDB; these pin
  * the signal-processing facts locally. */
class AudioResampleSpec extends AnyFunSuite {

  private def pcm(rate: Int, ch: Int, samples: Array[Short]) =
    PcmAudio(WavInfo(rate, ch, samples.length.toLong * 1000 /
      (rate.toLong * ch)), samples)

  test("DC passes with exactly unit gain") {
    for (v <- Seq[Short](0, 1, -1, 1000, -1000, 32767, -32768)) {
      val in = pcm(16000, 1, Array.fill(40)(v))
      val out = AudioOps.halfbandDownsample(in, channels = 1)
      assert(out.samples.forall(_ == v), s"DC $v not preserved")
      assert(out.info.sampleRate == 8000)
      assert(out.samples.length == 20)
    }
  }

  test("Nyquist tone is annihilated (the aliasing decimate lets through)") {
    val alt = Array.tabulate[Short](64)(i => if (i % 2 == 0) 12000 else -12000)
    val in = pcm(16000, 1, alt)
    val filtered = AudioOps.halfbandDownsample(in, channels = 1)
    // interior samples: Nyquist lands exactly in the filter's zero
    assert(filtered.samples.slice(2, 30).forall(_ == 0),
      s"Nyquist leaked: ${filtered.samples.mkString(",")}")
    // bare decimation aliases the same tone to full-scale DC
    val aliased = AudioOps.decimate(in, channels = 1, factor = 2)
    assert(aliased.samples.forall(_ == 12000))
  }

  test("channels filter independently (no interleave bleed)") {
    // ch0 = DC 100, ch1 = Nyquist ±100: output ch0 stays 100, ch1 → 0
    val n = 32
    val inter = new Array[Short](2 * n)
    for (f <- 0 until n) {
      inter(2 * f) = 100
      inter(2 * f + 1) = if (f % 2 == 0) 100 else -100
    }
    val out = AudioOps.halfbandDownsample(pcm(8000, 2, inter), channels = 2)
    val ch0 = (0 until out.samples.length / 2).map(f => out.samples(2 * f))
    val ch1 = (0 until out.samples.length / 2).map(f => out.samples(2 * f + 1))
    assert(ch0.forall(_ == 100))
    assert(ch1.slice(2, ch1.length - 2).forall(_ == 0))
  }

  test("impulse response walks every tap; rounding floors like the oracle") {
    // impulse at ODD frame 5: hit by the 9-taps (n=2,3) and the −1-taps
    // (n=1,4); even frames only ever meet the center tap
    val in = new Array[Short](16)
    in(5) = 32767
    val out = AudioOps.halfbandDownsample(pcm(8000, 1, in), channels = 1)
    // −32767 → floor((−32767+16)/32) = −1024 (truncation would give −1023)
    // 9·32767 → floor((294903+16)/32) = 9216
    assert(out.samples.toSeq == Seq[Short](0, -1024, 9216, 9216, -1024, 0, 0, 0),
      s"impulse response mismatch: ${out.samples.mkString(",")}")
    // center tap alone: impulse at even frame 4 → (16·32767+16)/32 = 16384
    val in2 = new Array[Short](16)
    in2(4) = 32767
    val out2 = AudioOps.halfbandDownsample(pcm(8000, 1, in2), channels = 1)
    assert(out2.samples(2) == 16384.toShort)
    assert(out2.samples.count(_ != 0) == 1)
  }

  test("odd frame counts: trailing edge replicates, ceil(n/2) frames out") {
    val in = pcm(8000, 1, Array.tabulate[Short](11)(i => (i * 100).toShort))
    val out = AudioOps.halfbandDownsample(in, channels = 1)
    assert(out.samples.length == 6)
  }

  test("polyphase L/M: DC unit gain exact for every ratio, incl. odd D") {
    // D = K²/L is odd for (1,3) (K=3, D=9) — the truncated-half rounding
    // branch; the partition property must hold regardless
    for ((l, m) <- Seq((2, 3), (3, 2), (1, 3), (3, 1), (5, 4), (4, 5));
        v <- Seq[Short](0, 1, -1, 1000, -1000, 32767, -32768)) {
      val in = pcm(l * m * 100, 1, Array.fill(41)(v))
      val out = AudioOps.polyphaseResample(in, 1, l, m)
      assert(out.samples.forall(_ == v), s"DC $v broken at $l/$m")
      assert(out.info.sampleRate == l * m * 100 * l / m)
      assert(out.samples.length == (40 * l) / m + 1)
    }
  }

  test("polyphase L==M is the identity; pure upsample passes samples") {
    val sig = Array.tabulate[Short](37)(i => ((i * 997) % 3000 - 1500).toShort)
    val same = AudioOps.polyphaseResample(pcm(8000, 1, sig), 1, 3, 3)
    assert(same.samples.sameElements(sig) && same.info.sampleRate == 8000)
    // 1→2 upsample: even outputs are the originals untouched, odd
    // outputs the floor-rounded midpoints (exact linear interpolation)
    val up = AudioOps.polyphaseResample(pcm(8000, 1, sig), 1, 2, 1)
    assert(up.info.sampleRate == 16000)
    sig.indices.foreach(i => assert(up.samples(2 * i) == sig(i)))
    (0 until sig.length - 1).foreach { i =>
      val mid = Math.floorDiv(sig(i) + sig(i + 1) + 1, 2)
      assert(up.samples(2 * i + 1) == mid.toShort)
    }
  }

  test("polyphase 3:2 downsample anti-aliases the input Nyquist tone") {
    val alt = Array.tabulate[Short](61)(i => if (i % 2 == 0) 12000 else -12000)
    val out = AudioOps.polyphaseResample(pcm(48000, 1, alt), 1, 2, 3)
    // input Nyquist (±v alternating) would alias under bare 2/3-rate
    // resampling; the triangle kernel's taps {2,4,2}/{1,3,3,1} cancel
    // it exactly on both branches in the interior
    assert(out.samples.slice(2, out.samples.length - 2).forall(_ == 0),
      s"Nyquist leaked: ${out.samples.mkString(",")}")
    // non-integral output rate refuses loudly
    val bad = intercept[IllegalArgumentException](
      AudioOps.polyphaseResample(pcm(8000, 1, alt), 1, 2, 3))
    assert(bad.getMessage.contains("not integral"))
  }

  test("polyphase channels stay independent and interleaved") {
    val n = 30
    val inter = new Array[Short](2 * n)
    for (f <- 0 until n) {
      inter(2 * f) = 100
      inter(2 * f + 1) = (f * 10).toShort
    }
    val out = AudioOps.polyphaseResample(pcm(48000, 2, inter), 2, 2, 3)
    val frames = out.samples.length / 2
    assert((0 until frames).forall(f => out.samples(2 * f) == 100))
    // ch1 is a ramp: resampled ramp stays monotone nondecreasing
    val ch1 = (0 until frames).map(f => out.samples(2 * f + 1))
    assert(ch1.zip(ch1.tail).forall { case (a, b) => a <= b })
  }

  test("wav roundtrip preserves filtered samples exactly") {
    for (id <- 0L until 40L) {
      val ch = MediaSynth.pcmChannels(id)
      val a = AudioHeaders.pcm16(MediaSynth.pcmWav(id)).get
      val d = AudioOps.halfbandDownsample(a, ch)
      val rt = AudioHeaders.pcm16(AudioOps.wavBytes(d.info, d.samples, ch)).get
      assert(rt.samples.sameElements(d.samples))
      assert(rt.info == d.info)
    }
  }
}
