package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

/** [[FlacCodec]] contracts the q308 gate can't fully see: exact
  * round-trips at edge values, every integrity check actually firing,
  * and the None-never-throw boundary discipline. */
class FlacCodecSpec extends AnyFunSuite {

  test("round-trip: decoded samples equal source bitwise, md5 verified") {
    for (id <- Seq(0L, 1L, 2L, 3L, 7L, 12L, 23L, 38L, 41L)) {
      val ch = MediaSynth.channels(id)
      val n = MediaSynth.flacFrames(id) * ch
      val src = Array.tabulate(n)(i => MediaSynth.flacSample(id, i).toShort)
      val dec = FlacCodec.decode(MediaSynth.flacBytes(id)).get
      assert(dec.sampleRate == MediaSynth.sampleRate(id))
      assert(dec.channels == ch && dec.bitsPerSample == 16)
      assert(dec.md5Ok, s"md5 failed for doc $id")
      assert(dec.samples.toSeq == src.toSeq, s"samples differ for doc $id")
    }
  }

  test("integrity: bit flips fail CRC, truncation declines, md5 flags") {
    val src = Array.tabulate(100)(i => ((i * 37) % 2000 - 1000).toShort)
    val enc = FlacCodec.encode(src, 1, 44100, 16)
    assert(FlacCodec.decode(enc).get.md5Ok)
    // a flipped frame-content bit must fail a CRC (or truncate) -> None
    val bad = enc.clone()
    bad(bad.length - 5) = (bad(bad.length - 5) ^ 0x10).toByte
    assert(FlacCodec.decode(bad).isEmpty, "corrupt frame decoded")
    // truncation declines, never throws
    assert(FlacCodec.decode(enc.dropRight(2)).isEmpty)
    assert(FlacCodec.decode(enc.take(10)).isEmpty)
    assert(FlacCodec.decode(Array.emptyByteArray).isEmpty)
    // a corrupted STREAMINFO md5 still decodes, FLAGGED (flac -d warns)
    val badMd5 = enc.clone()
    badMd5(8 + 18) = (badMd5(8 + 18) ^ 1).toByte
    val d = FlacCodec.decode(badMd5)
    assert(d.nonEmpty && !d.get.md5Ok)
  }

  test("extreme sample values and short final frames round-trip") {
    val edge = Array[Short](Short.MinValue, Short.MaxValue, 0, -1, 1,
      Short.MinValue, Short.MaxValue, 100, -100, 32000)
    val enc = FlacCodec.encode(edge, 2, 8000, blockSize = 4)
    val dec = FlacCodec.decode(enc).get
    assert(dec.samples.toSeq == edge.toSeq && dec.md5Ok)
    // mono, block size not dividing n: last frame is shorter
    val ramp = Array.tabulate(37)(i => (i * 100 - 1800).toShort)
    val dec2 = FlacCodec.decode(FlacCodec.encode(ramp, 1, 16000, 16)).get
    assert(dec2.samples.toSeq == ramp.toSeq && dec2.md5Ok)
  }
}
