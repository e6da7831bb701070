package graft.multimodal

import org.scalacheck.Gen

import graft.SparkTestBase

/** Property coverage for the media header parsers: a corpus probe runs
  * these over billions of arbitrary (possibly corrupt) payloads, so the
  * contract is (1) NEVER throw, (2) parse every well-formed header
  * exactly, (3) reject every prefix truncation rather than misparse. */
class MediaPropertySpecs extends SparkTestBase {

  private def hexToBytes(hx: String): Array[Byte] =
    Array.tabulate(hx.length / 2)(i =>
      Integer.parseInt(hx.substring(i * 2, i * 2 + 2), 16).toByte)
  private def be16(v: Int) = f"$v%04X"
  private def be32(v: Long) = f"$v%08X"
  private def le16(v: Int) = { val s = be16(v); s.substring(2) + s.substring(0, 2) }
  private def le32(v: Long) = {
    val s = be32(v)
    s.substring(6) + s.substring(4, 6) + s.substring(2, 4) + s.substring(0, 2)
  }

  test("random bytes never crash any parser and are never misparsed as valid") {
    val junk = for {
      n <- Gen.chooseNum(0, 200)
      bytes <- Gen.listOfN(n, Gen.chooseNum(0, 255))
    } yield bytes.map(_.toByte).toArray
    Gen.listOfN(300, junk).sample.get.foreach { p =>
      // must return (not throw); a random blob passing a full signature +
      // structure check is astronomically unlikely — treat as misparse
      val img = ImageHeaders.dims(p)
      val wav = AudioHeaders.wavInfo(p)
      val mp4 = VideoHeaders.mp4Info(p)
      assert(img.isEmpty && wav.isEmpty && mp4.isEmpty,
        s"junk parsed: img=$img wav=$wav mp4=$mp4")
    }
  }

  test("arbitrary-dimension PNG/GIF/JPEG headers round-trip exactly") {
    val dims = for {
      w <- Gen.chooseNum(1, 65535)
      h <- Gen.chooseNum(1, 65535)
    } yield (w, h)
    Gen.listOfN(200, dims).sample.get.foreach { case (w, h) =>
      val png = hexToBytes("89504E470D0A1A0A0000000D49484452" +
        be32(w) + be32(h) + "0806000000")
      assert(ImageHeaders.dims(png).contains(("png", w, h)))
      val gif = hexToBytes("474946383961" + le16(w) + le16(h) + "F70000")
      assert(ImageHeaders.dims(gif).contains(("gif", w, h)))
      val jpeg = hexToBytes("FFD8" + "FFE000104A46494600010100000100010000" +
        "FFC00011" + "08" + be16(h) + be16(w) + "03012200021101031101FFD9")
      assert(ImageHeaders.dims(jpeg).contains(("jpeg", w, h)))
    }
    // PNG dims above 16 bits exercise the full be32 field
    val wide = hexToBytes("89504E470D0A1A0A0000000D49484452" +
      be32(1L << 20) + be32((1L << 19) + 3) + "0806000000")
    assert(ImageHeaders.dims(wide).contains(("png", 1 << 20, (1 << 19) + 3)))
  }

  test("corrupt 32-bit sizes reject instead of looping or overflowing") {
    // a chunk/box size field is corruption-controlled: values whose Int
    // truncation is negative/zero must not wedge the walk (regression:
    // `size.toInt` made the advance non-positive → infinite loop on an
    // executor core, or wrapped the index → AIOOBE)
    for (sizeHex <- Seq("F8FFFFFF", "F0FFFF7F", "FFFFFFFF", "0C000000")) {
      val wav = hexToBytes("52494646" + "24000000" + "57415645" +
        "4A554E4B" + sizeHex + "00" * 8)
      assert(AudioHeaders.wavInfo(wav).isEmpty, s"wav size $sizeHex")
    }
    for (sizeHex <- Seq("FFFFFFF0", "7FFFFFF0", "FFFFFFFF")) {
      val mp4 = hexToBytes("0000001466747970" + "69736F6D" + "00000200" +
        "69736F6D" + sizeHex + "6A756E6B" + "00" * 8)
      assert(VideoHeaders.mp4Info(mp4).isEmpty, s"mp4 top size $sizeHex")
      // same inside moov: a child box with a wrapping size
      val moov = hexToBytes("0000001466747970" + "69736F6D" + "00000200" +
        "69736F6D" + "00000020" + "6D6F6F76" + sizeHex + "6A756E6B" +
        "00" * 16)
      assert(VideoHeaders.mp4Info(moov).isEmpty, s"mp4 child size $sizeHex")
    }
  }

  test("arbitrary WAV/MP4 headers round-trip; every truncation rejects") {
    val wavGen = for {
      rate <- Gen.oneOf(8000, 11025, 16000, 22050, 44100, 48000)
      ch <- Gen.chooseNum(1, 8)
      db <- Gen.chooseNum(1L, 1000000L)
    } yield (rate, ch, db)
    Gen.listOfN(100, wavGen).sample.get.foreach { case (rate, ch, db) =>
      val hx = "52494646" + le32(36L + db) + "57415645" +
        "666D74201000000001" + "00" + le16(ch) + le32(rate) +
        le32(rate.toLong * ch * 2) + le16(ch * 2) + "1000" +
        "64617461" + le32(db)
      val p = hexToBytes(hx)
      val got = AudioHeaders.wavInfo(p)
      assert(got.contains(AudioHeaders.WavInfo(rate, ch,
        db * 1000L / (rate.toLong * ch * 2))))
      (0 until p.length).foreach(n =>
        assert(AudioHeaders.wavInfo(p.take(n)).isEmpty, s"truncation $n parsed"))
    }
    val mp4Gen = for {
      ts <- Gen.oneOf(600L, 1000L, 25000L, 90000L)
      dur <- Gen.chooseNum(1L, (1L << 31) - 1)
    } yield (ts, dur)
    Gen.listOfN(100, mp4Gen).sample.get.foreach { case (ts, dur) =>
      val hx = "0000001466747970" + "69736F6D" + "00000200" + "69736F6D" +
        "00000074" + "6D6F6F76" + "0000006C" + "6D766864" +
        "000000000000000000000000" + be32(ts) + be32(dur) + "0" * 160
      val p = hexToBytes(hx)
      assert(VideoHeaders.mp4Info(p).contains(VideoHeaders.Mp4Info(ts, dur)))
      (0 until 56).foreach(n =>
        assert(VideoHeaders.mp4Info(p.take(n)).isEmpty, s"truncation $n parsed"))
    }
  }
}
