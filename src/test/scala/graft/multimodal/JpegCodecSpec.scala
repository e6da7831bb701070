package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

/** [[JpegCodec]] roundtrip + structure pins. The gate (q149) verifies the
  * decode against DuckDB-replayed closed forms; these specs pin the codec
  * mechanics locally, including the paths the corpus only partially
  * exercises. */
class JpegCodecSpec extends AnyFunSuite {

  private def closedFormPixels(id: Long): Array[Int] = {
    val w = MediaSynth.jpegWidth(id); val h = MediaSynth.jpegHeight(id)
    Array.tabulate(w * h)(i => MediaSynth.jpegPixel(id, i % w, i / w))
  }

  test("corpus roundtrip: decode(encode(coeffs)) == closed-form pixels") {
    for (id <- 0L until 120L) {
      val img = JpegCodec.decode(MediaSynth.jpegPayload(id))
        .getOrElse(fail(s"decode failed for doc $id"))
      assert(img.width == MediaSynth.jpegWidth(id))
      assert(img.height == MediaSynth.jpegHeight(id))
      assert(img.channels == 1)
      val expect = closedFormPixels(id)
      val got = img.pixels.map(_ & 0xff)
      assert(got.sameElements(expect),
        s"pixel mismatch for doc $id (restart=${MediaSynth.jpegRestart(id)})")
    }
  }

  test("restart-marker corpus really contains RST bytes") {
    // doc 0 has restartInterval=2 and ≥4 MCUs → at least one RSTn (FF D0-D7)
    val p = MediaSynth.jpegPayload(0L)
    val hasRst = p.sliding(2).exists(a =>
      (a(0) & 0xff) == 0xff && (a(1) & 0xff) >= 0xd0 && (a(1) & 0xff) <= 0xd7)
    assert(hasRst, "expected restart markers in doc 0's stream")
    // and a no-restart doc has none
    val p1 = MediaSynth.jpegPayload(1L)
    val hasRst1 = p1.dropRight(2).sliding(2).exists(a =>
      (a(0) & 0xff) == 0xff && (a(1) & 0xff) >= 0xd0 && (a(1) & 0xff) <= 0xd7)
    assert(!hasRst1)
  }

  test("byte stuffing: any FF inside the entropy stream is followed by 00 or a marker") {
    for (id <- 0L until 40L) {
      val p = MediaSynth.jpegPayload(id)
      var i = 2 // skip SOI
      while (i + 1 < p.length) {
        if ((p(i) & 0xff) == 0xff) {
          val nxt = p(i + 1) & 0xff
          assert(nxt == 0 || nxt >= 0xc0, s"bare FF at $i in doc $id")
        }
        i += 1
      }
    }
  }

  test("general AC coding: dense random coefficient blocks roundtrip") {
    // beyond the 4-coefficient corpus: all 64 slots active, magnitudes to
    // ±255 (sizes up to 8), exercising every (run,size) path incl. none
    val rnd = new scala.util.Random(42)
    val w = 24; val h = 16
    val q = Array.fill(64)(1) // identity quant: IDCT sees raw coefficients
    val blocks = Array.fill((w / 8) * (h / 8))(
      Array.fill(64)(rnd.nextInt(511) - 255))
    val bytes = JpegCodec.encodeGray(w, h, q,
      (bx, by) => blocks(by * (w / 8) + bx), restartInterval = 0)
    val img = JpegCodec.decode(bytes).get
    // decode again re-encoded from the SAME coefficients must be identical
    val img2 = JpegCodec.decode(JpegCodec.encodeGray(w, h, q,
      (bx, by) => blocks(by * (w / 8) + bx), restartInterval = 3)).get
    assert(img.pixels.sameElements(img2.pixels),
      "restart vs no-restart decode of identical coefficients diverged")
  }

  test("dequantization really multiplies by the transmitted table") {
    val q1 = Array.fill(64)(8)
    val q2 = Array.fill(64)(16) // double every dequantized value
    val coeffs = (_: Int, _: Int) => {
      val c = new Array[Int](64); c(0) = 4; c // DC-only: flat block
    }
    val a = JpegCodec.decode(JpegCodec.encodeGray(8, 8, q1, coeffs, 0)).get
    val b = JpegCodec.decode(JpegCodec.encodeGray(8, 8, q2, coeffs, 0)).get
    assert((a.pixels(0) & 0xff) == 128 + 4) // 8·4/8
    assert((b.pixels(0) & 0xff) == 128 + 8) // 16·4/8
  }

  test("rejects out-of-subset and malformed payloads with None") {
    assert(JpegCodec.decode(Array[Byte]()).isEmpty)
    assert(JpegCodec.decode(Array[Byte](0xff.toByte, 0xd8.toByte)).isEmpty)
    // q73's header-only JPEG (SOF but no scan data)
    assert(JpegCodec.decode(MediaSynth.payload(2L)).isEmpty)
    // truncated mid-stream: flip a structural length to walk off the end
    val p = MediaSynth.jpegPayload(5L)
    assert(JpegCodec.decode(p.take(p.length / 2)).isEmpty ||
      JpegCodec.decode(p.take(p.length / 2)).nonEmpty == false)
  }

  test("mjpeg track demux+decode yields per-frame closed-form pixels") {
    for (id <- 0L until 60L) {
      val rv = VideoHeaders.mjpegVideoFrames(MediaSynth.mjpegMp4(id))
        .getOrElse(fail(s"mjpeg decode failed for doc $id"))
      assert(rv.width == MediaSynth.mjpegWidth(id))
      assert(rv.height == MediaSynth.mjpegHeight(id))
      assert(rv.frames.length == MediaSynth.mjpegFrames(id))
      for ((frame, f) <- rv.frames.zipWithIndex) {
        val seed = MediaSynth.mjpegSeed(id, f)
        var i = 0
        while (i < frame.length) {
          val x = i % rv.width; val y = i / rv.width
          assert((frame(i) & 0xff) == MediaSynth.jpegPixel(seed, x, y),
            s"doc $id frame $f pixel ($x,$y)")
          i += 1
        }
      }
    }
    // the raw path must NOT claim an mjpeg track and vice versa
    assert(VideoHeaders.rawVideoFrames(MediaSynth.mjpegMp4(3L)).isEmpty)
    assert(VideoHeaders.mjpegVideoFrames(MediaSynth.rawVideoMp4(3L)).isEmpty)
  }

  test("4:2:0 color corpus roundtrip: decoded RGB equals closed form") {
    for (id <- 0L until 120L) {
      val img = JpegCodec.decode(MediaSynth.jpegColorPayload(id))
        .getOrElse(fail(s"color decode failed for doc $id"))
      assert(img.width == MediaSynth.jpegColorWidth(id))
      assert(img.height == MediaSynth.jpegColorHeight(id))
      assert(img.channels == 3)
      var bad = 0
      for (y <- 0 until img.height; x <- 0 until img.width) {
        val (r, g, b) = MediaSynth.jpegColorPixel(id, x, y)
        val i = (y * img.width + x) * 3
        if ((img.pixels(i) & 0xff) != r || (img.pixels(i + 1) & 0xff) != g ||
          (img.pixels(i + 2) & 0xff) != b) bad += 1
      }
      assert(bad == 0, s"$bad RGB mismatches for doc $id " +
        s"(${img.width}x${img.height}, restart=${MediaSynth.jpegRestart(id)})")
    }
  }

  test("color transform clamps genuinely fire somewhere in the corpus") {
    // saturated chroma must hit 0/255 at least once, or the clamp path is
    // untested dead code on both engines
    val hits = (0L until 120L).exists { id =>
      val img = JpegCodec.decode(MediaSynth.jpegColorPayload(id)).get
      img.pixels.exists(p => (p & 0xff) == 0 || (p & 0xff) == 255)
    }
    assert(hits, "no clamped channel value in 120 docs — corpus too tame")
  }

  test("4:4:4 and 4:2:2 sampling decode through the same general grid") {
    // the corpus pins 4:2:0; these pin the other two common schemes,
    // verifying the grid generality (h×v loops, per-scheme upsampling)
    for (id <- 0L until 30L; (lh, lv) <- Seq((1, 1), (2, 1))) {
      val w = MediaSynth.jpegColorWidth(id); val h = MediaSynth.jpegColorHeight(id)
      val bytes = JpegCodec.encodeColor(w, h,
        MediaSynth.jpegQuantTable, MediaSynth.jpegQuantTable,
        (c, bx, by) => MediaSynth.jpegCoeffs(MediaSynth.jpegColorSeed(id, c))(bx, by),
        restartInterval = if (id % 2 == 0) 3 else 0, lumaH = lh, lumaV = lv)
      val img = JpegCodec.decode(bytes)
        .getOrElse(fail(s"decode failed: doc $id sampling ${lh}x$lv"))
      assert(img.width == w && img.height == h && img.channels == 3)
      var bad = 0
      for (y <- 0 until h; x <- 0 until w) {
        val yv = MediaSynth.jpegPixel(MediaSynth.jpegColorSeed(id, 0), x, y)
        val cb = MediaSynth.jpegPixel(MediaSynth.jpegColorSeed(id, 1), x / lh, y / lv)
        val cr = MediaSynth.jpegPixel(MediaSynth.jpegColorSeed(id, 2), x / lh, y / lv)
        val (r, g, b) = JpegCodec.ycc2rgb(yv, cb, cr)
        val i = (y * w + x) * 3
        if ((img.pixels(i) & 0xff) != r || (img.pixels(i + 1) & 0xff) != g ||
          (img.pixels(i + 2) & 0xff) != b) bad += 1
      }
      assert(bad == 0, s"$bad mismatches: doc $id sampling ${lh}x$lv")
    }
  }

  test("progressive stream decodes identically to its baseline twin") {
    for (id <- 0L until 120L) {
      val prog = JpegCodec.decode(MediaSynth.jpegProgressivePayload(id))
        .getOrElse(fail(s"progressive decode failed for doc $id"))
      val base = JpegCodec.decode(MediaSynth.jpegPayload(id)).get
      assert(prog.width == base.width && prog.height == base.height)
      assert(prog.pixels.sameElements(base.pixels),
        s"progressive != baseline for doc $id")
    }
  }

  test("progressive streams really carry multiple scans and EOB runs") {
    val p = MediaSynth.jpegProgressivePayload(7L)
    // SOF2 present, three SOS markers (DC + two AC bands)
    def count(m: Int): Int = p.sliding(2).count(a =>
      (a(0) & 0xff) == 0xff && (a(1) & 0xff) == m)
    assert(count(0xc2) == 1 && count(0xc0) == 0)
    assert(count(0xda) == 3, s"expected 3 scans, got ${count(0xda)}")
    // a single-band layout also roundtrips (exercises one big EOB band)
    val one = JpegCodec.encodeGrayProgressive(
      MediaSynth.jpegWidth(7L), MediaSynth.jpegHeight(7L),
      MediaSynth.jpegQuantTable, MediaSynth.jpegCoeffs(7L),
      bands = Seq((1, 63)))
    val img = JpegCodec.decode(one).get
    val base = JpegCodec.decode(MediaSynth.jpegPayload(7L)).get
    assert(img.pixels.sameElements(base.pixels))
    // fine-grained bands (many empty scans per block) too
    val many = JpegCodec.encodeGrayProgressive(
      MediaSynth.jpegWidth(7L), MediaSynth.jpegHeight(7L),
      MediaSynth.jpegQuantTable, MediaSynth.jpegCoeffs(7L),
      bands = Seq((1, 5), (6, 10), (11, 20), (21, 38), (39, 40), (41, 63)))
    assert(JpegCodec.decode(many).get.pixels.sameElements(base.pixels))
  }

  test("successive-approximation progressive decodes identically to baseline") {
    for (id <- 0L until 120L) {
      val sa = JpegCodec.encodeGrayProgressive(
        MediaSynth.jpegWidth(id), MediaSynth.jpegHeight(id),
        MediaSynth.jpegQuantTable, MediaSynth.jpegCoeffs(id), approx = true)
      val img = JpegCodec.decode(sa)
        .getOrElse(fail(s"successive-approx decode failed for doc $id"))
      val base = JpegCodec.decode(MediaSynth.jpegPayload(id)).get
      assert(img.pixels.sameElements(base.pixels),
        s"successive-approx != baseline for doc $id")
      // five scans: DC first + DC refine + 2 AC bands + AC refine
      val scans = sa.sliding(2).count(a =>
        (a(0) & 0xff) == 0xff && (a(1) & 0xff) == 0xda)
      assert(scans == 5, s"expected 5 scans, got $scans")
    }
  }

  test("successive approximation survives dense random blocks (ZRL + buffered bits)") {
    val rnd = new scala.util.Random(1234)
    val w = 32; val h = 24
    val q = Array.fill(64)(1)
    for (trial <- 0 until 20) {
      // mix sparse and dense blocks: long zero runs around ±1 values
      // exercise ZRL-with-corrections and EOB-run buffering
      val blocks = Array.fill((w / 8) * (h / 8)) {
        val c = new Array[Int](64)
        c(0) = rnd.nextInt(255) - 127
        (1 until 64).foreach { kk =>
          val roll = rnd.nextInt(10)
          if (roll == 0) c(kk) = rnd.nextInt(63) - 31
          else if (roll == 1) c(kk) = if (rnd.nextBoolean()) 1 else -1
        }
        c
      }
      def cf(bx: Int, by: Int): Array[Int] = blocks(by * (w / 8) + bx)
      val base = JpegCodec.decode(
        JpegCodec.encodeGray(w, h, q, cf, 0)).get
      val sa = JpegCodec.decode(JpegCodec.encodeGrayProgressive(
        w, h, q, cf, approx = true)).get
      assert(sa.pixels.sameElements(base.pixels), s"trial $trial diverged")
    }
  }

  test("progressive out-of-subset forms are rejected, not mis-decoded") {
    // restart intervals inside a progressive stream are out of subset:
    // splice a DRI segment (FF DD 00 04 00 02) in front of the first SOS
    val p = MediaSynth.jpegProgressivePayload(3L)
    var i = 2
    while (!((p(i) & 0xff) == 0xff && (p(i + 1) & 0xff) == 0xda)) i += 1
    val dri = Array(0xff, 0xdd, 0x00, 0x04, 0x00, 0x02).map(_.toByte)
    val mod = p.take(i) ++ dri ++ p.drop(i)
    assert(JpegCodec.decode(mod).isEmpty)
  }

  test("ImageHeaders dims agree with the full decoder on the corpus") {
    for (id <- 0L until 30L) {
      val p = MediaSynth.jpegPayload(id)
      val probed = ImageHeaders.dims(p)
      assert(probed.contains(("jpeg", MediaSynth.jpegWidth(id),
        MediaSynth.jpegHeight(id))),
        s"header probe $probed disagrees for doc $id")
    }
  }
}
