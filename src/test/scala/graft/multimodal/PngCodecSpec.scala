package graft.multimodal

import java.util.zip.{CRC32, Deflater}

import org.scalatest.funsuite.AnyFunSuite

class PngCodecSpec extends AnyFunSuite {

  private def img(w: Int, h: Int, ch: Int, seed: Long): PngCodec.Image = {
    val px = Array.tabulate(w * h * ch)(i => ((i * 31 + seed * 7) % 256).toByte)
    PngCodec.Image(w, h, ch, px)
  }

  private def assertSame(a: PngCodec.Image, b: PngCodec.Image): Unit = {
    assert(a.width == b.width && a.height == b.height && a.channels == b.channels)
    assert(java.util.Arrays.equals(a.pixels, b.pixels))
  }

  test("round-trips exact pixels through every filter type, gray/RGB/RGBA") {
    for (ch <- Seq(1, 3, 4); ft <- 0 to 4) {
      val orig = img(13, 9, ch, ft * 10L + ch)
      val decoded = PngCodec.decode(PngCodec.encode(orig, _ => ft))
      assert(decoded.nonEmpty, s"ch=$ch ft=$ft failed to decode")
      assertSame(orig, decoded.get)
    }
    // rotating filters across scanlines (the gate-corpus shape)
    val orig = img(21, 17, 4, 99L)
    assertSame(orig, PngCodec.decode(PngCodec.encode(orig, y => y % 5)).get)
    // 1×1 and single-row/column edges
    for ((w, h) <- Seq((1, 1), (1, 8), (8, 1)))
      assertSame(img(w, h, 3, 5L),
        PngCodec.decode(PngCodec.encode(img(w, h, 3, 5L), y => (y + 3) % 5)).get)
  }

  test("truncations and byte corruption never throw") {
    val full = PngCodec.encode(img(6, 5, 3, 1L), y => y % 5)
    val want = PngCodec.decode(full).get
    (0 until full.length).foreach { n =>
      // prefixes either fail to parse or (missing only trailing IEND crc
      // bytes the lenient walk doesn't need) decode to the same pixels
      PngCodec.decode(full.take(n)).foreach(assertSame(want, _))
    }
    // single-byte corruption anywhere must not throw; flipping the zlib
    // header or a length field must not parse to a DIFFERENT-shaped image
    (0 until full.length).foreach { i =>
      val mut = full.clone()
      mut(i) = (mut(i) ^ 0x55).toByte
      PngCodec.decode(mut).foreach(d =>
        assert(d.pixels.length == want.pixels.length))
    }
  }

  // custom builder for malformed-raster cases the public encoder refuses
  private def rawPng(w: Long, h: Long, bitDepth: Int, colorType: Int,
      interlace: Int, raw: Array[Byte]): Array[Byte] = {
    def be32(v: Long) =
      Array((v >>> 24).toByte, (v >>> 16).toByte, (v >>> 8).toByte, v.toByte)
    def chunk(typ: String, data: Array[Byte]) = {
      val t = typ.getBytes("US-ASCII")
      val crc = new CRC32; crc.update(t); crc.update(data)
      be32(data.length.toLong) ++ t ++ data ++ be32(crc.getValue)
    }
    val d = new Deflater; d.setInput(raw); d.finish()
    val out = new java.io.ByteArrayOutputStream
    val buf = new Array[Byte](4096)
    while (!d.finished()) out.write(buf, 0, d.deflate(buf))
    d.end()
    val sig = Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)
    val ihdr = be32(w) ++ be32(h) ++
      Array[Byte](bitDepth.toByte, colorType.toByte, 0, 0, interlace.toByte)
    sig ++ chunk("IHDR", ihdr) ++ chunk("IDAT", out.toByteArray) ++
      chunk("IEND", Array.emptyByteArray)
  }

  test("out-of-subset and malformed rasters decode to None, not a crash") {
    val goodRaw = Array.tabulate(5 * (1 + 4 * 3))(i => // 4×5 RGB, filter 0
      if (i % 13 == 0) 0.toByte else (i * 17 % 256).toByte)
    val zeroed = goodRaw.clone()
    (0 until 5).foreach(y => zeroed(y * 13) = 0) // valid filter bytes
    assert(PngCodec.decode(rawPng(4, 5, 8, 2, 0, zeroed)).nonEmpty) // control
    // grayscale is IN subset (bpp=1 raster: 5 rows × (1 + 4) bytes)
    val grayRaw = Array.tabulate(5 * 5)(i =>
      if (i % 5 == 0) 0.toByte else (i * 7 % 256).toByte)
    assert(PngCodec.decode(rawPng(4, 5, 8, 0, 0, grayRaw))
      .exists(_.channels == 1))
    // 16-bit depth, palette, interlaced: unsupported subset
    assert(PngCodec.decode(rawPng(4, 5, 16, 2, 0, zeroed)).isEmpty)
    assert(PngCodec.decode(rawPng(4, 5, 8, 3, 0, zeroed)).isEmpty)
    assert(PngCodec.decode(rawPng(4, 5, 8, 2, 1, zeroed)).isEmpty)
    // filter byte > 4
    val badFilter = zeroed.clone(); badFilter(0) = 9
    assert(PngCodec.decode(rawPng(4, 5, 8, 2, 0, badFilter)).isEmpty)
    // raster length disagrees with IHDR dims (short and long)
    assert(PngCodec.decode(rawPng(4, 6, 8, 2, 0, zeroed)).isEmpty)
    assert(PngCodec.decode(rawPng(4, 4, 8, 2, 0, zeroed)).isEmpty)
    // zero and absurd declared dims: no OOM-sized allocation attempted
    assert(PngCodec.decode(rawPng(0, 5, 8, 2, 0, zeroed)).isEmpty)
    assert(PngCodec.decode(rawPng(0xFFFFFFFFL, 0xFFFFFFFFL, 8, 2, 0, zeroed)).isEmpty)
    assert(PngCodec.decode(Array.emptyByteArray).isEmpty)
    assert(PngCodec.decode("not a png at all".getBytes).isEmpty)
  }

  test("paletted (type 3) round-trips indices and PLTE through every filter") {
    def pimg(w: Int, h: Int, nc: Int, seed: Long): GifCodec.IndexedImage =
      GifCodec.IndexedImage(w, h,
        Array.tabulate(nc * 3)(i => ((i * 41 + seed * 13) % 256).toByte),
        Array.tabulate(w * h)(i => ((i * 17 + seed * 3) % nc).toByte))
    for (ft <- 0 to 4; nc <- Seq(1, 6, 255, 256)) {
      val orig = pimg(13, 9, nc, ft * 7L + nc)
      val dec = PngCodec.decodePaletted(PngCodec.encodePaletted(orig, _ => ft))
      assert(dec.nonEmpty, s"ft=$ft nc=$nc")
      assert(java.util.Arrays.equals(orig.indices, dec.get.indices))
      assert(java.util.Arrays.equals(orig.palette, dec.get.palette))
    }
    // rotating filters (the q97 corpus shape) + corpus closed forms
    for (id <- 0L to 19L) {
      val dec = PngCodec.decodePaletted(MediaSynth.palettePng(id))
      assert(dec.nonEmpty, s"doc $id")
      val d = dec.get
      assert(d.nColors == MediaSynth.palNColors(id))
      assert((d.indices(3 * d.width + 2) & 0xff) == MediaSynth.palIndex(id, 2, 3))
      val k = d.indices(0) & 0xff
      val (r, g, b) = MediaSynth.palRgb(id, k)
      assert((d.palette(3 * k) & 0xff) == r && (d.palette(3 * k + 1) & 0xff) == g
        && (d.palette(3 * k + 2) & 0xff) == b)
    }
    // cross-contract: the truecolor decoder still refuses type 3, and the
    // paletted decoder refuses truecolor
    val paletted = MediaSynth.palettePng(3L)
    assert(PngCodec.decode(paletted).isEmpty)
    assert(PngCodec.decodePaletted(MediaSynth.pixelPng(3L)).isEmpty)
    // an index past the palette must fail, not read out of bounds
    def rawPaletted(nc: Int, indices: Array[Byte]): Array[Byte] = {
      def be32(v: Long) =
        Array((v >>> 24).toByte, (v >>> 16).toByte, (v >>> 8).toByte, v.toByte)
      def chunk(typ: String, data: Array[Byte]) = {
        val t = typ.getBytes("US-ASCII")
        val crc = new CRC32; crc.update(t); crc.update(data)
        be32(data.length.toLong) ++ t ++ data ++ be32(crc.getValue)
      }
      val raw = Array[Byte](0) ++ indices.take(2) ++
        Array[Byte](0) ++ indices.drop(2) // 2×2, filter 0 rows
      val d = new Deflater; d.setInput(raw); d.finish()
      val out = new java.io.ByteArrayOutputStream
      val buf = new Array[Byte](4096)
      while (!d.finished()) out.write(buf, 0, d.deflate(buf))
      d.end()
      val sig = Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)
      sig ++ chunk("IHDR", be32(2) ++ be32(2) ++ Array[Byte](8, 3, 0, 0, 0)) ++
        chunk("PLTE", Array.tabulate(nc * 3)(_.toByte)) ++
        chunk("IDAT", out.toByteArray) ++ chunk("IEND", Array.emptyByteArray)
    }
    val idx = Array[Byte](0, 1, 2, 2)
    assert(PngCodec.decodePaletted(rawPaletted(4, idx)).nonEmpty) // control
    assert(PngCodec.decodePaletted(rawPaletted(2, idx)).isEmpty) // index 2 ≥ nc
    // truncation/corruption totality over the paletted container
    val full = MediaSynth.palettePng(7L)
    val want = PngCodec.decodePaletted(full).get
    (0 until full.length).foreach { n =>
      PngCodec.decodePaletted(full.take(n)).foreach(d =>
        assert(d.indices.length == want.indices.length))
    }
    (0 until full.length).foreach { i =>
      val mut = full.clone()
      mut(i) = (mut(i) ^ 0x55).toByte
      PngCodec.decodePaletted(mut).foreach(d =>
        assert(d.width * d.height == d.indices.length))
    }
  }

  test("grayscale gate corpus round-trips at bpp=1") {
    for (id <- 0L to 19L) {
      val dec = PngCodec.decode(MediaSynth.grayPng(id))
      assert(dec.nonEmpty, s"doc $id")
      assertSame(MediaSynth.grayImage(id), dec.get)
      assert(dec.get.channels == 1)
      assert((dec.get.pixels(3) & 0xff) == MediaSynth.pixelValue(id, 3, 0, 0))
    }
  }

  test("MediaSynth pixel corpus round-trips: decoded pixels match the closed form") {
    for (id <- 0L to 39L) {
      val decoded = PngCodec.decode(MediaSynth.pixelPng(id))
      assert(decoded.nonEmpty, s"doc $id")
      assertSame(MediaSynth.pixelImage(id), decoded.get)
      val d = decoded.get
      assert(d.width == MediaSynth.pixelWidth(id))
      assert(d.height == MediaSynth.pixelHeight(id))
      assert(d.channels == MediaSynth.pixelChannels(id))
      // spot-check the closed form against a decoded sample
      assert((d.pixels((2 * d.width + 3) * d.channels + 1) & 0xff) ==
        MediaSynth.pixelValue(id, 3, 2, 1))
    }
  }

  test("nearest-neighbor resize maps integer source coordinates exactly") {
    // 4×2 RGB, pixel value encodes its (x, y, c) position
    val src = PngCodec.Image(4, 2, 3, Array.tabulate(24)(i => i.toByte))
    val half = PngCodec.resizeNearest(src, 2, 1)
    // target (x, y) samples source (x*4/2, y*2/1) = (2x, 2y)
    assert(half.width == 2 && half.height == 1 && half.channels == 3)
    assert(half.pixels.toSeq == Seq[Byte](0, 1, 2, 6, 7, 8))
    // identity when dims unchanged
    val same = PngCodec.resizeNearest(src, 4, 2)
    assert(java.util.Arrays.equals(same.pixels, src.pixels))
    // upscale repeats source pixels (x*2/4 = x/2)
    val up = PngCodec.resizeNearest(PngCodec.Image(2, 1, 3,
      Array.tabulate(6)(i => i.toByte)), 4, 1)
    assert(up.pixels.toSeq == Seq[Byte](0, 1, 2, 0, 1, 2, 3, 4, 5, 3, 4, 5))
    // cap helper: aspect preserved, floor division, >= 1
    assert(PngCodec.capDims(19, 15, 8) == (8, 6))
    assert(PngCodec.capDims(4, 6, 8) == (4, 6)) // under the cap: identity
    assert(PngCodec.capDims(1000, 1, 8) == (8, 1)) // extreme aspect floors to 1
  }

  test("dataset resize really resamples decodable PNGs") {
    val spark = graft.GraftSession.get("graft-test")
    import spark.implicits._
    val id = 9L // 13×9 RGB: longer side 13 > 8 → resized
    val png = MediaSynth.pixelPng(id)
    val rows = Seq(
      Multimodal.MediaRow(1L, "image", png,
        MediaSynth.pixelWidth(id), MediaSynth.pixelHeight(id), 0L),
      Multimodal.MediaRow(2L, "audio", png, 44100, 2, 5L)).toDS()
    val out = Multimodal.resize(rows, maxSide = 8).collect()
      .map(m => m.media_id -> m).toMap
    val img = out(1L)
    val dec = PngCodec.decode(img.payload).get
    val (nw, nh) = PngCodec.capDims(
      MediaSynth.pixelWidth(id), MediaSynth.pixelHeight(id), 8)
    assert(img.width == nw && img.height == nh)
    assert(dec.width == nw && dec.height == nh)
    val want = PngCodec.resizeNearest(MediaSynth.pixelImage(id), nw, nh)
    assert(java.util.Arrays.equals(dec.pixels, want.pixels))
    // non-image rows untouched
    assert(out(2L).payload.length == png.length)
  }

  test("feature extraction consumes real pixels for PNG payloads") {
    val id = 7L
    val png = MediaSynth.pixelPng(id)
    val fromPayload = Multimodal.decodeFeature(png)
    val fromPixels = Multimodal.decodeStub(MediaSynth.pixelImage(id).pixels)
    assert(fromPayload.toSeq == fromPixels.toSeq)
    // compression level must not change the feature vector: re-encode the
    // same pixels with different filters → identical features
    val alt = PngCodec.encode(MediaSynth.pixelImage(id), _ => 0)
    assert(!java.util.Arrays.equals(alt, png)) // bytes differ...
    assert(Multimodal.decodeFeature(alt).toSeq == fromPayload.toSeq) // ...features don't
    // PCM WAV rows fold decoded SAMPLE bytes, not container bytes: the
    // same samples in a container with different header framing (extra
    // trailing pad) produce identical features
    val wav = MediaSynth.pcmWav(3L)
    val reframed = wav ++ "LIST".getBytes ++
      Array[Byte](4, 0, 0, 0, 1, 2, 3, 4) // trailing chunk: samples unchanged
    assert(Multimodal.decodeFeature(wav).toSeq ==
      Multimodal.decodeFeature(reframed).toSeq)
    assert(Multimodal.decodeFeature(wav).toSeq !=
      Multimodal.decodeStub(wav).toSeq)
    // raw-video rows fold concatenated frame bytes
    val vid = MediaSynth.rawVideoMp4(3L)
    val frames = VideoHeaders.rawVideoFrames(vid).get.frames.flatten.toArray
    assert(Multimodal.decodeFeature(vid).toSeq ==
      Multimodal.decodeStub(frames).toSeq)
    // out-of-subset payloads keep the documented stub behavior
    val junk = Array.tabulate(64)(i => (i * 3).toByte)
    assert(Multimodal.decodeFeature(junk).toSeq ==
      Multimodal.decodeStub(junk).toSeq)
  }
}
