package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

class GifCodecSpec extends AnyFunSuite {

  private def img(w: Int, h: Int, nc: Int, seed: Long): GifCodec.IndexedImage = {
    val pal = Array.tabulate(nc * 3)(i => ((i * 37 + seed * 11) % 256).toByte)
    val idx = Array.tabulate(w * h)(i => ((i * 13 + seed * 5) % nc).toByte)
    GifCodec.IndexedImage(w, h, pal, idx)
  }

  private def assertSame(a: GifCodec.IndexedImage, b: GifCodec.IndexedImage): Unit = {
    assert(a.width == b.width && a.height == b.height)
    assert(java.util.Arrays.equals(a.indices, b.indices))
    // decoded palette is the padded global table: prefix must match
    assert(b.palette.length >= a.palette.length)
    assert(java.util.Arrays.equals(a.palette,
      java.util.Arrays.copyOf(b.palette, a.palette.length)))
  }

  test("round-trips exact indices at every code size, with and without CLEAR resets") {
    for (mcs <- 2 to 8; clearEvery <- Seq(0, 7, 48)) {
      val nc = 1 << mcs
      val orig = img(23, 17, nc, mcs * 10L + clearEvery)
      val decoded = GifCodec.decode(GifCodec.encode(orig, mcs, clearEvery))
      assert(decoded.nonEmpty, s"mcs=$mcs clearEvery=$clearEvery failed")
      assertSame(orig, decoded.get)
    }
    // palettes smaller than the code-size table (encoder pads)
    assertSame(img(9, 7, 5, 3L),
      GifCodec.decode(GifCodec.encode(img(9, 7, 5, 3L), 3)).get)
    // 1×1 and single-row/column edges
    for ((w, h) <- Seq((1, 1), (1, 9), (9, 1)))
      assertSame(img(w, h, 4, 2L),
        GifCodec.decode(GifCodec.encode(img(w, h, 4, 2L), 2, clearEvery = 3)).get)
  }

  test("KwKwK sequences and long runs survive the variable-width growth") {
    // constant raster: the encoder emits a chain of KwKwK codes
    val flat = GifCodec.IndexedImage(31, 29,
      Array.tabulate(12)(_.toByte), new Array[Byte](31 * 29))
    assertSame(flat, GifCodec.decode(GifCodec.encode(flat, 2)).get)
    // aba-pattern corpus: textbook KwKwK trigger at several code sizes
    for (mcs <- Seq(2, 4, 8)) {
      val idx = Array.tabulate(500)(i => (i % 2).toByte)
      val im = GifCodec.IndexedImage(50, 10, Array.tabulate(3 * (1 << mcs))(_.toByte), idx)
      assertSame(im, GifCodec.decode(GifCodec.encode(im, mcs)).get)
    }
    // enough distinct pixels to push the code width up repeatedly
    val big = img(64, 60, 256, 17L)
    assertSame(big, GifCodec.decode(GifCodec.encode(big, 8)).get)
    // ...and at mcs=2, where growth starts immediately
    val big2 = img(64, 60, 4, 19L)
    assertSame(big2, GifCodec.decode(GifCodec.encode(big2, 2)).get)
  }

  test("table-full streams reset and keep decoding") {
    // high-entropy raster large enough to fill the 4096-entry table at
    // mcs=2 (needs > ~4090 distinct phrases)
    val n = 200 * 200
    val idx = Array.tabulate(n)(i => ((i * 2654435761L >>> 7) % 4).toByte)
    val im = GifCodec.IndexedImage(200, 200, Array.tabulate(12)(_.toByte), idx)
    assertSame(im, GifCodec.decode(GifCodec.encode(im, 2)).get)
  }

  test("truncations and byte corruption never throw") {
    val full = GifCodec.encode(img(9, 7, 16, 4L), 4, clearEvery = 5)
    val want = GifCodec.decode(full).get
    (0 until full.length).foreach { k =>
      GifCodec.decode(full.take(k)).foreach(d =>
        assert(d.indices.length == want.indices.length))
    }
    (0 until full.length).foreach { i =>
      val mut = full.clone()
      mut(i) = (mut(i) ^ 0x55).toByte
      // corrupt payloads may fail to parse, or parse to a same-shape
      // raster (LZW bitflips that stay in-table) — but must never throw
      GifCodec.decode(mut).foreach(d => assert(d.width * d.height == d.indices.length))
    }
    assert(GifCodec.decode(Array.emptyByteArray).isEmpty)
    assert(GifCodec.decode("GIF89a".getBytes).isEmpty)
    assert(GifCodec.decode("not a gif".getBytes).isEmpty)
  }

  test("out-of-subset structures decode to None") {
    val good = GifCodec.encode(img(6, 5, 8, 9L), 3)
    assert(GifCodec.decode(good).nonEmpty) // control
    // interlace flag on the image descriptor (byte 9 of the descriptor,
    // which starts right after the 13-byte header + 8*3-byte GCT)
    val descAt = 13 + 8 * 3
    val interlaced = good.clone()
    interlaced(descAt + 9) = (interlaced(descAt + 9) | 0x40).toByte
    assert(GifCodec.decode(interlaced).isEmpty)
    // local-color-table flag
    val lct = good.clone()
    lct(descAt + 9) = (lct(descAt + 9) | 0x80).toByte
    assert(GifCodec.decode(lct).isEmpty)
    // no global color table
    val noGct = good.clone()
    noGct(10) = (noGct(10) & 0x7f).toByte
    assert(GifCodec.decode(noGct).isEmpty)
    // trailer before any image
    assert(GifCodec.decode(good.take(13 + 8 * 3) :+ 0x3b.toByte).isEmpty)
  }

  test("extension blocks before the image are skipped") {
    val orig = img(5, 4, 4, 6L)
    val full = GifCodec.encode(orig, 2)
    val descAt = 13 + 4 * 3
    // splice a graphic-control extension between the GCT and the image
    val gce = Array[Byte](0x21, 0xf9.toByte, 4, 0, 0, 0, 0, 0)
    val spliced = full.take(descAt) ++ gce ++ full.drop(descAt)
    assertSame(orig, GifCodec.decode(spliced).get)
  }

  test("gate corpus round-trips: decoded indices and palette match the closed forms") {
    for (id <- 0L to 29L) {
      val dec = GifCodec.decode(MediaSynth.gifPayload(id))
      assert(dec.nonEmpty, s"doc $id")
      val d = dec.get
      assert(d.width == MediaSynth.pixelWidth(id))
      assert(d.height == MediaSynth.pixelHeight(id))
      assert(d.nColors == MediaSynth.gifNColors(id))
      assertSame(MediaSynth.gifImage(id), d)
      // spot-check the closed forms against decoded samples
      assert((d.indices(2 * d.width + 3) & 0xff) == MediaSynth.gifIndex(id, 3, 2))
      val k = d.indices(0) & 0xff
      val (r, g, b) = MediaSynth.gifPaletteRgb(id, k)
      assert((d.palette(3 * k) & 0xff) == r)
      assert((d.palette(3 * k + 1) & 0xff) == g)
      assert((d.palette(3 * k + 2) & 0xff) == b)
    }
  }
}
