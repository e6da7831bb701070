package graft.multimodal

import java.util.zip.{CRC32, Deflater, Inflater}

/** REAL PNG pixel codec — the step [[Multimodal.decodeStub]] stood in for.
  * Pure JVM: the IDAT stream is zlib (`java.util.zip.Inflater`/`Deflater`)
  * and the per-scanline filters (None/Sub/Up/Average/Paeth) are bytewise
  * arithmetic, so no native codec library is needed for the subset a
  * training pipeline's synthetic/screenshot-heavy PNG corpus actually
  * uses: non-interlaced, 8-bit, grayscale (color type 0), truecolor RGB
  * (2), or RGBA (6).
  *
  * Decode contract matches the header parsers ([[ImageHeaders]]): total —
  * any truncated, corrupt, or out-of-subset payload returns None, never
  * throws in an executor task. Offset arithmetic stays in Long (unsigned
  * be32 chunk lengths would wrap an Int walk), and declared dimensions are
  * capped before allocation so a corrupt IHDR cannot OOM an executor.
  *
  * The encoder exists for the deterministic gate corpus ([[MediaSynth]])
  * and the round-trip specs; it writes real CRCs and can exercise every
  * filter type, so the decoder's unfilter path is tested against genuine
  * filtered scanlines, not just filter-0 data.
  */
object PngCodec {

  /** Row-major, channel-interleaved 8-bit pixels:
    * `pixels((y*width + x)*channels + c)`. */
  final case class Image(width: Int, height: Int, channels: Int,
      pixels: Array[Byte])

  private val Signature: Array[Byte] =
    Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)

  /** Refuse to allocate more than this many raw bytes for a decode —
    * a corrupt IHDR declaring 65535×65535 must not OOM the task. */
  private val MaxRawBytes: Long = 64L << 20

  // ---------------------------------------------------------------- encode

  private def be32Bytes(v: Long): Array[Byte] =
    Array((v >>> 24).toByte, (v >>> 16).toByte, (v >>> 8).toByte, v.toByte)

  private def chunk(typ: String, data: Array[Byte]): Array[Byte] = {
    val t = typ.getBytes("US-ASCII")
    val crc = new CRC32
    crc.update(t)
    crc.update(data)
    be32Bytes(data.length.toLong) ++ t ++ data ++ be32Bytes(crc.getValue)
  }

  /** Standard Paeth predictor (PNG spec §9.4). */
  private def paeth(a: Int, b: Int, c: Int): Int = {
    val p = a + b - c
    val pa = math.abs(p - a); val pb = math.abs(p - b); val pc = math.abs(p - c)
    if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
  }

  /** Encode as a single-IDAT, non-interlaced 8-bit PNG (grayscale, RGB,
    * or RGBA by channel count). `filterFor(y)` picks the filter type
    * (0–4) applied to scanline `y`, letting the gate corpus exercise the
    * whole unfilter matrix deterministically — including at bpp=1, where
    * Sub/Paeth reference the immediately preceding byte. */
  def encode(img: Image, filterFor: Int => Int = _ => 0): Array[Byte] = {
    require(img.channels == 1 || img.channels == 3 || img.channels == 4,
      "grayscale/RGB/RGBA only")
    require(img.pixels.length == img.width * img.height * img.channels)
    val colorType = img.channels match {
      case 1 => 0
      case 3 => 2
      case _ => 6
    }
    val idat = deflate(
      filterRaster(img.pixels, img.width, img.height, img.channels, filterFor))
    val ihdr = be32Bytes(img.width.toLong) ++ be32Bytes(img.height.toLong) ++
      Array[Byte](8, colorType.toByte, 0, 0, 0)
    Signature ++ chunk("IHDR", ihdr) ++ chunk("IDAT", idat) ++
      chunk("IEND", Array.emptyByteArray)
  }

  /** Encode as an indexed-color (type 3, depth 8) PNG: a PLTE chunk plus
    * a filtered bpp=1 index raster. Palettes may be any size 1..256 —
    * unlike GIF's power-of-two tables. */
  def encodePaletted(img: GifCodec.IndexedImage,
      filterFor: Int => Int = _ => 0): Array[Byte] = {
    val nc = img.nColors
    require(nc >= 1 && nc <= 256, s"$nc palette entries")
    require(img.palette.length == nc * 3)
    require(img.indices.length == img.width * img.height)
    require(img.indices.forall(b => (b & 0xff) < nc), "index out of palette")
    val idat = deflate(
      filterRaster(img.indices, img.width, img.height, 1, filterFor))
    val ihdr = be32Bytes(img.width.toLong) ++ be32Bytes(img.height.toLong) ++
      Array[Byte](8, 3, 0, 0, 0)
    Signature ++ chunk("IHDR", ihdr) ++ chunk("PLTE", img.palette) ++
      chunk("IDAT", idat) ++ chunk("IEND", Array.emptyByteArray)
  }

  /** Apply the per-scanline filters to a raw raster (filter byte + bytes). */
  private def filterRaster(pixels: Array[Byte], width: Int, height: Int,
      bpp: Int, filterFor: Int => Int): Array[Byte] = {
    val stride = width * bpp
    val raw = new Array[Byte](height * (stride + 1))
    var y = 0
    while (y < height) {
      val ft = filterFor(y) & 0xff
      require(ft <= 4, s"filter $ft")
      raw(y * (stride + 1)) = ft.toByte
      var i = 0
      while (i < stride) {
        val x = pixels(y * stride + i) & 0xff
        val a = if (i >= bpp) pixels(y * stride + i - bpp) & 0xff else 0
        val b = if (y > 0) pixels((y - 1) * stride + i) & 0xff else 0
        val c = if (y > 0 && i >= bpp) pixels((y - 1) * stride + i - bpp) & 0xff else 0
        val filtered = ft match {
          case 0 => x
          case 1 => x - a
          case 2 => x - b
          case 3 => x - (a + b) / 2
          case 4 => x - paeth(a, b, c)
        }
        raw(y * (stride + 1) + 1 + i) = filtered.toByte
        i += 1
      }
      y += 1
    }
    raw
  }

  private def deflate(raw: Array[Byte]): Array[Byte] = {
    val deflater = new Deflater(Deflater.DEFAULT_COMPRESSION)
    deflater.setInput(raw)
    deflater.finish()
    val out = new java.io.ByteArrayOutputStream(raw.length / 2 + 64)
    val buf = new Array[Byte](8192)
    while (!deflater.finished()) out.write(buf, 0, deflater.deflate(buf))
    deflater.end()
    out.toByteArray
  }

  /** Nearest-neighbor resample — the standard thumbnail/bucketing kernel,
    * in PURE integer arithmetic (`sx = x*W / nw`, floor division) so an
    * SQL oracle can recompute every output pixel from a closed-form
    * source image. Identity when target dims equal the source's. */
  def resizeNearest(img: Image, nw: Int, nh: Int): Image = {
    require(nw >= 1 && nh >= 1)
    val out = new Array[Byte](nw * nh * img.channels)
    var y = 0
    while (y < nh) {
      val sy = (y.toLong * img.height / nh).toInt
      var x = 0
      while (x < nw) {
        val sx = (x.toLong * img.width / nw).toInt
        var c = 0
        while (c < img.channels) {
          out((y * nw + x) * img.channels + c) =
            img.pixels((sy * img.width + sx) * img.channels + c)
          c += 1
        }
        x += 1
      }
      y += 1
    }
    Image(nw, nh, img.channels, out)
  }

  /** Integer target dims capping the longer side at `maxSide` (aspect
    * preserved, floor division, ≥ 1) — mirrored verbatim in the q90
    * oracle. */
  def capDims(w: Int, h: Int, maxSide: Int): (Int, Int) = {
    val m = math.max(w, h)
    if (m <= maxSide) (w, h)
    else (math.max(1, w * maxSide / m), math.max(1, h * maxSide / m))
  }

  // ---------------------------------------------------------------- decode

  import ByteReads._

  /** Decode a non-interlaced 8-bit grayscale/RGB/RGBA PNG; None for
    * anything else (truncated, corrupt, out-of-subset — palette and
    * 16-bit depths stay out), never a throw. Lenient on chunk CRCs —
    * like most production decoders — but strict on structure: the
    * inflated stream must be exactly `height * (1 + width*bpp)` bytes. */
  def decode(payload: Array[Byte]): Option[Image] = {
    if (payload.length < Signature.length + 25) return None
    var k = 0
    while (k < Signature.length) {
      if (payload(k) != Signature(k)) return None
      k += 1
    }
    // IHDR must be the first chunk (spec) — read it, then walk for IDATs
    if (!tag(payload, 12, "IHDR") || be32(payload, 8) != 13L) return None
    val width = be32(payload, 16)
    val height = be32(payload, 20)
    val bitDepth = u8(payload, 24)
    val colorType = u8(payload, 25)
    val interlace = u8(payload, 28)
    if (bitDepth != 8 ||
      (colorType != 0 && colorType != 2 && colorType != 6) ||
      u8(payload, 26) != 0 || u8(payload, 27) != 0 || interlace != 0) return None
    val bpp = colorType match {
      case 0 => 1
      case 2 => 3
      case _ => 4
    }
    if (width < 1 || height < 1) return None
    val stride = width * bpp // Long: safe for any be32 dims
    val rawLen = height * (stride + 1)
    if (rawLen > MaxRawBytes) return None
    walkChunks(payload).flatMap { case (idat, _) =>
      inflateExact(idat, rawLen.toInt)
        .flatMap(unfilter(_, width.toInt, height.toInt, bpp))
        .map(px => Image(width.toInt, height.toInt, bpp, px))
    }
  }

  /** Decode an indexed-color (type 3, depth 8) non-interlaced PNG to its
    * palette indices + PLTE table; None for anything else — including an
    * index referencing past the palette — never a throw. */
  def decodePaletted(payload: Array[Byte]): Option[GifCodec.IndexedImage] = {
    if (payload.length < Signature.length + 25) return None
    var k = 0
    while (k < Signature.length) {
      if (payload(k) != Signature(k)) return None
      k += 1
    }
    if (!tag(payload, 12, "IHDR") || be32(payload, 8) != 13L) return None
    val width = be32(payload, 16)
    val height = be32(payload, 20)
    if (u8(payload, 24) != 8 || u8(payload, 25) != 3 ||
      u8(payload, 26) != 0 || u8(payload, 27) != 0 || u8(payload, 28) != 0)
      return None
    if (width < 1 || height < 1) return None
    val rawLen = height * (width + 1)
    if (rawLen > MaxRawBytes) return None
    walkChunks(payload).flatMap { case (idat, plte) =>
      plte match {
        case Some(pal) if pal.length >= 3 && pal.length <= 768 &&
            pal.length % 3 == 0 =>
          val nc = pal.length / 3
          inflateExact(idat, rawLen.toInt)
            .flatMap(unfilter(_, width.toInt, height.toInt, 1))
            .filter(_.forall(b => (b & 0xff) < nc))
            .map(GifCodec.IndexedImage(width.toInt, height.toInt, pal, _))
        case _ => None // missing or malformed palette
      }
    }
  }

  /** Walk the chunk sequence past IHDR, concatenating IDAT data and
    * capturing PLTE; None on truncation before IEND. */
  private def walkChunks(
      payload: Array[Byte]): Option[(Array[Byte], Option[Array[Byte]])] = {
    val idat = new java.io.ByteArrayOutputStream(256)
    var plte: Option[Array[Byte]] = None
    var i = 8L + 25L // past IHDR chunk (12 header/crc + 13 data)
    var sawEnd = false
    while (!sawEnd && i + 8 <= payload.length) {
      val at = i.toInt
      val len = be32(payload, at) // unsigned
      val dataStart = i + 8
      val next = dataStart + len + 4
      if (tag(payload, at + 4, "IEND")) sawEnd = true
      else {
        if (next > payload.length) return None // truncated mid-chunk
        if (tag(payload, at + 4, "IDAT"))
          idat.write(payload, dataStart.toInt, len.toInt)
        else if (tag(payload, at + 4, "PLTE"))
          plte = Some(java.util.Arrays.copyOfRange(
            payload, dataStart.toInt, (dataStart + len).toInt))
        i = next
      }
    }
    if (!sawEnd) None else Some((idat.toByteArray, plte))
  }

  /** Inflate to EXACTLY `expected` bytes; None on corrupt/short/long data. */
  private def inflateExact(deflated: Array[Byte], expected: Int): Option[Array[Byte]] = {
    val inflater = new Inflater
    try {
      inflater.setInput(deflated)
      val out = new Array[Byte](expected)
      var got = 0
      while (got < expected && !inflater.finished()) {
        val n = inflater.inflate(out, got, expected - got)
        // truncated stream, or an FDICT preset-dictionary header we will
        // never feed — without this check inflate() returns 0 forever
        if (n == 0 && (inflater.needsInput() || inflater.needsDictionary()))
          return None
        got += n
      }
      if (got == expected && (inflater.finished() ||
          inflater.inflate(new Array[Byte](1)) == 0)) Some(out)
      else None // short, or stream continues past the declared raster
    } catch {
      case _: java.util.zip.DataFormatException => None
    } finally inflater.end()
  }

  /** Reverse the per-scanline filters in place over a fresh pixel array. */
  private def unfilter(raw: Array[Byte], width: Int, height: Int,
      bpp: Int): Option[Array[Byte]] = {
    val stride = width * bpp
    val px = new Array[Byte](height * stride)
    var y = 0
    while (y < height) {
      val ft = raw(y * (stride + 1)) & 0xff
      if (ft > 4) return None
      var i = 0
      while (i < stride) {
        val f = raw(y * (stride + 1) + 1 + i) & 0xff
        val a = if (i >= bpp) px(y * stride + i - bpp) & 0xff else 0
        val b = if (y > 0) px((y - 1) * stride + i) & 0xff else 0
        val c = if (y > 0 && i >= bpp) px((y - 1) * stride + i - bpp) & 0xff else 0
        val v = ft match {
          case 0 => f
          case 1 => f + a
          case 2 => f + b
          case 3 => f + (a + b) / 2
          case 4 => f + paeth(a, b, c)
        }
        px(y * stride + i) = v.toByte
        i += 1
      }
      y += 1
    }
    Some(px)
  }
}
