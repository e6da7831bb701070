package graft.multimodal

/** REAL GIF pixel codec — the indexed-color sibling of [[PngCodec]],
  * completing the image half of the decode subset: GIF's compression is
  * LZW with variable-width codes (GIF89a spec appendix F), which is pure
  * bit arithmetic, so — like PNG's zlib+filters and WAV's PCM — a full
  * pure-JVM decode is COMPLETE for this container, not a stub. The
  * entropy-coded formats (JPEG DCT, Vorbis, H.264) remain the documented
  * out-of-subset boundary.
  *
  * Decode contract matches the other media parsers: total — truncated,
  * corrupt, or out-of-subset payloads (interlaced images, local color
  * tables, missing global table) return None, never throw in an executor
  * task. The LZW inflater implements the full algorithm: variable code
  * width growing to 12 bits, CLEAR resets mid-stream, the KwKwK case (a
  * code one past the table end), deferred-clear streams from encoders
  * that keep emitting at a full table, and strict termination — the
  * stream must decode to exactly `width*height` pixels and close with EOI.
  *
  * Width synchronization: the GIF code width depends on the dictionary
  * state, and the textbook incremental rules hide an encoder/decoder
  * off-by-one at the stream tail (the decoder defines one entry per data
  * code read, one step behind the encoder's defines, yet both must read/
  * write EVERY code — including EOI — at the same width). Both sides here
  * derive the width of the next code from one shared closed form,
  * [[widthFor]]: the largest value the decoder may legally see next is
  * its own KwKwK code `eoi + c` after `c` data codes since the last
  * CLEAR, so `width = bits(eoi + c)` clamped to [mcs+1, 12] — identical
  * on both sides by construction, and equal to the standard
  * (non-early-change) GIF convention.
  *
  * The encoder exists for the deterministic gate corpus ([[MediaSynth]])
  * and round-trip specs; it emits genuine variable-width LZW (with
  * optional periodic CLEAR resets so the decoder's reset path sees real
  * traffic) and 255-byte sub-block framing, so decode is tested against
  * authentic compressed streams, not canned bytes.
  */
object GifCodec {

  /** Row-major palette indices plus the RGB palette (3 bytes per entry):
    * `indices(y*width + x)` selects `palette(3*k..3*k+2)`. */
  final case class IndexedImage(width: Int, height: Int,
      palette: Array[Byte], indices: Array[Byte]) {
    def nColors: Int = palette.length / 3
  }

  /** Refuse rasters larger than this — a corrupt screen descriptor
    * declaring 65535×65535 must not OOM the task. */
  private val MaxPixels: Long = 64L << 20

  private val TableCap = 4096 // 12-bit GIF code space

  /** Width of the next code after `dataCodes` data codes since the last
    * CLEAR (see class doc): smallest w ≥ mcs+1 with eoi + dataCodes <
    * 2^w, capped at 12. */
  private def widthFor(mcs: Int, dataCodes: Int): Int = {
    val eoi = (1 << mcs) + 1
    var w = mcs + 1
    while (w < 12 && eoi + dataCodes >= (1 << w)) w += 1
    w
  }

  // ---------------------------------------------------------------- encode

  /** Encode as a non-interlaced GIF89a with a global color table.
    * `minCodeSize` must satisfy `2^minCodeSize >= nColors` (the GIF
    * minimum is 2); `clearEvery` > 0 forces a CLEAR reset after that many
    * data codes so the gate corpus exercises mid-stream dictionary resets
    * even on images too small to fill the 4096-entry table. */
  def encode(img: IndexedImage, minCodeSize: Int,
      clearEvery: Int = 0): Array[Byte] = {
    val nc = img.nColors
    require(minCodeSize >= 2 && minCodeSize <= 8, s"minCodeSize $minCodeSize")
    require(nc >= 1 && nc <= (1 << minCodeSize), s"$nc colors")
    require(img.indices.length == img.width * img.height)
    require(img.indices.forall(b => (b & 0xff) < nc), "index out of palette")
    val out = new java.io.ByteArrayOutputStream(
      img.indices.length / 2 + img.palette.length + 64)
    out.write("GIF89a".getBytes("US-ASCII"))
    // logical screen descriptor: w/h le16, GCT flag + size bits, bg, aspect
    val gctBits = math.max(1, minCodeSize)
    writeLe16(out, img.width)
    writeLe16(out, img.height)
    out.write(0x80 | ((gctBits - 1) << 4) | (gctBits - 1))
    out.write(0) // background color index
    out.write(0) // pixel aspect ratio
    // global color table, padded to 2^gctBits entries
    out.write(img.palette, 0, img.palette.length)
    val pad = ((1 << gctBits) - nc) * 3
    if (pad > 0) out.write(new Array[Byte](pad), 0, pad)
    // image descriptor at (0,0), no local table, non-interlaced
    out.write(0x2c)
    writeLe16(out, 0); writeLe16(out, 0)
    writeLe16(out, img.width); writeLe16(out, img.height)
    out.write(0)
    out.write(minCodeSize)
    subBlocks(out, lzwCompress(img.indices, minCodeSize, clearEvery))
    out.write(0) // block terminator
    out.write(0x3b) // trailer
    out.toByteArray
  }

  private def writeLe16(out: java.io.ByteArrayOutputStream, v: Int): Unit = {
    out.write(v & 0xff); out.write((v >>> 8) & 0xff)
  }

  /** Split the code stream into GIF's ≤255-byte data sub-blocks. */
  private def subBlocks(out: java.io.ByteArrayOutputStream,
      data: Array[Byte]): Unit = {
    var i = 0
    while (i < data.length) {
      val n = math.min(255, data.length - i)
      out.write(n)
      out.write(data, i, n)
      i += n
    }
  }

  /** GIF-flavor LZW compress: codes LSB-first, dictionary a prefix tree
    * keyed by `(prefixCode << 8) | nextByte`, widths from [[widthFor]].
    * A CLEAR is emitted when the table fills (or every `clearEvery` data
    * codes); the entry the decoder speculatively defines in that window
    * is never referenced, so skipping it here is sound. */
  private def lzwCompress(indices: Array[Byte], mcs: Int,
      clearEvery: Int): Array[Byte] = {
    val clear = 1 << mcs
    val eoi = clear + 1
    val bits = new LsbBitWriter
    val dict = new java.util.HashMap[Integer, Integer](TableCap)
    var nextCode = eoi + 1
    var dataCodes = 0

    def control(code: Int): Unit = bits.write(code, widthFor(mcs, dataCodes))
    def data(code: Int): Unit = { control(code); dataCodes += 1 }
    def reset(): Unit = { dict.clear(); nextCode = eoi + 1; dataCodes = 0 }

    control(clear) // spec-recommended leading CLEAR
    if (indices.nonEmpty) {
      var prefix = indices(0) & 0xff
      var i = 1
      while (i < indices.length) {
        val k = indices(i) & 0xff
        val key = Integer.valueOf((prefix << 8) | k)
        val hit = dict.get(key)
        if (hit != null) prefix = hit.intValue()
        else {
          data(prefix)
          if ((clearEvery > 0 && dataCodes % clearEvery == 0) ||
            nextCode == TableCap) {
            control(clear); reset()
          } else {
            dict.put(key, Integer.valueOf(nextCode))
            nextCode += 1
          }
          prefix = k
        }
        i += 1
      }
      data(prefix)
    }
    control(eoi)
    bits.finish()
  }

  private final class LsbBitWriter {
    private val out = new java.io.ByteArrayOutputStream(256)
    private var acc = 0
    private var nBits = 0
    def write(code: Int, width: Int): Unit = {
      acc |= code << nBits
      nBits += width
      while (nBits >= 8) {
        out.write(acc & 0xff)
        acc >>>= 8
        nBits -= 8
      }
    }
    def finish(): Array[Byte] = {
      if (nBits > 0) out.write(acc & 0xff)
      out.toByteArray
    }
  }

  // ---------------------------------------------------------------- decode

  /** Decode a non-interlaced GIF87a/89a that carries a global color table,
    * taking the FIRST image block (extension blocks are skipped — the
    * single-frame subset of a training corpus; animation frames would
    * iterate the same loop). None for truncated, corrupt, interlaced, or
    * GCT-less payloads — never a throw. */
  def decode(payload: Array[Byte]): Option[IndexedImage] = {
    if (payload.length < 14) return None
    val sig = new String(payload, 0, 6, "US-ASCII")
    if (sig != "GIF87a" && sig != "GIF89a") return None
    val packed = payload(10) & 0xff
    if ((packed & 0x80) == 0) return None // subset requires a GCT
    val gctEntries = 1 << ((packed & 0x07) + 1)
    val gctEnd = 13L + gctEntries * 3L
    if (gctEnd > payload.length) return None
    val palette = java.util.Arrays.copyOfRange(payload, 13, gctEnd.toInt)
    // walk blocks: skip extensions, stop at the first image descriptor
    var pos = gctEnd
    while (pos < payload.length) {
      (payload(pos.toInt) & 0xff) match {
        case 0x21 => // extension: introducer + label, then sub-blocks
          pos = skipSubBlocks(payload, pos + 2)
          if (pos < 0) return None
        case 0x2c =>
          return decodeImage(payload, pos, palette)
        case _ => return None // trailer (or junk) before any image
      }
    }
    None
  }

  private def le16(p: Array[Byte], at: Int): Int =
    (p(at) & 0xff) | ((p(at + 1) & 0xff) << 8)

  /** Advance past a sub-block chain (position after the 0 terminator;
    * -1 on truncation). */
  private def skipSubBlocks(p: Array[Byte], start: Long): Long = {
    var pos = start
    while (pos < p.length) {
      val n = p(pos.toInt) & 0xff
      pos += 1 + n
      if (n == 0) return pos
    }
    -1L
  }

  private def decodeImage(p: Array[Byte], descAt: Long,
      palette: Array[Byte]): Option[IndexedImage] = {
    if (descAt + 11 > p.length) return None
    val at = descAt.toInt
    val w = le16(p, at + 5)
    val h = le16(p, at + 7)
    val flags = p(at + 9) & 0xff
    if ((flags & 0x40) != 0) return None // interlaced: out of subset
    if ((flags & 0x80) != 0) return None // local color table: out of subset
    if (w < 1 || h < 1 || w.toLong * h > MaxPixels) return None
    val mcs = p(at + 10) & 0xff
    if (mcs < 2 || mcs > 8) return None
    // reassemble the code stream from the data sub-blocks
    var pos = descAt + 11
    val codeBytes = new java.io.ByteArrayOutputStream(256)
    var done = false
    while (!done) {
      if (pos >= p.length) return None
      val n = p(pos.toInt) & 0xff
      pos += 1
      if (n == 0) done = true
      else {
        if (pos + n > p.length) return None
        codeBytes.write(p, pos.toInt, n)
        pos += n
      }
    }
    lzwDecompress(codeBytes.toByteArray, mcs, w * h)
      .map(IndexedImage(w, h, palette, _))
  }

  /** Full GIF LZW inflate (see class doc for the width rule). Dictionary
    * entries are (prefixCode, finalByte) pairs resolved by walking the
    * prefix chain — O(len) per emitted string, no per-entry allocation. */
  private def lzwDecompress(stream: Array[Byte], mcs: Int,
      expected: Int): Option[Array[Byte]] = {
    val clear = 1 << mcs
    val eoi = clear + 1
    val prefixOf = new Array[Int](TableCap)
    val byteOf = new Array[Byte](TableCap)
    val lenOf = new Array[Int](TableCap)
    var k = 0
    while (k < clear) { prefixOf(k) = -1; byteOf(k) = k.toByte; lenOf(k) = 1; k += 1 }

    val out = new Array[Byte](expected)
    var got = 0
    var nextCode = eoi + 1
    var dataCodes = 0
    var prev = -1
    var acc = 0L
    var nBits = 0
    var i = 0

    def define(prefix: Int, first: Byte): Unit = {
      prefixOf(nextCode) = prefix
      byteOf(nextCode) = first
      lenOf(nextCode) = lenOf(prefix) + 1
      nextCode += 1
    }

    /** Append code's byte string at out(got); false past `expected`. */
    def emit(code: Int): Boolean = {
      val len = lenOf(code)
      if (got + len > expected) return false
      var at = got + len - 1
      var c = code
      while (c >= 0) { out(at) = byteOf(c); at -= 1; c = prefixOf(c) }
      got += len
      true
    }

    while (true) {
      val width = widthFor(mcs, dataCodes)
      while (nBits < width && i < stream.length) {
        acc |= (stream(i) & 0xffL) << nBits
        nBits += 8
        i += 1
      }
      if (nBits < width) return None // truncated stream
      val code = (acc & ((1L << width) - 1)).toInt
      acc >>>= width
      nBits -= width

      if (code == clear) {
        nextCode = eoi + 1
        dataCodes = 0
        prev = -1
      } else if (code == eoi) {
        return if (got == expected) Some(out) else None
      } else {
        dataCodes += 1
        if (prev < 0) {
          // first data code after a CLEAR must be a root
          if (code >= clear) return None
          if (!emit(code)) return None
        } else if (code < nextCode) {
          // defined before emit so width bookkeeping mirrors the encoder;
          // skipped at a full table (deferred-clear streams)
          if (nextCode < TableCap) define(prev, firstByte(prefixOf, byteOf, code))
          if (!emit(code)) return None
        } else if (code == nextCode && nextCode < TableCap) {
          // KwKwK: the entry being defined is the one emitted
          define(prev, firstByte(prefixOf, byteOf, prev))
          if (!emit(code)) return None
        } else {
          return None // code beyond the table: corrupt
        }
        prev = code
      }
    }
    None // unreachable
  }

  /** First byte of the string a dictionary code expands to. */
  private def firstByte(prefixOf: Array[Int], byteOf: Array[Byte],
      code: Int): Byte = {
    var c = code
    while (prefixOf(c) >= 0) c = prefixOf(c)
    byteOf(c)
  }
}
