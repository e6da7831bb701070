package graft.multimodal

import java.io.ByteArrayOutputStream

/** REAL FLAC encode/decode, pure JVM — the lossless compressed-audio leg
  * of the codec family (VERDICT r15 task 5): unlike the perceptual
  * codecs, FLAC's FIXED polynomial predictors + Rice-coded residuals are
  * INTEGER-EXACT, so decoded samples equal the source bitwise and a
  * DuckDB oracle can replay them arithmetically the way q149 replays
  * JPEG and q91 replays PCM.
  *
  * Supported subset (each boundary returns None, never a throw):
  *
  *  - STREAMINFO metadata block (mandatory-first per spec); other
  *    metadata blocks are SKIPPED via their length headers
  *  - fixed-blocksize streams (blocking strategy 0), 16-bit samples,
  *    independent channels (assignments 0–7); side-coded stereo
  *    (assignments 8–10) and other bit depths decline loudly
  *  - subframe types CONSTANT, VERBATIM, and FIXED orders 0–4, with
  *    the wasted-bits shift; LPC declines (the reference encoder's
  *    `-l 0` / fast presets emit exactly this subset)
  *  - 4-bit Rice residual partitions at any partition order, incl. the
  *    0b1111 escape (verbatim n-bit residuals)
  *
  * Every integrity field is VERIFIED on decode, not skipped: frame
  * header CRC-8 (poly 0x07), whole-frame CRC-16 (poly 0x8005), and the
  * STREAMINFO MD5 of the unencoded little-endian sample stream — one
  * flipped bit anywhere fails the gate. Bit IO is MSB-first as the
  * format prescribes. */
object FlacCodec {

  final case class FlacAudio(sampleRate: Int, channels: Int,
      bitsPerSample: Int, samples: Array[Short], md5Ok: Boolean)

  // ------------------------------------------------------------ bit IO

  private final class BitWriter {
    val bytes = new ByteArrayOutputStream()
    private var acc = 0
    private var nBits = 0
    def write(v: Long, bits: Int): Unit = {
      var i = bits - 1
      while (i >= 0) {
        acc = (acc << 1) | ((v >>> i) & 1L).toInt
        nBits += 1
        if (nBits == 8) { bytes.write(acc); acc = 0; nBits = 0 }
        i -= 1
      }
    }
    def writeUnary(q: Int): Unit = { // q zeros then a one
      var i = 0
      while (i < q) { write(0L, 1); i += 1 }
      write(1L, 1)
    }
    def align(): Unit = if (nBits > 0) write(0L, 8 - nBits)
    def size: Int = bytes.size()
  }

  private final class BitReader(p: Array[Byte]) {
    var pos = 0 // byte position of the NEXT unread byte
    private var acc = 0
    private var nBits = 0
    def bytePos: Int = pos - (nBits + 7) / 8
    def aligned: Boolean = nBits == 0
    def read(bits: Int): Long = {
      var out = 0L
      var i = 0
      while (i < bits) {
        if (nBits == 0) {
          if (pos >= p.length) throw Truncated
          acc = p(pos) & 0xFF; pos += 1; nBits = 8
        }
        out = (out << 1) | ((acc >> (nBits - 1)) & 1)
        nBits -= 1
        i += 1
      }
      out
    }
    def readUnary(): Int = {
      var q = 0
      while (read(1) == 0L) q += 1
      q
    }
    def readSigned(bits: Int): Long = {
      val u = read(bits)
      if ((u & (1L << (bits - 1))) != 0) u - (1L << bits) else u
    }
    def align(): Unit = nBits = 0
  }

  private object Truncated extends RuntimeException {
    override def fillInStackTrace(): Throwable = this
  }

  // -------------------------------------------------------------- CRCs

  private def crc8(p: Array[Byte], from: Int, until: Int): Int = {
    var c = 0
    var i = from
    while (i < until) {
      c ^= p(i) & 0xFF
      var b = 0
      while (b < 8) {
        c = if ((c & 0x80) != 0) ((c << 1) ^ 0x07) & 0xFF else (c << 1) & 0xFF
        b += 1
      }
      i += 1
    }
    c
  }

  private def crc16(p: Array[Byte], from: Int, until: Int): Int = {
    var c = 0
    var i = from
    while (i < until) {
      c ^= (p(i) & 0xFF) << 8
      var b = 0
      while (b < 8) {
        c = if ((c & 0x8000) != 0) ((c << 1) ^ 0x8005) & 0xFFFF
            else (c << 1) & 0xFFFF
        b += 1
      }
      i += 1
    }
    c
  }

  private def md5Of(samples: Array[Short]): Array[Byte] = {
    val le = new Array[Byte](samples.length * 2)
    var i = 0
    while (i < samples.length) {
      le(2 * i) = (samples(i) & 0xFF).toByte
      le(2 * i + 1) = ((samples(i) >> 8) & 0xFF).toByte
      i += 1
    }
    java.security.MessageDigest.getInstance("MD5").digest(le)
  }

  /** residual of the order-`o` fixed polynomial predictor at index i
    * (i ≥ o) over per-channel samples `s`. */
  private def fixedResidual(s: Array[Int], i: Int, o: Int): Long = o match {
    case 0 => s(i)
    case 1 => s(i).toLong - s(i - 1)
    case 2 => s(i).toLong - 2L * s(i - 1) + s(i - 2)
    case 3 => s(i).toLong - 3L * s(i - 1) + 3L * s(i - 2) - s(i - 3)
    case 4 => s(i).toLong - 4L * s(i - 1) + 6L * s(i - 2) -
      4L * s(i - 3) + s(i - 4)
  }

  private def zigzag(v: Long): Long = if (v >= 0) v << 1 else ((-v) << 1) - 1

  /** The frame header's UTF-8-style coded number (spec §9.1.5): 1 byte
    * below 0x80, else a lead byte of (n+1) ones + zero carrying the top
    * bits followed by n `10xxxxxx` continuation bytes — so encode has no
    * frame-count ceiling (decode already walks the length prefix). */
  private def writeUtf8Coded(w: BitWriter, v: Long): Unit = {
    if (v < 0x80L) { w.write(v, 8); return }
    val n =
      if (v < 0x800L) 1
      else if (v < 0x10000L) 2
      else if (v < 0x200000L) 3
      else if (v < 0x4000000L) 4
      else 5
    w.write(((0xFE << (6 - n)) & 0xFF).toLong |
      ((v >>> (6 * n)) & ((1L << (6 - n)) - 1)), 8)
    var i = n - 1
    while (i >= 0) {
      w.write(0x80L | ((v >>> (6 * i)) & 0x3F), 8)
      i -= 1
    }
  }

  // ------------------------------------------------------------ encode

  /** Encode interleaved 16-bit samples as a real FLAC stream: one
    * STREAMINFO block (true MD5), fixed-blocksize frames of
    * `blockSize` samples (last one shorter), per-channel best FIXED
    * order 0–2 by absolute residual sum, one order-0 Rice partition
    * with the standard mean-based parameter. */
  def encode(samples: Array[Short], channels: Int, sampleRate: Int,
      blockSize: Int = 16): Array[Byte] = {
    require(channels >= 1 && channels <= 8 &&
      samples.length % channels == 0)
    val perCh = samples.length / channels
    val out = new ByteArrayOutputStream()
    out.write('f'); out.write('L'); out.write('a'); out.write('C')
    // STREAMINFO (last-metadata flag set, type 0, length 34)
    val si = new BitWriter
    si.write(blockSize.toLong, 16); si.write(blockSize.toLong, 16)
    si.write(0L, 24); si.write(0L, 24) // frame sizes unknown
    si.write(sampleRate.toLong, 20)
    si.write((channels - 1).toLong, 3)
    si.write(15L, 5) // bits-per-sample - 1
    si.write(perCh.toLong, 36)
    val head = si.bytes.toByteArray
    out.write(0x80); out.write(0); out.write(0); out.write(34)
    out.write(head, 0, head.length)
    out.write(md5Of(samples), 0, 16)
    var frame = 0
    var done = 0
    while (done < perCh) {
      val bs = math.min(blockSize, perCh - done)
      val w = new BitWriter
      w.write(0x3FFE, 14); w.write(0L, 1); w.write(0L, 1)
      w.write(7L, 4) // blocksize: 16-bit value at header end
      w.write(0L, 4) // sample rate: from STREAMINFO
      w.write((channels - 1).toLong, 4) // independent channels
      w.write(4L, 3) // 16-bit samples
      w.write(0L, 1)
      writeUtf8Coded(w, frame.toLong)
      w.write((bs - 1).toLong, 16)
      val headerBytes = w.bytes.toByteArray // aligned: 4+1+2 bytes
      w.write(crc8(headerBytes, 0, headerBytes.length).toLong, 8)
      var ch = 0
      while (ch < channels) {
        val s = new Array[Int](bs)
        var i = 0
        while (i < bs) {
          s(i) = samples((done + i) * channels + ch); i += 1
        }
        // best fixed order 0..2 by absolute residual sum
        val order = (0 to math.min(2, bs - 1)).minBy { o =>
          var sum = 0L
          var i2 = o
          while (i2 < bs) { sum += math.abs(fixedResidual(s, i2, o)); i2 += 1 }
          (sum, o)
        }
        w.write(0L, 1); w.write((8 + order).toLong, 6); w.write(0L, 1)
        var i3 = 0
        while (i3 < order) { w.write(s(i3).toLong & 0xFFFF, 16); i3 += 1 }
        // residuals: method 00 (4-bit Rice), partition order 0
        w.write(0L, 2); w.write(0L, 4)
        val n = bs - order
        var sumU = 0L
        var i4 = order
        while (i4 < bs) { sumU += zigzag(fixedResidual(s, i4, order)); i4 += 1 }
        var k = 0
        while (k < 14 && (n.toLong << (k + 1)) < sumU) k += 1
        w.write(k.toLong, 4)
        var i5 = order
        while (i5 < bs) {
          val u = zigzag(fixedResidual(s, i5, order))
          w.writeUnary((u >>> k).toInt)
          if (k > 0) w.write(u & ((1L << k) - 1), k)
          i5 += 1
        }
        ch += 1
      }
      w.align()
      val frameBytes = w.bytes.toByteArray
      out.write(frameBytes, 0, frameBytes.length)
      val c16 = crc16(frameBytes, 0, frameBytes.length)
      out.write((c16 >> 8) & 0xFF); out.write(c16 & 0xFF)
      done += bs
      frame += 1
    }
    out.toByteArray
  }

  // ------------------------------------------------------------ decode

  /** Decode a FLAC stream within the supported subset; None on any
    * boundary (side stereo, non-16-bit, LPC, truncation) or any failed
    * integrity check (CRC-8, CRC-16). The STREAMINFO MD5 is verified
    * into `md5Ok` rather than failing the decode — a stream with a
    * wrong signature still decodes, flagged, like `flac -d` warns. */
  def decode(p: Array[Byte]): Option[FlacAudio] =
    try decodeOrThrow(p) catch { case Truncated => None }

  private def decodeOrThrow(p: Array[Byte]): Option[FlacAudio] = {
    if (p.length < 42 || p(0) != 'f' || p(1) != 'L' || p(2) != 'a' ||
      p(3) != 'C') return None
    var pos = 4
    var last = false
    var rate = -1; var channels = -1; var bps = -1
    var total = -1L
    var md5: Array[Byte] = null
    while (!last) {
      if (pos + 4 > p.length) return None
      val h = p(pos) & 0xFF
      last = (h & 0x80) != 0
      val tpe = h & 0x7F
      val len = ((p(pos + 1) & 0xFF) << 16) | ((p(pos + 2) & 0xFF) << 8) |
        (p(pos + 3) & 0xFF)
      pos += 4
      if (pos + len > p.length) return None
      if (tpe == 0) {
        if (len != 34) return None
        val r = new BitReader(java.util.Arrays.copyOfRange(p, pos, pos + 34))
        r.read(16); r.read(16); r.read(24); r.read(24)
        rate = r.read(20).toInt
        channels = r.read(3).toInt + 1
        bps = r.read(5).toInt + 1
        total = r.read(36)
        md5 = java.util.Arrays.copyOfRange(p, pos + 18, pos + 34)
      }
      pos += len
    }
    if (rate <= 0 || channels <= 0 || bps != 16 || total < 0) return None
    // a corrupt 36-bit total must not allocation-bomb: the stream can
    // carry at most ~8 samples per byte per channel (all-constant
    // frames), so anything beyond that bound is a lie
    if (total * channels > 16L * p.length + 65536L) return None
    val samples = new Array[Short]((total * channels).toInt)
    var decoded = 0L
    while (decoded < total) {
      val frameStart = pos
      val r = new BitReader(p)
      r.pos = pos
      if (r.read(14) != 0x3FFE) return None
      r.read(1)
      if (r.read(1) != 0L) return None // variable blocksize: out of scope
      val bsCode = r.read(4).toInt
      val rateCode = r.read(4).toInt
      val chanAsg = r.read(4).toInt
      val sizeCode = r.read(3).toInt
      r.read(1)
      if (chanAsg > 7) return None // side-coded stereo: out of scope
      if (chanAsg + 1 != channels) return None
      if (sizeCode != 4) return None // only 16-bit
      // UTF-8 coded frame number: skip per its length prefix
      val b0 = r.read(8).toInt
      var extra = 0
      if ((b0 & 0x80) != 0) {
        var m = b0
        while ((m & 0x40) != 0) { extra += 1; m <<= 1 }
        var i = 0
        while (i < extra) { if ((r.read(8) & 0xC0L) != 0x80L) return None; i += 1 }
      }
      val bs = bsCode match {
        case 1 => 192
        case c if c >= 2 && c <= 5 => 576 << (c - 2)
        case 6 => r.read(8).toInt + 1
        case 7 => r.read(16).toInt + 1
        case c if c >= 8 => 256 << (c - 8)
        case _ => return None
      }
      rateCode match {
        case 0 => ()
        case 12 => r.read(8)
        case 13 | 14 => r.read(16)
        case c if c >= 1 && c <= 11 => ()
        case _ => return None
      }
      val headerEnd = r.bytePos
      val storedCrc8 = r.read(8).toInt
      if (crc8(p, frameStart, headerEnd) != storedCrc8) return None
      val frameSamples = math.min(bs.toLong, total - decoded).toInt
      var ch = 0
      while (ch < channels) {
        val s = decodeSubframe(r, frameSamples, bps) match {
          case Some(v) => v
          case None => return None
        }
        var i = 0
        while (i < frameSamples) {
          samples(((decoded + i) * channels + ch).toInt) = s(i).toShort
          i += 1
        }
        ch += 1
      }
      r.align()
      val bodyEnd = r.bytePos
      val storedCrc16 = r.read(16).toInt
      if (crc16(p, frameStart, bodyEnd) != storedCrc16) return None
      pos = r.bytePos
      decoded += frameSamples
    }
    Some(FlacAudio(rate, channels, bps, samples,
      java.util.Arrays.equals(md5, md5Of(samples))))
  }

  private def decodeSubframe(r: BitReader, n: Int, bps: Int):
      Option[Array[Int]] = {
    if (r.read(1) != 0L) return None
    val tpe = r.read(6).toInt
    val wastedFlag = r.read(1)
    val wasted = if (wastedFlag == 1L) r.readUnary() + 1 else 0
    val eff = bps - wasted
    val out = new Array[Int](n)
    if (tpe == 0) { // CONSTANT
      val v = r.readSigned(eff).toInt
      java.util.Arrays.fill(out, v)
    } else if (tpe == 1) { // VERBATIM
      var i = 0
      while (i < n) { out(i) = r.readSigned(eff).toInt; i += 1 }
    } else if (tpe >= 8 && tpe <= 12) { // FIXED order 0..4
      val order = tpe - 8
      if (order > n) return None
      var i = 0
      while (i < order) { out(i) = r.readSigned(eff).toInt; i += 1 }
      val res = decodeResiduals(r, n, order, eff) match {
        case Some(v) => v
        case None => return None
      }
      var j = order
      while (j < n) {
        val pred = order match {
          case 0 => 0L
          case 1 => out(j - 1).toLong
          case 2 => 2L * out(j - 1) - out(j - 2)
          case 3 => 3L * out(j - 1) - 3L * out(j - 2) + out(j - 3)
          case 4 => 4L * out(j - 1) - 6L * out(j - 2) +
            4L * out(j - 3) - out(j - 4)
        }
        out(j) = (pred + res(j - order)).toInt
        j += 1
      }
    } else return None // LPC and reserved types: out of scope
    if (wasted > 0) {
      var i = 0
      while (i < n) { out(i) = out(i) << wasted; i += 1 }
    }
    Some(out)
  }

  private def decodeResiduals(r: BitReader, blockSize: Int, order: Int,
      bps: Int): Option[Array[Long]] = {
    val method = r.read(2).toInt
    if (method > 1) return None // 00 = 4-bit Rice, 01 = 5-bit Rice2
    val pBits = if (method == 0) 4 else 5
    val escape = (1 << pBits) - 1
    val po = r.read(4).toInt
    val parts = 1 << po
    if (blockSize % parts != 0) return None
    val out = new Array[Long](blockSize - order)
    var idx = 0
    var part = 0
    while (part < parts) {
      val cnt = blockSize / parts - (if (part == 0) order else 0)
      if (cnt < 0) return None
      val k = r.read(pBits).toInt
      if (k == escape) {
        val raw = r.read(5).toInt
        var i = 0
        while (i < cnt) { out(idx) = r.readSigned(raw); idx += 1; i += 1 }
      } else {
        var i = 0
        while (i < cnt) {
          val q = r.readUnary().toLong
          val u = (q << k) | (if (k > 0) r.read(k) else 0L)
          out(idx) = if ((u & 1L) == 0L) u >>> 1 else -((u + 1L) >>> 1)
          idx += 1
          i += 1
        }
      }
      part += 1
    }
    Some(out)
  }
}
