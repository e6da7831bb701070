package graft.multimodal

import java.io.ByteArrayOutputStream

/** Pure-JVM baseline JPEG (ITU-T T.81 / JFIF) codec — the entropy-coded
  * image family that was the repo's last documented image stub
  * (VERDICT_r08 task 4).
  *
  * DECODER: a general baseline-DCT decoder — full marker walk (SOI, APPn/
  * COM skip, DQT, DHT, SOF0, DRI, SOS, EOI), canonical huffman decode per
  * spec §F.2.2 (mincode/maxcode/valptr), byte-unstuffing (FF 00) and
  * restart-marker handling (byte realign + DC predictor reset), DC
  * difference EXTEND, AC run-length with ZRL and EOB, dequantization
  * through the transmitted table, a separable float IDCT with final
  * round/clamp/level-shift, the full sampling-factor grid (interleaved
  * h×v data units per MCU, per-component planes, replication upsampling
  * of subsampled chroma — 4:4:4/4:2:2/4:2:0), integer fixed-point
  * YCbCr→RGB for 3-component JFIF frames ([[ycc2rgb]]), edge cropping
  * for non-MCU-multiple dims, and PROGRESSIVE (SOF2) spectral-selection
  * streams — per-scan coefficient accumulation with band-limited
  * run/size pairs and EOBn block-run codes. Limits (returned as None,
  * never mis-decoded): 8-bit precision, 1 (grayscale) or 3 (YCbCr)
  * components; progressive is single-component without successive
  * approximation (Ah=Al=0) or restarts.
  *
  * ENCODER: emits a complete JFIF byte stream from per-block QUANTIZED
  * coefficients (natural order): spec Annex K luminance huffman tables,
  * DC diffs, general AC run-length (EOB/ZRL), bit stuffing, optional
  * restart intervals. Supplying coefficients rather than pixels is what
  * keeps the gate corpus exactly replayable: JPEG is lossy pixel→pixel
  * but LOSSLESS coefficient→pixel, so a corpus built in the frequency
  * domain pins the decoder bit-exactly (see
  * [[MediaSynth.jpegCoeffs]]).
  *
  * Reference behavior mirrored: the Retail-AWS-ETL reference treats media
  * as opaque payloads; this extends the corpus-decode family (q85/q96)
  * to the dominant real-world entropy-coded format.
  */
object JpegCodec {

  /** Zigzag scan order: index k (scan position) → natural position
    * (row*8 + col). Spec Figure A.6. */
  val Zigzag: Array[Int] = Array(
    0, 1, 8, 16, 9, 2, 3, 10,
    17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63)

  // ------------------------------------------------------------ decode

  private final class HuffTable(bits: Array[Int], vals: Array[Byte]) {
    // spec F.15/F.16: canonical code bounds per length
    val minCode = new Array[Int](17)
    val maxCode = new Array[Int](17)
    val valPtr = new Array[Int](17)
    locally {
      var code = 0; var k = 0
      var l = 1
      while (l <= 16) {
        valPtr(l) = k
        minCode(l) = code
        code += bits(l - 1); k += bits(l - 1)
        maxCode(l) = if (bits(l - 1) == 0) -1 else code - 1
        code <<= 1
        l += 1
      }
    }
    def value(l: Int, code: Int): Int =
      vals(valPtr(l) + code - minCode(l)) & 0xff
  }

  /** Bit reader over the entropy-coded segment: unstuffs FF 00, surfaces
    * restart markers, refuses to read past a real marker. */
  private final class BitReader(data: Array[Byte], var pos: Int) {
    private var acc = 0
    private var nBits = 0
    /** Set when the reader lands on a marker (FF xx, xx != 0). */
    var atMarker: Int = -1

    private def fill(): Unit = {
      while (nBits <= 24 && atMarker < 0) {
        if (pos >= data.length) { atMarker = 0xd9; return }
        val b = data(pos) & 0xff
        if (b == 0xff) {
          if (pos + 1 >= data.length) { atMarker = 0xd9; return }
          val nxt = data(pos + 1) & 0xff
          if (nxt == 0x00) { // stuffed FF
            acc = (acc << 8) | 0xff; nBits += 8; pos += 2
          } else { atMarker = nxt; return }
        } else { acc = (acc << 8) | b; nBits += 8; pos += 1 }
      }
    }

    def readBit(): Int = {
      if (nBits == 0) fill()
      if (nBits == 0) 0 // past marker: spec fills with zero bits
      else { nBits -= 1; (acc >>> nBits) & 1 }
    }

    def receive(n: Int): Int = {
      var v = 0; var i = 0
      while (i < n) { v = (v << 1) | readBit(); i += 1 }
      v
    }

    def huffDecode(t: HuffTable): Int = {
      var code = readBit()
      var l = 1
      while (l <= 16) {
        if (t.maxCode(l) >= 0 && code <= t.maxCode(l)) return t.value(l, code)
        code = (code << 1) | readBit()
        l += 1
      }
      throw new IllegalArgumentException("invalid huffman code")
    }

    /** Consume an expected RSTn marker and realign. Discards the ≤7
      * buffered pad bits; the marker either was already sighted by an
      * eager fill (atMarker) or starts at the next unread byte. */
    def restart(): Boolean = {
      acc = 0; nBits = 0
      if (atMarker < 0) {
        if (pos + 1 < data.length && (data(pos) & 0xff) == 0xff) {
          val nxt = data(pos + 1) & 0xff
          if (nxt >= 0xd0 && nxt <= 0xd7) { pos += 2; return true }
        }
        false
      } else if (atMarker >= 0xd0 && atMarker <= 0xd7) {
        pos += 2; atMarker = -1; true
      } else false
    }
  }

  /** Spec F.2.2.1 EXTEND: map the `s`-bit magnitude field to its signed
    * value. */
  private def extend(v: Int, s: Int): Int =
    if (s == 0) 0 else if (v < (1 << (s - 1))) v - (1 << s) + 1 else v

  // separable IDCT basis: basis(u)(x) = C(u)/2 · cos((2x+1)uπ/16)
  private val Basis: Array[Array[Double]] = Array.tabulate(8, 8) { (u, x) =>
    val c = if (u == 0) 1.0 / math.sqrt(2.0) else 1.0
    0.5 * c * math.cos((2 * x + 1) * u * math.Pi / 16.0)
  }

  /** Dequantized natural-order coefficients → 64 pixel samples (level
    * shifted, clamped). */
  private[multimodal] def idctBlock(coef: Array[Int]): Array[Int] = {
    val tmp = new Array[Double](64) // rows transformed: tmp(v*8+x)
    var v = 0
    while (v < 8) {
      var x = 0
      while (x < 8) {
        var s = 0.0; var u = 0
        while (u < 8) { s += Basis(u)(x) * coef(v * 8 + u); u += 1 }
        tmp(v * 8 + x) = s
        x += 1
      }
      v += 1
    }
    val out = new Array[Int](64)
    var y = 0
    while (y < 8) {
      var x = 0
      while (x < 8) {
        var s = 0.0; var vv = 0
        while (vv < 8) { s += Basis(vv)(y) * tmp(vv * 8 + x); vv += 1 }
        val px = math.round(s).toInt + 128
        out(y * 8 + x) = if (px < 0) 0 else if (px > 255) 255 else px
        x += 1
      }
      y += 1
    }
    out
  }

  private final case class Component(id: Int, h: Int, v: Int, qId: Int,
      var dcTbl: Int, var acTbl: Int)

  /** JFIF integer YCbCr→RGB: libjpeg's classic ×65536 fixed-point
    * constants with a +0.5 rounding term and FLOOR division — computed on
    * an offset-nonnegative numerator so a SQL replay with truncating
    * division gets the identical value (same trick as the q151 halfband).
    */
  private val RgbOffset = 256 << 16
  private[multimodal] def ycc2rgb(y: Int, cb: Int, cr: Int): (Int, Int, Int) = {
    def f(n: Int): Int = ((n + 32768 + RgbOffset) >> 16) - 256
    def clamp(v: Int): Int = if (v < 0) 0 else if (v > 255) 255 else v
    val cbp = cb - 128; val crp = cr - 128
    (clamp(y + f(91881 * crp)),
      clamp(y + f(-22554 * cbp - 46802 * crp)),
      clamp(y + f(116130 * cbp)))
  }

  /** Decode a baseline JFIF payload to interleaved component samples.
    * None for anything outside the supported subset or malformed. */
  def decode(payload: Array[Byte]): Option[PngCodec.Image] =
    try decodeImpl(payload) catch { case _: Exception => None }

  private def decodeImpl(d: Array[Byte]): Option[PngCodec.Image] = {
    if (d.length < 4 || (d(0) & 0xff) != 0xff || (d(1) & 0xff) != 0xd8)
      return None
    var pos = 2
    val quant = new Array[Array[Int]](4) // natural-order tables
    val dcTables = new Array[HuffTable](4)
    val acTables = new Array[HuffTable](4)
    var width = 0; var height = 0
    var comps: Array[Component] = null
    var restartInterval = 0
    var progressive = false
    var progCoef: Array[Array[Int]] = null

    def u16(p: Int): Int = ((d(p) & 0xff) << 8) | (d(p + 1) & 0xff)

    while (pos + 4 <= d.length) {
      if ((d(pos) & 0xff) != 0xff) return None
      val marker = d(pos + 1) & 0xff
      if (marker == 0xd9) return None // EOI before SOS produced data
      val len = u16(pos + 2)
      val seg = pos + 4
      marker match {
        case 0xdb => // DQT: one or more tables
          var p = seg
          while (p < pos + 2 + len) {
            val pq = (d(p) & 0xff) >> 4; val tq = d(p) & 0x0f
            if (pq != 0) return None // 8-bit tables only
            val t = new Array[Int](64)
            var k = 0
            while (k < 64) { t(Zigzag(k)) = d(p + 1 + k) & 0xff; k += 1 }
            quant(tq) = t
            p += 65
          }
        case 0xc4 => // DHT: one or more tables
          var p = seg
          while (p < pos + 2 + len) {
            val tc = (d(p) & 0xff) >> 4; val th = d(p) & 0x0f
            val bits = Array.tabulate(16)(i => d(p + 1 + i) & 0xff)
            val n = bits.sum
            val vals = java.util.Arrays.copyOfRange(d, p + 17, p + 17 + n)
            val tbl = new HuffTable(bits, vals)
            if (tc == 0) dcTables(th) = tbl else acTables(th) = tbl
            p += 17 + n
          }
        case 0xc0 | 0xc2 => // SOF0 baseline | SOF2 progressive
          if ((d(seg) & 0xff) != 8) return None
          progressive = marker == 0xc2
          height = u16(seg + 1); width = u16(seg + 3)
          val nc = d(seg + 5) & 0xff
          comps = Array.tabulate(nc) { i =>
            val b = seg + 6 + 3 * i
            val h = (d(b + 1) & 0xff) >> 4; val v = d(b + 1) & 0x0f
            if (h < 1 || h > 4 || v < 1 || v > 4) return None
            Component(d(b) & 0xff, h, v, d(b + 2) & 0x0f, 0, 0)
          }
          // a single-component frame is scanned non-interleaved (MCU = one
          // data unit); only 1×1 sampling is meaningful there
          if (nc == 1 && (comps(0).h != 1 || comps(0).v != 1)) return None
          // the progressive subset is single-component (grayscale)
          if (progressive && nc != 1) return None
          if (progressive) {
            val blocks = ((width + 7) / 8) * ((height + 7) / 8)
            progCoef = Array.fill(blocks)(new Array[Int](64))
          }
        case m if m >= 0xc1 && m <= 0xcf && m != 0xc2 && m != 0xc4 && m != 0xc8 =>
          return None // arithmetic/hierarchical/extended: out of subset
        case 0xdd => restartInterval = u16(seg)
        case 0xda => // SOS → entropy-coded data follows
          if (comps == null || width == 0) return None
          val ns = d(seg) & 0xff
          // the baseline path decodes ONE interleaved scan covering every
          // frame component: a legal non-interleaved multi-scan baseline
          // JPEG (Ns=1, Nf=3) must return None, not be mis-decoded as
          // interleaved with decode_ok=true (the progressive subset below
          // has its own single-component check)
          if (!progressive && ns != comps.length) return None
          var i = 0
          while (i < ns) {
            val cs = d(seg + 1 + 2 * i) & 0xff
            val c = comps.find(_.id == cs).getOrElse(return None)
            c.dcTbl = (d(seg + 2 + 2 * i) & 0xff) >> 4
            c.acTbl = d(seg + 2 + 2 * i) & 0x0f
            i += 1
          }
          if (!progressive)
            return decodeScan(d, pos + 2 + len, width, height, comps, quant,
              dcTables, acTables, restartInterval)
          // progressive: spectral-selection parameters follow the
          // component specs; decode this scan into the coefficient
          // buffers, then continue the marker walk after its data
          val ss = d(seg + 1 + 2 * ns) & 0xff
          val se = d(seg + 2 + 2 * ns) & 0xff
          val ahal = d(seg + 3 + 2 * ns) & 0xff
          val ah = ahal >> 4; val al = ahal & 0x0f
          if (restartInterval != 0) return None // out of subset for SOF2
          val scanEnd =
            if (ah == 0)
              decodeProgressiveScan(d, pos + 2 + len, comps(0),
                dcTables, acTables, ss, se, al, progCoef)
            else
              decodeRefinementScan(d, pos + 2 + len, comps(0),
                acTables, ss, se, al, progCoef)
          if (scanEnd < 0) return None
          pos = scanEnd
        case _ => () // APPn / COM / anything with a length: skip
      }
      if (marker == 0xda && progressive) {
        // pos already set to the next marker by the scan decoder
        if (pos + 2 <= d.length && (d(pos) & 0xff) == 0xff &&
          (d(pos + 1) & 0xff) == 0xd9)
          return assembleProgressive(width, height, comps(0), quant, progCoef)
      } else pos += 2 + len
    }
    // progressive stream whose EOI the walk did not land on exactly
    if (progressive && progCoef != null)
      assembleProgressive(width, height, comps(0), quant, progCoef)
    else None
  }

  /** Decode one progressive FIRST scan (Ah=0; spectral selection at the
    * successive-approximation level `al`, single component) into the
    * per-block quantized-coefficient buffers — decoded values land
    * shifted left by `al` (the point transform's inverse). Returns the
    * position of the marker following the scan's entropy data, or -1 on
    * malformed input. */
  private def decodeProgressiveScan(d: Array[Byte], start: Int,
      comp: Component, dcTables: Array[HuffTable],
      acTables: Array[HuffTable], ss: Int, se: Int, al: Int,
      coefs: Array[Array[Int]]): Int = {
    val br = new BitReader(d, start)
    var pred = 0
    var eobrun = 0
    var blk = 0
    while (blk < coefs.length) {
      val coef = coefs(blk)
      if (ss == 0) { // DC scan (Se must be 0)
        if (se != 0) return -1
        val t = br.huffDecode(dcTables(comp.dcTbl))
        pred += extend(br.receive(t), t)
        coef(0) = pred << al
      } else if (eobrun > 0) {
        eobrun -= 1 // this block's band is entirely zero
      } else {
        var k = ss
        var done = false
        while (k <= se && !done) {
          val rs = br.huffDecode(acTables(comp.acTbl))
          val r = rs >> 4; val s = rs & 0x0f
          if (s == 0) {
            if (r == 15) k += 16 // ZRL
            else { // EOBn: 2^r + extra-bits blocks end here (incl. this one)
              eobrun = (1 << r) + br.receive(r) - 1
              done = true
            }
          } else {
            k += r
            if (k > se) return -1
            coef(Zigzag(k)) = extend(br.receive(s), s) << al
            k += 1
          }
        }
      }
      blk += 1
    }
    scanEndPos(d, br.pos)
  }

  /** Decode one progressive REFINEMENT scan (Ah = Al + 1): every
    * coefficient already significant receives one correction bit (set →
    * add ±2^Al toward larger magnitude); newly significant coefficients
    * arrive as (zero-history-run, size=1) codes with a sign bit, with
    * the correction bits of nonzero-history positions passed over WOVEN
    * into the stream — the spec G.2 structure. DC refinement (Ss=0) is
    * one bit per block ORed at 2^Al. */
  private def decodeRefinementScan(d: Array[Byte], start: Int,
      comp: Component, acTables: Array[HuffTable], ss: Int, se: Int,
      al: Int, coefs: Array[Array[Int]]): Int = {
    val br = new BitReader(d, start)
    val p1 = 1 << al
    val m1 = -1 << al
    var eobrun = 0
    var blk = 0
    while (blk < coefs.length) {
      val coef = coefs(blk)
      if (ss == 0) { // DC refinement: one appended bit per block
        if (se != 0) return -1
        if (br.readBit() == 1) coef(0) |= p1
      } else {
        var k = ss
        if (eobrun == 0) {
          var broke = false
          while (k <= se && !broke) {
            val rs = br.huffDecode(acTables(comp.acTbl))
            var r = rs >> 4; val s = rs & 0x0f
            var newval = 0
            if (s == 0) {
              if (r != 15) {
                eobrun = (1 << r) + (if (r > 0) br.receive(r) else 0)
                broke = true
              }
              // r == 15: ZRL — pass 16 zero-history positions
            } else {
              if (s != 1) return -1 // refinement codes only size 1
              newval = if (br.readBit() == 1) p1 else m1
            }
            if (!broke) {
              // advance over the run: corrections at nonzero-history
              // positions, count down r at zero-history positions
              var placed = false
              while (k <= se && !placed) {
                val nat = Zigzag(k)
                if (coef(nat) != 0) {
                  if (br.readBit() == 1 && (coef(nat) & p1) == 0)
                    coef(nat) += (if (coef(nat) >= 0) p1 else m1)
                  k += 1
                } else if (r == 0) {
                  if (newval != 0) { coef(nat) = newval; k += 1 }
                  placed = true
                } else { r -= 1; k += 1 }
              }
              if (!placed && newval != 0) return -1 // ran past Se
              if (placed && newval == 0) k += 1 // ZRL landing position
            }
          }
        }
        if (eobrun > 0) {
          // remainder of this block: corrections only
          while (k <= se) {
            val nat = Zigzag(k)
            if (coef(nat) != 0) {
              if (br.readBit() == 1 && (coef(nat) & p1) == 0)
                coef(nat) += (if (coef(nat) >= 0) p1 else m1)
            }
            k += 1
          }
          eobrun -= 1
        }
      }
      blk += 1
    }
    scanEndPos(d, br.pos)
  }

  /** Locate the marker after a scan's entropy data (pad bits already
    * consumed into the reader's buffer; fill() never reads past a
    * marker). */
  private def scanEndPos(d: Array[Byte], from: Int): Int = {
    var p = from
    while (p + 1 < d.length &&
      !((d(p) & 0xff) == 0xff && (d(p + 1) & 0xff) != 0)) p += 1
    if (p + 1 >= d.length) -1 else p
  }

  /** Dequantize + IDCT the accumulated progressive coefficients. */
  private def assembleProgressive(width: Int, height: Int, comp: Component,
      quant: Array[Array[Int]], coefs: Array[Array[Int]]): Option[PngCodec.Image] = {
    val q = quant(comp.qId)
    if (q == null) return None
    val bw = (width + 7) / 8
    val out = new Array[Byte](width * height)
    val deq = new Array[Int](64)
    var blk = 0
    while (blk < coefs.length) {
      var i = 0
      while (i < 64) { deq(i) = coefs(blk)(i) * q(i); i += 1 }
      val px = idctBlock(deq)
      val bx = blk % bw; val by = blk / bw
      var y = 0
      while (y < 8) {
        val oy = by * 8 + y
        if (oy < height) {
          var x = 0
          while (x < 8) {
            val ox = bx * 8 + x
            if (ox < width) out(oy * width + ox) = px(y * 8 + x).toByte
            x += 1
          }
        }
        y += 1
      }
      blk += 1
    }
    Some(PngCodec.Image(width, height, 1, out))
  }

  private def decodeScan(d: Array[Byte], start: Int, width: Int, height: Int,
      comps: Array[Component], quant: Array[Array[Int]],
      dcTables: Array[HuffTable], acTables: Array[HuffTable],
      restartInterval: Int): Option[PngCodec.Image] = {
    val nc = comps.length
    if (nc != 1 && nc != 3) return None // gray or JFIF YCbCr only
    val hMax = comps.map(_.h).max
    val vMax = comps.map(_.v).max
    val mcusX = (width + 8 * hMax - 1) / (8 * hMax)
    val mcusY = (height + 8 * vMax - 1) / (8 * vMax)
    // full-MCU-padded per-component sample planes; image crop happens at
    // assembly, exactly like the spec's extended-to-MCU-boundary frame
    val planeW = comps.map(c => mcusX * 8 * c.h)
    val planeH = comps.map(c => mcusY * 8 * c.v)
    val planes = Array.tabulate(nc)(c => new Array[Int](planeW(c) * planeH(c)))
    val pred = new Array[Int](nc)
    val br = new BitReader(d, start)
    val coef = new Array[Int](64)
    var mcu = 0
    val nMcus = mcusX * mcusY
    while (mcu < nMcus) {
      if (restartInterval > 0 && mcu > 0 && mcu % restartInterval == 0) {
        if (!br.restart()) return None
        java.util.Arrays.fill(pred, 0)
      }
      val mx = mcu % mcusX; val my = mcu / mcusX
      var ci = 0
      while (ci < nc) {
        val c = comps(ci)
        val q = quant(c.qId)
        if (q == null) return None
        // data units per MCU for this component: v rows × h cols
        var bv = 0
        while (bv < c.v) {
          var bh = 0
          while (bh < c.h) {
            java.util.Arrays.fill(coef, 0)
            // DC
            val t = br.huffDecode(dcTables(c.dcTbl))
            pred(ci) += extend(br.receive(t), t)
            coef(0) = pred(ci) * q(0)
            // AC
            var k = 1
            var eob = false
            while (k < 64 && !eob) {
              val rs = br.huffDecode(acTables(c.acTbl))
              val r = rs >> 4; val s = rs & 0x0f
              if (s == 0) {
                if (r == 15) k += 16 else eob = true // ZRL | EOB
              } else {
                k += r
                if (k > 63) return None
                val nat = Zigzag(k)
                coef(nat) = extend(br.receive(s), s) * q(nat)
                k += 1
              }
            }
            val px = idctBlock(coef)
            val px0 = (mx * c.h + bh) * 8
            val py0 = (my * c.v + bv) * 8
            val pw = planeW(ci)
            var y = 0
            while (y < 8) {
              var x = 0
              while (x < 8) {
                planes(ci)((py0 + y) * pw + px0 + x) = px(y * 8 + x)
                x += 1
              }
              y += 1
            }
            bh += 1
          }
          bv += 1
        }
        ci += 1
      }
      mcu += 1
    }
    // assemble: replication upsampling of subsampled planes to full res
    val out = new Array[Byte](width * height * nc)
    if (nc == 1) {
      val pw = planeW(0)
      var y = 0
      while (y < height) {
        var x = 0
        while (x < width) {
          out(y * width + x) = planes(0)(y * pw + x).toByte
          x += 1
        }
        y += 1
      }
    } else {
      def at(ci: Int, x: Int, y: Int): Int = {
        val c = comps(ci)
        planes(ci)((y * c.v / vMax) * planeW(ci) + (x * c.h / hMax))
      }
      var y = 0
      while (y < height) {
        var x = 0
        while (x < width) {
          val (r, g, b) = ycc2rgb(at(0, x, y), at(1, x, y), at(2, x, y))
          val i = (y * width + x) * 3
          out(i) = r.toByte; out(i + 1) = g.toByte; out(i + 2) = b.toByte
          x += 1
        }
        y += 1
      }
    }
    Some(PngCodec.Image(width, height, nc, out))
  }

  // ------------------------------------------------------------ encode

  /** Spec Annex K.3.1 luminance DC table: BITS + HUFFVAL. */
  private val DcBits = Array(0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0)
  private val DcVals: Array[Byte] =
    Array.tabulate[Byte](12)(_.toByte)

  /** Spec Annex K.3.2 luminance AC table. */
  private val AcBits = Array(0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7d)
  private val AcVals: Array[Byte] = Array(
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
    0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
    0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xa1, 0x08,
    0x23, 0x42, 0xb1, 0xc1, 0x15, 0x52, 0xd1, 0xf0,
    0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0a, 0x16,
    0x17, 0x18, 0x19, 0x1a, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2a, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
    0x3a, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
    0x4a, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5a, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
    0x6a, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7a, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8a, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
    0x99, 0x9a, 0xa2, 0xa3, 0xa4, 0xa5, 0xa6, 0xa7,
    0xa8, 0xa9, 0xaa, 0xb2, 0xb3, 0xb4, 0xb5, 0xb6,
    0xb7, 0xb8, 0xb9, 0xba, 0xc2, 0xc3, 0xc4, 0xc5,
    0xc6, 0xc7, 0xc8, 0xc9, 0xca, 0xd2, 0xd3, 0xd4,
    0xd5, 0xd6, 0xd7, 0xd8, 0xd9, 0xda, 0xe1, 0xe2,
    0xe3, 0xe4, 0xe5, 0xe6, 0xe7, 0xe8, 0xe9, 0xea,
    0xf1, 0xf2, 0xf3, 0xf4, 0xf5, 0xf6, 0xf7, 0xf8,
    0xf9, 0xfa).map(_.toByte)

  /** Spec Annex K.3.1 chrominance DC table. */
  private val DcBitsC = Array(0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0)
  private val DcValsC: Array[Byte] = Array.tabulate[Byte](12)(_.toByte)

  /** Spec Annex K.3.2 chrominance AC table. */
  private val AcBitsC = Array(0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77)
  private val AcValsC: Array[Byte] = Array(
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
    0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
    0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xa1, 0xb1, 0xc1, 0x09, 0x23, 0x33, 0x52, 0xf0,
    0x15, 0x62, 0x72, 0xd1, 0x0a, 0x16, 0x24, 0x34,
    0xe1, 0x25, 0xf1, 0x17, 0x18, 0x19, 0x1a, 0x26,
    0x27, 0x28, 0x29, 0x2a, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3a, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
    0x49, 0x4a, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5a, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
    0x69, 0x6a, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7a, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8a, 0x92, 0x93, 0x94, 0x95, 0x96,
    0x97, 0x98, 0x99, 0x9a, 0xa2, 0xa3, 0xa4, 0xa5,
    0xa6, 0xa7, 0xa8, 0xa9, 0xaa, 0xb2, 0xb3, 0xb4,
    0xb5, 0xb6, 0xb7, 0xb8, 0xb9, 0xba, 0xc2, 0xc3,
    0xc4, 0xc5, 0xc6, 0xc7, 0xc8, 0xc9, 0xca, 0xd2,
    0xd3, 0xd4, 0xd5, 0xd6, 0xd7, 0xd8, 0xd9, 0xda,
    0xe2, 0xe3, 0xe4, 0xe5, 0xe6, 0xe7, 0xe8, 0xe9,
    0xea, 0xf2, 0xf3, 0xf4, 0xf5, 0xf6, 0xf7, 0xf8,
    0xf9, 0xfa).map(_.toByte)

  /** Canonical code assignment (spec C.2): value → (code, size). */
  private def buildEncodeTable(bits: Array[Int], vals: Array[Byte]): Array[(Int, Int)] = {
    val table = new Array[(Int, Int)](256)
    var code = 0; var k = 0
    var l = 1
    while (l <= 16) {
      var i = 0
      while (i < bits(l - 1)) {
        table(vals(k) & 0xff) = (code, l)
        code += 1; k += 1; i += 1
      }
      code <<= 1
      l += 1
    }
    table
  }
  private val DcEnc = buildEncodeTable(DcBits, DcVals)
  private val AcEnc = buildEncodeTable(AcBits, AcVals)
  private val DcEncC = buildEncodeTable(DcBitsC, DcValsC)
  private val AcEncC = buildEncodeTable(AcBitsC, AcValsC)

  /** AC table for PROGRESSIVE scans: the baseline Annex K table has no
    * codes for the EOBn symbols (0x10..0xE0 — run-lengths of band-empty
    * blocks), so progressive streams transmit their own. A flat canonical
    * table (every symbol 8 bits: 160 run/size pairs + EOB + ZRL + 14
    * EOBn = 176 ≤ 256) — compression-naive, structurally real. */
  private val AcBitsProg = Array(0, 0, 0, 0, 0, 0, 0, 176, 0, 0, 0, 0, 0, 0, 0, 0)
  private val AcValsProg: Array[Byte] = {
    val syms = (for (r <- 0 to 15; s <- 1 to 10) yield (r << 4) | s) ++
      Seq(0x00, 0xf0) ++ (1 to 14).map(_ << 4)
    syms.sorted.map(_.toByte).toArray
  }
  private val AcEncProg = buildEncodeTable(AcBitsProg, AcValsProg)

  private final class BitWriter(out: ByteArrayOutputStream) {
    private var acc = 0
    private var nBits = 0
    def put(code: Int, size: Int): Unit = {
      acc = (acc << size) | (code & ((1 << size) - 1))
      nBits += size
      while (nBits >= 8) {
        nBits -= 8
        val b = (acc >>> nBits) & 0xff
        out.write(b)
        if (b == 0xff) out.write(0x00) // byte stuffing
      }
    }
    /** Pad to a byte boundary with 1-bits (spec F.1.2.3). */
    def align(): Unit = if (nBits > 0) put((1 << (8 - nBits)) - 1, 8 - nBits)
  }

  private def magnitude(v: Int): Int = {
    var a = math.abs(v); var s = 0
    while (a != 0) { a >>= 1; s += 1 }
    s
  }

  /** Entropy-code one data unit (quantized coefficients, natural order);
    * returns the new DC predictor. */
  private def encodeBlock(bw: BitWriter, blk: Array[Int], pred: Int,
      dcEnc: Array[(Int, Int)], acEnc: Array[(Int, Int)]): Int = {
    val diff = blk(0) - pred
    val s = magnitude(diff)
    val (dcCode, dcSize) = dcEnc(s)
    bw.put(dcCode, dcSize)
    if (s > 0) bw.put(if (diff < 0) diff + (1 << s) - 1 else diff, s)
    var run = 0
    var k = 1
    while (k < 64) {
      val v = blk(Zigzag(k))
      if (v == 0) run += 1
      else {
        while (run > 15) { // ZRL
          val (zc, zs) = acEnc(0xf0); bw.put(zc, zs); run -= 16
        }
        val sz = magnitude(v)
        val (c, cs) = acEnc((run << 4) | sz)
        bw.put(c, cs)
        bw.put(if (v < 0) v + (1 << sz) - 1 else v, sz)
        run = 0
      }
      k += 1
    }
    if (run > 0) { val (ec, es) = acEnc(0x00); bw.put(ec, es) } // EOB
    blk(0)
  }

  /** Encode a grayscale baseline JFIF from per-block QUANTIZED
    * coefficients in natural order. `qtable` is natural-order; emitted in
    * zigzag per spec. `restartInterval` in MCUs (0 = none). */
  def encodeGray(width: Int, height: Int, qtable: Array[Int],
      coeffs: (Int, Int) => Array[Int], restartInterval: Int): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    def marker(m: Int): Unit = { out.write(0xff); out.write(m) }
    def u16(v: Int): Unit = { out.write((v >> 8) & 0xff); out.write(v & 0xff) }
    marker(0xd8) // SOI
    // APP0 JFIF
    marker(0xe0); u16(16)
    out.write("JFIF".getBytes("US-ASCII")); out.write(0)
    out.write(1); out.write(1) // version
    out.write(0); u16(1); u16(1) // aspect units + density
    out.write(0); out.write(0) // no thumbnail
    // DQT (table 0, zigzag order)
    marker(0xdb); u16(2 + 1 + 64); out.write(0x00)
    var k = 0
    while (k < 64) { out.write(qtable(Zigzag(k)) & 0xff); k += 1 }
    // SOF0: 8-bit, 1 component, 1×1 sampling, qtable 0
    marker(0xc0); u16(8 + 3)
    out.write(8); u16(height); u16(width); out.write(1)
    out.write(1); out.write(0x11); out.write(0)
    // DHT: DC table 0 + AC table 0
    marker(0xc4); u16(2 + 1 + 16 + DcVals.length + 1 + 16 + AcVals.length)
    out.write(0x00); DcBits.foreach(out.write); out.write(DcVals)
    out.write(0x10); AcBits.foreach(out.write); out.write(AcVals)
    if (restartInterval > 0) { marker(0xdd); u16(4); u16(restartInterval) }
    // SOS
    marker(0xda); u16(6 + 2)
    out.write(1); out.write(1); out.write(0x00)
    out.write(0); out.write(63); out.write(0)
    // entropy-coded data
    val bw = new BitWriter(out)
    val mcusX = (width + 7) / 8
    val mcusY = (height + 7) / 8
    var pred = 0
    var rstN = 0
    var mcu = 0
    val nMcus = mcusX * mcusY
    while (mcu < nMcus) {
      if (restartInterval > 0 && mcu > 0 && mcu % restartInterval == 0) {
        bw.align()
        marker(0xd0 + rstN)
        rstN = (rstN + 1) % 8
        pred = 0
      }
      pred = encodeBlock(bw, coeffs(mcu % mcusX, mcu / mcusX), pred,
        DcEnc, AcEnc)
      mcu += 1
    }
    bw.align()
    marker(0xd9) // EOI
    out.toByteArray
  }

  /** Encode a grayscale PROGRESSIVE (SOF2, spectral selection) JFIF from
    * per-block QUANTIZED coefficients: one DC-only first scan, then one
    * AC scan per `bands` entry (inclusive zigzag ranges covering 1..63) —
    * the multi-pass stream web encoders emit for incremental rendering.
    * AC scans use the REAL progressive entropy surface: in-band
    * run/size pairs, ZRL, and EOBn codes carrying run-lengths of
    * band-empty BLOCKS (accumulated and flushed per spec G.1.2.2).
    * Successive approximation is out of scope (Ah=Al=0 in every scan),
    * matching the decoder subset. */
  /** With `approx = true` the stream uses SUCCESSIVE APPROXIMATION on
    * top of spectral selection (the full web-encoder form): every first
    * scan transmits coefficients at point-transform level Al=1 (DC:
    * arithmetic shift with diffs on shifted values; AC: sign-magnitude
    * shift, sub-threshold coefficients absent), then refinement scans
    * (Ah=1→Al=0) deliver the low bit — one appended bit per block for
    * DC, and for AC the spec G.1.2.3 machinery: correction bits for
    * already-significant coefficients woven between newly-significant
    * (run, size=1) codes, with bits buffered behind pending EOB runs. */
  def encodeGrayProgressive(width: Int, height: Int, qtable: Array[Int],
      coeffs: (Int, Int) => Array[Int],
      bands: Seq[(Int, Int)] = Seq((1, 12), (13, 63)),
      approx: Boolean = false): Array[Byte] = {
    require(bands.nonEmpty && bands.head._1 == 1 && bands.last._2 == 63 &&
      bands.sliding(2).forall {
        case Seq((_, e), (s, _)) => s == e + 1
        case _ => true
      }, s"bands must tile 1..63: $bands")
    val out = new ByteArrayOutputStream()
    def marker(m: Int): Unit = { out.write(0xff); out.write(m) }
    def u16(v: Int): Unit = { out.write((v >> 8) & 0xff); out.write(v & 0xff) }
    marker(0xd8)
    marker(0xe0); u16(16)
    out.write("JFIF".getBytes("US-ASCII")); out.write(0)
    out.write(1); out.write(1)
    out.write(0); u16(1); u16(1)
    out.write(0); out.write(0)
    marker(0xdb); u16(2 + 1 + 64); out.write(0x00)
    var k = 0
    while (k < 64) { out.write(qtable(Zigzag(k)) & 0xff); k += 1 }
    marker(0xc2); u16(8 + 3) // SOF2
    out.write(8); u16(height); u16(width); out.write(1)
    out.write(1); out.write(0x11); out.write(0)
    marker(0xc4); u16(2 + 1 + 16 + DcVals.length + 1 + 16 + AcValsProg.length)
    out.write(0x00); DcBits.foreach(out.write); out.write(DcVals)
    out.write(0x10); AcBitsProg.foreach(out.write); out.write(AcValsProg)
    val bw = (width + 7) / 8
    val bh = (height + 7) / 8
    val blocks = Array.tabulate(bw * bh)(b => coeffs(b % bw, b / bw))
    def sosHeader(ss: Int, se: Int, ah: Int, al: Int): Unit = {
      marker(0xda); u16(6 + 2)
      out.write(1); out.write(1); out.write(0x00)
      out.write(ss); out.write(se); out.write((ah << 4) | al)
    }
    val al0 = if (approx) 1 else 0
    // scan 1: DC at approximation level al0 (arithmetic shift + diffs)
    sosHeader(0, 0, 0, al0)
    locally {
      val bwr = new BitWriter(out)
      var pred = 0
      blocks.foreach { blk =>
        val v = blk(0) >> al0
        val diff = v - pred
        pred = v
        val s = magnitude(diff)
        val (c, cs) = DcEnc(s)
        bwr.put(c, cs)
        if (s > 0) bwr.put(if (diff < 0) diff + (1 << s) - 1 else diff, s)
      }
      bwr.align()
    }
    if (approx) { // DC refinement: bit 0 of the two's-complement value
      sosHeader(0, 0, 1, 0)
      val bwr = new BitWriter(out)
      blocks.foreach(blk => bwr.put(blk(0) & 1, 1))
      bwr.align()
    }
    // AC first scans, one per band, at level al0 (sign-magnitude shift)
    bands.foreach { case (ss, se) =>
      sosHeader(ss, se, 0, al0)
      val bwr = new BitWriter(out)
      var eobrun = 0
      def flushEob(): Unit = if (eobrun > 0) {
        var r = 0
        while ((1 << (r + 1)) <= eobrun) r += 1
        val (c, cs) = AcEncProg(r << 4)
        bwr.put(c, cs)
        if (r > 0) bwr.put(eobrun - (1 << r), r)
        eobrun = 0
      }
      def shifted(v: Int): Int = {
        val a = math.abs(v) >> al0
        if (v < 0) -a else a
      }
      blocks.foreach { blk =>
        val nz = (ss to se).filter(kk => shifted(blk(Zigzag(kk))) != 0)
        if (nz.isEmpty) {
          eobrun += 1
          if (eobrun == 0x7fff) flushEob()
        } else {
          flushEob()
          var run = 0
          var kk = ss
          while (kk <= se) {
            val v = shifted(blk(Zigzag(kk)))
            if (v == 0) run += 1
            else {
              while (run > 15) {
                val (zc, zs) = AcEncProg(0xf0); bwr.put(zc, zs); run -= 16
              }
              val sz = magnitude(v)
              val (c, cs) = AcEncProg((run << 4) | sz)
              bwr.put(c, cs)
              bwr.put(if (v < 0) v + (1 << sz) - 1 else v, sz)
              run = 0
            }
            kk += 1
          }
          if (run > 0) { // trailing zeros to Se: this block ends in an EOB
            eobrun += 1
            if (eobrun == 0x7fff) flushEob()
          }
        }
      }
      flushEob()
      bwr.align()
    }
    if (approx) { // AC refinement over the full band (Ah=1 → Al=0)
      sosHeader(1, 63, 1, 0)
      val bwr = new BitWriter(out)
      var eobrun = 0
      val behindEob = scala.collection.mutable.ArrayBuffer.empty[Int]
      def emitEobrun(): Unit = if (eobrun > 0) {
        var r = 0
        while ((1 << (r + 1)) <= eobrun) r += 1
        val (c, cs) = AcEncProg(r << 4)
        bwr.put(c, cs)
        if (r > 0) bwr.put(eobrun - (1 << r), r)
        behindEob.foreach(b => bwr.put(b, 1))
        behindEob.clear()
        eobrun = 0
      }
      blocks.foreach { blk =>
        val absv = Array.tabulate(64)(kk =>
          if (kk >= 1) math.abs(blk(Zigzag(kk))) else 0)
        var eobPos = 0 // last newly-significant position (0 = none)
        var kk = 1
        while (kk <= 63) { if (absv(kk) == 1) eobPos = kk; kk += 1 }
        val held = scala.collection.mutable.ArrayBuffer.empty[Int]
        var r = 0
        kk = 1
        while (kk <= 63) {
          val temp = absv(kk)
          if (temp == 0) r += 1
          else {
            // ZRLs that cannot fold into the EOB run
            while (r > 15 && kk <= eobPos) {
              emitEobrun()
              val (zc, zs) = AcEncProg(0xf0); bwr.put(zc, zs)
              r -= 16
              held.foreach(b => bwr.put(b, 1)); held.clear()
            }
            if (temp > 1) held += (temp & 1) // correction bit
            else { // newly significant
              emitEobrun()
              val (c, cs) = AcEncProg((r << 4) | 1)
              bwr.put(c, cs)
              bwr.put(if (blk(Zigzag(kk)) < 0) 0 else 1, 1)
              held.foreach(b => bwr.put(b, 1)); held.clear()
              r = 0
            }
          }
          kk += 1
        }
        if (r > 0 || held.nonEmpty) {
          eobrun += 1
          behindEob ++= held
          if (eobrun == 0x7fff) emitEobrun()
        }
      }
      emitEobrun()
      bwr.align()
    }
    marker(0xd9)
    out.toByteArray
  }

  /** Encode a 3-component YCbCr baseline JFIF from per-block QUANTIZED
    * coefficients: `coeffs(comp, bx, by)` in natural order, where
    * (bx, by) are COMPONENT-plane block coords (Y plane spans
    * lumaH·mcusX × lumaV·mcusY blocks including MCU padding; each chroma
    * plane mcusX × mcusY at 1×1). Luma sampling parametrizes the
    * subsampling scheme: (2,2) = 4:2:0 (default corpus form),
    * (2,1) = 4:2:2, (1,1) = 4:4:4. Two quant tables (0 = luma,
    * 1 = chroma), the four Annex K huffman tables in their conventional
    * slots, interleaved Y×(lumaH·lumaV) + Cb + Cr MCUs, optional restart
    * intervals. */
  def encodeColor(width: Int, height: Int, qLuma: Array[Int],
      qChroma: Array[Int], coeffs: (Int, Int, Int) => Array[Int],
      restartInterval: Int, lumaH: Int = 2, lumaV: Int = 2): Array[Byte] = {
    require(lumaH >= 1 && lumaH <= 4 && lumaV >= 1 && lumaV <= 4)
    val out = new ByteArrayOutputStream()
    def marker(m: Int): Unit = { out.write(0xff); out.write(m) }
    def u16(v: Int): Unit = { out.write((v >> 8) & 0xff); out.write(v & 0xff) }
    marker(0xd8) // SOI
    marker(0xe0); u16(16)
    out.write("JFIF".getBytes("US-ASCII")); out.write(0)
    out.write(1); out.write(1)
    out.write(0); u16(1); u16(1)
    out.write(0); out.write(0)
    // DQT: luma table 0 + chroma table 1, zigzag order
    marker(0xdb); u16(2 + 2 * 65)
    out.write(0x00)
    var k = 0
    while (k < 64) { out.write(qLuma(Zigzag(k)) & 0xff); k += 1 }
    out.write(0x01)
    k = 0
    while (k < 64) { out.write(qChroma(Zigzag(k)) & 0xff); k += 1 }
    // SOF0: Y 2×2 sampling qtable 0; Cb/Cr 1×1 qtable 1
    marker(0xc0); u16(8 + 9)
    out.write(8); u16(height); u16(width); out.write(3)
    out.write(1); out.write((lumaH << 4) | lumaV); out.write(0)
    out.write(2); out.write(0x11); out.write(1)
    out.write(3); out.write(0x11); out.write(1)
    // DHT: all four Annex K tables
    marker(0xc4); u16(2 + (1 + 16 + DcVals.length) + (1 + 16 + AcVals.length)
      + (1 + 16 + DcValsC.length) + (1 + 16 + AcValsC.length))
    out.write(0x00); DcBits.foreach(out.write); out.write(DcVals)
    out.write(0x10); AcBits.foreach(out.write); out.write(AcVals)
    out.write(0x01); DcBitsC.foreach(out.write); out.write(DcValsC)
    out.write(0x11); AcBitsC.foreach(out.write); out.write(AcValsC)
    if (restartInterval > 0) { marker(0xdd); u16(4); u16(restartInterval) }
    // SOS: Y → tables 0/0, chroma → 1/1
    marker(0xda); u16(6 + 2 * 3)
    out.write(3)
    out.write(1); out.write(0x00)
    out.write(2); out.write(0x11)
    out.write(3); out.write(0x11)
    out.write(0); out.write(63); out.write(0)
    val bw = new BitWriter(out)
    val mcusX = (width + 8 * lumaH - 1) / (8 * lumaH)
    val mcusY = (height + 8 * lumaV - 1) / (8 * lumaV)
    val pred = new Array[Int](3)
    var rstN = 0
    var mcu = 0
    val nMcus = mcusX * mcusY
    while (mcu < nMcus) {
      if (restartInterval > 0 && mcu > 0 && mcu % restartInterval == 0) {
        bw.align()
        marker(0xd0 + rstN)
        rstN = (rstN + 1) % 8
        java.util.Arrays.fill(pred, 0)
      }
      val mx = mcu % mcusX; val my = mcu / mcusX
      // Y: v-major lumaH×lumaV data units, then Cb, then Cr
      var bv = 0
      while (bv < lumaV) {
        var bh = 0
        while (bh < lumaH) {
          pred(0) = encodeBlock(bw,
            coeffs(0, mx * lumaH + bh, my * lumaV + bv), pred(0), DcEnc, AcEnc)
          bh += 1
        }
        bv += 1
      }
      pred(1) = encodeBlock(bw, coeffs(1, mx, my), pred(1), DcEncC, AcEncC)
      pred(2) = encodeBlock(bw, coeffs(2, mx, my), pred(2), DcEncC, AcEncC)
      mcu += 1
    }
    bw.align()
    marker(0xd9) // EOI
    out.toByteArray
  }
}
