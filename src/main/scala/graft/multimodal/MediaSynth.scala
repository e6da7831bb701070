package graft.multimodal

/** Deterministic synthetic media payloads for the multimodal driver gate
  * (q73): every `doc_id` maps to one container payload — PNG, GIF, JPEG,
  * WAV, or a truncated/corrupt blob — built as a pure function of the id,
  * so the DuckDB oracle can construct the IDENTICAL bytes in SQL
  * (`lpad(hex(...))` pieces → `from_hex`) and parse them back with
  * independent fixed-offset arithmetic while the Spark side runs the real
  * parsers ([[ImageHeaders]] marker scan, [[AudioHeaders]] chunk walk).
  * Synthetic because the sandbox ships no media fixtures; the byte
  * layouts are the real container formats.
  *
  * The payload is built FROM ITS HEX STRING ([[payloadHex]]): the hex
  * template is the single construction source shared conceptually with
  * the SQL oracle, and any drift between the two is exactly what the
  * driver's hash gate catches.
  */
object MediaSynth {

  /** Image dims: 16-bit-safe so GIF(le16)/JPEG(be16) hold them. */
  def width(docId: Long): Int = (docId % 640).toInt + 16
  def height(docId: Long): Int = (docId % 480).toInt + 16

  def sampleRate(docId: Long): Int =
    Seq(8000, 16000, 44100)((docId % 3).toInt)
  def channels(docId: Long): Int = (docId % 2).toInt + 1
  /** 16-bit PCM: block align = 2 bytes × channels. */
  def byteRate(docId: Long): Int = sampleRate(docId) * channels(docId) * 2
  def dataBytes(docId: Long): Int = ((docId % 997).toInt + 1) * 100

  /** MP4 movie-header fields: mvhd units/second + duration in units. */
  def mp4Timescale(docId: Long): Long = Seq(600L, 1000L, 90000L)((docId % 3).toInt)
  def mp4DurationUnits(docId: Long): Long = ((docId % 5000) + 1) * 37L

  private def be16(v: Int): String = f"$v%04X"
  private def be32(v: Long): String = f"$v%08X"
  private def le16(v: Int): String = { val s = be16(v); s.substring(2) + s.substring(0, 2) }
  private def le32(v: Long): String = {
    val s = be32(v)
    s.substring(6) + s.substring(4, 6) + s.substring(2, 4) + s.substring(0, 2)
  }

  /** Container hex template per kind = doc_id % 6. */
  def payloadHex(docId: Long): String = (docId % 6) match {
    case 0 => // PNG: sig + IHDR(len 13) + w/h be32 + depth/color/trailer
      "89504E470D0A1A0A" + "0000000D" + "49484452" +
        be32(width(docId)) + be32(height(docId)) + "0806000000"
    case 1 => // GIF89a: logical screen w/h le16 + GCT flags
      "474946383961" + le16(width(docId)) + le16(height(docId)) + "F70000"
    case 2 => // JPEG: SOI + APP0(JFIF) + COM + SOF0(h/w be16) + EOI —
      // segments before SOF exercise the real marker scan
      "FFD8" +
        "FFE0" + "0010" + "4A46494600" + "0101" + "00" + "0001" + "0001" + "0000" +
        "FFFE" + "0004" + "6766" +
        "FFC0" + "0011" + "08" + be16(height(docId)) + be16(width(docId)) +
        "03" + "012200" + "021101" + "031101" +
        "FFD9"
    case 3 => // WAV: RIFF size + fmt(PCM) + data size, header-only payload
      "52494646" + le32(36L + dataBytes(docId)) + "57415645" +
        "666D7420" + "10000000" + "0100" + le16(channels(docId)) +
        le32(sampleRate(docId)) + le32(byteRate(docId)) +
        le16(channels(docId) * 2) + "1000" +
        "64617461" + le32(dataBytes(docId))
    case 4 => // MP4: ftyp(isom) + moov[mvhd v0] — timescale/duration be32,
      // remaining mvhd payload (rate..next_track_id) zeroed
      "00000014" + "66747970" + "69736F6D" + "00000200" + "69736F6D" +
        "00000074" + "6D6F6F76" +
        "0000006C" + "6D766864" + "00000000" + "00000000" + "00000000" +
        be32(mp4Timescale(docId)) + be32(mp4DurationUnits(docId)) +
        "0" * 160 // rate..next_track_id: 80 zero bytes complete the 100-byte payload
    case _ => // corrupt: PNG signature truncated before IHDR
      "89504E470D0A1A0A" + "0000000D"
  }

  def payload(docId: Long): Array[Byte] = {
    val hx = payloadHex(docId)
    Array.tabulate(hx.length / 2)(i =>
      Integer.parseInt(hx.substring(i * 2, i * 2 + 2), 16).toByte)
  }

  // ------------------------------------------------- full-pixel PNG (q85)

  /** Deterministic PIXEL corpus for the real decode gate (q85): a complete
    * PNG — IHDR + zlib-compressed filtered scanlines + IEND — whose pixel
    * at (x, y, channel) is the closed form `(3x + 7y + 11c + doc_id) % 256`,
    * so the DuckDB oracle can recompute every decoded statistic by pure
    * arithmetic while the Spark side must actually inflate and unfilter the
    * bytes. The filter type rotates per scanline (`(doc_id + y) % 5`), so
    * the corpus exercises the whole None/Sub/Up/Average/Paeth matrix.
    * Compressed bytes are NOT part of the contract (zlib level/version may
    * vary); only the decoded pixels are, which is exactly what the gate
    * hashes. */
  def pixelWidth(docId: Long): Int = (docId % 16).toInt + 4
  def pixelHeight(docId: Long): Int = (docId % 12).toInt + 4
  def pixelChannels(docId: Long): Int = (docId % 2).toInt + 3 // RGB | RGBA

  def pixelValue(docId: Long, x: Int, y: Int, c: Int): Int =
    ((3L * x + 7L * y + 11L * c + docId) % 256L).toInt

  def pixelImage(docId: Long): PngCodec.Image = {
    val w = pixelWidth(docId); val h = pixelHeight(docId)
    val ch = pixelChannels(docId)
    val px = new Array[Byte](w * h * ch)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        var c = 0
        while (c < ch) {
          px((y * w + x) * ch + c) = pixelValue(docId, x, y, c).toByte
          c += 1
        }
        x += 1
      }
      y += 1
    }
    PngCodec.Image(w, h, ch, px)
  }

  def pixelPng(docId: Long): Array[Byte] =
    PngCodec.encode(pixelImage(docId), y => ((docId + y) % 5).toInt)

  /** Grayscale sibling of [[pixelImage]] (q95): same dims and closed form
    * with channel fixed at 0, one byte per pixel — exercises the whole
    * unfilter matrix at bpp=1, where Sub/Paeth reference the immediately
    * preceding BYTE rather than a 3/4-byte-away one. */
  def grayImage(docId: Long): PngCodec.Image = {
    val w = pixelWidth(docId); val h = pixelHeight(docId)
    val px = new Array[Byte](w * h)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        px(y * w + x) = pixelValue(docId, x, y, 0).toByte
        x += 1
      }
      y += 1
    }
    PngCodec.Image(w, h, 1, px)
  }

  def grayPng(docId: Long): Array[Byte] =
    PngCodec.encode(grayImage(docId), y => ((docId + y) % 5).toInt)

  // ------------------------------------------------ indexed-color GIF (q96)

  /** Deterministic INDEXED corpus for the real GIF decode gate (q96): a
    * complete GIF89a — global color table + genuine variable-width LZW
    * image data — whose palette index at (x, y) and palette entry k are
    * closed forms of `doc_id`, so the DuckDB oracle recomputes every
    * decoded statistic by pure arithmetic while the Spark side must
    * actually run the LZW inflater ([[GifCodec]]). Palette sizes sweep
    * 4..256 (all seven GIF code sizes), and the encoder's periodic CLEAR
    * resets put real mid-stream dictionary resets in the corpus.
    * Compressed bytes are NOT part of the contract; only the decoded
    * indices and palette are — exactly what the gate hashes. */
  def gifBits(docId: Long): Int = (docId % 7).toInt + 2 // 2..8
  def gifNColors(docId: Long): Int = 1 << gifBits(docId)

  def gifIndex(docId: Long, x: Int, y: Int): Int =
    ((3L * x + 7L * y + docId) % gifNColors(docId)).toInt

  /** Palette entry k as (r, g, b). */
  def gifPaletteRgb(docId: Long, k: Int): (Int, Int, Int) = (
    ((5L * k + docId) % 256L).toInt,
    ((7L * k + 2L * docId) % 256L).toInt,
    ((11L * k + 3L * docId) % 256L).toInt)

  def gifImage(docId: Long): GifCodec.IndexedImage = {
    val w = pixelWidth(docId); val h = pixelHeight(docId)
    val nc = gifNColors(docId)
    val pal = new Array[Byte](nc * 3)
    var k = 0
    while (k < nc) {
      val (r, g, b) = gifPaletteRgb(docId, k)
      pal(3 * k) = r.toByte; pal(3 * k + 1) = g.toByte; pal(3 * k + 2) = b.toByte
      k += 1
    }
    val idx = new Array[Byte](w * h)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        idx(y * w + x) = gifIndex(docId, x, y).toByte
        x += 1
      }
      y += 1
    }
    GifCodec.IndexedImage(w, h, pal, idx)
  }

  /** CLEAR every 48 data codes: the larger corpus images (up to 19×16
    * pixels) reset the dictionary several times mid-stream; the smallest
    * never do — both paths stay exercised. */
  def gifPayload(docId: Long): Array[Byte] =
    GifCodec.encode(gifImage(docId), gifBits(docId), clearEvery = 48)

  // --------------------------------------------- indexed-color PNG (q97)

  /** Deterministic PALETTED-PNG corpus (q97): color type 3 — a PLTE table
    * plus a filtered bpp=1 index raster — with palette sizes sweeping
    * 6..255, most NOT powers of two (exactly what GIF's 2^n tables can
    * never produce). The filter types rotate per scanline as in q85, so
    * the bpp=1 unfilter matrix runs under indexed color too. */
  def palNColors(docId: Long): Int = (docId % 250).toInt + 6 // 6..255

  def palIndex(docId: Long, x: Int, y: Int): Int =
    ((5L * x + 3L * y + docId) % palNColors(docId)).toInt

  /** Palette entry k as (r, g, b). */
  def palRgb(docId: Long, k: Int): (Int, Int, Int) = (
    ((3L * k + docId) % 256L).toInt,
    ((5L * k + 2L * docId) % 256L).toInt,
    ((7L * k + 3L * docId) % 256L).toInt)

  def palImage(docId: Long): GifCodec.IndexedImage = {
    val w = pixelWidth(docId); val h = pixelHeight(docId)
    val nc = palNColors(docId)
    val pal = new Array[Byte](nc * 3)
    var k = 0
    while (k < nc) {
      val (r, g, b) = palRgb(docId, k)
      pal(3 * k) = r.toByte; pal(3 * k + 1) = g.toByte; pal(3 * k + 2) = b.toByte
      k += 1
    }
    val idx = new Array[Byte](w * h)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        idx(y * w + x) = palIndex(docId, x, y).toByte
        x += 1
      }
      y += 1
    }
    GifCodec.IndexedImage(w, h, pal, idx)
  }

  def palettePng(docId: Long): Array[Byte] =
    PngCodec.encodePaletted(palImage(docId), y => ((docId + y) % 5).toInt)

  // ------------------------------------------ raw-video ISO-BMFF (q94)

  /** Deterministic FRAME corpus for the real video-extraction gate (q94):
    * a complete ISO-BMFF file with an uncompressed (`raw ` RGB) video
    * track — ftyp + moov (mvhd + trak/mdia/minf/stbl with a real
    * stsd/stsz/stco sample table) + mdat holding the frames. Frame f's
    * pixel at (x, y, channel) is `(3x + 7y + 11c + 13f + doc_id) % 256`,
    * so the oracle replays every extracted byte while the Spark side must
    * genuinely resolve sample sizes and absolute chunk offsets
    * ([[VideoHeaders.rawVideoFrames]]). */
  def videoWidth(docId: Long): Int = (docId % 4).toInt + 2
  def videoHeight(docId: Long): Int = (docId % 3).toInt + 2
  def videoFrames(docId: Long): Int = (docId % 5).toInt + 2

  def videoPixel(docId: Long, f: Int, x: Int, y: Int, c: Int): Int =
    ((3L * x + 7L * y + 11L * c + 13L * f + docId) % 256L).toInt

  /** Shared ISO-BMFF assembler: ftyp + moov (mvhd + trak/mdia/minf/stbl
    * with stsd[`fmt`]/stsz-table/stco-absolute) + mdat holding `samples`
    * back to back. Every video corpus (raw q94, MJPEG q150, predicted
    * q168) differs only in the sample fourcc and bytes. */
  def videoMp4(docId: Long, fmt: String, w: Int, h: Int,
      samples: Seq[Array[Byte]]): Array[Byte] = {
    val nF = samples.length
    def box(typ: String, payload: Array[Byte]): Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(8 + payload.length)
      bb.putInt(8 + payload.length).put(typ.getBytes("US-ASCII")).put(payload)
      bb.array()
    }
    def be32(v: Int): Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(4); bb.putInt(v); bb.array()
    }
    val ftyp = box("ftyp", "isom".getBytes ++ be32(0x200) ++ "isom".getBytes)
    val mvhd = box("mvhd", new Array[Byte](12) ++
      be32(mp4Timescale(docId).toInt) ++ be32(mp4DurationUnits(docId).toInt) ++
      new Array[Byte](80))
    // stsd: ver/flags + count=1 + one 86-byte VisualSampleEntry,
    // zero-filled except width/height at entry offsets 32/34
    val entry = {
      val bb = java.nio.ByteBuffer.allocate(86)
      bb.putInt(86).put(fmt.getBytes("US-ASCII"))
      bb.position(32)
      bb.putShort(w.toShort).putShort(h.toShort)
      bb.array()
    }
    val stsd = box("stsd", new Array[Byte](4) ++ be32(1) ++ entry)
    // stsz in table form (sample_size = 0): exercises the per-sample path
    val stsz = box("stsz", new Array[Byte](4) ++ be32(0) ++ be32(nF) ++
      samples.flatMap(s => be32(s.length).toSeq).toArray)
    // stco offsets are ABSOLUTE — computed from the final layout below
    def stco(offsets: Seq[Int]) = box("stco",
      new Array[Byte](4) ++ be32(nF) ++ offsets.flatMap(be32).toArray)
    def moov(offsets: Seq[Int]) = box("moov", mvhd ++
      box("trak", box("mdia", box("minf",
        box("stbl", stsd ++ stsz ++ stco(offsets))))))
    // layout: ftyp | moov | mdat(header + samples); moov size is offset-
    // independent, so compute it once with placeholder offsets
    val moovSize = moov(Seq.fill(nF)(0)).length
    val mdatStart = ftyp.length + moovSize + 8
    val offsets = samples.scanLeft(mdatStart)(_ + _.length).init
    ftyp ++ moov(offsets) ++ box("mdat", samples.flatten.toArray)
  }

  def rawVideoMp4(docId: Long): Array[Byte] = {
    val w = videoWidth(docId); val h = videoHeight(docId)
    val frameBytes = w * h * 3
    val frames = (0 until videoFrames(docId)).map { f =>
      Array.tabulate(frameBytes) { r =>
        val y = r / (w * 3); val x = (r % (w * 3)) / 3; val c = r % 3
        videoPixel(docId, f, x, y, c).toByte
      }
    }
    videoMp4(docId, "raw ", w, h, frames)
  }

  // --------------------------- predicted (inter-frame) video (q168)

  /** Deterministic PREDICTED-track corpus (q168): sample 0 is a full
    * intra frame, every later sample holds per-pixel integer RESIDUALS —
    * frame f only exists by summing all residuals up to f, the genuine
    * inter-frame dependency of a P-frame track. Closed form keeps every
    * decoded byte an exact oracle-replayable integer with no clamping:
    * base = (3x + 7y + 11c + doc) % 220, residual_f = (x+y+c+f) % 7 + 1,
    * so frame f's pixel = base + Σ_{j=1..f} residual_j ≤ 219 + 5·7 <
    * 256. */
  def pvBase(docId: Long, x: Int, y: Int, c: Int): Int =
    ((3L * x + 7L * y + 11L * c + docId) % 220L).toInt

  def pvResidual(x: Int, y: Int, c: Int, f: Int): Int = ((x + y + c + f) % 7) + 1

  def predVideoMp4(docId: Long): Array[Byte] = {
    val w = videoWidth(docId); val h = videoHeight(docId)
    val frameBytes = w * h * 3
    def posOf(r: Int): (Int, Int, Int) =
      (r % (w * 3) / 3, r / (w * 3), r % 3)
    val samples = (0 until videoFrames(docId)).map { f =>
      Array.tabulate(frameBytes) { r =>
        val (x, y, c) = posOf(r)
        (if (f == 0) pvBase(docId, x, y, c) else pvResidual(x, y, c, f)).toByte
      }
    }
    videoMp4(docId, "pvid", w, h, samples)
  }

  // --------------------------------------------- baseline JPEG (q149)

  /** Deterministic COEFFICIENT corpus for the real JPEG decode gate
    * (q149): a complete baseline JFIF ([[JpegCodec.encodeGray]] — real
    * huffman entropy coding, byte stuffing, restart markers on a third of
    * the corpus) that [[JpegCodec.decode]] must genuinely entropy-decode,
    * dequantize and IDCT. JPEG is lossy pixel→pixel but LOSSLESS
    * coefficient→pixel, so the corpus is built in the FREQUENCY domain:
    * each block carries quantized coefficients only at (0,0), (4,0),
    * (0,4) and (4,4) — the four DCT basis functions that are ±1/8-valued
    * over the block — with dequantized magnitudes that are multiples of 8,
    * so every decoded pixel is the exact integer
    * `128 + da + db·s(x) + dc·s(y) + dd·s(x)s(y)` with
    * `s(i) = +1 if i mod 4 ∈ {0,3} else −1`, replayable by the oracle in
    * pure arithmetic. Magnitudes are bounded (|da|≤64, |db|,|dc|≤16,
    * |dd|≤8) so no clamping fires; the zigzag gaps between the three ACs
    * (positions 10, 14, 39) put real (run,size) pairs AND a ZRL in every
    * block's stream, and per-block-varying DC exercises difference
    * coding; dims are non-multiples of 8, exercising edge crop. */
  def jpegWidth(docId: Long): Int = (docId % 24).toInt + 9 // 9..32
  def jpegHeight(docId: Long): Int = (docId % 20).toInt + 9 // 9..28
  /** Restart interval in MCUs on a third of the corpus (0 = none). */
  def jpegRestart(docId: Long): Int = if (docId % 3 == 0) 2 else 0

  def jpegDa(docId: Long, bx: Int, by: Int): Int =
    (((3L * bx + 5L * by + docId) % 128L) - 64L).toInt
  def jpegDb(docId: Long, bx: Int, by: Int): Int =
    (((7L * bx + 11L * by + 2L * docId) % 32L) - 16L).toInt
  def jpegDc(docId: Long, bx: Int, by: Int): Int =
    (((13L * bx + 17L * by + 3L * docId) % 32L) - 16L).toInt
  def jpegDd(docId: Long, bx: Int, by: Int): Int =
    (((19L * bx + 23L * by + 5L * docId) % 16L) - 8L).toInt

  /** Natural-order quant table: 8 at the four used positions (so the
    * dequantized values are the 8·d multiples the closed form needs),
    * varied elsewhere — the decoder must still parse the full table. */
  val jpegQuantTable: Array[Int] = Array.tabulate(64) {
    case 0 | 4 | 32 | 36 => 8
    case i => (i * 7) % 23 + 1
  }

  /** Quantized coefficients for block (bx, by), natural order. */
  def jpegCoeffs(docId: Long)(bx: Int, by: Int): Array[Int] = {
    val c = new Array[Int](64)
    c(0) = jpegDa(docId, bx, by) // DC
    c(4) = jpegDb(docId, bx, by) // (u=4, v=0): horizontal ±1/8 basis
    c(32) = jpegDc(docId, bx, by) // (u=0, v=4): vertical
    c(36) = jpegDd(docId, bx, by) // (u=4, v=4): checker
    c
  }

  private def jpegSign(i: Int): Int = if (i % 4 == 0 || i % 4 == 3) 1 else -1

  /** Closed-form decoded pixel value at (x, y). */
  def jpegPixel(docId: Long, x: Int, y: Int): Int = {
    val bx = x / 8; val by = y / 8
    val sx = jpegSign(x % 8); val sy = jpegSign(y % 8)
    128 + jpegDa(docId, bx, by) + jpegDb(docId, bx, by) * sx +
      jpegDc(docId, bx, by) * sy + jpegDd(docId, bx, by) * sx * sy
  }

  def jpegPayload(docId: Long): Array[Byte] =
    JpegCodec.encodeGray(jpegWidth(docId), jpegHeight(docId), jpegQuantTable,
      jpegCoeffs(docId), jpegRestart(docId))

  // ------------------------------- progressive JPEG (q160)

  /** PROGRESSIVE twin of the q149 corpus: identical dims and
    * frequency-domain closed forms, emitted as a multi-scan SOF2 stream
    * (DC scan + two spectral-selection AC bands split at zigzag 13, so
    * band 1 carries the (4,0) coefficient and band 2 the (0,4)/(4,4)
    * pair — every scan has real content and real band-empty EOB runs).
    * Decoded pixels must equal [[jpegPixel]] — and therefore equal the
    * baseline q149 decode bit-for-bit. */
  def jpegProgressivePayload(docId: Long): Array[Byte] =
    JpegCodec.encodeGrayProgressive(jpegWidth(docId), jpegHeight(docId),
      jpegQuantTable, jpegCoeffs(docId))

  /** SUCCESSIVE-APPROXIMATION variant (q161): the same closed forms as
    * five scans — coarse DC/AC at point-transform level 1, then DC and
    * AC refinement scans delivering the low bits (corrections woven with
    * newly-significant coefficients per spec G.1.2.3). Must still decode
    * to exactly [[jpegPixel]]. */
  def jpegApproxPayload(docId: Long): Array[Byte] =
    JpegCodec.encodeGrayProgressive(jpegWidth(docId), jpegHeight(docId),
      jpegQuantTable, jpegCoeffs(docId), approx = true)

  // --------------------------------- 4:2:0 color JPEG (q152)

  /** Deterministic COLOR corpus for the chroma-subsampled decode gate
    * (q152): a 3-component 4:2:0 baseline JFIF
    * ([[JpegCodec.encodeColor]] — interleaved Y×4+Cb+Cr MCUs, two quant
    * tables, all four Annex K huffman tables) whose per-component blocks
    * reuse the q149 frequency-domain closed forms seeded per component
    * (`doc_id + 1009·comp`). The decoder must run the full sampling-grid
    * path: 4 luma data units per MCU, chroma at half resolution,
    * replication upsampling, then the integer fixed-point YCbCr→RGB
    * ([[JpegCodec.ycc2rgb]]) — every output channel value is exact
    * integer arithmetic the oracle replays (including the clamps that
    * genuinely fire on saturated chroma). Dims span 1–3 MCUs per axis
    * with non-multiples of 16, exercising padded Y/chroma blocks that
    * must be decoded and then cropped away. */
  def jpegColorWidth(docId: Long): Int = (docId % 28).toInt + 9 // 9..36
  def jpegColorHeight(docId: Long): Int = (docId % 24).toInt + 9 // 9..32
  def jpegColorSeed(docId: Long, comp: Int): Long = docId + 1009L * comp

  def jpegColorPayload(docId: Long): Array[Byte] =
    JpegCodec.encodeColor(jpegColorWidth(docId), jpegColorHeight(docId),
      jpegQuantTable, jpegQuantTable,
      (comp, bx, by) => jpegCoeffs(jpegColorSeed(docId, comp))(bx, by),
      jpegRestart(docId))

  /** Closed-form decoded RGB at (x, y): luma at full resolution, chroma
    * replicated from (x/2, y/2), converted by the same integer transform
    * the decoder applies. */
  def jpegColorPixel(docId: Long, x: Int, y: Int): (Int, Int, Int) = {
    val yv = jpegPixel(jpegColorSeed(docId, 0), x, y)
    val cb = jpegPixel(jpegColorSeed(docId, 1), x / 2, y / 2)
    val cr = jpegPixel(jpegColorSeed(docId, 2), x / 2, y / 2)
    JpegCodec.ycc2rgb(yv, cb, cr)
  }

  // ------------------------------------------ motion-JPEG ISO-BMFF (q150)

  /** Deterministic COMPRESSED-video corpus (q150): the q94 container with
    * the `jpeg` sample format — every track sample is a complete baseline
    * JFIF built by [[JpegCodec.encodeGray]] from the q149 frequency-domain
    * closed forms, seeded per-frame (`doc_id + 131·f`), so sample sizes
    * genuinely differ (real stsz table addressing) and the decoder must
    * run the full entropy decode per frame. Decoded frame f's pixel at
    * (x, y) is exactly [[jpegPixel]](doc_id + 131·f, x, y) — except dims,
    * which stay constant per video as a real track requires. */
  def mjpegWidth(docId: Long): Int = (docId % 16).toInt + 9 // 9..24
  def mjpegHeight(docId: Long): Int = (docId % 12).toInt + 9 // 9..20
  def mjpegFrames(docId: Long): Int = (docId % 4).toInt + 2 // 2..5
  def mjpegSeed(docId: Long, f: Int): Long = docId + 131L * f

  def mjpegFrameJpeg(docId: Long, f: Int): Array[Byte] = {
    val s = mjpegSeed(docId, f)
    JpegCodec.encodeGray(mjpegWidth(docId), mjpegHeight(docId),
      jpegQuantTable, jpegCoeffs(s), jpegRestart(s))
  }

  /** Sample sizes REALLY differ here (entropy-coded lengths) — the
    * shared assembler's stsz table form carries them. */
  def mjpegMp4(docId: Long): Array[Byte] =
    videoMp4(docId, "jpeg", mjpegWidth(docId), mjpegHeight(docId),
      (0 until mjpegFrames(docId)).map(f => mjpegFrameJpeg(docId, f)))

  // ---------------------------------------------- full-sample PCM WAV (q91)

  /** Deterministic SAMPLE corpus for the real audio decode gate (q91): a
    * complete 16-bit PCM WAV whose interleaved sample i is the closed form
    * `((2293·i + 7919·doc_id) mod 65536) − 32768` — the DuckDB oracle
    * recomputes every decoded statistic by pure arithmetic while the
    * Spark side must actually walk the chunks and extract signed LE16
    * samples ([[AudioHeaders.pcm16]]). */
  def pcmChannels(docId: Long): Int = (docId % 2).toInt + 1
  def pcmRate(docId: Long): Int = Seq(8000, 16000, 44100)((docId % 3).toInt)
  def pcmFrames(docId: Long): Int = (docId % 50).toInt + 10

  /** Signed 16-bit sample value at interleaved position `i`. */
  def pcmSample(docId: Long, i: Int): Int =
    (((2293L * i + 7919L * docId) % 65536L) - 32768L).toInt

  def pcmWav(docId: Long): Array[Byte] = {
    val ch = pcmChannels(docId)
    val rate = pcmRate(docId)
    val n = pcmFrames(docId) * ch
    val dataBytes = n * 2
    val bb = java.nio.ByteBuffer.allocate(44 + dataBytes)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataBytes)
      .put("WAVE".getBytes("US-ASCII"))
    bb.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(ch.toShort) // PCM, channels
      .putInt(rate).putInt(rate * ch * 2) // sample rate, byte rate
      .putShort((ch * 2).toShort).putShort(16) // block align, bits/sample
    bb.put("data".getBytes("US-ASCII")).putInt(dataBytes)
    var i = 0
    while (i < n) {
      bb.putShort(pcmSample(docId, i).toShort)
      i += 1
    }
    bb.array()
  }

  /** FLAC synth parameters (q308): per-channel frame count and the
    * closed-form sample the oracle replays. Values stay within ±2048 so
    * fixed-predictor residuals never stress the Rice range. */
  def flacFrames(docId: Long): Int = (docId % 40).toInt + 20

  /** Signed sample at INTERLEAVED position `i` — same shape as
    * [[pcmSample]] with a narrower range. */
  def flacSample(docId: Long, i: Int): Int =
    (((2293L * i + 7919L * docId) % 4096L) - 2048L).toInt

  /** A complete REAL FLAC stream for the doc: deterministic samples
    * encoded by [[FlacCodec.encode]] — fixed predictors, Rice
    * residuals, true CRCs and MD5, multiple frames (block size 16). */
  def flacBytes(docId: Long): Array[Byte] = {
    val ch = channels(docId)
    val n = flacFrames(docId) * ch
    val samples = new Array[Short](n)
    var i = 0
    while (i < n) { samples(i) = flacSample(docId, i).toShort; i += 1 }
    FlacCodec.encode(samples, ch, sampleRate(docId), blockSize = 16)
  }
}
