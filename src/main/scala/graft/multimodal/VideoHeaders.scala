package graft.multimodal

/** REAL video-container header parsing — the ISO-BMFF (MP4/MOV) sibling of
  * [[ImageHeaders]]/[[AudioHeaders]]: presentation duration lives in the
  * `moov/mvhd` movie header (timescale units/second + duration in units),
  * reachable by walking the length-prefixed box tree — no codec, no frame
  * decode. The pass a corpus pipeline runs to bucket/filter video by
  * length before any frame extraction.
  *
  * Box layout: `[size:be32]['typ'x4][payload]`, children nested inside
  * `moov`; mvhd v0 carries timescale/duration as be32 at payload offsets
  * 12/16, v1 (64-bit times) at 20/24 with duration be64.
  */
object VideoHeaders {

  final case class Mp4Info(timescale: Long, durationUnits: Long) {
    def durationMs: Long = durationUnits * 1000L / timescale
  }

  import ByteReads._

  private def parseMvhd(p: Array[Byte], j: Int, end: Int): Option[Mp4Info] = {
    // j points at the mvhd box header; payload starts at j+8
    val v = if (j + 9 <= end) u8(p, j + 8) else return None
    val raw =
      if (v == 0 && j + 28 <= end)
        Some(Mp4Info(be32(p, j + 20), be32(p, j + 24)))
      else if (v == 1 && j + 40 <= end)
        Some(Mp4Info(be32(p, j + 28), be64(p, j + 32)))
      else None
    // durationMs divides by timescale and multiplies duration by 1000:
    // a corrupt-but-well-framed mvhd with timescale=0 (or a v1 be64
    // duration that overflows the *1000L) must parse to None, not arm a
    // later ArithmeticException/overflow in an executor task.
    raw.filter(m => m.timescale > 0 &&
      m.durationUnits >= 0 && m.durationUnits <= Long.MaxValue / 1000L)
  }

  /** Find the first child box named `typ` inside [start, end) — one level
    * of the length-prefixed tree; returns (payload start, payload end). */
  private def findChild(p: Array[Byte], start: Long, end: Long,
      typ: String): Option[(Long, Long)] = {
    var i = start
    while (i + 8 <= end) {
      val at = i.toInt
      val size = be32(p, at)
      if (size < 8) return None
      if (tag(p, at + 4, typ))
        return Some((i + 8, math.min(end, i + size)))
      i += size
    }
    None
  }

  /** Descend a container path (e.g. moov/trak/mdia/minf/stbl), first
    * match at each level. */
  private def findPath(p: Array[Byte], path: Seq[String]): Option[(Long, Long)] =
    path.foldLeft(Option((0L, p.length.toLong))) {
      case (acc, typ) => acc.flatMap { case (s, e) => findChild(p, s, e, typ) }
    }

  final case class RawVideo(width: Int, height: Int, frames: Seq[Array[Byte]])

  /** The demuxer core shared by every track flavor: walk
    * moov/trak/mdia/minf/stbl, read the first `stsd` entry's sample
    * format and declared dimensions, resolve the per-sample sizes
    * (`stsz`, uniform or table form) and chunk offsets (`stco`, one
    * sample per chunk), and slice each sample's bytes out of `mdat` by
    * ABSOLUTE file offset — exactly how a demuxer addresses samples.
    * Returns (format, width, height, samples); None for any truncated/
    * corrupt payload. */
  private def trackSamples(p: Array[Byte]): Option[(String, Int, Int, Seq[Array[Byte]])] = {
    if (p.length < 16 || !(tag(p, 4, "ftyp") || tag(p, 4, "moov"))) return None
    val stbl = findPath(p, Seq("moov", "trak", "mdia", "minf", "stbl"))
      .getOrElse(return None)
    val (ss, se) = stbl
    // stsd: ver/flags(4) + entry_count(4); first entry: size(4) format(4)
    // reserved(6) dataref(2) + VisualSampleEntry pre(16) + w/h be16
    val (ds, de) = findChild(p, ss, se, "stsd").getOrElse(return None)
    if (ds + 8 + 36 > de || be32(p, ds.toInt + 4) < 1L) return None
    val entry = ds + 8
    val fmt = new String(p, entry.toInt + 4, 4, "US-ASCII")
    val width = be16(p, entry.toInt + 32)
    val height = be16(p, entry.toInt + 34)
    if (width < 1 || height < 1) return None
    // stsz: ver/flags(4) + sample_size(4) + count(4) [+ sizes]
    val (zs, ze) = findChild(p, ss, se, "stsz").getOrElse(return None)
    if (zs + 12 > ze) return None
    val uniform = be32(p, zs.toInt + 4)
    val n = be32(p, zs.toInt + 8)
    if (n < 1 || n > 4096) return None // bounded: a header, not a stream
    val sizes = (0 until n.toInt).map { i =>
      if (uniform != 0L) uniform
      else if (zs + 12 + i * 4 + 4 <= ze) be32(p, (zs + 12 + i * 4).toInt)
      else return None
    }
    // stco: ver/flags(4) + count(4) + offsets[count] (absolute)
    val (cs, ce) = findChild(p, ss, se, "stco").getOrElse(return None)
    if (cs + 8 > ce || be32(p, cs.toInt + 4) != n) return None
    val frames = (0 until n.toInt).map { i =>
      if (cs + 8 + i * 4 + 4 > ce) return None
      val off = be32(p, (cs + 8 + i * 4).toInt)
      val sz = sizes(i)
      if (off + sz > p.length || sz < 1 || sz > (1L << 24)) return None
      java.util.Arrays.copyOfRange(p, off.toInt, (off + sz).toInt)
    }
    Some((fmt, width, height, frames))
  }

  /** REAL frame extraction for an uncompressed-video track — the q94 gate
    * kernel over [[trackSamples]]: requires the `raw ` (uncompressed RGB)
    * sample format; each sample IS the frame's pixel bytes. No entropy
    * codec involved, which is why this subset was the first complete one
    * in pure JVM; compressed tracks dispatch through
    * [[mjpegVideoFrames]] (motion-JPEG) or are out of subset → None. */
  def rawVideoFrames(p: Array[Byte]): Option[RawVideo] =
    trackSamples(p) match {
      case Some(("raw ", w, h, frames)) => Some(RawVideo(w, h, frames))
      case _ => None
    }

  /** REAL COMPRESSED-track frame decode — motion-JPEG (the q150 gate
    * kernel): each track sample is a complete baseline JFIF that
    * [[JpegCodec.decode]] entropy-decodes to pixels; the demux addressing
    * is identical to the `raw ` path, so this is demux + per-sample codec
    * — the real shape of compressed-video ingestion (a production build
    * swaps the per-sample codec, not the Spark plumbing). Frames hold the
    * DECODED grayscale pixels; a sample that fails to decode, or whose
    * decoded dims disagree with the stsd declaration, fails the whole
    * payload to None rather than mixing real and garbage frames. */
  def mjpegVideoFrames(p: Array[Byte]): Option[RawVideo] =
    trackSamples(p) match {
      case Some(("jpeg", w, h, samples)) =>
        val decoded = samples.map { s =>
          JpegCodec.decode(s) match {
            case Some(img) if img.width == w && img.height == h &&
              img.channels == 1 => img.pixels
            case _ => return None
          }
        }
        Some(RawVideo(w, h, decoded))
      case _ => None
    }

  /** REAL INTER-FRAME decode — a predicted ('pvid') track, the P-frame
    * shape beyond MJPEG's intra-only samples: sample 0 is a full intra
    * frame; every later sample holds per-pixel SIGNED-BYTE residuals, and
    * frame f is reconstructed as frame f−1 plus sample f — so no frame
    * beyond the first exists without decoding every prior sample (the
    * genuine temporal dependency chain of predictive video coding).
    * A residual that would push any pixel outside [0, 255] marks the
    * payload corrupt → None, never a silently clamped frame. */
  def predictedVideoFrames(p: Array[Byte]): Option[RawVideo] =
    trackSamples(p) match {
      case Some(("pvid", w, h, samples)) if samples.nonEmpty =>
        val frameBytes = w * h * 3
        if (samples.exists(_.length != frameBytes)) return None
        val frames = samples.tail.scanLeft(samples.head) { (prev, res) =>
          val out = new Array[Byte](frameBytes)
          var i = 0
          while (i < frameBytes) {
            val v = (prev(i) & 0xff) + res(i) // residual is signed
            if (v < 0 || v > 255) return None
            out(i) = v.toByte
            i += 1
          }
          out
        }
        Some(RawVideo(w, h, frames))
      case _ => None
    }

  /** Walk top-level boxes for `moov`, then its children for `mvhd`.
    * Returns None for non-MP4, truncated-before-mvhd, or malformed
    * (zero/overflowing box size) payloads. Offset arithmetic stays in
    * Long: an unsigned 32-bit box size truncated to Int would loop
    * forever (advance wraps to 0/negative) or overflow the index — in
    * Long it just walks past the end and returns None. */
  def mp4Info(p: Array[Byte]): Option[Mp4Info] = {
    // a real MP4 starts with a box whose type is ftyp (or a moov-first
    // streaming layout); require a plausible first box header
    if (p.length < 16 || !(tag(p, 4, "ftyp") || tag(p, 4, "moov"))) return None
    var i = 0L
    while (i + 8 <= p.length) {
      val at = i.toInt // safe: i + 8 <= p.length <= Int.MaxValue
      val size = be32(p, at) // unsigned, up to 0xFFFFFFFF
      if (size < 8) return None // 64-bit/to-end sizes not used by headers
      if (tag(p, at + 4, "moov")) {
        val end = math.min(p.length.toLong, i + size).toInt
        var j = i + 8
        while (j + 8 <= end) {
          val cat = j.toInt
          val csize = be32(p, cat)
          if (csize < 8) return None
          if (tag(p, cat + 4, "mvhd")) return parseMvhd(p, cat, end)
          j += csize
        }
        return None // moov without mvhd (or truncated)
      }
      i += size
    }
    None
  }
}
