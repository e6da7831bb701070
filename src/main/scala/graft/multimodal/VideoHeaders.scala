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
