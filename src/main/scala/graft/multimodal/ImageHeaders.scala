package graft.multimodal

/** REAL image-container header parsing — no codec library required.
  *
  * Dimensions do not need a pixel decoder: PNG and GIF store them at fixed
  * byte offsets and JPEG in its SOF marker segment, so metadata extraction
  * over a `binary` media column is exact even in environments (like this
  * one) where the decode step itself must stay stubbed. This is the op a
  * training pipeline runs at full corpus scale (filter by resolution,
  * bucket by aspect ratio) long before any pixels are decoded.
  *
  * Formats: PNG (8-byte signature, IHDR width/height big-endian at offsets
  * 16/20), GIF87a/89a (logical screen width/height little-endian at 6/8),
  * JPEG (scan FF-marker segments to the first SOF0-SOF15 frame header:
  * [marker][len][precision][height u16 BE][width u16 BE]).
  */
object ImageHeaders {

  import ByteReads._

  def pngDims(p: Array[Byte]): Option[(Int, Int)] =
    if (p.length >= 24 && u8(p, 0) == 0x89 && p(1) == 'P' && p(2) == 'N' &&
      p(3) == 'G' && u8(p, 4) == 0x0d && u8(p, 5) == 0x0a &&
      u8(p, 6) == 0x1a && u8(p, 7) == 0x0a &&
      p(12) == 'I' && p(13) == 'H' && p(14) == 'D' && p(15) == 'R')
      Some((be32(p, 16).toInt, be32(p, 20).toInt))
    else None

  def gifDims(p: Array[Byte]): Option[(Int, Int)] =
    if (p.length >= 10 && p(0) == 'G' && p(1) == 'I' && p(2) == 'F' &&
      p(3) == '8' && (p(4) == '7' || p(4) == '9') && p(5) == 'a')
      Some((le16(p, 6), le16(p, 8)))
    else None

  /** SOF markers carrying frame dimensions (C0-CF minus DHT C4, JPG C8,
    * DAC CC, which are not frame headers). */
  private val SofMarkers = Set(0xc0, 0xc1, 0xc2, 0xc3, 0xc5, 0xc6, 0xc7,
    0xc9, 0xca, 0xcb, 0xcd, 0xce, 0xcf)

  def jpegDims(p: Array[Byte]): Option[(Int, Int)] = {
    if (p.length < 4 || u8(p, 0) != 0xff || u8(p, 1) != 0xd8) return None
    var i = 2
    while (i + 3 < p.length) {
      if (u8(p, i) != 0xff) return None // desynced — not a marker stream
      val marker = u8(p, i + 1)
      if (marker == 0xff) i += 1 // fill byte
      else if (marker == 0x01 || (marker >= 0xd0 && marker <= 0xd9)) i += 2 // standalone
      else {
        val len = be16(p, i + 2)
        if (len < 2) return None
        if (SofMarkers.contains(marker))
          return if (i + 9 <= p.length) Some((be16(p, i + 7), be16(p, i + 5)))
          else None
        i += 2 + len
      }
    }
    None
  }

  /** (format, width, height) for any recognized container. */
  def dims(p: Array[Byte]): Option[(String, Int, Int)] =
    pngDims(p).map { case (w, h) => ("png", w, h) }
      .orElse(gifDims(p).map { case (w, h) => ("gif", w, h) })
      .orElse(jpegDims(p).map { case (w, h) => ("jpeg", w, h) })
}
