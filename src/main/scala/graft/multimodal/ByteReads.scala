package graft.multimodal

/** Shared byte-field readers for the container header parsers. All sizes
  * read as UNSIGNED values into Long — a 32-bit size field truncated to a
  * signed Int is how a corrupt payload turns a header probe into an
  * infinite loop (advance of 0/negative) or an ArrayIndexOutOfBounds;
  * callers must do offset arithmetic in Long and bail to None when an
  * advance would not strictly increase. */
private[multimodal] object ByteReads {
  def u8(b: Array[Byte], i: Int): Int = b(i) & 0xff
  def le16(b: Array[Byte], i: Int): Int = u8(b, i) | (u8(b, i + 1) << 8)
  def be16(b: Array[Byte], i: Int): Int = (u8(b, i) << 8) | u8(b, i + 1)
  def le32(b: Array[Byte], i: Int): Long =
    u8(b, i).toLong | (u8(b, i + 1).toLong << 8) |
      (u8(b, i + 2).toLong << 16) | (u8(b, i + 3).toLong << 24)
  def be32(b: Array[Byte], i: Int): Long =
    (u8(b, i).toLong << 24) | (u8(b, i + 1) << 16) | (u8(b, i + 2) << 8) | u8(b, i + 3)
  def be64(b: Array[Byte], i: Int): Long =
    (be32(b, i) << 32) | be32(b, i + 4)
  def tag(b: Array[Byte], i: Int, t: String): Boolean =
    b(i) == t(0) && b(i + 1) == t(1) && b(i + 2) == t(2) && b(i + 3) == t(3)
}
