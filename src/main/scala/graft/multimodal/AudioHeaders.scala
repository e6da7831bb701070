package graft.multimodal

/** REAL audio-container header parsing — no codec library required, the
  * WAV/RIFF sibling of [[ImageHeaders]]: sample rate, channel count, and
  * declared duration live in fixed-layout `fmt `/`data` chunk headers, so
  * audio metadata extraction over a `binary` column (filter by sample
  * rate, bucket by duration) is exact without decoding a single sample —
  * the pass a training pipeline runs over the full corpus before any
  * resample/feature step.
  *
  * Layout: `RIFF` + riff-size (le32) + `WAVE`, then a chunk walk of
  * `[id:4][size:le32][data:size (+1 pad if odd)]` records; `fmt ` carries
  * audio-format/channels (le16) + sample-rate/byte-rate (le32); `data`
  * declares the payload size, which over byte-rate gives duration.
  */
object AudioHeaders {

  final case class WavInfo(sampleRate: Int, channels: Int, durationMs: Long)

  import ByteReads._

  /** Walk the RIFF chunk list for `fmt ` + `data`. Returns None on a
    * non-WAV or truncated-before-metadata payload. The data chunk's BYTES
    * need not be present (probing the head of a large object reads only
    * the declared size) — but the fmt fields and the data size field
    * must be. Offset arithmetic stays in Long: a corrupt unsigned 32-bit
    * chunk size truncated to Int would advance by 0/negative (infinite
    * loop) or overflow the index (AIOOBE) — here it just walks past the
    * end and returns None. */
  def wavInfo(p: Array[Byte]): Option[WavInfo] = {
    if (p.length < 12 || !tag(p, 0, "RIFF") || !tag(p, 8, "WAVE")) return None
    var i = 12L
    var rate = -1L
    var channels = -1
    var byteRate = -1L
    var dataSize = -1L
    while (i + 8 <= p.length && (rate < 0 || dataSize < 0)) {
      val at = i.toInt // safe: i + 8 <= p.length <= Int.MaxValue
      val size = le32(p, at + 4) // unsigned, up to 0xFFFFFFFF
      if (tag(p, at, "fmt ")) {
        if (size < 16 || i + 8 + 16 > p.length) return None
        channels = le16(p, at + 10)
        rate = le32(p, at + 12)
        byteRate = le32(p, at + 16)
      } else if (tag(p, at, "data")) dataSize = size
      // chunks are word-aligned: odd sizes carry one pad byte
      i += 8L + size + (size & 1L)
    }
    if (rate > 0 && channels > 0 && byteRate > 0 && dataSize >= 0)
      Some(WavInfo(rate.toInt, channels, dataSize * 1000L / byteRate))
    else None
  }

  final case class PcmAudio(info: WavInfo, samples: Array[Short])

  /** REAL sample decode for 16-bit PCM WAV (audio format 1, the q91 gate
    * kernel): the `data` chunk's bytes are interleaved signed LE16 frames,
    * so "decoding" is exact little-endian sample extraction — no lossy
    * codec involved, which is precisely why a pure-JVM implementation is
    * complete for this subset. Unlike [[wavInfo]] (a header probe that
    * tolerates a missing data body), this requires every declared sample
    * byte to be present, the declared size to be even, and the PCM
    * format/bit-depth fields to match; anything else is None, never a
    * throw. */
  def pcm16(p: Array[Byte]): Option[PcmAudio] = {
    if (p.length < 12 || !tag(p, 0, "RIFF") || !tag(p, 8, "WAVE")) return None
    var i = 12L
    var info: Option[WavInfo] = None
    var fmtOk = false
    while (i + 8 <= p.length) {
      val at = i.toInt
      val size = le32(p, at + 4)
      if (tag(p, at, "fmt ")) {
        if (size < 16 || i + 8 + 16 > p.length) return None
        fmtOk = le16(p, at + 8) == 1 && le16(p, at + 22) == 16 // PCM, 16-bit
        val channels = le16(p, at + 10)
        val rate = le32(p, at + 12)
        val byteRate = le32(p, at + 16)
        if (channels <= 0 || rate <= 0 || byteRate <= 0) return None
        info = Some(WavInfo(rate.toInt, channels, 0L))
      } else if (tag(p, at, "data")) {
        val inf = info.getOrElse(return None) // fmt must precede data
        if (!fmtOk || (size & 1L) == 1L) return None
        if (i + 8 + size > p.length) return None // body must be present
        val n = (size / 2L).toInt
        val out = new Array[Short](n)
        var j = 0
        while (j < n) {
          out(j) = le16(p, at + 8 + j * 2).toShort
          j += 1
        }
        val byteRate = inf.sampleRate.toLong * inf.channels * 2
        return Some(PcmAudio(
          inf.copy(durationMs = size * 1000L / byteRate), out))
      }
      i += 8L + size + (size & 1L)
    }
    None
  }
}
