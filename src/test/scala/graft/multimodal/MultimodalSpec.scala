package graft.multimodal

import graft.SparkTestBase
import graft.multimodal.Multimodal._

class MultimodalSpec extends SparkTestBase {
  import spark.implicits._

  private def payload(id: Long, n: Int): Array[Byte] =
    Array.tabulate(n)(i => ((id * 31 + i) % 256).toByte)

  private lazy val media = Seq(
    MediaRow(1L, "image", payload(1, 1024), 640, 480, 0L),
    MediaRow(2L, "image", payload(2, 4096), 1920, 1080, 0L),
    MediaRow(3L, "audio", payload(3, 2048), 44100, 2, 5000L),
    MediaRow(4L, "video", payload(4, 8192), 1280, 720, 10000L),
    MediaRow(5L, "image", Array.emptyByteArray, 1, 1, 0L)).toDS()

  test("feature extraction: schema, width, determinism, empty payload") {
    val feats = extractFeatures(media).collect().sortBy(_.media_id)
    assert(feats.map(_.media_id).toSeq == Seq(1L, 2L, 3L, 4L, 5L))
    assert(feats.forall(_.feature.length == FeatureDim))
    assert(feats.find(_.media_id == 5L).get.feature.forall(_ == 0.0f))
    // deterministic: same input → identical vectors on re-run
    val again = extractFeatures(media).collect().sortBy(_.media_id)
    assert(feats.map(_.feature.toSeq).toSeq == again.map(_.feature.toSeq).toSeq)
    assert(feats.map(_.n_bytes).toSeq == Seq(1024L, 4096L, 2048L, 8192L, 0L))
  }

  test("resize caps the longer side and keeps metadata consistent") {
    val resized = resize(media, maxSide = 960).collect().sortBy(_.media_id)
    val big = resized.find(_.media_id == 2L).get
    assert(math.max(big.width, big.height) == 960)
    assert(big.width == 960 && big.height == 540)
    assert(big.payload.length < 4096)
    // non-images and already-small images untouched
    assert(resized.find(_.media_id == 3L).get.payload.length == 2048)
    assert(resized.find(_.media_id == 1L).get.width == 640)
  }

  test("frame sampling keeps every stride-th chunk of video payloads only") {
    val frames = sampleFrames(media, frameSize = 1024, stride = 2).collect()
    assert(frames.forall(_.getLong(0) == 4L))
    // 8192/1024 = 8 chunks, stride 2 → frames 0,2,4,6
    assert(frames.map(_.getInt(1)).sorted.toSeq == Seq(0, 2, 4, 6))
  }

  // genuine container bytes, built field by field from the format specs
  private def pngBytes(w: Int, h: Int): Array[Byte] = {
    val sig = Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)
    val ihdrLen = Array(0, 0, 0, 13).map(_.toByte)
    val ihdr = "IHDR".getBytes ++
      Array(w >> 24, w >> 16, w >> 8, w).map(_.toByte) ++
      Array(h >> 24, h >> 16, h >> 8, h).map(_.toByte) ++
      Array[Byte](8, 6, 0, 0, 0) // bit depth, color type, ...
    sig ++ ihdrLen ++ ihdr ++ Array[Byte](0, 0, 0, 0)
  }
  private def gifBytes(w: Int, h: Int): Array[Byte] =
    "GIF89a".getBytes ++
      Array(w & 0xff, w >> 8, h & 0xff, h >> 8, 0, 0, 0).map(_.toByte)
  private def jpegBytes(w: Int, h: Int): Array[Byte] = {
    val soi = Array(0xff, 0xd8).map(_.toByte)
    // APP0/JFIF segment before the frame header, as real encoders emit
    val app0 = Array(0xff, 0xe0, 0, 16).map(_.toByte) ++
      "JFIF".getBytes ++ Array[Byte](0, 1, 1, 0, 0, 1, 0, 1, 0, 0)
    val sof0 = Array(0xff, 0xc0, 0, 17, 8,
      h >> 8, h & 0xff, w >> 8, w & 0xff, 3).map(_.toByte) ++
      Array[Byte](1, 0x11, 0, 2, 0x11, 1, 3, 0x11, 1)
    soi ++ app0 ++ sof0
  }

  test("header probe parses real PNG/GIF/JPEG container bytes") {
    assert(ImageHeaders.dims(pngBytes(640, 480)).contains(("png", 640, 480)))
    assert(ImageHeaders.dims(gifBytes(320, 200)).contains(("gif", 320, 200)))
    assert(ImageHeaders.dims(jpegBytes(1920, 1080)).contains(("jpeg", 1920, 1080)))
    // dimensions above one byte exercise the endianness handling
    assert(ImageHeaders.dims(pngBytes(70000, 3)).contains(("png", 70000, 3)))
    assert(ImageHeaders.dims(jpegBytes(258, 515)).contains(("jpeg", 258, 515)))
    // garbage, truncation, empty → None, never a crash
    assert(ImageHeaders.dims(payload(9, 64)).isEmpty)
    assert(ImageHeaders.dims(pngBytes(640, 480).take(20)).isEmpty)
    assert(ImageHeaders.dims(Array.emptyByteArray).isEmpty)
    val probed = probeDimensions(Seq(
        MediaRow(1L, "image", pngBytes(12, 34), 0, 0, 0L),
        MediaRow(2L, "image", jpegBytes(56, 78), 0, 0, 0L),
        MediaRow(3L, "image", payload(3, 100), 0, 0, 0L)).toDS())
      .collect().sortBy(_.media_id)
    assert(probed(0) == ProbedDims(1L, Some("png"), Some(12), Some(34)))
    assert(probed(1) == ProbedDims(2L, Some("jpeg"), Some(56), Some(78)))
    assert(probed(2) == ProbedDims(3L, None, None, None))
  }

  test("PNG dimensions via pure column expressions match the JVM parser") {
    import org.apache.spark.sql.functions.col
    val df = Seq((1L, pngBytes(800, 600)), (2L, gifBytes(10, 10)),
        (3L, pngBytes(65537, 2)))
      .toDF("media_id", "payload")
      .select(col("media_id"), pngDimsCol(col("payload")).as("dims"))
      .collect().map(r => r.getLong(0) ->
        Option(r.getStruct(1)).map(s => (s.getInt(0), s.getInt(1)))).toMap
    assert(df(1L).contains((800, 600)))
    assert(df(2L).isEmpty) // non-PNG → null, no misparse
    assert(df(3L).contains((65537, 2)))
  }

  // genuine RIFF/WAVE bytes, built chunk by chunk from the format spec
  private def le16b(v: Int) = Array(v & 0xff, (v >> 8) & 0xff).map(_.toByte)
  private def le32b(v: Long) = Array(v & 0xff, (v >> 8) & 0xff,
    (v >> 16) & 0xff, (v >> 24) & 0xff).map(_.toByte)
  private def wavBytes(rate: Int, ch: Int, dataSize: Long,
      extraChunkBefore: Option[Int] = None): Array[Byte] = {
    val fmt = "fmt ".getBytes ++ le32b(16) ++ le16b(1) ++ le16b(ch) ++
      le32b(rate) ++ le32b(rate.toLong * ch * 2) ++ le16b(ch * 2) ++ le16b(16)
    val extra = extraChunkBefore.map(n =>
      "LIST".getBytes ++ le32b(n) ++ Array.fill(n + (n & 1))(0x20.toByte))
      .getOrElse(Array.emptyByteArray)
    val data = "data".getBytes ++ le32b(dataSize)
    val body = "WAVE".getBytes ++ extra ++ fmt ++ data
    "RIFF".getBytes ++ le32b(body.length.toLong) ++ body
  }

  test("WAV probe walks real RIFF chunks: rate, channels, duration") {
    import AudioHeaders.{wavInfo, WavInfo}
    assert(wavInfo(wavBytes(44100, 2, 176400L))
      .contains(WavInfo(44100, 2, 1000L))) // 1 s of 44.1k stereo 16-bit
    assert(wavInfo(wavBytes(8000, 1, 4000L))
      .contains(WavInfo(8000, 1, 250L)))
    // a preceding chunk (LIST/INFO metadata) must be skipped, including
    // the odd-size word-alignment pad byte
    assert(wavInfo(wavBytes(16000, 1, 8000L, extraChunkBefore = Some(7)))
      .contains(WavInfo(16000, 1, 250L)))
    // truncations and garbage → None, never a crash
    val full = wavBytes(44100, 2, 176400L)
    assert(wavInfo(full.take(11)).isEmpty) // inside the RIFF header
    assert(wavInfo(full.take(30)).isEmpty) // inside the fmt chunk
    assert(wavInfo(full.dropRight(6)).isEmpty) // data size field cut
    assert(wavInfo("RIFFxxxxWAVE".getBytes).isEmpty) // no chunks at all
    assert(wavInfo(payload(7, 64)).isEmpty)
    assert(wavInfo(Array.emptyByteArray).isEmpty)
    // header-only payloads (probing the head of a large object) parse:
    // the data chunk declares its size, its bytes need not be present
    assert(wavInfo(wavBytes(22050, 1, 441000L))
      .contains(WavInfo(22050, 1, 10000L)))
  }

  test("MP4 probe walks real ISO-BMFF boxes: timescale, duration, truncation") {
    import VideoHeaders.{mp4Info, Mp4Info}
    val p = graft.multimodal.MediaSynth.payload(4L) // kind 4 = MP4
    val info = mp4Info(p)
    assert(info.contains(Mp4Info(1000L, 185L))) // doc 4: ts 1000, 5*37 units
    assert(info.get.durationMs == 185L)
    // truncations and garbage → None, never a crash
    assert(mp4Info(p.take(30)).isEmpty) // inside moov, before mvhd payload
    assert(mp4Info(p.take(40)).isEmpty) // inside mvhd, before duration
    assert(mp4Info(p.take(12)).isEmpty)
    assert(mp4Info("1234ftyp".getBytes).isEmpty) // header only, no moov
    assert(mp4Info(payload(11, 64)).isEmpty)
    assert(mp4Info(Array.emptyByteArray).isEmpty)
  }

  test("PCM sample decode round-trips the synthetic WAV corpus exactly") {
    import AudioHeaders.pcm16
    for (id <- 0L to 29L) {
      val p = MediaSynth.pcmWav(id)
      // the header probe still reads the same file (body now present)
      val probe = AudioHeaders.wavInfo(p).get
      assert(probe.sampleRate == MediaSynth.pcmRate(id))
      assert(probe.channels == MediaSynth.pcmChannels(id))
      val a = pcm16(p).get
      assert(a.info.sampleRate == probe.sampleRate)
      assert(a.info.channels == probe.channels)
      assert(a.info.durationMs == probe.durationMs)
      val n = MediaSynth.pcmFrames(id) * MediaSynth.pcmChannels(id)
      assert(a.samples.length == n)
      (0 until n).foreach(i =>
        assert(a.samples(i) == MediaSynth.pcmSample(id, i).toShort, s"doc $id sample $i"))
      // body truncations never parse and never throw (pcm16 needs the
      // full declared data, unlike the header probe)
      Seq(p.length - 1, p.length - 2, 44, 20, 3).foreach(k =>
        assert(pcm16(p.take(k)).isEmpty, s"doc $id truncation $k"))
    }
    // non-PCM format code and non-16-bit depth are out of subset
    val good = MediaSynth.pcmWav(1L)
    val floatFmt = good.clone(); floatFmt(20) = 3 // fmt code: IEEE float
    assert(pcm16(floatFmt).isEmpty)
    val bits8 = good.clone(); bits8(34) = 8
    assert(pcm16(bits8).isEmpty)
    // the header-only (body-absent) q73 payloads probe but don't decode
    assert(pcm16(MediaSynth.payload(3L)).isEmpty)
    assert(AudioHeaders.wavInfo(MediaSynth.payload(3L)).nonEmpty)
  }

  test("PCM ops: decimate keeps every k-th frame, wavBytes round-trips") {
    import AudioHeaders.{pcm16, PcmAudio, WavInfo}
    // 2 channels, 5 frames: sample (f, c) = f*10 + c
    val src = PcmAudio(WavInfo(8000, 2, 0L),
      Array.tabulate[Short](10)(i => ((i / 2) * 10 + i % 2).toShort))
    val d = AudioOps.decimate(src, channels = 2, factor = 2)
    // frames 0, 2, 4 survive, both channels each
    assert(d.samples.toSeq == Seq[Short](0, 1, 20, 21, 40, 41))
    assert(d.info.sampleRate == 4000)
    // container round trip: encode + decode restores samples and metadata
    val rt = pcm16(AudioOps.wavBytes(d.info, d.samples, 2)).get
    assert(rt.samples.toSeq == d.samples.toSeq)
    assert(rt.info.sampleRate == 4000 && rt.info.channels == 2)
    // identity factor
    val same = AudioOps.decimate(src, 2, 1)
    assert(same.samples.toSeq == src.samples.toSeq)
    // windowed energy: 2-frame windows over 5 frames → sizes 2,2,1
    val e = AudioOps.windowedEnergy(src, channels = 2, windowFrames = 2)
    assert(e.map(_.nFrames) == Seq(2, 2, 1))
    assert(e.map(_.window_id) == Seq(0, 1, 2))
    assert(e.head.sumSq == 0L + 1 + 100 + 121) // 0²+1²+10²+11²
    assert(e.forall(_.nNeg == 0L))
    val neg = AudioOps.windowedEnergy(
      PcmAudio(WavInfo(8000, 1, 0L), Array[Short](-3, 4)), 1, 2)
    assert(neg.head.sumSq == 25L && neg.head.nNeg == 1L)
  }

  test("MP4 probe rejects mvhd fields that would arm durationMs") {
    import VideoHeaders.mp4Info
    def hexBytes(hx: String): Array[Byte] =
      Array.tabulate(hx.length / 2)(i =>
        Integer.parseInt(hx.substring(i * 2, i * 2 + 2), 16).toByte)
    // well-framed v0 mvhd with timescale=0: structurally valid, but
    // durationMs would divide by zero in an executor task → must be None
    def mp4v0(tsHex: String, durHex: String) = hexBytes(
      "00000014" + "66747970" + "69736F6D" + "00000200" + "69736F6D" +
        "00000074" + "6D6F6F76" +
        "0000006C" + "6D766864" + "00000000" + "00000000" + "00000000" +
        tsHex + durHex + "0" * 160)
    assert(mp4Info(mp4v0("00000000", "000000B9")).isEmpty) // timescale 0
    assert(mp4Info(mp4v0("000003E8", "000000B9")).nonEmpty) // control
    // v1 mvhd (be64 times): a duration that overflows durationUnits*1000L
    // must be rejected; a sane v1 duration parses
    def mp4v1(tsHex: String, dur64Hex: String) = hexBytes(
      "00000014" + "66747970" + "69736F6D" + "00000200" + "69736F6D" +
        "00000080" + "6D6F6F76" +
        "00000078" + "6D766864" + "01000000" +
        "0000000000000000" + "0000000000000000" + // be64 create/modify
        tsHex + dur64Hex + "0" * 160)
    assert(mp4v1("000003E8", "00000000000000B9").length > 48)
    assert(mp4Info(mp4v1("000003E8", "00000000000000B9"))
      .exists(m => m.durationUnits == 185L && m.durationMs == 185L))
    assert(mp4Info(mp4v1("000003E8", "7FFFFFFFFFFFFFFF")).isEmpty) // *1000 overflow
    assert(mp4Info(mp4v1("000003E8", "FFFFFFFFFFFFFFFF")).isEmpty) // negative
    assert(mp4Info(mp4v1("00000000", "00000000000000B9")).isEmpty) // v1 ts 0
  }

  test("raw-video frame extraction resolves the real sample table") {
    import VideoHeaders.rawVideoFrames
    for (id <- 0L to 29L) {
      val p = MediaSynth.rawVideoMp4(id)
      // the mvhd probe reads the same file
      val probe = VideoHeaders.mp4Info(p).get
      assert(probe.timescale == MediaSynth.mp4Timescale(id))
      val rv = rawVideoFrames(p).get
      assert(rv.width == MediaSynth.videoWidth(id))
      assert(rv.height == MediaSynth.videoHeight(id))
      assert(rv.frames.size == MediaSynth.videoFrames(id))
      rv.frames.zipWithIndex.foreach { case (frame, f) =>
        assert(frame.length == rv.width * rv.height * 3)
        for (y <- 0 until rv.height; x <- 0 until rv.width; c <- 0 until 3)
          assert((frame((y * rv.width + x) * 3 + c) & 0xff) ==
            MediaSynth.videoPixel(id, f, x, y, c), s"doc $id frame $f ($x,$y,$c)")
      }
      // truncations parse to None, never a throw (mdat cut → offsets
      // out of bounds; moov cut → table unreadable)
      Seq(p.length - 1, p.length / 2, 40, 12, 0).foreach(k =>
        assert(rawVideoFrames(p.take(k)).isEmpty, s"doc $id truncation $k"))
    }
    // a compressed track (avc1 sample format) is out of subset, not a crash
    val comp = MediaSynth.rawVideoMp4(5L)
    val idx = {
      val raw = "raw ".getBytes("US-ASCII")
      (0 until comp.length - 4).find(i => raw.indices.forall(j => comp(i + j) == raw(j))).get
    }
    "avc1".getBytes("US-ASCII").zipWithIndex.foreach { case (b, j) => comp(idx + j) = b }
    assert(VideoHeaders.rawVideoFrames(comp).isEmpty)
    // header-only q73 payloads have no sample table
    assert(VideoHeaders.rawVideoFrames(MediaSynth.payload(4L)).isEmpty)
  }

  test("predicted-track decode reconstructs through the residual chain") {
    import VideoHeaders.predictedVideoFrames
    for (id <- 0L to 29L) {
      val p = MediaSynth.predVideoMp4(id)
      val rv = predictedVideoFrames(p).get
      assert(rv.width == MediaSynth.videoWidth(id))
      assert(rv.frames.size == MediaSynth.videoFrames(id))
      // every frame equals base + cumulative residuals (the closed form)
      rv.frames.zipWithIndex.foreach { case (frame, f) =>
        for (y <- 0 until rv.height; x <- 0 until rv.width; c <- 0 until 3) {
          val want = MediaSynth.pvBase(id, x, y, c) +
            (1 to f).map(MediaSynth.pvResidual(x, y, c, _)).sum
          assert((frame((y * rv.width + x) * 3 + c) & 0xff) == want,
            s"doc $id frame $f ($x,$y,$c)")
        }
      }
      // truncations parse to None, never a throw
      Seq(p.length - 1, p.length / 2, 40, 0).foreach(k =>
        assert(predictedVideoFrames(p.take(k)).isEmpty))
    }
    // frames genuinely depend on PRIOR samples: perturbing one residual
    // byte in sample 1 must change every later frame at that position
    val id = 7L
    val clean = predictedVideoFrames(MediaSynth.predVideoMp4(id)).get
    assert(clean.frames.size >= 3)
    val tampered = MediaSynth.predVideoMp4(id)
    // locate sample 1 in mdat: frames are back to back after sample 0
    val frameBytes = clean.width * clean.height * 3
    val mdatAt = {
      val tag = "mdat".getBytes("US-ASCII")
      (0 until tampered.length - 4).find(i =>
        tag.indices.forall(j => tampered(i + j) == tag(j))).get + 4
    }
    val s1 = mdatAt + frameBytes // first byte of sample 1 (residual of (0,0,0))
    tampered(s1) = (tampered(s1) - 1).toByte
    val dirty = predictedVideoFrames(tampered).get
    // frame 0 untouched; frames 1.. all shifted by the same -1 at (0,0,0)
    assert(dirty.frames(0).sameElements(clean.frames(0)))
    (1 until clean.frames.size).foreach { f =>
      assert((dirty.frames(f)(0) & 0xff) == (clean.frames(f)(0) & 0xff) - 1,
        s"frame $f did not inherit the perturbed residual")
    }
    // residuals that push a pixel past 255 mark the payload corrupt →
    // None, never a silently clamped frame (base(7,0,0,0)=7; +127+127
    // overflows on the third frame)
    val boom = MediaSynth.predVideoMp4(id)
    boom(mdatAt + frameBytes) = 127
    boom(mdatAt + 2 * frameBytes) = 127
    assert(predictedVideoFrames(boom).isEmpty)
  }

  test("frame sampling extracts real frames for uncompressed tracks") {
    import spark.implicits._
    val id = 7L
    val p = MediaSynth.rawVideoMp4(id)
    val rows = Seq(
      MediaRow(1L, "video", p, MediaSynth.videoWidth(id),
        MediaSynth.videoHeight(id), 1000L)).toDS()
    val frames = sampleFrames(rows, frameSize = 1024, stride = 2).collect()
    val want = VideoHeaders.rawVideoFrames(p).get.frames
    assert(frames.map(_.getInt(1)).sorted.toSeq ==
      (0 until MediaSynth.videoFrames(id) by 2).toSeq)
    frames.foreach { r =>
      assert(java.util.Arrays.equals(
        r.getAs[Array[Byte]](2), want(r.getInt(1))))
    }
  }

  test("MediaSynth payloads round-trip through the real parsers") {
    import graft.multimodal.MediaSynth
    for (id <- 0L to 59L) {
      val p = MediaSynth.payload(id)
      (id % 6) match {
        case 0 => assert(ImageHeaders.dims(p).contains(
          ("png", MediaSynth.width(id), MediaSynth.height(id))))
        case 1 => assert(ImageHeaders.dims(p).contains(
          ("gif", MediaSynth.width(id), MediaSynth.height(id))))
        case 2 => assert(ImageHeaders.dims(p).contains(
          ("jpeg", MediaSynth.width(id), MediaSynth.height(id))))
        case 3 =>
          val got = AudioHeaders.wavInfo(p).get
          assert(got.sampleRate == MediaSynth.sampleRate(id))
          assert(got.channels == MediaSynth.channels(id))
          assert(got.durationMs == MediaSynth.dataBytes(id) * 1000L /
            MediaSynth.byteRate(id))
          assert(ImageHeaders.dims(p).isEmpty)
        case 4 =>
          val got = VideoHeaders.mp4Info(p).get
          assert(got.timescale == MediaSynth.mp4Timescale(id))
          assert(got.durationUnits == MediaSynth.mp4DurationUnits(id))
          assert(ImageHeaders.dims(p).isEmpty)
          assert(AudioHeaders.wavInfo(p).isEmpty)
        case _ =>
          assert(ImageHeaders.dims(p).isEmpty)
          assert(AudioHeaders.wavInfo(p).isEmpty)
          assert(VideoHeaders.mp4Info(p).isEmpty)
      }
    }
  }

  test("expression-path probe matches mapPartitions and stays in codegen") {
    // the q73 gate runs the probe as native expressions; the batch-session
    // mapPartitions twin must agree row for row
    val dir = "/root/testdata/sf0.001"
    val expr = graft.queries.MultimodalQueries.mediaProbe(spark, dir)
    val part = graft.queries.MultimodalQueries.mediaProbePartitioned(spark, dir)
    val a = expr.collect().map(_.toString).sorted
    val b = part.collect().map(_.toString).sorted
    assert(a.length > 0 && a.sameElements(b))
    val plan = expr.queryExecution.executedPlan.toString
    // all three parsers plus the synth are codegen'd expressions — no
    // object boundary (encoder deserialize/serialize) anywhere in the plan
    for (e <- Seq("image_dims", "wav_info", "mp4_info", "media_synth_payload"))
      assert(plan.contains(e), s"$e missing:\n${plan.take(2000)}")
    // `*(n)` prefixes are the WholeStageCodegen stage markers in the AQE
    // plan rendering — the probe projects must carry one
    assert(plan.contains("*(2) Project") || plan.contains("*(1) Project"),
      plan.take(2000))
    assert(!plan.contains("DeserializeToObject") &&
      !plan.contains("MapPartitions"), plan.take(2000))
  }

  test("modality partitioning co-locates media types") {
    // every media type must land in exactly one partition (hash
    // partitioning may place several types together — that's fine)
    val pairs = partitionByModality(media, 4).rdd
      .mapPartitionsWithIndex { (pid, it) =>
        it.map(m => (m.media_type, pid)).toSet.iterator
      }
      .collect()
    val typeToPartitions = pairs.groupBy(_._1).view.mapValues(_.map(_._2).toSet)
    assert(typeToPartitions.values.forall(_.size == 1), typeToPartitions.toMap)
  }
}
