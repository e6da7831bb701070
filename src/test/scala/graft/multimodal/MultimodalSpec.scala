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
