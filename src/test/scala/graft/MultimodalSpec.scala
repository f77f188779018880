package graft

import graft.multimodal.Multimodal
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {
  test("media table carries binary payloads with typed metadata") {
    val media = Multimodal.mediaFromDocuments(spark, sf)
    val r = media.head()
    assert(r.payload.nonEmpty && r.mime == "text/plain"
      && r.n_bytes == r.payload.length)
  }

  test("feature extraction is partition-parallel, deterministic, 4-dim") {
    val media = Multimodal.mediaFromDocuments(spark, sf).repartition(7)
    val f1 = Multimodal.extractFeatures(media).collect()
      .map(f => f.media_id -> f.features.toSeq).toMap
    val f2 = Multimodal.extractFeatures(media.repartition(3)).collect()
      .map(f => f.media_id -> f.features.toSeq).toMap
    assert(f1 == f2, "features must not depend on partitioning")
    assert(f1.values.forall(_.length == 4))
  }

  test("frame sampling stride yields ceil(blocks/stride) frames") {
    val payload = Array.fill[Byte](300)(1)
    val frames = Multimodal.MediaCodec.sampleFrames(payload, 2)
    // 300 bytes -> 5 blocks of 64 -> indices 0,2,4 survive stride 2
    assert(frames.length == 3)
  }

  test("sampled frame hashes carry original block indices and content md5") {
    import spark.implicits._
    // 150 bytes → blocks [0,64) [64,128) [128,150); stride 2 keeps 0, 2
    val payload = ("a" * 64 + "b" * 64 + "c" * 22).getBytes("UTF-8")
    val media = Seq(Multimodal.MediaRow(7L, payload, "text/plain", 150L)).toDS()
    val frames = Multimodal.sampleFrameHashes(media, stride = 2)
      .collect().sortBy(_.frame_idx)
    assert(frames.map(f => (f.frame_idx, f.n_frame_bytes)).toSeq ==
      Seq((0, 64), (2, 22)))
    val md = java.security.MessageDigest.getInstance("MD5")
    def hex(s: String) =
      md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(frames(0).frame_md5 == hex("a" * 64))
    assert(frames(1).frame_md5 == hex("c" * 22))
  }

  test("decode stub derives features from byte statistics") {
    val f = Multimodal.MediaCodec.decode("abc".getBytes("UTF-8"))
    assert(f.toSeq == Seq(3.0f, ((97 + 98 + 99) / 3.0).toFloat, 97.0f, 99.0f))
  }
}
