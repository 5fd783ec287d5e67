package graft

import graft.queries.Multimodal
import graft.queries.Multimodal.StubDecoder

class MultimodalSpec extends SparkSpec {

  test("stub decoder: deterministic dims, histogram argmax, intensity") {
    val hist = new Array[Long](16)
    val bytes = "aaaaAAAA".getBytes("UTF-8") // 'a'=0x61 bin 6, 'A'=0x41 bin 4
    val f = StubDecoder.decode(bytes, hist)
    assert(f.width == 64 + 8 && f.height == 64)
    assert(f.n_frames == 1 && f.sampled_frames == 1)
    assert(f.top_bin == 4 || f.top_bin == 6) // 4 each; argmax keeps first max
    assert(f.top_bin == 4)                   // bin 4 seen first in scan order
    val expected = (0x61 * 4 + 0x41 * 4).toDouble / 8 / 255.0
    assert(math.abs(f.intensity - expected) < 1e-12)
    // empty payload is safe
    val empty = StubDecoder.decode(Array.empty[Byte], hist)
    assert(empty.intensity == 0.0 && empty.n_frames == 1)
  }

  test("m1 metadata: modality cycle, byte lengths match n_chars (ascii corpus)") {
    val rows = Multimodal.m1MultimodalMeta(spark, sfDir).collect()
    assert(rows.length == 500)
    rows.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      val mt = r.getAs[String]("media_type")
      assert(mt == Seq("image", "audio", "video")((id % 3).toInt))
      assert(r.getAs[String]("checksum").matches("[0-9a-f]{32}"))
      assert(r.getAs[Int]("byte_len") > 0)
    }
  }

  test("m2 decode features: one row per doc, bounded intensity, " +
       "frame sampling is ceil(n/10)") {
    val rows = Multimodal.m2DecodeFeatures(spark, sfDir).collect()
    assert(rows.length == 500)
    rows.foreach { r =>
      val i = r.getAs[Double]("intensity")
      assert(i > 0.0 && i < 1.0) // ascii text bytes
      val n = r.getAs[Int]("n_frames")
      assert(r.getAs[Int]("sampled_frames") == (n + 9) / 10)
      assert(r.getAs[Int]("width") >= 64 && r.getAs[Int]("width") < 128)
    }
  }
}
