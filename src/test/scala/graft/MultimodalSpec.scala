package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.multimodal.Multimodal
import graft.multimodal.Multimodal.MediaRow

/** Multimodal plumbing: schema, partition-wise batch shape, and the
  * deterministic stub decoder's feature contract.
  */
class MultimodalSpec extends AnyFunSuite {
  lazy val spark: SparkSession = TestSpark.session

  test("feature extraction is deterministic and shape-correct") {
    import spark.implicits._
    val media = Seq(
      MediaRow(1L, "image/fake", Array[Byte](0, 0, 64, -1)),
      MediaRow(2L, "audio/fake", "hello world".getBytes("UTF-8")),
      MediaRow(3L, "video/fake", Array.empty[Byte])).toDS()
    val f = Multimodal.extractFeatures(media).collect()
      .sortBy(_.media_id)
    assert(f.length == 3)
    assert(f.forall(_.histogram.length == Multimodal.HistBins))
    // histogram of [0,0,64,255]: bin0 gets 2, bin4 gets 1, bin15 gets 1
    val h1 = f(0).histogram
    assert(h1(0) == 0.5 && h1(4) == 0.25 && h1(15) == 0.25)
    assert(f(0).brightness == (0 + 0 + 64 + 255) / 4.0)
    // empty content: zero bytes, zero histogram, no NaN
    assert(f(2).n_bytes == 0 && !f(2).brightness.isNaN)
    // determinism across runs
    val again = Multimodal.extractFeatures(media).collect().sortBy(_.media_id)
    assert(f.map(_.brightness).toSeq == again.map(_.brightness).toSeq)
  }

  test("frame sampling emits every k-th fixed-size window") {
    import spark.implicits._
    val media = Seq(MediaRow(9L, "video/fake", (0 until 300)
      .map(_.toByte).toArray)).toDS()
    val frames = Multimodal.sampleFrames(media, frameBytes = 64, everyK = 2)
      .collect().sortBy(_.getInt(1))
    // 300 bytes → windows 0..4 (64,64,64,64,44); sampled: 0, 2, 4
    assert(frames.map(_.getInt(1)).toSeq == Seq(0, 2, 4))
    assert(frames.map(_.getInt(2)).toSeq == Seq(64, 64, 44))
  }

  test("documents-backed media table has the binary schema") {
    val media = Multimodal.mediaFromDocuments(spark, "/root/testdata/sf0.001")
    val schema = media.schema
    assert(schema("content").dataType ==
      org.apache.spark.sql.types.BinaryType)
    assert(media.count() == 500)
  }
}
