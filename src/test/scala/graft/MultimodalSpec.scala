package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.multimodal.Multimodal
import graft.multimodal.Multimodal.MediaRow

/** Multimodal plumbing: schema, partition-wise batch shape, the
  * passthrough path's feature contract, and the REAL JDK codecs
  * (PNG/BMP/JPEG luma, WAV PCM) against hand-computed pixels/samples.
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

  private def encodeImage(fmt: String): Array[Byte] = {
    // 4×2 image with known colors: luma(255,255,255)=255, (0,0,0)=0,
    // red=76, green=149, blue=29, gray128=128
    val img = new java.awt.image.BufferedImage(4, 2,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    val px = Seq(0xffffff, 0x000000, 0xff0000, 0x00ff00,
      0x0000ff, 0x808080, 0xffffff, 0x000000)
    for ((p, i) <- px.zipWithIndex) img.setRGB(i % 4, i / 4, p)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, fmt, bos)
    bos.toByteArray
  }

  test("PNG and BMP decode to exact ITU-601 luma pixels") {
    val wantLuma = Seq(255, 0, 76, 149, 29, 128, 255, 0)
    for (f <- Seq("png", "bmp")) {
      val decoded = Multimodal.MediaDecoder.decode(s"image/$f", encodeImage(f))
      assert(decoded.map(_ & 0xff).toSeq == wantLuma, s"format $f")
    }
  }

  test("JPEG decodes to the pixel grid (values lossy, shape exact)") {
    val decoded = Multimodal.MediaDecoder.decode("image/jpeg", encodeImage("jpg"))
    assert(decoded.length == 8)
  }

  test("WAV PCM16 decodes to 8-bit unsigned samples") {
    import javax.sound.sampled._
    val samples = Seq[Short](0, Short.MinValue, Short.MaxValue, 256, -256)
    val pcm = new Array[Byte](samples.size * 2)
    for ((s, i) <- samples.zipWithIndex) {
      pcm(2 * i) = (s & 0xff).toByte; pcm(2 * i + 1) = (s >> 8).toByte
    }
    val fmt = new AudioFormat(AudioFormat.Encoding.PCM_SIGNED,
      8000f, 16, 1, 2, 8000f, false)
    val bos = new java.io.ByteArrayOutputStream()
    AudioSystem.write(new AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, samples.size),
      AudioFileFormat.Type.WAVE, bos)
    val decoded = Multimodal.MediaDecoder.decode("audio/wav", bos.toByteArray)
    // high byte + 128: 0→128, -32768→0, 32767→255, 256→129, -256→127
    assert(decoded.map(_ & 0xff).toSeq == Seq(128, 0, 255, 129, 127))
  }

  test("resize: nearest-neighbor luma grid, integer index math, quarantine") {
    import spark.implicits._
    val media = Seq(
      MediaRow(1L, "image/png", encodeImage("png")),
      MediaRow(2L, "image/png", Array[Byte](9, 9))).toDS()
    val out = Multimodal.resizeImages(media, 2, 2).collect()
      .sortBy(_.getLong(0))
    // 4×2 source → 2×2: sx = x·4/2 picks columns {0, 2}, sy rows
    // {0, 1} → luma (255, 76) / (29, 255) from the known fixture
    assert(out(0).getInt(1) == 2 && out(0).getInt(2) == 2)
    assert(out(0).getAs[Array[Byte]]("pixels").map(_ & 0xff).toSeq
      == Seq(255, 76, 29, 255))
    assert(out(0).getBoolean(4))
    // corrupt bytes quarantine (flagged empty row), strict throws
    assert(!out(1).getBoolean(4) &&
      out(1).getAs[Array[Byte]]("pixels").isEmpty)
    intercept[org.apache.spark.SparkException] {
      Multimodal.resizeImages(media, 2, 2, strict = true).collect()
    }
    // upscale is the same integer rule (no interpolation invented)
    val up = Multimodal.resizeImages(media.filter(_.media_id == 1L), 8, 2)
      .collect()(0).getAs[Array[Byte]]("pixels")
    assert(up.length == 16)
    assert(up.map(_ & 0xff).take(8).toSeq
      == Seq(255, 255, 0, 0, 76, 76, 149, 149))
    // mixed-modality contract: non-image rows are EXCLUDED, not
    // quarantined — decode_ok=false must mean "corrupt image" only,
    // and strict mode must not abort on a perfectly valid WAV row
    val mixed = media.union(Seq(
      MediaRow(3L, "audio/wav", Array[Byte](1, 2, 3))).toDS())
    val ids = Multimodal.resizeImages(mixed, 2, 2, strict = false)
      .collect().map(_.getLong(0)).toSet
    assert(ids == Set(1L, 2L))
  }

  test("corrupt media is quarantined leniently, throws only in strict mode") {
    import spark.implicits._
    val junk = Array[Byte](1, 2, 3, 4) // not a PNG, not a WAV
    // lenient decode seam: null, never a throw
    assert(Multimodal.MediaDecoder.decode("image/png", junk) == null)
    assert(Multimodal.MediaDecoder.decode("audio/wav", junk) == null)
    intercept[Exception] {
      Multimodal.MediaDecoder.decode("image/png", junk, strict = true)
    }
    // pipeline: the corrupt row survives as a flagged zero-feature row
    // next to a good one — one bad file must not kill the partition
    val media = Seq(
      MediaRow(1L, "image/png", encodeImage("png")),
      MediaRow(2L, "image/png", junk)).toDS()
    val f = Multimodal.extractFeatures(media).collect().sortBy(_.media_id)
    assert(f.map(_.decode_ok).toSeq == Seq(true, false))
    assert(f(1).n_bytes == 0 && f(1).brightness == 0.0)
    intercept[org.apache.spark.SparkException] {
      Multimodal.extractFeatures(media, strict = true).collect()
    }
  }

  test("real decode flows through the partition-wise feature extraction") {
    import spark.implicits._
    val media = Seq(MediaRow(1L, "image/png", encodeImage("png"))).toDS()
    val f = Multimodal.extractFeatures(media).collect().head
    assert(f.n_bytes == 8) // 8 pixels, not the (larger) PNG byte count
    assert(f.brightness == (255 + 0 + 76 + 149 + 29 + 128 + 255 + 0) / 8.0)
  }
}
