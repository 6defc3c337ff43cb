package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.multimodal.Multimodal
import graft.multimodal.Multimodal.MediaRow

/** Animated-GIF frame extraction: a multi-frame GIF written through
  * the JDK's own sequence writer must round-trip through
  * `sampleGifFrames` — frame count and order, every-k sampling,
  * pixels bit-identical to `resizeImages` on single-frame GIFs of
  * the same rasters (palette colors, so encoding is exact), and the
  * corrupt-bytes quarantine at both strictness levels.
  */
class GifFramesSpec extends AnyFunSuite {
  lazy val spark: SparkSession = TestSpark.session

  private def frame(k: Int): java.awt.image.BufferedImage = {
    val img = new java.awt.image.BufferedImage(4, 3,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 3; x <- 0 until 4)
      img.setRGB(x, y, ((k * 80 + x * 10 + y) & 0xff) << 16 | (k * 31 & 0xff))
    img
  }

  private def animatedGif(frames: Seq[java.awt.image.BufferedImage])
      : Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val w = javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
    val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
    try {
      w.setOutput(ios)
      w.prepareWriteSequence(null)
      frames.foreach(f =>
        w.writeToSequence(new javax.imageio.IIOImage(f, null, null), null))
      w.endWriteSequence()
    } finally { w.dispose(); ios.close() }
    bos.toByteArray
  }

  private def singleGif(img: java.awt.image.BufferedImage): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "gif", bos)
    bos.toByteArray
  }

  private def media(rows: MediaRow*) = {
    import spark.implicits._
    spark.createDataset(rows)
  }

  private val frames = (0 until 4).map(frame)
  private val gif = animatedGif(frames)

  test("all frames extract in order, pixels bit-identical to the " +
      "single-image path") {
    val out = Multimodal.sampleGifFrames(
      media(MediaRow(9L, "image/gif", gif)), 1, 3, 2)
      .orderBy("frame_no").collect()
    assert(out.map(_.getInt(1)).toSeq == Seq(0, 1, 2, 3))
    assert(out.forall(_.getBoolean(4)))
    val expected = Multimodal.resizeImages(
      media(frames.zipWithIndex.map { case (f, i) =>
        MediaRow(i.toLong, "image/gif", singleGif(f)) }: _*), 3, 2)
      .orderBy("media_id").collect().map(_.getAs[Array[Byte]]("pixels"))
    val got = out.map(_.getAs[Array[Byte]]("pixels"))
    assert(got.zip(expected).forall { case (a, b) => a.sameElements(b) })
    assert(out.forall(_.getInt(2) == 6)) // frame_bytes = 3x2 luma grid
  }

  test("everyK samples frame indices 0, k, 2k...") {
    val out = Multimodal.sampleGifFrames(
      media(MediaRow(1L, "image/gif", gif)), 3, 2, 2)
      .orderBy("frame_no").collect()
    assert(out.map(_.getInt(1)).toSeq == Seq(0, 3))
  }

  test("sample-only decode: everyK=5 on a 10-frame GIF decodes 2 " +
      "frames, not 10 — output bit-identical to decode-everything") {
    val ten = (0 until 10).map(frame)
    val gif10 = animatedGif(ten)
    val before = Multimodal.gifFramesDecodedCount
    // collect WITHOUT orderBy: a global sort's range-partitioning
    // sample pass would run the decode lambda a second time and
    // double the probe's count
    val out = Multimodal.sampleGifFrames(
      media(MediaRow(7L, "image/gif", gif10)), 5, 3, 2)
      .collect().sortBy(_.getInt(1))
    assert(out.map(_.getInt(1)).toSeq == Seq(0, 5))
    // the probe: only the sampled indices hit reader.read — skipped
    // frames' rasters are never LZW-decoded (tests run sequentially in
    // the forked JVM, so the process-wide counter delta is exact)
    assert(Multimodal.gifFramesDecodedCount - before == 2)
    // bit-identical: each sampled frame equals its single-image render
    val expected = Multimodal.resizeImages(
      media(Seq(0, 5).map(i =>
        MediaRow(i.toLong, "image/gif", singleGif(ten(i)))): _*), 3, 2)
      .orderBy("media_id").collect().map(_.getAs[Array[Byte]]("pixels"))
    assert(out.map(_.getAs[Array[Byte]]("pixels")).zip(expected)
      .forall { case (a, b) => a.sameElements(b) })
  }

  test("non-gif rows contribute nothing; mislabeled PNG degrades to " +
      "its one frame") {
    val png = {
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(frame(2), "png", bos)
      bos.toByteArray
    }
    assert(Multimodal.sampleGifFrames(
      media(MediaRow(1L, "image/png", png)), 1, 2, 2).count() == 0)
    val out = Multimodal.sampleGifFrames(
      media(MediaRow(2L, "image/gif", png)), 1, 2, 2).collect()
    assert(out.length == 1 && out.head.getBoolean(4))
  }

  test("corrupt bytes quarantine as one frame_no=-1 row; strict throws") {
    val out = Multimodal.sampleGifFrames(
      media(MediaRow(5L, "image/gif", "junk".getBytes("UTF-8"))), 1, 2, 2)
      .collect()
    assert(out.length == 1 && out.head.getInt(1) == -1 &&
      !out.head.getBoolean(4))
    intercept[Exception] {
      Multimodal.sampleGifFrames(
        media(MediaRow(5L, "image/gif", "junk".getBytes("UTF-8"))), 1, 2, 2,
        strict = true).collect()
    }
  }
}
