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

  /** Animated GIF with explicit per-frame placement + disposal —
    * the delta-frame layout real GIFs use (only the changed rectangle
    * is stored, drawn over the previous canvas).
    */
  private def animatedGifWithMeta(
      frames: Seq[(java.awt.image.BufferedImage, Int, Int, String)])
      : Array[Byte] = {
    import javax.imageio.metadata.IIOMetadataNode
    val bos = new java.io.ByteArrayOutputStream()
    val w = javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
    val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
    try {
      w.setOutput(ios)
      w.prepareWriteSequence(null)
      frames.foreach { case (img, x, y, disposal) =>
        val md = w.getDefaultImageMetadata(
          new javax.imageio.ImageTypeSpecifier(img), w.getDefaultWriteParam)
        val fmt = "javax_imageio_gif_image_1.0"
        val root = md.getAsTree(fmt).asInstanceOf[IIOMetadataNode]
        def child(name: String): IIOMetadataNode = {
          val kids = root.getElementsByTagName(name)
          if (kids.getLength > 0) kids.item(0).asInstanceOf[IIOMetadataNode]
          else { val n = new IIOMetadataNode(name); root.appendChild(n); n }
        }
        val gce = child("GraphicControlExtension")
        gce.setAttribute("disposalMethod", disposal)
        if (!gce.hasAttribute("userInputFlag"))
          gce.setAttribute("userInputFlag", "FALSE")
        if (!gce.hasAttribute("transparentColorFlag"))
          gce.setAttribute("transparentColorFlag", "FALSE")
        if (!gce.hasAttribute("delayTime")) gce.setAttribute("delayTime", "10")
        if (!gce.hasAttribute("transparentColorIndex"))
          gce.setAttribute("transparentColorIndex", "0")
        val desc = child("ImageDescriptor")
        desc.setAttribute("imageLeftPosition", x.toString)
        desc.setAttribute("imageTopPosition", y.toString)
        md.setFromTree(fmt, root)
        w.writeToSequence(new javax.imageio.IIOImage(img, null, md), null)
      }
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

  test("composite mode honors placement + disposal; stored mode does not") {
    def lum(rgb: Int): Byte =
      ((299 * ((rgb >> 16) & 0xff) + 587 * ((rgb >> 8) & 0xff) +
        114 * (rgb & 0xff)) / 1000).toByte
    val base = frame(1) // 4x3, nonzero lumas everywhere
    val patch = new java.awt.image.BufferedImage(2, 1,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    patch.setRGB(0, 0, 0x00ff00); patch.setRGB(1, 0, 0x0000ff)
    val overlay = new java.awt.image.BufferedImage(1, 1,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    overlay.setRGB(0, 0, 0xffffff)
    // frame 0: full base; frame 1: 2x1 delta patch at (1,1) that is
    // CLEARED afterwards; frame 2: 1x1 overlay at (0,0)
    val gifDelta = animatedGifWithMeta(Seq(
      (base, 0, 0, "doNotDispose"),
      (patch, 1, 1, "restoreToBackgroundColor"),
      (overlay, 0, 0, "doNotDispose")))

    // rendered at native 4x3 so the luma grid is identity-sampled
    val composited = Multimodal.sampleGifFrames(
      media(MediaRow(3L, "image/gif", gifDelta)), 1, 4, 3,
      composite = true).collect().sortBy(_.getInt(1))
      .map(_.getAs[Array[Byte]]("pixels"))
    val stored = Multimodal.sampleGifFrames(
      media(MediaRow(4L, "image/gif", gifDelta)), 1, 4, 3)
      .collect().sortBy(_.getInt(1)).map(_.getAs[Array[Byte]]("pixels"))

    // frame 1 composited == the round-tripped base canvas with the
    // patch drawn at (1,1). The base expectation comes from stored
    // frame 0 (the JDK GIF writer quantizes TYPE_INT_RGB rasters to
    // its default palette, so pre-encode pixels are NOT the
    // reference); the patch colors are palette-exact web-safe values.
    val exp1 = stored(0).clone()
    exp1(1 * 4 + 1) = lum(0x00ff00)
    exp1(1 * 4 + 2) = lum(0x0000ff)
    assert(composited(1).sameElements(exp1),
      s"got ${composited(1).toSeq} want ${exp1.toSeq}")
    // frame 2: the patch rect was restored (cleared → luma 0, where
    // the canvas was nonzero) and the overlay landed at (0,0)
    val f2 = composited(2)
    assert(f2(1 * 4 + 1) == 0 && f2(1 * 4 + 2) == 0) // cleared patch rect
    assert(exp1(1 * 4 + 1) != 0) // ...which was nonzero before
    assert(f2(0) == lum(0xffffff)) // the overlay pixel
    assert(f2(2 * 4 + 3) == stored(0)(2 * 4 + 3)) // untouched canvas kept

    // stored mode: frame 1 is the raw 2x1 patch resampled — NOT the
    // composited canvas
    assert(!stored(1).sameElements(composited(1)))
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
