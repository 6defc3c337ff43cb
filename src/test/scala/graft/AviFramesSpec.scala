package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.multimodal.Multimodal
import graft.multimodal.Multimodal.MediaRow

/** Real video-frame extraction: an MJPEG-in-AVI container synthesized
  * in-memory (RIFF chunk grammar, JDK-encoded JPEG payloads) must
  * round-trip through `sampleAviFrames` — frames found across nested
  * `rec ` lists and odd-length padding, audio/index chunks skipped,
  * pixels bit-identical to `resizeImages` on the same JPEG bytes,
  * and both quarantine levels (bad frame / corrupt container)
  * lenient-by-default, loud in strict mode.
  */
class AviFramesSpec extends AnyFunSuite {
  lazy val spark: SparkSession = TestSpark.session

  // ---- RIFF/AVI builder (the spec's own, independent of the walk) ----

  private def fcc(s: String): Array[Byte] = s.getBytes("US-ASCII")
  private def u32(n: Int): Array[Byte] = Array(
    (n & 0xff).toByte, ((n >> 8) & 0xff).toByte,
    ((n >> 16) & 0xff).toByte, ((n >> 24) & 0xff).toByte)
  private def chunk(cc: String, data: Array[Byte]): Array[Byte] =
    fcc(cc) ++ u32(data.length) ++ data ++
      (if (data.length % 2 == 1) Array[Byte](0) else Array.empty[Byte])
  private def list(tp: String, subs: Array[Byte]): Array[Byte] =
    chunk("LIST", fcc(tp) ++ subs)
  private def avi(subs: Array[Byte]): Array[Byte] = {
    val body = fcc("AVI ") ++ subs
    fcc("RIFF") ++ u32(body.length) ++ body
  }

  /** A small JPEG whose pixel content varies with `seed`. */
  private def jpeg(seed: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(4, 3,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 3; x <- 0 until 4)
      img.setRGB(x, y, (seed * 0x10101 + x * 40 + y * 2000) & 0xffffff)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", bos)
    bos.toByteArray
  }

  private val (j0, j1, j2) = (jpeg(1), jpeg(99), jpeg(200))
  /** Odd-length undecodable frame payload: exercises both even-offset
    * padding AND the per-frame quarantine in one chunk.
    */
  private val badFrame = Array.tabulate[Byte](33)(i => (i * 7).toByte)

  /** hdrl + movi with: frame, audio chunk (skipped), a nested `rec `
    * holding a frame, the odd bad frame, a final frame, then idx1.
    */
  private def wellFormed: Array[Byte] = avi(
    list("hdrl", chunk("avih", new Array[Byte](56))) ++
      list("movi",
        chunk("00dc", j0) ++
          chunk("01wb", Array.tabulate[Byte](10)(_.toByte)) ++
          list("rec ", chunk("00dc", j1)) ++
          chunk("00dc", badFrame) ++
          chunk("00db", j2)) ++
      chunk("idx1", new Array[Byte](16)))

  private def media(rows: MediaRow*) = {
    import spark.implicits._
    spark.createDataset(rows)
  }

  test("frames extract across nested lists and odd padding; pixels " +
      "match resizeImages on the same JPEG bytes") {
    val out = Multimodal.sampleAviFrames(
      media(MediaRow(7L, "video/avi", wellFormed)), 1, 3, 2)
      .orderBy("frame_no").collect()
    assert(out.map(_.getInt(1)).toSeq == Seq(0, 1, 2, 3))
    assert(out.map(_.getBoolean(4)).toSeq ==
      Seq(true, true, false, true)) // frame 2 = the bad payload
    assert(out(2).getAs[Array[Byte]]("pixels").isEmpty)
    assert(out.map(_.getInt(2)).toSeq ==
      Seq(j0.length, j1.length, badFrame.length, j2.length))
    // bit-identical to the image path on the same bytes
    val expected = Multimodal.resizeImages(
      media(MediaRow(0L, "image/jpeg", j0), MediaRow(1L, "image/jpeg", j1),
        MediaRow(3L, "image/jpeg", j2)), 3, 2)
      .orderBy("media_id").collect()
      .map(_.getAs[Array[Byte]]("pixels"))
    val got = Seq(0, 1, 3).map(i => out(i).getAs[Array[Byte]]("pixels"))
    assert(got.zip(expected).forall { case (a, b) => a.sameElements(b) })
  }

  test("everyK samples frame indices 0, k, 2k...") {
    val out = Multimodal.sampleAviFrames(
      media(MediaRow(1L, "video/x-msvideo", wellFormed)), 2, 2, 2)
      .orderBy("frame_no").collect()
    assert(out.map(_.getInt(1)).toSeq == Seq(0, 2))
  }

  test("non-video rows are untouched and contribute no output") {
    val out = Multimodal.sampleAviFrames(
      media(MediaRow(1L, "image/jpeg", j0),
        MediaRow(2L, "text/en", "hello".getBytes("UTF-8"))), 1, 2, 2)
    assert(out.count() == 0)
  }

  test("corrupt containers quarantine as one frame_no=-1 row, and " +
      "strict mode throws") {
    val corrupt = Seq(
      "not even riff".getBytes("UTF-8"),
      wellFormed.take(wellFormed.length - 5)) // truncated mid-chunk
    for (bytes <- corrupt) {
      val out = Multimodal.sampleAviFrames(
        media(MediaRow(5L, "video/avi", bytes)), 1, 2, 2).collect()
      // the walk is all-or-nothing (frames materialize before rows
      // emit), so a torn container is ONE quarantine row, not a
      // partial frame list
      assert(out.length == 1 && out.head.getInt(1) == -1 &&
        !out.head.getBoolean(4), "quarantine row")
      intercept[Exception] {
        Multimodal.sampleAviFrames(
          media(MediaRow(5L, "video/avi", bytes)), 1, 2, 2,
          strict = true).collect()
      }
    }
  }
}
