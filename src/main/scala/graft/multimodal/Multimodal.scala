package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column support: image/audio/video as opaque binary
  * columns with typed metadata, decoded/feature-extracted partition-
  * wise (the Scala analog of pandas-batch UDFs: `mapPartitions` over
  * an iterator, so heavy decoder state is initialized once per
  * partition, not per row).
  *
  * Decode is REAL for the formats the JDK ships codecs for —
  * PNG/BMP/JPEG via `javax.imageio` (→ 8-bit luma pixels) and WAV
  * PCM via `javax.sound.sampled` (→ 8-bit unsigned samples) — with
  * zero external dependencies. Unknown media types pass bytes
  * through, which is both the extension seam for exotic codecs and
  * what keeps the deterministic text-fixture path (q47-q49, oracle-
  * checked byte-for-byte in DuckDB) decodable by BOTH engines. Video
  * frame extraction is REAL for MJPEG-in-AVI (RIFF chunk walk + the
  * JDK JPEG codec — [[Multimodal.sampleAviFrames]]); codec formats
  * the JDK can't decode (H.264...) keep the byte-window stub, whose
  * partitioning and output shape are the real contract.
  */
object Multimodal {

  /** One media asset: id, modality tag, raw bytes, optional metadata. */
  case class MediaRow(media_id: Long, media_type: String, content: Array[Byte])

  /** Extracted features: byte-level stats + a 16-bin histogram
    * embedding of the "decoded" content. `decode_ok = false` marks a
    * quarantined row whose bytes failed to decode (zeros elsewhere) —
    * at 100 TB malformed files are routine, so corrupt rows must
    * survive as flagged rows, not kill the task.
    */
  case class MediaFeatures(
      media_id: Long,
      media_type: String,
      n_bytes: Long,
      histogram: Array[Double],
      brightness: Double,
      decode_ok: Boolean)

  val HistBins = 16

  /** The decode seam: JDK codecs for image (PNG/BMP/JPEG → row-major
    * 8-bit luma) and WAV PCM (→ 8-bit unsigned mono-ish samples);
    * passthrough otherwise (text fixtures, unknown codecs).
    *
    * Lenient by default: undecodable bytes return `null` so the
    * caller can quarantine the row — a single corrupt file inside a
    * mapPartitions batch must not fail the job. `strict = true`
    * restores the throw for pipelines that want corruption to be
    * loud (e.g. validating a supposedly-clean ingest).
    */
  object MediaDecoder {
    def decode(mediaType: String, content: Array[Byte],
        strict: Boolean = false): Array[Byte] = {
      def guard(d: => Array[Byte]): Array[Byte] =
        if (strict) d
        else try d catch { case scala.util.control.NonFatal(_) => null }
      mediaType match {
        case "image/png" | "image/bmp" | "image/jpeg" =>
          guard(decodeImageLuma(content))
        case "audio/wav" => guard(decodeWavPcm8(content))
        case _ => content
      }
    }

    /** ONE ITU-601 luma sampler for decode AND resize — two copies of
      * the 299/587/114 recipe would have to stay bit-identical by
      * hand. Nearest-neighbor source index in LONG arithmetic
      * (`x·srcW` overflows Int on panorama-width sources).
      */
    private def lumaGrid(img: java.awt.image.BufferedImage,
        w: Int, h: Int): Array[Byte] = {
      val (sw, sh) = (img.getWidth, img.getHeight)
      val out = new Array[Byte](w * h)
      var y = 0
      while (y < h) {
        val sy = (y.toLong * sh / h).toInt
        var x = 0
        while (x < w) {
          val rgb = img.getRGB((x.toLong * sw / w).toInt, sy)
          val lum = (299 * ((rgb >> 16) & 0xff) + 587 * ((rgb >> 8) & 0xff)
            + 114 * (rgb & 0xff)) / 1000
          out(y * w + x) = lum.toByte
          x += 1
        }
        y += 1
      }
      out
    }

    private def readImage(content: Array[Byte]): java.awt.image.BufferedImage = {
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(content))
      require(img != null, "undecodable image bytes")
      img
    }

    /** Decoded pixels as ITU-R 601 integer luma, row-major — the
      * (w, h) = source-dimensions case of [[lumaGrid]].
      */
    private[multimodal] def decodeImageLuma(content: Array[Byte]): Array[Byte] = {
      val img = readImage(content)
      lumaGrid(img, img.getWidth, img.getHeight)
    }

    /** Decode + nearest-neighbor resample to (w × h) ITU-601 luma;
      * the dimension-aware sibling of [[decodeImageLuma]].
      */
    private[multimodal] def resizeImageLuma(content: Array[Byte],
        w: Int, h: Int): Array[Byte] =
      lumaGrid(readImage(content), w, h)

    /** MJPEG-in-AVI frame extraction: a RIFF chunk walk (pure byte
      * arithmetic, no codec) yields the per-frame JPEG payloads —
      * video-stream chunks are the fourcc `##dc`/`##db` entries
      * inside `LIST movi` (and its nested `LIST rec ` groups); each
      * payload then decodes through the JDK's own JPEG codec like any
      * other image. This is the one video container a stock JDK can
      * decode END TO END; codec formats (H.264 etc.) stay with the
      * declared [[Multimodal.sampleFrames]] byte-window stub.
      *
      * Fail-fast on a non-AVI or structurally corrupt container (a
      * chunk running past its parent): the CALLER decides lenient vs
      * strict, same as the image path. Audio (`##wb`) and index
      * (`idx1`) chunks are skipped, not errors.
      */
    /** `everyK`: only every k-th video frame's bytes are COPIED out
      * of the container (the walk itself touches headers only) —
      * at everyK=30 the old copy-then-drop wasted 29/30 of the
      * byte-array churn. Returned with the original frame indices.
      */
    private[multimodal] def aviMjpegFrames(content: Array[Byte],
        everyK: Int = 1): Seq[(Int, Array[Byte])] = {
      def u32le(i: Int): Long =
        (content(i) & 0xffL) | ((content(i + 1) & 0xffL) << 8) |
          ((content(i + 2) & 0xffL) << 16) | ((content(i + 3) & 0xffL) << 24)
      def fourcc(i: Int): String = new String(content, i, 4, "US-ASCII")
      require(content.length >= 12 && fourcc(0) == "RIFF" &&
        fourcc(8) == "AVI ", "not a RIFF/AVI container")
      val out = scala.collection.mutable.ArrayBuffer.empty[(Int, Array[Byte])]
      var frameNo = 0
      def walk(start: Int, end: Int): Unit = {
        var i = start
        while (i + 8 <= end) {
          val cc = fourcc(i)
          val size = u32le(i + 4)
          val dataStart = i + 8
          val dataEnd = dataStart + size
          require(dataEnd <= end,
            s"corrupt container: chunk $cc runs past its parent")
          if (cc == "LIST") walk(dataStart + 4, dataEnd.toInt)
          else if (cc(0).isDigit && cc(1).isDigit && cc(2) == 'd' &&
              (cc(3) == 'c' || cc(3) == 'b')) {
            if (frameNo % everyK == 0)
              out += (frameNo -> java.util.Arrays.copyOfRange(content,
                dataStart, dataEnd.toInt))
            frameNo += 1
          }
          i = (dataEnd + (size & 1)).toInt // chunks pad to even offsets
        }
      }
      walk(12, math.min(content.length.toLong, 8 + u32le(4)).toInt)
      out.toSeq
    }

    /** Animated-GIF frames via the JDK's own multi-frame reader, each
      * resampled to a (w × h) luma grid. Frames are returned AS
      * STORED: GIF disposal-method compositing (delta frames drawn
      * over the previous canvas) is out of scope, documented — for
      * the full-frame GIFs training corpora normalize to, stored ==
      * composited. Lenient: a frame that fails to read yields `null`
      * in its slot (the caller quarantines); strict rethrows.
      * Mislabeled single-frame image bytes (a PNG tagged image/gif)
      * degrade to their one frame — ImageIO dispatches on content.
      */
    /** Frames DECODED (reader.read calls) — the sample-only contract's
      * test probe: at everyK=k only ceil(n/k) frames may decode, never
      * all n. Process-wide diagnostic counter (exact in local mode).
      */
    private[multimodal] val gifFramesDecoded =
      new java.util.concurrent.atomic.AtomicLong

    private[multimodal] def gifFrameLumas(content: Array[Byte], w: Int,
        h: Int, strict: Boolean, everyK: Int = 1): Seq[(Int, Array[Byte])] = {
      val iis = javax.imageio.ImageIO.createImageInputStream(
        new java.io.ByteArrayInputStream(content))
      try {
        val readers = javax.imageio.ImageIO.getImageReaders(iis)
        require(readers.hasNext, "undecodable bytes: no ImageIO reader")
        val reader = readers.next()
        try {
          reader.setInput(iis)
          // decode ONLY the sampled indices: reader.read(i) seeks by
          // index (the JDK GIF reader skips unsampled frames' rasters
          // without LZW-decoding them) — everyK=30 on a long GIF was
          // 30× wasted raster work when sampling happened on the
          // already-decoded list
          (0 until reader.getNumImages(true) by everyK).map { i =>
            gifFramesDecoded.incrementAndGet()
            val px =
              if (strict) lumaGrid(reader.read(i), w, h)
              else try lumaGrid(reader.read(i), w, h)
              catch { case scala.util.control.NonFatal(_) => null }
            i -> px
          }
        } finally reader.dispose()
      } finally iis.close()
    }

    /** Per-frame GIF placement + disposal from the reader's native
      * metadata tree (`javax_imageio_gif_image_1.0`): (left, top,
      * disposalMethod). Missing nodes default to (0, 0, "none") —
      * the full-frame layout the stored-frame path assumes.
      */
    private def gifFrameMeta(
        md: javax.imageio.metadata.IIOMetadata): (Int, Int, String) = {
      val root = md.getAsTree("javax_imageio_gif_image_1.0")
        .asInstanceOf[org.w3c.dom.Element]
      def child(name: String): Option[org.w3c.dom.Element] = {
        val kids = root.getElementsByTagName(name)
        if (kids.getLength == 0) None
        else Some(kids.item(0).asInstanceOf[org.w3c.dom.Element])
      }
      val (x, y) = child("ImageDescriptor").map { d =>
        (d.getAttribute("imageLeftPosition").toInt,
          d.getAttribute("imageTopPosition").toInt)
      }.getOrElse((0, 0))
      val disposal = child("GraphicControlExtension")
        .map(_.getAttribute("disposalMethod")).filter(_.nonEmpty)
        .getOrElse("none")
      (x, y, disposal)
    }

    /** Disposal-method compositing (the `composite = true` mode of
      * [[Multimodal.sampleGifFrames]]): each emitted frame is the
      * LOGICAL canvas after drawing frame i at its declared offset,
      * honoring the prior frame's disposal — `doNotDispose`/`none`
      * leave the canvas, `restoreToBackgroundColor` clears the frame's
      * rectangle (to transparent; luma reads it as black, the same
      * value an un-drawn canvas has), `restoreToPrevious` rolls the
      * canvas back. Delta-frame GIFs become correct at the cost of
      * decoding EVERY stored frame up to the last sampled index — the
      * sample-only shortcut is inherently unavailable when frame i
      * depends on frames < i, which is why stored-frame mode stays
      * the default.
      *
      * Lenient mode quarantines an unreadable frame (null slot if
      * sampled) and keeps compositing the frames that do decode.
      */
    private[multimodal] def gifFrameLumasComposited(content: Array[Byte],
        w: Int, h: Int, strict: Boolean,
        everyK: Int = 1): Seq[(Int, Array[Byte])] = {
      val iis = javax.imageio.ImageIO.createImageInputStream(
        new java.io.ByteArrayInputStream(content))
      try {
        val readers = javax.imageio.ImageIO.getImageReaders(iis)
        require(readers.hasNext, "undecodable bytes: no ImageIO reader")
        val reader = readers.next()
        try {
          reader.setInput(iis)
          val n = reader.getNumImages(true)
          // logical screen from the stream metadata; fall back to the
          // first frame's own size (single-frame images have no LSD)
          val (sw, sh) = {
            val stream = Option(reader.getStreamMetadata)
              .map(_.getAsTree("javax_imageio_gif_stream_1.0")
                .asInstanceOf[org.w3c.dom.Element])
              .flatMap { root =>
                val lsd = root.getElementsByTagName("LogicalScreenDescriptor")
                if (lsd.getLength == 0) None
                else {
                  val d = lsd.item(0).asInstanceOf[org.w3c.dom.Element]
                  Some((d.getAttribute("logicalScreenWidth").toInt,
                    d.getAttribute("logicalScreenHeight").toInt))
                }
              }
            stream.getOrElse {
              (reader.getWidth(0), reader.getHeight(0))
            }
          }
          var canvas = new java.awt.image.BufferedImage(sw, sh,
            java.awt.image.BufferedImage.TYPE_INT_ARGB)
          def copyCanvas(): java.awt.image.BufferedImage = {
            val c = new java.awt.image.BufferedImage(sw, sh,
              java.awt.image.BufferedImage.TYPE_INT_ARGB)
            val g = c.createGraphics()
            try g.drawImage(canvas, 0, 0, null) finally g.dispose()
            c
          }
          val out = Seq.newBuilder[(Int, Array[Byte])]
          var i = 0
          while (i < n) {
            val decoded =
              try Some((reader.read(i), gifFrameMeta(reader.getImageMetadata(i))))
              catch {
                case scala.util.control.NonFatal(e) =>
                  if (strict) throw e else None
              }
            decoded match {
              case Some((frame, (x, y, disposal))) =>
                gifFramesDecoded.incrementAndGet()
                val before =
                  if (disposal == "restoreToPrevious") Some(copyCanvas())
                  else None
                val g = canvas.createGraphics()
                try g.drawImage(frame, x, y, null) finally g.dispose()
                if (i % everyK == 0) out += (i -> lumaGrid(canvas, w, h))
                disposal match {
                  case "restoreToBackgroundColor" =>
                    val g2 = canvas.createGraphics()
                    try {
                      g2.setComposite(java.awt.AlphaComposite.Clear)
                      g2.fillRect(x, y, frame.getWidth, frame.getHeight)
                    } finally g2.dispose()
                  case "restoreToPrevious" => before.foreach(canvas = _)
                  case _ => ()
                }
              case None => // lenient quarantine: null slot if sampled
                if (i % everyK == 0) out += (i -> null)
            }
            i += 1
          }
          out.result()
        } finally reader.dispose()
      } finally iis.close()
    }

    /** WAV container → 8-bit unsigned samples (16-bit PCM is taken
      * down to its high byte; 8-bit PCM is already unsigned).
      */
    private[multimodal] def decodeWavPcm8(content: Array[Byte]): Array[Byte] = {
      import javax.sound.sampled.AudioFormat.Encoding
      val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(content))
      try {
        val fmt = in.getFormat
        val raw = in.readAllBytes()
        // dispatch on (encoding, depth), not depth alone: a μ-law/
        // a-law WAV is also 8-bit but its companded codewords are NOT
        // linear samples — returning them raw would silently corrupt
        // every downstream feature; reject anything not linear PCM
        (fmt.getEncoding, fmt.getSampleSizeInBits) match {
          case (Encoding.PCM_UNSIGNED, 8) => raw
          case (Encoding.PCM_SIGNED, 8) =>
            raw.map(b => (b + 128).toByte)
          case (Encoding.PCM_SIGNED, 16) =>
            val loOff = if (fmt.isBigEndian) 1 else 0
            val hiOff = 1 - loOff
            val n = raw.length / 2
            val out = new Array[Byte](n)
            var i = 0
            while (i < n) {
              val s = (raw(2 * i + hiOff) << 8) | (raw(2 * i + loOff) & 0xff)
              out(i) = ((s >> 8) + 128).toByte
              i += 1
            }
            out
          case (e, b) => throw new IllegalArgumentException(
            s"unsupported wav format: $e at $b bits (linear PCM only)")
        }
      } finally in.close()
    }
  }

  /** Partition-wise feature extraction. Decoder "model" is constructed
    * once per partition (the expensive-init pattern that matters when
    * the decoder is a native codec or an ONNX session).
    */
  def extractFeatures(media: Dataset[MediaRow],
      strict: Boolean = false): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      val decoder = MediaDecoder // per-partition init point
      rows.map { r =>
        val decoded = decoder.decode(r.media_type, r.content, strict)
        if (decoded == null)
          // quarantined: corrupt bytes yield a flagged zero-feature
          // row instead of a dead task
          MediaFeatures(r.media_id, r.media_type, 0L,
            new Array[Double](HistBins), 0.0, decode_ok = false)
        else {
          val hist = new Array[Double](HistBins)
          var sum = 0L
          var i = 0
          while (i < decoded.length) {
            val b = decoded(i) & 0xff
            hist(b * HistBins / 256) += 1.0
            sum += b
            i += 1
          }
          val n = math.max(decoded.length, 1)
          MediaFeatures(r.media_id, r.media_type, decoded.length.toLong,
            hist.map(_ / n), sum.toDouble / n, decode_ok = true)
        }
      }
    }
  }

  /** Nearest-neighbor resize of an encoded image to a (w × h) luma
    * grid — the thumbnail / input-normalization step of an image
    * training pipeline. Source index arithmetic is pure integer
    * (`sx = x·srcW div w`), so outputs are bit-identical across
    * platforms (no float filtering kernels); luma is the same
    * ITU-601 integer recipe as [[MediaDecoder.decode]]. Lenient like
    * extractFeatures: undecodable bytes yield a quarantined
    * `decode_ok=false` row with empty pixels (strict=true throws).
    * mapPartitions so a real codec's init cost is per-partition.
    */
  def resizeImages(media: Dataset[MediaRow], w: Int, h: Int,
      strict: Boolean = false): DataFrame = {
    require(w > 0 && h > 0, s"target dims must be positive, got ${w}x$h")
    // w·h is the Int output allocation — 65536×65536 would wrap to 0
    // and "succeed" with empty grids
    require(w.toLong * h <= Int.MaxValue,
      s"target grid ${w}x$h exceeds a single array")
    import media.sparkSession.implicits._
    // image rows only: a mixed-modality lake must neither abort on a
    // valid WAV row (strict) nor quarantine it as if corrupt
    // (lenient) — decode_ok=false below means CORRUPT IMAGE, nothing
    // else. Output cardinality = image-typed rows.
    media.filter(_.media_type.startsWith("image/")).mapPartitions { rows =>
      val decoder = MediaDecoder // per-partition init point
      rows.map { r =>
        // NonFatal only (the MediaDecoder.guard rule): an OOM from a
        // decompression-bomb image must stay fatal, not become a
        // quarantined row
        val px = if (strict) decoder.resizeImageLuma(r.content, w, h)
        else try decoder.resizeImageLuma(r.content, w, h)
        catch { case scala.util.control.NonFatal(_) => null }
        (r.media_id, w, h, if (px == null) Array.empty[Byte] else px,
          px != null)
      }
    }.toDF("media_id", "w", "h", "pixels", "decode_ok")
  }

  /** Real video-frame extraction for MJPEG-in-AVI: every k-th frame
    * chunk from the RIFF walk ([[MediaDecoder.aviMjpegFrames]]),
    * decoded to the same (w × h) integer luma grid as
    * [[resizeImages]]. Lenient by default at BOTH levels: an
    * undecodable frame quarantines that frame (`decode_ok=false`,
    * empty pixels); a structurally corrupt container quarantines the
    * whole asset as one `frame_no = -1` row — at 100 TB truncated
    * uploads are routine and must stay rows, not task failures
    * (strict=true throws either way). Only `video/avi` /
    * `video/x-msvideo` rows are touched; codec formats the JDK can't
    * decode stay with the [[sampleFrames]] stub.
    */
  def sampleAviFrames(media: Dataset[MediaRow], everyK: Int,
      w: Int, h: Int, strict: Boolean = false): DataFrame = {
    require(everyK > 0, s"everyK must be positive, got $everyK")
    require(w > 0 && h > 0, s"target dims must be positive, got ${w}x$h")
    require(w.toLong * h <= Int.MaxValue,
      s"target grid ${w}x$h exceeds a single array")
    import media.sparkSession.implicits._
    media.filter(r => r.media_type == "video/avi" ||
        r.media_type == "video/x-msvideo")
      .flatMap { r =>
        val decoder = MediaDecoder
        try {
          decoder.aviMjpegFrames(r.content, everyK).iterator
            .map { case (idx, f) =>
              val px =
                if (strict) decoder.resizeImageLuma(f, w, h)
                else try decoder.resizeImageLuma(f, w, h)
                catch { case scala.util.control.NonFatal(_) => null }
              (r.media_id, idx, f.length,
                if (px == null) Array.empty[Byte] else px, px != null)
            }.toSeq
        } catch {
          case scala.util.control.NonFatal(_) if !strict =>
            Seq((r.media_id, -1, 0, Array.empty[Byte], false))
        }
      }.toDF("media_id", "frame_no", "frame_bytes", "pixels", "decode_ok")
  }

  /** Real frame extraction for animated GIFs — the second multi-frame
    * format a stock JDK decodes end to end (with
    * [[sampleAviFrames]]): every k-th stored frame raster to the same
    * (w × h) integer luma grid, same output schema and two-level
    * quarantine (`frame_bytes` is the luma-grid size here — GIF
    * frames have no standalone encoded payload the way AVI chunks
    * do). Only `image/gif` rows are touched.
    */
  /** Test probe for the sample-only contract: cumulative frames the
    * GIF path has DECODED (not merely skipped) process-wide.
    */
  private[graft] def gifFramesDecodedCount: Long =
    MediaDecoder.gifFramesDecoded.get()

  def sampleGifFrames(media: Dataset[MediaRow], everyK: Int,
      w: Int, h: Int, strict: Boolean = false,
      composite: Boolean = false): DataFrame = {
    require(everyK > 0, s"everyK must be positive, got $everyK")
    require(w > 0 && h > 0, s"target dims must be positive, got ${w}x$h")
    require(w.toLong * h <= Int.MaxValue,
      s"target grid ${w}x$h exceeds a single array")
    import media.sparkSession.implicits._
    media.filter(_.media_type == "image/gif")
      .flatMap { r =>
        val decoder = MediaDecoder
        try {
          // composite=true maintains the disposal-method canvas so
          // delta-frame GIFs are correct (decodes every stored frame —
          // sampling can't skip frames its successors draw over);
          // the default emits frames AS STORED with sample-only decode
          val frames =
            if (composite)
              decoder.gifFrameLumasComposited(r.content, w, h, strict, everyK)
            else decoder.gifFrameLumas(r.content, w, h, strict, everyK)
          frames.iterator
            .map { case (idx, px) =>
              (r.media_id, idx, if (px == null) 0 else px.length,
                if (px == null) Array.empty[Byte] else px, px != null)
            }.toSeq
        } catch {
          case scala.util.control.NonFatal(_) if !strict =>
            Seq((r.media_id, -1, 0, Array.empty[Byte], false))
        }
      }.toDF("media_id", "frame_no", "frame_bytes", "pixels", "decode_ok")
  }

  /** Frame sampling stub: every k-th fixed-size byte window stands in
    * for video frame extraction — the partitioning and output shape
    * (one row per sampled frame) are the real contract. For the one
    * container format a stock JDK can decode end to end, use the REAL
    * [[sampleAviFrames]] instead.
    */
  def sampleFrames(media: Dataset[MediaRow], frameBytes: Int,
      everyK: Int): DataFrame = {
    import media.sparkSession.implicits._
    media.flatMap { r =>
      val frames = r.content.grouped(frameBytes).zipWithIndex
      frames.collect { case (f, idx) if idx % everyK == 0 =>
        (r.media_id, idx, f.length, f)
      }
    }.toDF("media_id", "frame_no", "frame_bytes", "frame")
  }

  /** Test-fixture media table synthesized from documents.text (the
    * container ships no real binary assets): content = utf-8 bytes.
    */
  def mediaFromDocuments(spark: SparkSession, dir: String): Dataset[MediaRow] = {
    import spark.implicits._
    spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id").as("media_id"),
        concat(lit("text/"), col("lang")).as("media_type"),
        col("text").cast("binary").as("content"))
      .as[MediaRow]
  }
}
