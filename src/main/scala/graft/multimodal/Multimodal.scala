package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column support: image/audio/video as opaque binary
  * columns with typed metadata, decoded/feature-extracted partition-
  * wise (the Scala analog of pandas-batch UDFs: `mapPartitions` over
  * an iterator, so heavy decoder state is initialized once per
  * partition, not per row).
  *
  * The actual byte→pixels/samples decode is STUBBED (`decodeStub`):
  * the container has no image/audio libraries, so the stub derives a
  * deterministic fake "decoded frame" from the bytes. Everything
  * around it — schema, partitioning, batch shape, feature extraction
  * — is real and tested, and a production decoder drops into
  * [[MediaDecoder.decode]] without touching the pipeline.
  */
object Multimodal {

  /** One media asset: id, modality tag, raw bytes, optional metadata. */
  case class MediaRow(media_id: Long, media_type: String, content: Array[Byte])

  /** Extracted features: byte-level stats + a 16-bin histogram
    * embedding of the "decoded" content.
    */
  case class MediaFeatures(
      media_id: Long,
      media_type: String,
      n_bytes: Long,
      histogram: Array[Double],
      brightness: Double)

  val HistBins = 16

  /** The decode seam. STUB: identity over bytes. A real build links an
    * image/audio codec here and returns decoded samples.
    */
  object MediaDecoder {
    def decode(mediaType: String, content: Array[Byte]): Array[Byte] =
      content // ??? real codec goes here — deterministic passthrough stub
  }

  /** Partition-wise feature extraction. Decoder "model" is constructed
    * once per partition (the expensive-init pattern that matters when
    * the decoder is a native codec or an ONNX session).
    */
  def extractFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      val decoder = MediaDecoder // per-partition init point
      rows.map { r =>
        val decoded = decoder.decode(r.media_type, r.content)
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
          hist.map(_ / n), sum.toDouble / n)
      }
    }
  }

  /** Frame sampling stub: every k-th fixed-size byte window stands in
    * for video frame extraction — the partitioning and output shape
    * (one row per sampled frame) are the real contract.
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
