package graft.queries

import org.apache.spark.sql.functions._
import graft.multimodal.Multimodal

/** Multimodal-column surface: binary payload metadata (oracle-checked)
  * and the partition-wise feature extraction pipeline (rows-only —
  * the decoder stub is engine-internal).
  */
object MultimodalQueries {

  val defs: Seq[QueryDef] = Seq(

    // Binary column plumbing: byte length + content hash of the
    // binary payload. md5 over the original string (DuckDB's md5
    // takes VARCHAR; bytes are the utf-8 encoding either way).
    QueryDef(
      "q47_multimodal_meta",
      """SELECT doc_id AS media_id,
        | CAST(octet_length(text::BLOB) AS BIGINT) AS n_bytes,
        | md5(text) AS content_md5
        |FROM documents ORDER BY media_id""".stripMargin) { (spark, dir) =>
      Tables(spark, dir).documents
        .select(col("doc_id").as("media_id"),
          length(col("text").cast("binary")).cast("long").as("n_bytes"),
          md5(col("text").cast("binary")).as("content_md5"))
        .orderBy("media_id")
    },

    // Partition-wise feature extraction over the binary column: 16-bin
    // byte histogram + brightness via mapPartitions (decoder stubbed).
    QueryDef.rowsOnly("q48_multimodal_features") { (spark, dir) =>
      val media = Multimodal.mediaFromDocuments(spark, dir)
      Multimodal.extractFeatures(media).toDF()
        .select(col("media_id"), col("media_type"), col("n_bytes"),
          round(col("brightness"), 4).as("brightness"),
          round(element_at(col("histogram"), 8), 6).as("hist_bin7"))
        .orderBy("media_id")
    },

    // Frame-sampling stub: every 2nd 64-byte window, output shape
    // (media_id, frame_no, frame_bytes).
    QueryDef.rowsOnly("q49_multimodal_frames") { (spark, dir) =>
      val media = Multimodal.mediaFromDocuments(spark, dir)
      Multimodal.sampleFrames(media, frameBytes = 64, everyK = 2)
        .select(col("media_id"), col("frame_no"), col("frame_bytes"))
        .orderBy("media_id", "frame_no")
    },
  )
}
