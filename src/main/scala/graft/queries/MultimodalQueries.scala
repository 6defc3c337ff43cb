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
    // byte histogram + brightness via mapPartitions (decoder stubbed —
    // a deterministic passthrough, so the whole pipeline is oracle-
    // checkable: DuckDB re-derives the byte stream via hex() and
    // mirrors the bin-7 fraction and mean-byte brightness. Raw doubles
    // on both sides (single int/int divisions are bit-identical); the
    // checker rounds to 6.
    QueryDef(
      "q48_multimodal_features",
      """SELECT doc_id AS media_id, 'text/'||lang AS media_type,
        | CAST(octet_length(text::BLOB) AS BIGINT) AS n_bytes,
        | coalesce(CAST(list_sum(bytes) AS DOUBLE), 0.0)
        |   / greatest(len(bytes), 1) AS brightness,
        | len(list_filter(bytes, b -> b//16 = 7))
        |   / CAST(greatest(len(bytes), 1) AS DOUBLE) AS hist_bin7
        |FROM (SELECT *, list_transform(
        |   generate_series(1, octet_length(text::BLOB)),
        |   i -> ('0x'||substr(hex(text::BLOB), CAST(2*i-1 AS INT), 2))::BIGINT)
        |   AS bytes FROM documents)
        |ORDER BY media_id""".stripMargin) { (spark, dir) =>
      val media = Multimodal.mediaFromDocuments(spark, dir)
      Multimodal.extractFeatures(media).toDF()
        .select(col("media_id"), col("media_type"), col("n_bytes"),
          col("brightness"),
          element_at(col("histogram"), 8).as("hist_bin7"))
        .orderBy("media_id")
    },

    // Frame-sampling stub: every 2nd 64-byte window, output shape
    // (media_id, frame_no, frame_bytes). The sampled-window geometry
    // (which frames, how many bytes each) is SQL: DuckDB enumerates
    // windows with a generated series and recomputes each length.
    QueryDef(
      "q49_multimodal_frames",
      """WITH f AS (
        | SELECT doc_id AS media_id, octet_length(text::BLOB) AS n,
        |  unnest(generate_series(0,
        |    CAST(ceil(octet_length(text::BLOB)/64.0) AS BIGINT) - 1)) AS fno
        | FROM documents)
        |SELECT media_id, CAST(fno AS INT) AS frame_no,
        | CAST(least(64, n - fno*64) AS INT) AS frame_bytes
        |FROM f WHERE fno % 2 = 0
        |ORDER BY media_id, frame_no""".stripMargin) { (spark, dir) =>
      val media = Multimodal.mediaFromDocuments(spark, dir)
      Multimodal.sampleFrames(media, frameBytes = 64, everyK = 2)
        .select(col("media_id"), col("frame_no"), col("frame_bytes"))
        .orderBy("media_id", "frame_no")
    },
  )
}
