package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.model.TableSpec
import graft.schema.TypeMapping

/** Decodes the reference's flat CDC JSON envelope (FIXTURES.md §A.1)
  * with Column expressions only — every step is optimizer-visible, no
  * UDFs. The raw line is kept as `_raw` until the per-table payload
  * projection, mirroring the reference's stringly pipeline but typed
  * at the edges (SURVEY §1.5).
  */
object EnvelopeDecoder {

  /** Metadata fields extracted for routing/gating. `_ts` is numeric;
    * everything else stays string until the payload decode.
    */
  val MetaFields: Seq[String] = Seq(
    "_op", "_db", "_database", "_tbl", "_coll", "_schema",
    "_ddl", "_ddl_tbl",
    "_binlog_file", "_binlog_pos_end",
    "_binlog_file_internal", "_binlog_pos_internal",
    "_lsn", "_scn", "_txn_op_index")

  private val MetaSchema: StructType = StructType(
    StructField("_ts", LongType) +:
      MetaFields.map(f => StructField(f, StringType)))

  /** Raw JSON lines → envelope frame with routing columns.
    *
    * One from_json parse per row — N separate get_json_object calls
    * each re-parse the document (measured 4× ingest throughput).
    *
    * Routing key resolution matches the per-source demux lookups:
    * MySQL/Oracle `db.table` from `_db`+`_tbl`; Postgres bare `_tbl`
    * (with `_schema` present); Mongo bare `_coll`
    * (`mysql/SideInputProcessFunction.java:51-52`,
    * `mongodb/SideInputProcessFunction.java:36-50`).
    */
  def decode(lines: DataFrame): DataFrame = {
    val raw = col("value")
    lines
      .select(raw.as("_raw"), from_json(raw, MetaSchema).as("_m"))
      .select(col("_raw") +: col("_m._ts").as("_ts") +:
        MetaFields.map(f => col(s"_m.$f").as(f)): _*)
      .withColumn("_tbl_name", coalesce(col("_tbl"), col("_coll")))
      .withColumn("_tbl_key",
        when(col("_ddl").isNotNull, // DDL routes to _{db}_ddl; PG has
          // no _db (SURVEY §2.7 routing bug) — use _schema there
          concat(lit("_"), coalesce(col("_db"), col("_schema")), lit("_ddl")))
          .when(col("_db").isNotNull && col("_schema").isNull,
            concat(col("_db"), lit("."), col("_tbl_name")))
          .otherwise(col("_tbl_name")))
  }

  /** Per-table payload projection: union-tagged JSON fields → typed
    * columns (`{"int": 5}` → 5), the T5 `from-json-to-record` step.
    * A single from_json against the table's union-shaped schema (one
    * parse per row), then untagging is pure struct field access.
    * Kept metadata matches the reference sink schema: `_op`, `_ts`,
    * Debezium-internal binlog position (`MySQLStreamer.java:434-441`);
    * routing + write-back offsets are stripped (T6,
    * `mysql/SideInputProcessFunction.java:54-63`).
    */
  /** The metadata columns the sink keeps after the payload, per
    * source type — THE single source of truth, matching the reference
    * sink schemas: MySQL keeps the Debezium-internal binlog position
    * (`MySQLStreamer.java:436-439`, pos is BIGINT there), Mongo keeps
    * `_txn_op_index` (`MongoDBStreamer.java:308-310`) — the intra-
    * transaction tiebreaker keep-latest consumers need when two ops
    * share a millisecond — and Postgres/Oracle keep only op + ts
    * (`PostgresStreamer.java:257-258`, `OracleStreamer.java:254-255`).
    * [[payload]] (the tail), `streaming.JdbcSnapshot` (the live
    * snapshot) and `streaming.SinkDdl` (generated CREATE TABLE) all
    * derive from this list, so the sink schema cannot fork between
    * them.
    */
  def keptMetadata(sourceType: String): Seq[StructField] =
    StructField("_op", StringType) +: StructField("_ts", LongType) +:
      (sourceType match {
        case "mysql" => Seq(
          StructField("_binlog_file_internal", StringType),
          StructField("_binlog_pos_internal", LongType))
        case "mongodb" => Seq(StructField("_txn_op_index", StringType))
        case _ => Seq.empty
      })

  def payload(frame: DataFrame, spec: TableSpec,
      sourceType: String = "mysql"): DataFrame = {
    val unionSchema = StructType(spec.schema.fields.toSeq.map { f =>
      StructField(f.name, StructType(Seq(
        StructField(TypeMapping.unionTag(f.dataType), f.dataType))))
    })
    val cols = spec.schema.fields.toSeq.map { f =>
      col(s"_p.${f.name}.${TypeMapping.unionTag(f.dataType)}").as(f.name)
    }
    // envelope metadata arrives as strings (except _ts) — the cast to
    // each kept field's declared type is what typed `_binlog_pos...`
    val kept = keptMetadata(sourceType).map(f =>
      col(f.name).cast(f.dataType).as(f.name))
    frame
      .withColumn("_p", from_json(col("_raw"), unionSchema))
      .select(cols ++ kept: _*)
  }

  /** DDL event projection for the `_{db}_ddl` table
    * (`MySQLStreamer.java:472-481`).
    */
  def ddlPayload(frame: DataFrame): DataFrame =
    frame.select(col("_ddl"), col("_ddl_tbl"), col("_ts"),
      col("_binlog_file"),
      col("_binlog_pos_end").cast(LongType).as("_binlog_pos_end"))

  /** The `dt=yyyy-MM-dd` bucket column from `_ts` millis
    * (`DateBucketAssigner.java:32-41`).
    */
  def dtColumn: Column =
    date_format(timestamp_millis(col("_ts")), "yyyy-MM-dd").as("dt")
}
