package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.model.TableSpec
import graft.schema.TypeMapping

/** MongoDB deserializer output modes
  * (`MongoDBDebeziumToJSONDeserializer.java:30-34,195-257`):
  *
  *  - `doc-string`: the whole document as one JSON string column
  *  - `top-level-string`: every top-level field stringified; a field
  *    not in the discovered schema aborts the job ("map collection to
  *    new name" — the Mongo flavor of schema evolution, SURVEY §1.2)
  *  - `top-level-type`: typed top-level fields per the sampled schema
  *    (missing fields → null fill)
  *
  * The document arrives as extended JSON under `_doc`; field access
  * goes through get_json_object (optimizer-visible), the extended-
  * JSON unwrap through MongoExtJson.
  */
object MongoModes {
  sealed trait Mode
  case object DocString extends Mode
  case object TopLevelString extends Mode
  case object TopLevelType extends Mode

  private val unwrapUdf = udf(MongoExtJson.unwrap _)
  private val idUdf = udf(MongoExtJson.normalizeId _)

  /** Project one collection's frame per the configured mode. Keeps
    * `_op`/`_ts`/`_txn_op_index` like the reference sink schema.
    *
    * Parse discipline: the top-level modes stage `_doc` ONCE (one
    * parse of the envelope) and pull every schema field from it with
    * a single `json_tuple` (one parse of the document) — the naive
    * per-field `get_json_object($._doc.f)` re-parses the WHOLE
    * envelope once per column, O(fields) full parses per row, which
    * at a 100 TB mongo lake with wide collections is the demux's
    * dominant cost. 2 parses per row regardless of width instead.
    */
  def project(frame: DataFrame, spec: TableSpec, mode: Mode): DataFrame = {
    val metaNames = Seq("_op", "_ts", "_txn_op_index")
    val meta = metaNames.map(col)
    def withDoc = frame.select(
      get_json_object(col("_raw"), "$._doc").as("_docstr") +: meta: _*)
    // one json_tuple = ONE parse for every field; its outputs come
    // back as c0..cN, renamed to the schema field names positionally.
    // A collection field named like a metadata column would make that
    // rename produce duplicate names and fail downstream with an
    // ambiguous-reference error — fail HERE with the real cause
    // instead (the operator's fix is a field/name map, same as any
    // other collision).
    def tupled(fields: Seq[String]): DataFrame = {
      val shadowed = fields.filter(metaNames.contains)
      require(shadowed.isEmpty,
        s"collection ${spec.key}: field(s) ${shadowed.mkString(", ")} " +
          "shadow pipeline metadata columns (_op/_ts/_txn_op_index) — " +
          "rename them via the field name map before ingesting")
      withDoc
        .select((meta :+ json_tuple(col("_docstr"), fields: _*)): _*)
        .toDF(metaNames ++ fields: _*)
    }
    mode match {
      case DocString =>
        withDoc.select(
          idUdf(get_json_object(col("_docstr"), "$._id")).as("_id") +:
            col("_docstr").as("doc") +: meta: _*)
      case TopLevelString =>
        val fields = spec.schema.fieldNames.toSeq
        tupled(fields).select(
          fields.map(f => unwrapUdf(col(f)).as(f)) ++ meta: _*)
      case TopLevelType =>
        val fields = spec.schema.fields.toSeq
        tupled(fields.map(_.name)).select(
          fields.map(f =>
            unwrapUdf(col(f.name)).cast(f.dataType).as(f.name)) ++ meta: _*)
    }
  }

  /** top-level-string schema-drift guard: any document field outside
    * the discovered schema aborts
    * (`MongoDBDebeziumToJSONDeserializer.java:244-254`). Returns the
    * set of unexpected fields found in the batch.
    */
  def driftCheck(frame: DataFrame, spec: TableSpec): Set[String] = {
    val known = spec.schema.fieldNames.toSet ++ Set("_id")
    // Top-level keys ONLY, like the reference's doc.keySet() walk
    // (MongoDBDebeziumToJSONDeserializer.java:233-254): a nested
    // sub-document's fields (stringified by the type mapping) must not
    // count as drift. json_object_keys parses the JSON properly, so
    // key-like text inside string values can't false-positive either.
    // RAW-key comparison, deliberately: the projection extracts by
    // the schema field name as the literal JSON key, so a doc key the
    // sanitizer would change (`sku-2` vs schema `sku_2`) can NEVER be
    // extracted — treating it as known would convert the loud abort
    // into a permanently-null column. Such keys abort like any other
    // drift; the proposal's note flags them as needing a manual
    // source-side rename.
    frame
      .select(explode(json_object_keys(get_json_object(col("_raw"), "$._doc")))
        .as("f"))
      .filter(!col("f").startsWith("$"))
      .distinct().collect().map(_.getString(0)).toSet
      .diff(known)
  }
}
