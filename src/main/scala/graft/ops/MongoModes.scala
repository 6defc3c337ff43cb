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
    */
  def project(frame: DataFrame, spec: TableSpec, mode: Mode): DataFrame = {
    val meta = Seq(col("_op"), col("_ts"), col("_txn_op_index"))
    mode match {
      case DocString =>
        frame.select(
          idUdf(get_json_object(col("_raw"), "$._doc._id")).as("_id") +:
            get_json_object(col("_raw"), "$._doc").as("doc") +: meta: _*)
      case TopLevelString =>
        frame.select(
          spec.schema.fieldNames.toSeq.map(f =>
            unwrapUdf(get_json_object(col("_raw"), s"$$._doc.$f")).as(f))
            ++ meta: _*)
      case TopLevelType =>
        frame.select(
          spec.schema.fields.toSeq.map { f =>
            val raw = unwrapUdf(get_json_object(col("_raw"), s"$$._doc.${f.name}"))
            raw.cast(f.dataType).as(f.name) // missing field ⇒ null fill
          } ++ meta: _*)
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
    frame
      .select(explode(json_object_keys(get_json_object(col("_raw"), "$._doc")))
        .as("f"))
      .filter(!col("f").startsWith("$"))
      .distinct().collect().map(_.getString(0)).toSet
      .diff(known)
  }
}
