package graft.ops

/** MongoDB extended-JSON scalar unwrap — the T4 transform
  * (`MongoDBDebeziumToJSONDeserializer.java:112-172`): Debezium emits
  * Mongo values as extended JSON (`{"$numberLong": "5"}`); the sink
  * wants plain scalars. Pure string-level function so it can run as a
  * Catalyst-friendly map or be unit-tested without Spark.
  */
object MongoExtJson {

  private val Wrapped =
    """\{\s*"\$(numberLong|numberInt|numberDouble|numberDecimal|oid|date|timestamp)"\s*:\s*(.+?)\s*\}""".r

  /** Unwraps one extended-JSON value; non-wrapped values pass through.
    *   {"$numberLong": "152"}   → 152
    *   {"$numberDouble": "1.5"} → 1.5
    *   {"$oid": "abc..."}       → "abc..." (string, kept quoted)
    *   {"$date": 1700000000000} → 1700000000000
    *   {"$timestamp": {"t": 1, "i": 2}} → {"t": 1, "i": 2}
    */
  def unwrap(json: String): String = json match {
    case null => null
    case Wrapped(tag, inner) => tag match {
      case "numberLong" | "numberInt" | "numberDouble" | "numberDecimal" =>
        inner.stripPrefix("\"").stripSuffix("\"")
      case "oid" => inner
      case "date" | "timestamp" => inner
      case _ => json
    }
    case _ => json
  }

  /** The `_id` normalization (`MongoDBDebeziumToJSONDeserializer.java:84-110`):
    * `{"$oid": "..."}` → the hex string; any other document id → its
    * literal JSON (the reference hashes it; we keep it readable).
    */
  def normalizeId(idJson: String): String = idJson match {
    case null => null
    case Wrapped("oid", inner) => inner.stripPrefix("\"").stripSuffix("\"")
    case other => other
  }
}
