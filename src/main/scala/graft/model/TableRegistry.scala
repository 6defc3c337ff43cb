package graft.model

import org.apache.spark.sql.types._
import graft.schema.Sanitizer

/** Per-table sink spec — replaces the reference's
  * `Map<String, Tuple2<OutputTag, avro-schema-json>>` registry
  * (`MySQLStreamer.java:313-457`): StructType instead of an Avro JSON
  * string, path template instead of an OutputTag.
  *
  * @param db      sanitized database/schema name ("" for bare keys)
  * @param table   sanitized table/collection name
  * @param schema  payload columns only (metadata added by the sink)
  */
final case class TableSpec(db: String, table: String, schema: StructType) {
  /** Routing key: `db.table` (MySQL/Oracle) or bare `table`
    * (Postgres/Mongo) — `MySQLStreamer.java:444`,
    * `PostgresStreamer.java:264`.
    */
  def key: String = if (db.isEmpty) table else s"$db.$table"

  /** Sink directory: `{sink}/{source_id}_{db}__{table}`
    * (`FlinkCDCMulti.java:372-389`).
    */
  def sinkDir(sinkRoot: String, sourceId: String): String =
    if (db.isEmpty) s"$sinkRoot/${sourceId}_$table"
    else s"$sinkRoot/${sourceId}_${db}__$table"
}

/** The table registry built at job start. Name maps are applied here,
  * once, keyed by the ORIGINAL (config-declared) names — the
  * reference's `_database`-keyed lookup done ahead of time
  * (`SideInputProcessFunction.java:68-118`; we deliberately skip its
  * lossy `_`→`-` reverse lookup, SURVEY §1.4).
  */
final case class TableRegistry(
    tables: Seq[TableSpec],
    dbNameMap: Map[String, String] = Map.empty,
    tableNameMap: Map[String, String] = Map.empty) {

  /** Registry after sanitization + renames. ROUTING keys are the
    * SANITIZED original names — envelopes carry sanitized `_db`/`_tbl`
    * (FIXTURES §A.1), so a raw config key like `my-db.users` would
    * never match its own events. The spec's db/table carry the
    * (renamed, sanitized) SINK identity.
    */
  lazy val routed: Map[String, TableSpec] = tables.map { t =>
    val db = dbNameMap.getOrElse(t.db, t.db)
    val tbl = tableNameMap.getOrElse(t.key, t.table)
    val spec = t.copy(db = Sanitizer(db), table = Sanitizer(tbl))
    val routeKey =
      if (t.db.isEmpty) Sanitizer(t.table)
      else s"${Sanitizer(t.db)}.${Sanitizer(t.table)}"
    routeKey -> spec
  }.toMap

  def keys: Set[String] = routed.keySet

  /** Route key → the ORIGINAL (config-declared) source identity —
    * what a live JDBC connection must query. `routed` carries the
    * renamed/sanitized SINK identity, which may not exist at the
    * source at all (a `table.name.map` points the sink at
    * `users_v20231114` while the source table is still `users`).
    */
  lazy val sourceTables: Map[String, TableSpec] = tables.map { t =>
    val routeKey =
      if (t.db.isEmpty) Sanitizer(t.table)
      else s"${Sanitizer(t.db)}.${Sanitizer(t.table)}"
    routeKey -> t
  }.toMap

  /** The `{db}_ddl` side table registered per database
    * (`MySQLStreamer.java:459-481`). The reference's DDL outputTagID is
    * `{db}_ddl` (`MySQLStreamer.java` createDDLTableForDatabase), so
    * with an empty db the sink dir comes out
    * `{sink}/{sourceId}_{db}_ddl` — matching the upstream layout
    * (a non-empty db here would add a stray `{db}__` infix).
    */
  def ddlSpec(db: String): TableSpec =
    TableSpec("", s"${Sanitizer(db)}_ddl", TableRegistry.DdlSchema)
}

object TableRegistry {
  /** DDL event table schema (`MySQLStreamer.java:472-481`);
    * `_binlog_pos_end` is BIGINT in the reference's Avro schema.
    */
  val DdlSchema: StructType = StructType(Seq(
    StructField("_ddl", StringType),
    StructField("_ddl_tbl", StringType),
    StructField("_ts", LongType),
    StructField("_binlog_file", StringType),
    StructField("_binlog_pos_end", LongType)))
}
