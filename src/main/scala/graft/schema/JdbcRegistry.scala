package graft.schema

import graft.model.{TableRegistry, TableSpec}

/** Live-deployment registry builder: the `DatabaseMetaData` walk a
  * real job runs at startup (`MySQLStreamer.java:334-457`) —
  * discovered tables + `TYPE_NAME` columns → the §1.3 type collapse →
  * [[TableRegistry]]. Only the JDBC connection itself is
  * environment-dependent; everything behind [[MetadataProvider]] is
  * deterministic and unit-testable without a database.
  *
  * Table selection per configured database (the reference's filter
  * loop, wildcard at `MySQLStreamer.java:353-359`):
  *   - `db.*` present among the filter entries → ALL tables of `db`
  *     (wildcard wins over specific entries, as upstream `break`s);
  *   - specific `db.tbl` entries → exactly those tables;
  *   - no entries for `db` at all → all tables (upstream fallback).
  */
object JdbcRegistry {

  /** The minimal metadata surface the walk needs. Implemented by
    * [[fromDatabaseMetaData]] in a live deployment; by a fixture map
    * in tests.
    */
  trait MetadataProvider {
    /** TABLE-type table names of one database. */
    def tables(db: String): Seq[String]
    /** (COLUMN_NAME, TYPE_NAME) pairs in ordinal order. */
    def columns(db: String, table: String): Seq[(String, String)]
  }

  /** Adapter over a live connection's metadata
    * (`connection.getMetaData`): catalog-scoped getTables/getColumns,
    * mirroring the reference's calls.
    */
  def fromDatabaseMetaData(md: java.sql.DatabaseMetaData): MetadataProvider =
    new MetadataProvider {
      def tables(db: String): Seq[String] = {
        val rs = md.getTables(db, null, "%", Array("TABLE"))
        val out = scala.collection.mutable.ArrayBuffer.empty[String]
        while (rs.next()) out += rs.getString(3) // TABLE_NAME ordinal
        out.toSeq
      }
      def columns(db: String, table: String): Seq[(String, String)] = {
        val rs = md.getColumns(db, null, table, "%")
        val out = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
        while (rs.next())
          out += (rs.getString("COLUMN_NAME") -> rs.getString("TYPE_NAME"))
        out.toSeq
      }
    }

  /** Walk `databases` through `meta` and build the registry.
    *
    * @param tableFilter  `db.tbl` / `db.*` entries (config
    *   `table.list` semantics); empty ⇒ every table of every database
    * @param oracle       use the Oracle type-name collapse
    */
  def build(meta: MetadataProvider, databases: Seq[String],
      tableFilter: Seq[String] = Nil,
      dbNameMap: Map[String, String] = Map.empty,
      tableNameMap: Map[String, String] = Map.empty,
      oracle: Boolean = false): TableRegistry = {
    val specs = for {
      db <- databases
      entries = tableFilter.filter(_.startsWith(db + "."))
      name <- if (entries.contains(s"$db.*") || entries.isEmpty) meta.tables(db)
              else entries.map(_.substring(db.length + 1))
    } yield TableSpec(db, name,
      TypeMapping.schemaFromJdbc(meta.columns(db, name), oracle))
    TableRegistry(specs, dbNameMap = dbNameMap, tableNameMap = tableNameMap)
  }
}
