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
    /** Primary-key column names in KEY_SEQ order; empty = no PK (or
      * the provider can't know — the safe reading either way is
      * "nothing to chunk on"). Defaulted so fixture providers that
      * predate the method keep compiling; the live adapter overrides
      * it with a real `getPrimaryKeys` walk.
      */
    def primaryKeys(db: String, table: String): Seq[String] = Seq.empty
  }

  /** Adapter over a live connection's metadata
    * (`connection.getMetaData`): catalog- or schema-scoped
    * getTables/getColumns, mirroring the reference's calls. The table
    * name is escaped before use as a `tableNamePattern` — JDBC treats
    * it as a LIKE pattern, so an unescaped `user_events` would also
    * match `userXevents` and merge a sibling table's columns into the
    * schema.
    *
    * @param dbIsSchema how the engine namespaces "databases": MySQL
    *   exposes them as JDBC CATALOGs (the reference's walk,
    *   `MySQLStreamer.java:334-457`); Postgres/Oracle/Derby expose
    *   them as SCHEMAs, where the catalog slot must stay null and the
    *   db name goes in `schemaPattern` (escaped — it's a LIKE pattern
    *   too).
    */
  def fromDatabaseMetaData(md: java.sql.DatabaseMetaData,
      dbIsSchema: Boolean = false): MetadataProvider =
    new MetadataProvider {
      private def drain[A](rs: java.sql.ResultSet)(
          read: java.sql.ResultSet => A): Seq[A] =
        try {
          val out = scala.collection.mutable.ArrayBuffer.empty[A]
          while (rs.next()) out += read(rs)
          out.toSeq
        } finally rs.close()
      // Escaping narrows what the engine sends back, but it is NOT
      // the correctness guarantee: Derby's getSearchStringEscape
      // returns "" (no escape support at all — an escaped pattern
      // matches nothing, an unescaped one matches siblings), so every
      // result row below is ALSO post-filtered by exact name equality
      // on the result set's own TABLE_NAME/namespace columns.
      private def escapeLike(name: String): String = {
        val esc = md.getSearchStringEscape
        if (esc == null || esc.isEmpty) name
        else name.replace(esc, esc + esc)
          .replace("_", esc + "_").replace("%", esc + "%")
      }
      private def catalogOf(db: String): String =
        if (dbIsSchema) null else db
      private def schemaOf(db: String): String =
        if (dbIsSchema) escapeLike(db) else null
      private def namespace(rs: java.sql.ResultSet): String =
        if (dbIsSchema) rs.getString("TABLE_SCHEM")
        else rs.getString("TABLE_CAT")
      // Case-insensitive equality, null-tolerant: case-insensitive
      // engines (MySQL lower_case_table_names, Derby's upcasing) may
      // report a different case than the config declares, and some
      // drivers return a null namespace column — a null can't
      // CONTRADICT the request (the engine already scoped the query),
      // so it passes; only a conflicting non-null name is a sibling
      // to drop.
      private def sameName(reported: String, requested: String): Boolean =
        reported == null || reported.equalsIgnoreCase(requested)
      def tables(db: String): Seq[String] =
        drain(md.getTables(catalogOf(db), schemaOf(db), "%",
          Array("TABLE")))(rs => namespace(rs) -> rs.getString("TABLE_NAME"))
          .collect { case (ns, t) if sameName(ns, db) => t }
      def columns(db: String, table: String): Seq[(String, String)] =
        drain(md.getColumns(catalogOf(db), schemaOf(db), escapeLike(table),
          "%"))(rs => (namespace(rs), rs.getString("TABLE_NAME"),
            rs.getString("COLUMN_NAME") -> rs.getString("TYPE_NAME")))
          .collect { case (ns, t, col)
            if sameName(ns, db) && sameName(t, table) => col }
      // getPrimaryKeys takes EXACT names (not LIKE patterns — no
      // escaping). Case-insensitive engines may store a different
      // case than the config declares (Derby/Oracle upcase, MySQL
      // lower_case_table_names), and a MySQL-shaped config may run
      // against a schema-namespaced engine — so try the declared
      // spelling then the case variants, under the configured
      // namespace convention first and the opposite one as a
      // fallback, post-filtering by exact name like every other call.
      override def primaryKeys(db: String, table: String): Seq[String] = {
        // the db name lands in TABLE_CAT or TABLE_SCHEM depending on
        // which convention actually matched — check both; the unused
        // slot is null (or "": Derby reports an empty catalog), which
        // can't contradict, and the real one must agree
        def nsOk(reported: String): Boolean =
          reported == null || reported.isEmpty ||
            reported.equalsIgnoreCase(db)
        def probe(cat: String, sch: String, t: String): Seq[String] =
          drain(md.getPrimaryKeys(cat, sch, t))(rs =>
            (rs.getString("TABLE_CAT"), rs.getString("TABLE_SCHEM"),
              rs.getString("TABLE_NAME"),
              rs.getShort("KEY_SEQ"), rs.getString("COLUMN_NAME")))
            .collect { case (c, s, tn, seq, col)
              if nsOk(c) && nsOk(s) && sameName(tn, table) => seq -> col }
            .sortBy(_._1).map(_._2)
        val variants = Seq((db, table), (db.toUpperCase, table.toUpperCase),
          (db.toLowerCase, table.toLowerCase)).distinct
        val scopings: Seq[(String, String) => Seq[String]] =
          if (dbIsSchema) Seq((d, t) => probe(null, d, t),
            (d, t) => probe(d, null, t))
          else Seq((d, t) => probe(d, null, t), (d, t) => probe(null, d, t))
        (for {
          scope <- scopings.iterator
          (d, t) <- variants.iterator
          pk = scope(d, t) if pk.nonEmpty
        } yield pk).nextOption().getOrElse(Seq.empty)
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
              else {
                // fail fast on a typo'd specific entry — getColumns on
                // a non-existent table would otherwise fabricate an
                // empty-schema spec that silently sinks no columns
                val named = entries.map(_.substring(db.length + 1))
                val known = meta.tables(db).toSet
                val missing = named.filterNot(known)
                if (missing.nonEmpty) throw new IllegalArgumentException(
                  s"UNKNOWN TABLE(S) IN $db: ${missing.mkString(", ")} " +
                    s"(discovered: ${known.toSeq.sorted.mkString(", ")})")
                named
              }
    } yield TableSpec(db, name,
      TypeMapping.schemaFromJdbc(meta.columns(db, name), oracle))
    TableRegistry(specs, dbNameMap = dbNameMap, tableNameMap = tableNameMap)
  }
}
