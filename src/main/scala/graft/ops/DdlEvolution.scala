package graft.ops

import org.apache.spark.sql.types.StructType

import graft.model.TableRegistry
import graft.schema.{Sanitizer, TypeMapping}

/** The reference's in-dev "Auto table name mapping when a DDL is met,
  * for MySQL" (`README.md:54`), completing its manual evolution story
  * (`README.md:15`: new table version `mytable_v20240401` dated by
  * the change): when a structural DDL stops the job, propose the
  * exact configuration the operator's runbook would hand-write — the
  * `table.name.map` entry pointing at the dated version name, and
  * (for the ALTER subset whose effect on the schema is mechanical)
  * the evolved payload schema itself.
  *
  * The proposal is advisory by design: graft logs it and exposes it
  * on the pipeline ([[graft.streaming.CdcPipeline.evolutionProposals]])
  * rather than hot-swapping the registry mid-job — the reference
  * stops the job for a reason (in-flight sinks, downstream contracts),
  * and an unparseable ALTER (engine-specific clauses, multi-action
  * statements mixing structural and not) must degrade to "name map
  * only, schema by operator", never to a silently wrong schema.
  */
final case class EvolutionProposal(
    /** Routing key of the table the DDL hit (`db.table`). */
    routeKey: String,
    /** The dated version name, e.g. `users_v20240401`. */
    newTableName: String,
    /** Ready-to-paste name-map entry (the config key it belongs
      * under is [[nameMapKey]]).
      */
    tableNameMapEntry: (String, String),
    /** Evolved payload schema, when the ALTER subset allows deriving
      * it mechanically; None = operator declares it (the proposal
      * says why in `note`).
      */
    schema: Option[StructType],
    note: String,
    /** Which config map the entry pastes into: `table.name.map` for
      * the relational flavors, `collection.name.map` for Mongo — the
      * reference's MongoDB streamer reads its renames from the
      * collection-flavored key (`MongoDBStreamer.java:65`), and the
      * proposal must emit the spelling that flavor's config actually
      * loads.
      */
    nameMapKey: String = "table.name.map") {
  /** The flat-config rendering the runbook pastes. JSON-escaped the
    * same way as [[DdlEvolution.applyProposal]]'s renderMap — a raw
    * spelling containing `"` or `\` must still paste as valid JSON.
    */
  def configJson: String = {
    def esc(s: String): String =
      s.replace("\\", "\\\\").replace("\"", "\\\"")
    val (k, v) = tableNameMapEntry
    s"""{"$nameMapKey": {"${esc(k)}": "${esc(v)}"}}"""
  }
}

object DdlEvolution {

  /** `mytable` + change time → `mytable_v20240401` (UTC date, the
    * reference's versioning convention).
    */
  def versionedName(table: String, tsMillis: Long): String = {
    val d = java.time.format.DateTimeFormatter.ofPattern("yyyyMMdd")
      .withZone(java.time.ZoneOffset.UTC)
      .format(java.time.Instant.ofEpochMilli(tsMillis))
    s"${table}_v$d"
  }

  private def stripQuotes(s: String): String =
    s.trim.stripPrefix("`").stripSuffix("`")

  /** Tokens that mean an ADD/DROP clause is NOT a column operation
    * (`ADD PRIMARY KEY (id)`, `ADD UNIQUE idx (col)`, `DROP PARTITION
    * p0`...). Without this guard `ADD PRIMARY KEY` would parse as
    * adding a column named `PRIMARY` — the silently-wrong-schema
    * outcome this module promises never to produce. A backtick-quoted
    * name (`` `primary` ``) is a real column and stays allowed.
    */
  private val NonColumnTokens = Set("PRIMARY", "UNIQUE", "FOREIGN",
    "INDEX", "KEY", "CONSTRAINT", "FULLTEXT", "SPATIAL", "PARTITION",
    "CHECK")

  /** A plain or backquoted identifier — anything else (the
    * multi-column paren form `ADD COLUMN (a INT, b INT)`, expressions,
    * reserved words) bails the clause to manual, the safe direction.
    */
  private def isColumnName(raw: String): Boolean = {
    val t = raw.trim
    t.matches("`[^`]+`") ||
      (t.matches("[A-Za-z_][A-Za-z0-9_$]*") &&
        !NonColumnTokens.contains(t.toUpperCase))
  }

  /** DDL type token → TYPE_NAME for the §1.3 collapse: display width
    * / precision parens dropped (`INT(11)` → `INT`), an UNSIGNED
    * attribute kept (it widens ints to long).
    */
  private def typeNameOf(tokens: Seq[String]): String = {
    val base = tokens.headOption.getOrElse("")
      .replaceAll("\\(.*\\)$", "").replaceAll("\\(.*", "")
    val unsigned = tokens.map(_.toUpperCase).contains("UNSIGNED")
    if (unsigned) s"$base UNSIGNED" else base
  }

  /** Split an ALTER body on top-level commas (type parens like
    * `DECIMAL(10,2)` protected) — the shared tokenizer.
    */
  private def clauses(body: String): Seq[String] =
    TypeMapping.splitTopLevel(body).map(_.trim).filter(_.nonEmpty)

  private val AlterRe =
    """(?is)\s*ALTER\s+TABLE\s+(\S+)\s+(.*?)\s*;?\s*""".r
  private val AddRe =
    """(?is)ADD\s+(?:COLUMN\s+)?(\S+)\s+(\S+.*)""".r
  private val DropRe = """(?is)DROP\s+(?:COLUMN\s+)?(\S+)\s*""".r
  private val ModifyRe =
    """(?is)MODIFY\s+(?:COLUMN\s+)?(\S+)\s+(\S+.*)""".r
  private val ChangeRe =
    """(?is)CHANGE\s+(?:COLUMN\s+)?(\S+)\s+(\S+)\s+(\S+.*)""".r
  private val RenameColRe =
    """(?is)RENAME\s+COLUMN\s+(\S+)\s+TO\s+(\S+)\s*""".r

  /** Apply the mechanical ALTER subset (ADD/DROP/MODIFY/CHANGE/RENAME
    * COLUMN, comma-chained) to a payload schema. None when any clause
    * falls outside the subset or references a column the schema
    * doesn't have — a partial evolution would be worse than none.
    */
  def evolveSchema(schema: StructType, ddl: String): Option[StructType] =
    ddl match {
      case AlterRe(_, body) =>
        clauses(body).foldLeft(Option(schema)) { (acc, clause) =>
          acc.flatMap { s =>
            def has(n: String) = s.fieldNames.contains(Sanitizer(n))
            clause match {
              case AddRe(name, rest) if isColumnName(name) =>
                val n = Sanitizer(stripQuotes(name))
                if (s.fieldNames.contains(n)) None
                else Some(StructType(s.fields :+
                  org.apache.spark.sql.types.StructField(n,
                    TypeMapping.jdbcToSpark(
                      typeNameOf(rest.trim.split("\\s+").toSeq)),
                    nullable = true)))
              case DropRe(name) if has(stripQuotes(name)) =>
                val n = Sanitizer(stripQuotes(name))
                Some(StructType(s.fields.filterNot(_.name == n)))
              case ModifyRe(name, rest) if has(stripQuotes(name)) =>
                val n = Sanitizer(stripQuotes(name))
                val t = TypeMapping.jdbcToSpark(
                  typeNameOf(rest.trim.split("\\s+").toSeq))
                Some(StructType(s.fields.map(f =>
                  if (f.name == n) f.copy(dataType = t) else f)))
              case ChangeRe(old, nw, rest)
                  if has(stripQuotes(old)) && isColumnName(nw) =>
                val o = Sanitizer(stripQuotes(old))
                val n = Sanitizer(stripQuotes(nw))
                val t = TypeMapping.jdbcToSpark(
                  typeNameOf(rest.trim.split("\\s+").toSeq))
                Some(StructType(s.fields.map(f =>
                  if (f.name == o) f.copy(name = n, dataType = t) else f)))
              case RenameColRe(old, nw)
                  if has(stripQuotes(old)) && isColumnName(nw) =>
                val o = Sanitizer(stripQuotes(old))
                val n = Sanitizer(stripQuotes(nw))
                Some(StructType(s.fields.map(f =>
                  if (f.name == o) f.copy(name = n) else f)))
              case _ => None
            }
          }
        }
      case _ => None
    }

  /** Spark type → a config TYPE token that round-trips through the
    * §1.3 MySQL collapse (`TypeMapping.jdbcToSpark`) — the reference's
    * auto-mapping roadmap line is MySQL-scoped (`README.md:54`), and
    * so is this rendering.
    */
  private def typeToken(dt: org.apache.spark.sql.types.DataType): String = {
    import org.apache.spark.sql.types._
    dt match {
      case IntegerType => "INT"
      case LongType => "BIGINT"
      case DoubleType => "DOUBLE"
      case BooleanType => "BOOLEAN"
      case _ => "VARCHAR(255)"
    }
  }

  /** Close the runbook loop: rewrite a flat job config with a
    * proposal, producing the EXACT config the restarted job loads —
    * `table.name.map` gains the dated-version entry, and (when the
    * ALTER was mechanical) the table's `table.schemas` entry is
    * replaced with the evolved column list. A pure function so an
    * operator — or a supervisor process restarting from the logged
    * proposal — applies it verbatim instead of hand-assembling the v2
    * registry. `table.schemas` keys keep their RAW config spelling
    * (the proposal's routeKey is the sanitized form — matched through
    * the same collapse `configFromMap` applies).
    */
  def applyProposal(cfg: Map[String, String],
      p: EvolutionProposal): Map[String, String] = {
    // renderMap must JSON-escape \ and " — a raw table spelling or
    // schema token containing either would otherwise render an
    // unparseable rewritten config, breaking the runbook loop's
    // verbatim-apply artifact (JobConfig.parse unescapes both back)
    def esc(s: String): String =
      s.replace("\\", "\\\\").replace("\"", "\\\"")
    def renderMap(m: Map[String, String]): String =
      m.toSeq.sortBy(_._1).map { case (k, v) =>
        s""""${esc(k)}": "${esc(v)}"""" }.mkString("{", ", ", "}")
    def sanitizeKey(raw: String): String = raw.split("\\.", 2) match {
      case Array(d, t) => s"${Sanitizer(d)}.${Sanitizer(t)}"
      case Array(t) => Sanitizer(t)
    }
    val schemas = graft.streaming.JobConfig.nameMap(cfg, "table.schemas")
    // BOTH rewritten entries must keep the RAW config spelling:
    // `TableRegistry.routed` looks `tableNameMap` up by the raw
    // declared key (`t.key`), so an entry keyed by the sanitized
    // route key would silently never apply for a dash/dot-named
    // db or table — the rows would land in the OLD undated sink
    // with the NEW schema, the exact fork the versioning prevents.
    // The proposal itself already carries the raw spelling (its
    // tableNameMapEntry key came from `sourceTables` at propose
    // time) — prefer it, so the two raw-key derivations can never
    // diverge; fall back to a schemas-key scan only when the
    // proposal carries the sanitized routeKey (a source the
    // registry never raw-tracked).
    val rawKey = {
      val fromProposal = p.tableNameMapEntry._1
      if (fromProposal != p.routeKey) fromProposal
      else schemas.keys.find(sanitizeKey(_) == p.routeKey)
        .getOrElse(p.routeKey)
    }
    // the proposal names which map it pastes into (table.name.map
    // for relational flavors, collection.name.map for Mongo) — apply
    // must rewrite THAT key, or a mongo proposal would land in a map
    // the flavor-specific config surface never consults
    val names = graft.streaming.JobConfig.nameMap(cfg, p.nameMapKey) +
      (rawKey -> p.newTableName)
    val evolvedSchemas = p.schema match {
      case Some(s) =>
        schemas + (rawKey ->
          s.fields.map(f => s"${f.name}:${typeToken(f.dataType)}")
            .mkString(","))
      case None => schemas
    }
    cfg + (p.nameMapKey -> renderMap(names)) +
      ("table.schemas" -> renderMap(evolvedSchemas))
  }

  /** The Mongo flavor of a structural change
    * (`MongoDBDebeziumToJSONDeserializer.java:244-254`): the
    * top-level-string drift abort ("map collection to new name").
    * Same ready-made proposal as a MySQL DDL stop — dated collection
    * name map + the evolved sampled schema: existing fields ∪ each
    * new field as STRING (the top-level-string mode stringifies every
    * field; a re-sample would land the same way via
    * `TypeMapping.mongoClassToSpark`'s default).
    */
  def proposeMongoDrift(spec: graft.model.TableSpec, routeKey: String,
      driftFields: Set[String], tsMillis: Long,
      rawKey: Option[String] = None): EvolutionProposal = {
    import org.apache.spark.sql.types.{StringType, StructField}
    // Only SANITIZER-STABLE names auto-append: MongoModes.project
    // extracts by the schema field name as the literal JSON key, so a
    // doc key the sanitizer would change (`sku-2` → `sku_2`) can
    // never be extracted through its sanitized column — appending it
    // would produce a permanently-null column (and a collision with
    // an existing field would produce a duplicate-field StructType
    // that breaks json_tuple's rename and the parquet writer). Those
    // fields go to the note: the operator renames them at the source
    // or maps the collection, exactly the reference's manual story.
    val (stable, manual) = driftFields.toSeq.sorted.partition(f =>
      Sanitizer(f) == f && !spec.schema.fieldNames.contains(f))
    val evolved = StructType(spec.schema.fields ++
      stable.map(f => StructField(f, StringType, nullable = true)))
    EvolutionProposal(
      routeKey = routeKey,
      newTableName = versionedName(spec.table, tsMillis),
      tableNameMapEntry =
        rawKey.getOrElse(routeKey) -> versionedName(spec.table, tsMillis),
      schema = Some(evolved),
      // MongoDBStreamer.java:65 reads renames from collection.name.map
      nameMapKey = "collection.name.map",
      note = "mongo top-level-string drift: new field(s) " +
        s"${stable.mkString(", ")} appended as string to the " +
        "sampled schema" +
        (if (manual.isEmpty) ""
        else s"; field(s) ${manual.mkString(", ")} need a MANUAL " +
          "rename at the source (name not sanitizer-stable or " +
          "collides with an existing column — the projection cannot " +
          "extract them)"))
  }

  /** Proposal for one structural-DDL stop. None when the DDL's table
    * isn't in the registry (an untracked table can't need a version
    * bump) or the statement isn't structural.
    */
  def propose(registry: TableRegistry, db: String, table: String,
      ddl: String, tsMillis: Long,
      oracle: Boolean = false): Option[EvolutionProposal] = {
    if (DdlClassifier.classify(ddl, oracle) == DdlClassifier.Ignore) return None
    val sdb = Sanitizer(db); val stbl = Sanitizer(table)
    val routeKey = if (sdb.isEmpty) stbl else s"$sdb.$stbl"
    registry.routed.get(routeKey).map { spec =>
      val evolved = evolveSchema(spec.schema, ddl)
      // the name-map entry carries the RAW config spelling (the
      // ORIGINAL declared key, via sourceTables) — TableRegistry looks
      // tableNameMap up by the raw key, so a sanitized-keyed entry in
      // the pasteable configJson would silently never rename the sink
      // for a dash/dot-named db or table
      val rawKey = registry.sourceTables.get(routeKey)
        .map(_.key).getOrElse(routeKey)
      EvolutionProposal(
        routeKey = routeKey,
        newTableName = versionedName(spec.table, tsMillis),
        tableNameMapEntry = rawKey -> versionedName(spec.table, tsMillis),
        schema = evolved,
        note = if (evolved.isDefined)
          "schema evolved mechanically from the ALTER clause list"
        else "statement outside the mechanical ALTER subset — declare " +
          "the new schema manually (name map still applies)")
    }
  }
}
