package graft

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.model.{TableRegistry, TableSpec}
import graft.ops.DdlEvolution

/** The auto-evolution proposer (the reference's in-dev auto table
  * name mapping): dated version names, the mechanical ALTER subset,
  * and the bail-to-manual contract for everything else.
  */
class DdlEvolutionSpec extends AnyFunSuite {

  private val base = StructType(Seq(
    StructField("id", IntegerType), StructField("name", StringType),
    StructField("balance", StringType)))

  private val registry = TableRegistry(Seq(
    TableSpec("testdb", "users", base)))

  // 1700000002000 ms = 2023-11-14 UTC
  private val ts = 1700000002000L

  test("versioned name follows the reference's dated convention") {
    assert(DdlEvolution.versionedName("users", ts) == "users_v20231114")
  }

  test("ADD COLUMN evolves the schema with the §1.3 type collapse") {
    val s = DdlEvolution.evolveSchema(base,
      "ALTER TABLE users ADD COLUMN age INT").get
    assert(s.fieldNames.toSeq == Seq("id", "name", "balance", "age"))
    assert(s("age").dataType == IntegerType)
    // display width + UNSIGNED + constraints don't confuse the mapping
    val u = DdlEvolution.evolveSchema(base,
      "ALTER TABLE users ADD `hits` INT(11) UNSIGNED NOT NULL DEFAULT 0").get
    assert(u("hits").dataType == LongType) // unsigned int widens
    val d = DdlEvolution.evolveSchema(base,
      "ALTER TABLE users ADD COLUMN rate DECIMAL(10,2)").get
    assert(d("rate").dataType == StringType) // decimal-as-string policy
  }

  test("DROP / MODIFY / CHANGE / RENAME COLUMN, comma-chained") {
    val s = DdlEvolution.evolveSchema(base,
      "ALTER TABLE users DROP COLUMN balance, MODIFY COLUMN id BIGINT").get
    assert(s.fieldNames.toSeq == Seq("id", "name"))
    assert(s("id").dataType == LongType)
    val c = DdlEvolution.evolveSchema(base,
      "ALTER TABLE users CHANGE name full_name VARCHAR(100)").get
    assert(c.fieldNames.toSeq == Seq("id", "full_name", "balance"))
    val r = DdlEvolution.evolveSchema(base,
      "ALTER TABLE users RENAME COLUMN name TO nm").get
    assert(r.fieldNames.toSeq == Seq("id", "nm", "balance"))
  }

  test("outside the mechanical subset → None, never a wrong schema") {
    // engine-specific clause
    assert(DdlEvolution.evolveSchema(base,
      "ALTER TABLE users PARTITION BY HASH(id)").isEmpty)
    // one good clause + one unknown: the whole evolution bails
    assert(DdlEvolution.evolveSchema(base,
      "ALTER TABLE users ADD COLUMN age INT, ALGORITHM=INPLACE").isEmpty)
    // dropping a column the schema doesn't have
    assert(DdlEvolution.evolveSchema(base,
      "ALTER TABLE users DROP COLUMN ghost").isEmpty)
    // adding a column that already exists
    assert(DdlEvolution.evolveSchema(base,
      "ALTER TABLE users ADD COLUMN name TEXT").isEmpty)
    // not an ALTER at all
    assert(DdlEvolution.evolveSchema(base, "TRUNCATE TABLE users").isEmpty)
    // ADD of a non-column object that still classifies as Stop: must
    // NOT become a column named PRIMARY/UNIQUE
    assert(DdlEvolution.evolveSchema(base,
      "ALTER TABLE users ADD PRIMARY KEY (id)").isEmpty)
    assert(DdlEvolution.evolveSchema(base,
      "ALTER TABLE users ADD UNIQUE idx_name (name)").isEmpty)
    // the multi-column paren form is outside the subset
    assert(DdlEvolution.evolveSchema(base,
      "ALTER TABLE users ADD COLUMN (a INT, b INT)").isEmpty)
    // ...but a backquoted reserved word IS a real column
    val q = DdlEvolution.evolveSchema(base,
      "ALTER TABLE users ADD COLUMN `key` VARCHAR(10)").get
    assert(q.fieldNames.contains("key"))
  }

  test("propose: tracked structural DDL only; name map always present") {
    val p = DdlEvolution.propose(registry, "testdb", "users",
      "ALTER TABLE users ADD COLUMN age INT", ts).get
    assert(p.routeKey == "testdb.users")
    assert(p.newTableName == "users_v20231114")
    assert(p.tableNameMapEntry == ("testdb.users" -> "users_v20231114"))
    assert(p.schema.exists(_.fieldNames.contains("age")))
    assert(p.configJson ==
      """{"table.name.map": {"testdb.users": "users_v20231114"}}""")
    // unparseable ALTER: proposal survives, schema falls to manual
    val manual = DdlEvolution.propose(registry, "testdb", "users",
      "ALTER TABLE users CONVERT TO CHARACTER SET utf8mb4", ts).get
    assert(manual.schema.isEmpty && manual.note.contains("manually"))
    // untracked table → no proposal
    assert(DdlEvolution.propose(registry, "testdb", "ghosts",
      "ALTER TABLE ghosts ADD COLUMN x INT", ts).isEmpty)
    // non-structural DDL → no proposal
    assert(DdlEvolution.propose(registry, "testdb", "users",
      "CREATE INDEX i1 ON users (id)", ts).isEmpty)
  }

  test("applyProposal keys BOTH rewritten entries by the RAW config " +
      "spelling (dash-named db)") {
    // raw key "my-db.users" sanitizes to route key "my_db.users";
    // TableRegistry.routed looks tableNameMap up by the RAW key, so a
    // sanitized-key entry would silently never rename the sink
    val dashRegistry = TableRegistry(Seq(TableSpec("my-db", "users", base)))
    val p = DdlEvolution.propose(dashRegistry, "my-db", "users",
      "ALTER TABLE users ADD COLUMN age INT", ts).get
    assert(p.routeKey == "my_db.users")
    // the PASTEABLE surface (logged configJson) must carry the raw
    // spelling too — TableRegistry looks the map up by the raw key
    assert(p.tableNameMapEntry == ("my-db.users" -> "users_v20231114"))
    assert(p.configJson.contains("\"my-db.users\""))
    val v1 = Map(
      "source.id" -> "s", "source.type" -> "mysql", "sink.path" -> "SINK",
      "table.schemas" ->
        """{"my-db.users": "id:INT,name:VARCHAR(50),balance:DECIMAL(10,2)"}""")
    val v2 = DdlEvolution.applyProposal(v1, p)
    val reg = graft.streaming.CdcJob.registryFromConfig(v2)
    val spec = reg.routed("my_db.users")
    assert(spec.table == "users_v20231114") // the rename APPLIED
    assert(spec.schema.fieldNames.contains("age"))
  }

  test("applyProposal prefers the proposal's own raw spelling over a " +
      "schemas-key scan — the two derivations cannot diverge") {
    // a config may carry NO table.schemas entry for the table (the
    // registry could have been built from live discovery): the
    // schemas-scan fallback would then key the rewrite by the
    // SANITIZED routeKey — silently-never-applies. The proposal's
    // tableNameMapEntry already carries the raw spelling from
    // sourceTables; applyProposal must use it.
    val dashRegistry = TableRegistry(Seq(TableSpec("my-db", "users", base)))
    val p = DdlEvolution.propose(dashRegistry, "my-db", "users",
      "ALTER TABLE users ADD COLUMN age INT", ts).get
    val v1 = Map(
      "source.id" -> "s", "source.type" -> "mysql", "sink.path" -> "SINK")
    val v2 = DdlEvolution.applyProposal(v1, p)
    val names = graft.streaming.JobConfig.nameMap(v2, "table.name.map")
    assert(names == Map("my-db.users" -> "users_v20231114"), names)
  }

  test("applyProposal and configJson JSON-escape raw spellings — a " +
      "quote or backslash in a name still renders parseable config") {
    val weird = """my"db.ta\ble"""
    val p = graft.ops.EvolutionProposal(
      routeKey = "my_db.ta_ble",
      newTableName = "ta_ble_v20231114",
      tableNameMapEntry = weird -> "ta_ble_v20231114",
      schema = None,
      note = "")
    // configJson must be real JSON despite the raw " and \
    assert(p.configJson.contains("""my\"db.ta\\ble"""), p.configJson)
    val v2 = DdlEvolution.applyProposal(Map(
      "source.id" -> "s", "source.type" -> "mysql",
      "sink.path" -> "SINK"), p)
    // the rewritten value parses back to the EXACT raw spelling
    val names = graft.streaming.JobConfig.nameMap(v2, "table.name.map")
    assert(names == Map(weird -> "ta_ble_v20231114"), names)
  }

  test("mongo drift proposal auto-appends only sanitizer-stable " +
      "extractable fields; the rest go to the manual note") {
    val spec = TableSpec("", "orders", StructType(Seq(
      StructField("_id", StringType), StructField("sku_2", StringType))))
    // "extra" is stable → appended; "sku-2" collides with sku_2 after
    // sanitization and "brand-new" isn't sanitizer-stable — the
    // projection can't extract either (json_tuple uses the schema name
    // as the literal JSON key), so auto-appending them would create
    // permanently-null (or duplicate) columns — manual instead
    val p = DdlEvolution.proposeMongoDrift(spec, "orders",
      Set("sku-2", "brand-new", "extra"), ts)
    val evolved = p.schema.get
    assert(evolved.fieldNames.toSeq == Seq("_id", "sku_2", "extra"))
    // the manual list is exactly the two unextractable fields
    assert(p.note.contains("field(s) brand-new, sku-2 need a MANUAL"),
      p.note)
  }
}
