package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.{CdcJob, JobConfig}

/** Config-file-to-running-job assembly (§3.1): the CLI contract,
  * schema declaration through the §1.3 type collapse, name maps, and
  * a full snapshot-only run from a config file.
  */
class CdcJobSpec extends AnyFunSuite {
  lazy val spark: SparkSession = TestSpark.session

  val cfgJson =
    """{"source.id": "cfgsrc", "source.type": "mysql",
      | "sink.path": "SINK",
      | "offset.store.path": "OFF",
      | "snapshot.only": true,
      | "table.schemas": "{\"testdb.users\": \"id:INT, name:VARCHAR, balance:DECIMAL\", \"testdb.counts\": \"n:BIGINT UNSIGNED\"}",
      | "table.name.map": "{\"testdb.users\": \"users_v2\"}"}""".stripMargin

  test("registry built from config applies type collapse and name maps") {
    val cfg = JobConfig.parse(cfgJson)
    val reg = CdcJob.registryFromConfig(cfg)
    val users = reg.routed("testdb.users")
    assert(users.table == "users_v2") // name-mapped
    assert(users.schema("id").dataType == IntegerType)
    assert(users.schema("name").dataType == StringType)
    assert(users.schema("balance").dataType == StringType) // decimal policy
    assert(reg.routed("testdb.counts").schema("n").dataType == LongType)
  }

  test("collection.name.map aliases the rename map for mongodb only") {
    // the reference's MongoDB streamer reads renames from
    // collection.name.map (MongoDBStreamer.java:65) — a reference
    // config ported verbatim must route, not silently ignore renames
    val base = Map(
      "source.id" -> "m", "source.type" -> "mongodb", "sink.path" -> "S",
      "table.schemas" -> """{"orders": "_id:VARCHAR(24),qty:BIGINT"}""")
    val reg = CdcJob.registryFromConfig(base +
      ("collection.name.map" -> """{"orders": "orders_v2"}"""))
    assert(reg.routed("orders").table == "orders_v2")
    // both spellings merge; an agreeing duplicate is fine
    val both = CdcJob.registryFromConfig(base ++ Map(
      "collection.name.map" -> """{"orders": "orders_v2"}""",
      "table.name.map" -> """{"orders": "orders_v2"}"""))
    assert(both.routed("orders").table == "orders_v2")
    // a contradicting duplicate fails loudly
    val e1 = intercept[IllegalArgumentException] {
      CdcJob.registryFromConfig(base ++ Map(
        "collection.name.map" -> """{"orders": "a"}""",
        "table.name.map" -> """{"orders": "b"}"""))
    }
    assert(e1.getMessage.contains("CONFLICTING"))
    // mongodb-only: for a relational source the key is a config error
    val e2 = intercept[IllegalArgumentException] {
      CdcJob.registryFromConfig(base ++ Map(
        "source.type" -> "mysql",
        "collection.name.map" -> """{"orders": "orders_v2"}"""))
    }
    assert(e2.getMessage.contains("MONGODB-ONLY"))
  }

  test("snapshot override config: parse, validation, statement grammar") {
    import graft.streaming.SnapshotOverrides
    val base = Map("source.id" -> "s", "source.type" -> "mysql",
      "sink.path" -> "SINK")
    // absent key → no overrides
    assert(SnapshotOverrides.fromConfig(base).isEmpty)
    // happy path: list + per-table statements, WHERE optional
    val ov = SnapshotOverrides.fromConfig(base ++ Map(
      "snapshot.select.statement.overrides" -> "db.users, db.items",
      "snapshot.select.statement.overrides.db.users" ->
        "SELECT * FROM db.users WHERE id > 100 AND name IS NOT NULL",
      "snapshot.select.statement.overrides.db.items" ->
        "SELECT id, qty FROM db.items;"))
    assert(ov("db.users").selectCols.isEmpty) // SELECT *
    assert(ov("db.users").where
      .contains("id > 100 AND name IS NOT NULL"))
    assert(ov("db.items").selectCols.contains(Set("id", "qty")))
    assert(ov("db.items").where.isEmpty)
    // a listed table with no statement fails at parse time, like the
    // reference's Validator.ensureNotEmpty (MySQLStreamer.java:141-146)
    val e = intercept[IllegalArgumentException] {
      SnapshotOverrides.fromConfig(base +
        ("snapshot.select.statement.overrides" -> "db.missing"))
    }
    assert(e.getMessage.contains("MISSING OVERRIDE STATEMENT"))
    // non-SELECT statements are a config error, not a silent no-op
    intercept[IllegalArgumentException] {
      SnapshotOverrides.fromConfig(base ++ Map(
        "snapshot.select.statement.overrides" -> "db.t",
        "snapshot.select.statement.overrides.db.t" -> "DELETE FROM db.t"))
    }
    // a statement reading a DIFFERENT table than its key (copy-paste
    // error) fails at parse time, not at first batch
    val wrongFrom = intercept[IllegalArgumentException] {
      SnapshotOverrides.fromConfig(base ++ Map(
        "snapshot.select.statement.overrides" -> "db.users",
        "snapshot.select.statement.overrides.db.users" ->
          "SELECT * FROM db.items WHERE qty > 0"))
    }
    assert(wrongFrom.getMessage.contains("must read the table it overrides"))
    // the live-JDBC rendering: statement goes server-side verbatim as
    // a dbtable subquery, same grammar gate
    assert(SnapshotOverrides.asJdbcSubquery("db.users",
      "SELECT id, name FROM db.users WHERE id > 5;")
      == "(SELECT id, name FROM db.users WHERE id > 5) graft_snapshot_override")
    intercept[IllegalArgumentException] {
      SnapshotOverrides.asJdbcSubquery("db.users", "DROP TABLE db.users")
    }
  }

  test("mongodb.deserialization.mode wires into the config; unknown fails") {
    val base = Map("source.id" -> "m", "source.type" -> "mongodb",
      "sink.path" -> "SINK",
      "table.schemas" -> """{"orders":"_id:VARCHAR(24),qty:BIGINT"}""")
    import graft.ops.MongoModes
    // reference default (MongoDBStreamer.java:92): unset → top-level-type
    assert(CdcJob.configFromMap(base).mongoMode
      .contains(MongoModes.TopLevelType))
    assert(CdcJob.configFromMap(
      base + ("mongodb.deserialization.mode" -> "doc-string")).mongoMode
      .contains(MongoModes.DocString))
    assert(CdcJob.configFromMap(
      base + ("mongodb.deserialization.mode" -> "top-level-string")).mongoMode
      .contains(MongoModes.TopLevelString))
    val e = intercept[IllegalArgumentException] {
      CdcJob.configFromMap(
        base + ("mongodb.deserialization.mode" -> "bogus"))
    }
    assert(e.getMessage.contains("UNKNOWN MONGODB DESERIALIZATION MODE"))
    // a non-mongo source never gets a mongo projection mode
    val mysql = Map("source.id" -> "s", "source.type" -> "mysql",
      "sink.path" -> "SINK",
      "table.schemas" -> """{"db.t":"id:INT"}""")
    assert(CdcJob.configFromMap(mysql).mongoMode.isEmpty)
  }

  test("sink.compact knobs wire into the config; junk fails fast") {
    val base = Map("source.id" -> "s", "source.type" -> "mysql",
      "sink.path" -> "SINK",
      "table.schemas" -> """{"db.t":"id:INT"}""")
    // unset → off
    assert(CdcJob.configFromMap(base).compactAfterFiles == 0)
    val on = CdcJob.configFromMap(base ++ Map(
      "sink.compact.after.files" -> "8",
      "sink.compact.rows.per.file" -> "500000"))
    assert(on.compactAfterFiles == 8 && on.compactRowsPerFile == 500000L)
    // non-positive / junk values fail assembly
    for (bad <- Seq("0", "-3", "abc", ""))
      assert(intercept[IllegalArgumentException] {
        CdcJob.configFromMap(base + ("sink.compact.after.files" -> bad))
      }.getMessage.contains("sink.compact.after.files"))
    // rows.per.file without the trigger threshold is a config error
    assert(intercept[IllegalArgumentException] {
      CdcJob.configFromMap(base + ("sink.compact.rows.per.file" -> "1000"))
    }.getMessage.contains("sink.compact.after.files"))
    // retention: unset → keep forever; junk fails like the others
    assert(CdcJob.configFromMap(base).retentionDays == 0)
    assert(CdcJob.configFromMap(
      base + ("sink.retention.days" -> "365")).retentionDays == 365)
    assert(intercept[IllegalArgumentException] {
      CdcJob.configFromMap(base + ("sink.retention.days" -> "0"))
    }.getMessage.contains("sink.retention.days"))
    // current-table keys: raw spellings re-key; unknown table or
    // column fails assembly
    assert(CdcJob.configFromMap(base +
      ("sink.current.keys" -> """{"db.t": "id"}""")).currentKeys
      == Map("db.t" -> Seq("id")))
    assert(intercept[IllegalArgumentException] {
      CdcJob.configFromMap(base +
        ("sink.current.keys" -> """{"db.ghost": "id"}"""))
    }.getMessage.contains("UNKNOWN TABLE"))
    assert(intercept[IllegalArgumentException] {
      CdcJob.configFromMap(base +
        ("sink.current.keys" -> """{"db.t": "nope"}"""))
    }.getMessage.contains("KEY COLUMN"))
    // bucket sizing: default, explicit, requires current tables,
    // junk fails like the others
    assert(CdcJob.configFromMap(base).currentBuckets == 16)
    assert(CdcJob.configFromMap(base ++ Map(
      "sink.current.keys" -> """{"db.t": "id"}""",
      "sink.current.buckets" -> "64")).currentBuckets == 64)
    assert(intercept[IllegalArgumentException] {
      CdcJob.configFromMap(base + ("sink.current.buckets" -> "64"))
    }.getMessage.contains("sink.current.keys"))
    assert(intercept[IllegalArgumentException] {
      CdcJob.configFromMap(base ++ Map(
        "sink.current.keys" -> """{"db.t": "id"}""",
        "sink.current.buckets" -> "0"))
    }.getMessage.contains("sink.current.buckets"))
    // fullsync cadence: default off, explicit, requires current
    // tables, junk fails like the others
    assert(CdcJob.configFromMap(base).currentFullsyncBatches == 0)
    assert(CdcJob.configFromMap(base ++ Map(
      "sink.current.keys" -> """{"db.t": "id"}""",
      "sink.current.fullsync.batches" -> "12")).currentFullsyncBatches == 12)
    assert(intercept[IllegalArgumentException] {
      CdcJob.configFromMap(base +
        ("sink.current.fullsync.batches" -> "12"))
    }.getMessage.contains("sink.current.keys"))
    assert(intercept[IllegalArgumentException] {
      CdcJob.configFromMap(base ++ Map(
        "sink.current.keys" -> """{"db.t": "id"}""",
        "sink.current.fullsync.batches" -> "0"))
    }.getMessage.contains("sink.current.fullsync.batches"))
    // rescale-advisory bucket target: default off, explicit, requires
    // current tables, junk fails like the others
    assert(CdcJob.configFromMap(base).currentTargetBucketMb == 0)
    assert(CdcJob.configFromMap(base ++ Map(
      "sink.current.keys" -> """{"db.t": "id"}""",
      "sink.current.target.bucket.mb" -> "256")).currentTargetBucketMb == 256)
    assert(intercept[IllegalArgumentException] {
      CdcJob.configFromMap(base +
        ("sink.current.target.bucket.mb" -> "256"))
    }.getMessage.contains("sink.current.keys"))
    assert(intercept[IllegalArgumentException] {
      CdcJob.configFromMap(base ++ Map(
        "sink.current.keys" -> """{"db.t": "id"}""",
        "sink.current.target.bucket.mb" -> "-1"))
    }.getMessage.contains("sink.current.target.bucket.mb"))
    // within-bucket order: re-keyed + validated like current keys,
    // requires a current table for the same table, unknown column
    // fails fast
    assert(CdcJob.configFromMap(base).currentOrderBy.isEmpty)
    assert(CdcJob.configFromMap(base ++ Map(
      "sink.current.keys" -> """{"db.t": "id"}""",
      "sink.current.order.by" -> """{"db.t": "id"}"""))
      .currentOrderBy == Map("db.t" -> Seq("id")))
    // sink METADATA columns are orderable too (the registry schema is
    // payload-only, but the sink rows carry _ts etc. — recency is the
    // canonical clustering)
    assert(CdcJob.configFromMap(base ++ Map(
      "sink.current.keys" -> """{"db.t": "id"}""",
      "sink.current.order.by" -> """{"db.t": "_ts"}"""))
      .currentOrderBy == Map("db.t" -> Seq("_ts")))
    assert(intercept[IllegalArgumentException] {
      CdcJob.configFromMap(base +
        ("sink.current.order.by" -> """{"db.t": "id"}"""))
    }.getMessage.contains("sink.current.keys"))
    assert(intercept[IllegalArgumentException] {
      CdcJob.configFromMap(base ++ Map(
        "sink.current.keys" -> """{"db.t": "id"}""",
        "sink.current.order.by" -> """{"db.t": "nope"}"""))
    }.getMessage.contains("ORDER COLUMN"))
    assert(intercept[IllegalArgumentException] {
      CdcJob.configFromMap(base ++ Map(
        "sink.current.keys" -> """{"db.t": "id"}""",
        "sink.current.order.by" -> """{"db.zzz": "id"}"""))
    }.getMessage.contains("UNKNOWN TABLE"))
    // secondary index columns: re-keyed + validated like order.by —
    // requires a current table for the same table, unknown table or
    // column fails at assembly, metadata columns indexable too
    assert(CdcJob.configFromMap(base).currentIndexColumns.isEmpty)
    assert(CdcJob.configFromMap(base ++ Map(
      "sink.current.keys" -> """{"db.t": "id"}""",
      "sink.current.index.columns" -> """{"db.t": "id,_ts"}"""))
      .currentIndexColumns == Map("db.t" -> Seq("id", "_ts")))
    assert(intercept[IllegalArgumentException] {
      CdcJob.configFromMap(base +
        ("sink.current.index.columns" -> """{"db.t": "name"}"""))
    }.getMessage.contains("sink.current.keys"))
    assert(intercept[IllegalArgumentException] {
      CdcJob.configFromMap(base ++ Map(
        "sink.current.keys" -> """{"db.t": "id"}""",
        "sink.current.index.columns" -> """{"db.t": "nope"}"""))
    }.getMessage.contains("INDEX COLUMN"))
    assert(intercept[IllegalArgumentException] {
      CdcJob.configFromMap(base ++ Map(
        "sink.current.keys" -> """{"db.t": "id"}""",
        "sink.current.index.columns" -> """{"db.zzz": "name"}"""))
    }.getMessage.contains("UNKNOWN TABLE"))
    // the reserved layout column fails at ASSEMBLY, not as a
    // crash-looping attach on the first batch (kb is not in any
    // registry schema, so the membership check names it; validColumn
    // backstops a hypothetical source column literally named kb)
    val kbErr = intercept[IllegalArgumentException] {
      CdcJob.configFromMap(base ++ Map(
        "sink.current.keys" -> """{"db.t": "id"}""",
        "sink.current.index.columns" -> """{"db.t": "kb"}"""))
    }.getMessage
    assert(kbErr.contains("kb"), kbErr)
    // configured rollups: full clause parse (name, dims, aggs, countd
    // k), global form, multiple per table via '|', every validation
    // path named
    assert(CdcJob.configFromMap(base).currentRollups.isEmpty)
    val ru = CdcJob.configFromMap(base ++ Map(
      "sink.current.keys" -> """{"db.t": "id"}""",
      "sink.current.rollup" ->
        """{"db.t": "by_id: dims=id; count:*:n sum:id:s countd:id:d:64 | g: count:*:n"}"""))
      .currentRollups("db.t")
    assert(ru.map(_._1) == Seq("by_id", "g"))
    assert(ru.head._2 == graft.ops.RollupTable.Spec(Seq("id"), Seq(
      graft.ops.RollupTable.Agg("count", "*", "n"),
      graft.ops.RollupTable.Agg("sum", "id", "s"),
      graft.ops.RollupTable.Agg("countd", "id", "d", 64))))
    assert(ru(1)._2.dims.isEmpty)
    assert(intercept[IllegalArgumentException] {
      CdcJob.configFromMap(base +
        ("sink.current.rollup" -> """{"db.t": "g: count:*:n"}"""))
    }.getMessage.contains("sink.current.keys"))
    assert(intercept[IllegalArgumentException] {
      CdcJob.configFromMap(base ++ Map(
        "sink.current.keys" -> """{"db.t": "id"}""",
        "sink.current.rollup" -> """{"db.t": "g: sum:nope:s"}"""))
    }.getMessage.contains("ROLLUP COLUMN"))
    assert(intercept[IllegalArgumentException] {
      CdcJob.configFromMap(base ++ Map(
        "sink.current.keys" -> """{"db.t": "id"}""",
        "sink.current.rollup" -> """{"db.t": "g: avg:id:a"}"""))
    }.getMessage.contains("unsupported aggregate"))
    assert(intercept[IllegalArgumentException] {
      CdcJob.configFromMap(base ++ Map(
        "sink.current.keys" -> """{"db.t": "id"}""",
        "sink.current.rollup" -> """{"db.t": "g count *"}"""))
    }.getMessage.contains("sink.current.rollup"))
    assert(intercept[IllegalArgumentException] {
      CdcJob.configFromMap(base ++ Map(
        "sink.current.keys" -> """{"db.t": "id"}""",
        "sink.current.rollup" ->
          """{"db.t": "g: count:*:n | g: sum:id:s"}"""))
    }.getMessage.contains("DUPLICATE ROLLUP NAME"))
    // lookup probe bound: default off (session default governs),
    // explicit, requires current tables, junk fails like the others
    assert(CdcJob.configFromMap(base).currentLookupMaxDriverKeys == 0)
    assert(CdcJob.configFromMap(base ++ Map(
      "sink.current.keys" -> """{"db.t": "id"}""",
      "sink.current.lookup.max.driver.keys" -> "500"))
      .currentLookupMaxDriverKeys == 500)
    assert(intercept[IllegalArgumentException] {
      CdcJob.configFromMap(base +
        ("sink.current.lookup.max.driver.keys" -> "500"))
    }.getMessage.contains("sink.current.keys"))
    assert(intercept[IllegalArgumentException] {
      CdcJob.configFromMap(base ++ Map(
        "sink.current.keys" -> """{"db.t": "id"}""",
        "sink.current.lookup.max.driver.keys" -> "junk"))
    }.getMessage.contains("sink.current.lookup.max.driver.keys"))
    // the pipeline publishes the bound as the session conf readers
    // resolve CurrentTable.lookup's default from — at job START, not
    // construction (building a pipeline for validation must not
    // mutate shared session state)
    val cfgWithBound = CdcJob.configFromMap(base ++ Map(
      "sink.current.keys" -> """{"db.t": "id"}""",
      "sink.current.lookup.max.driver.keys" -> "777"))
    val priorBound =
      spark.conf.getOption("spark.graft.current.lookup.maxDriverKeys")
    try {
      val p = new graft.streaming.CdcPipeline(spark, cfgWithBound)
      assert(spark.conf.getOption(
        "spark.graft.current.lookup.maxDriverKeys") == priorBound,
        "construction alone must not publish the conf")
      p.publishSessionConfs() // what startFeed runs first
      assert(spark.conf.get("spark.graft.current.lookup.maxDriverKeys")
        == "777")
    } finally priorBound match {
      case Some(v) =>
        spark.conf.set("spark.graft.current.lookup.maxDriverKeys", v)
      case None =>
        spark.conf.unset("spark.graft.current.lookup.maxDriverKeys")
    }
  }

  test("snapshot override keys are sanitized to route keys and registry-validated") {
    val cfg = Map("source.id" -> "s", "source.type" -> "mysql",
      "sink.path" -> "SINK",
      "table.schemas" -> """{"my-db.users":"id:INT"}""",
      "snapshot.select.statement.overrides" -> "my-db.users",
      "snapshot.select.statement.overrides.my-db.users" ->
        "SELECT * FROM my-db.users WHERE id > 1")
    // raw config spelling re-keys to the sanitized ROUTE key the
    // demux actually looks up — without this the override would
    // never match its own events and the full table would snapshot
    assert(CdcJob.configFromMap(cfg).snapshotOverrides.keySet
      == Set("my_db.users"))
    // a typo'd key fails assembly instead of silently not applying
    val e = intercept[IllegalArgumentException] {
      CdcJob.configFromMap(cfg ++ Map(
        "snapshot.select.statement.overrides" -> "my-db.userz",
        "snapshot.select.statement.overrides.my-db.userz" ->
          "SELECT * FROM my-db.userz"))
    }
    assert(e.getMessage.contains("UNKNOWN TABLE"))
  }

  test("config file runs a snapshot-only job end to end") {
    val in = Files.createTempDirectory("graft-job-in-")
    val sink = Files.createTempDirectory("graft-job-sink-")
    val off = Files.createTempDirectory("graft-job-off-")
    val cfgFile = Files.createTempDirectory("graft-job-cfg-")
      .resolve("config.json")
    Files.write(cfgFile, cfgJson
      .replace("SINK", sink.toString).replace("OFF", off.toString)
      .getBytes)
    Files.write(in.resolve("00.jsonl"), Seq(
      """{"_op":"READ","_ts":1700000000000,"_db":"testdb","_tbl":"users","id":{"int":1},"name":{"string":"a"},"balance":{"string":"9.99"},"_binlog_file":"f1","_binlog_pos_end":"1"}""",
      """{"_op":"READ","_ts":1700000000000,"_db":"testdb","_tbl":"counts","n":{"long":5},"_binlog_file":"f1","_binlog_pos_end":"1"}""",
      """{"_op":"CREATE","_ts":1700000001000,"_db":"testdb","_tbl":"users","id":{"int":2},"name":{"string":"b"},"balance":null,"_binlog_file":"f1","_binlog_pos_end":"77"}""",
      """{"_op":"CREATE","_ts":1700000002000,"_db":"testdb","_tbl":"counts","n":{"long":6},"_binlog_file":"f1","_binlog_pos_end":"88"}""")
      .mkString("\n").getBytes)

    val cfg = JobConfig.load(cfgFile.toString)
    val p = CdcJob.run(spark, cfg, in.toString,
      Files.createTempDirectory("graft-job-ck-").toString)

    // name-mapped sink dir, typed payload, snapshot completion
    val users = spark.read.parquet(s"$sink/cfgsrc_testdb__users_v2")
    assert(users.count() == 2)
    assert(users.schema("balance").dataType == StringType)
    assert(p.gate.stopped && p.gate.reason.contains("SNAPSHOT-COMPLETE"))
    assert(p.readStoredOffset(off.toString).contains("f1,88"))
  }

  test("shipped example configs parse and build valid registries") {
    for (name <- Seq("mysql-config", "mongodb-config", "postgres-config")) {
      val path = s"src/main/resources/example-configs/$name.json"
      val cfg = JobConfig.load(path)
      assert(cfg.contains("source.id") && cfg.contains("sink.path"), name)
      val reg = CdcJob.registryFromConfig(cfg)
      assert(reg.routed.nonEmpty, name)
      // configFromMap must assemble without throwing
      assert(CdcJob.configFromMap(cfg).sourceId == cfg("source.id"), name)
    }
    // the mysql example's nested name maps apply
    val my = JobConfig.load("src/main/resources/example-configs/mysql-config.json")
    val reg = CdcJob.registryFromConfig(my)
    assert(reg.routed("test.orders").table == "orders_v20240713")
    assert(reg.routed("test.orders").db == "test_prod")
  }

  test("source.feed=dsv2 snapshot-only forces initial over configured seek") {
    val in = Files.createTempDirectory("graft-jobd-in-")
    val sink = Files.createTempDirectory("graft-jobd-sink-")
    val cfgJson2 = cfgJson
      .replace("SINK", sink.toString)
      .replace("OFF", Files.createTempDirectory("graft-jobd-off-").toString)
      .replace(""""snapshot.only": true,""",
        """"snapshot.only": true, "source.feed": "dsv2",
          | "startup.timestamp": "1700000001000",""".stripMargin)
    Files.write(in.resolve("00.jsonl"), Seq(
      """{"_op":"READ","_ts":1700000000000,"_db":"testdb","_tbl":"users","id":{"int":1},"name":{"string":"a"},"balance":null,"_binlog_file":"f1","_binlog_pos_end":"1"}""",
      """{"_op":"CREATE","_ts":1700000001000,"_db":"testdb","_tbl":"users","id":{"int":2},"name":{"string":"b"},"balance":null,"_binlog_file":"f1","_binlog_pos_end":"77"}""")
      .mkString("\n").getBytes)
    val p = CdcJob.run(spark, JobConfig.parse(cfgJson2), in.toString,
      Files.createTempDirectory("graft-jobd-ck-").toString)
    // S5: snapshot-only forces initial — the configured timestamp
    // seek must NOT skip the backlog (a "latest"/timestamp seek under
    // snapshot-only would emit an empty snapshot). Seek behavior
    // itself is covered in CdcDsv2SourceSpec.
    val users = spark.read.parquet(s"$sink/cfgsrc_testdb__users_v2")
    assert(users.count() == 2)
    assert(users.select("id").collect().map(_.getInt(0)).toSet == Set(1, 2))
  }
}
