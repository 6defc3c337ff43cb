package graft

import java.nio.file.{Files, Path}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.model.{TableRegistry, TableSpec}
import graft.streaming.{CdcConfig, CdcPipeline}

/** The reference's manual schema-evolution runbook as ONE lifecycle
  * (`README.md:15` — "creating new versions of a table every time a
  * table structure is changed … done manually using a table mapping
  * option", stop-on-DDL at `:26`): ingest → structural DDL stops the
  * job → operator reads the recorded DDL, re-maps `table.name.map`
  * to `users_v2` with the evolved schema → restarts from the stored
  * binlog offset. Previously covered piecewise (gate stop:
  * CdcPipelineSpec; offset restart: CdcDsv2SourceSpec; name maps:
  * TypeMappingSpec) — this is the composed end-to-end guarantee: old
  * dir frozen pre-DDL, v2 dir holds exactly the post-DDL rows,
  * offsets strictly continuous, no row lost or duplicated.
  *
  * Restart mechanics mirror production, not the test harness: the
  * stopped job's Spark checkpoint is NOT reused (batches after the
  * stop were drained-and-swallowed there — the reference likewise
  * "relies on binlog retention to restore", `README.md:13`); the new
  * job starts from `startup.mode=offset` at the position just past
  * the recorded DDL, exactly what the `_ddl` side table exists for.
  */
class SchemaEvolutionSpec extends AnyFunSuite {
  lazy val spark: SparkSession = TestSpark.session

  private val v1Schema = StructType(Seq(
    StructField("id", IntegerType), StructField("name", StringType)))

  private def row(op: String, ts: Long, file: String, pos: Long,
      fields: String): String =
    s"""{"_op":"$op","_ts":$ts,"_db":"testdb","_tbl":"users",$fields,""" +
      s""""_binlog_file":"$file","_binlog_pos_end":"$pos"}"""

  def tmp(): Path = Files.createTempDirectory("graft-evo-")

  test("DDL evolution runbook: stop, re-map to v2, resume from offset") {
    val feed = tmp(); val out = tmp(); val off = tmp()
    // the feed directory IS the binlog in the DSv2 model: files are
    // segments, lines are events, (file, line) is the offset
    Files.write(feed.resolve("mysql-bin.000001"), Seq(
      row("CREATE", 1700000000000L, "mysql-bin.000001", 10,
        """"id":{"int":1},"name":{"string":"alice"}"""),
      row("CREATE", 1700000001000L, "mysql-bin.000001", 20,
        """"id":{"int":2},"name":{"string":"bob"}"""))
      .mkString("\n").getBytes)
    Files.write(feed.resolve("mysql-bin.000002"), Seq(
      s"""{"_ddl":"ALTER TABLE users ADD COLUMN age INT","_ddl_tbl":"users","_ts":1700000002000,"_db":"testdb","_binlog_file":"mysql-bin.000002","_binlog_pos_end":"40"}""")
      .mkString("\n").getBytes)
    Files.write(feed.resolve("mysql-bin.000003"), Seq(
      row("CREATE", 1700000003000L, "mysql-bin.000003", 10,
        """"id":{"int":9},"name":{"string":"carol"},"age":{"int":30}"""))
      .mkString("\n").getBytes)

    // ---- phase 1: the v1 job runs until the DDL stops it
    val v1 = TableRegistry(Seq(TableSpec("testdb", "users", v1Schema)))
    val p1 = new CdcPipeline(spark, CdcConfig("evo", v1, out.toString,
      offsetStorePath = Some(off.toString)))
    p1.startFeed(
      graft.source.Dsv2Feed(feed.toString, maxFilesPerTrigger = Some(1)),
      tmp().resolve("ck1").toString,
      org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .awaitTermination()
    assert(p1.gate.stopped)
    assert(p1.gate.reason.exists(_.startsWith("STRUCTURAL-DDL")))
    // pre-DDL rows landed in the v1 dir; the post-DDL segment was
    // drained-and-swallowed (no write, no offset advance)
    assert(spark.read.parquet(s"$out/evo_testdb__users").count() == 2)
    assert(p1.readStoredOffset(off.toString).contains("mysql-bin.000001,20"))

    // ---- the operator's runbook inputs: the recorded DDL, plus the
    // pipeline's AUTO-EVOLUTION proposal (the reference's in-dev auto
    // table-name mapping) — the v2 config is machine-derived, not
    // hand-written: dated version name + mechanically evolved schema
    val ddlRec = spark.read.parquet(s"$out/evo_testdb_ddl").collect()
    assert(ddlRec.length == 1)
    assert(ddlRec(0).getAs[String]("_ddl").startsWith("ALTER TABLE users"))
    val ddlSegment = ddlRec(0).getAs[String]("_binlog_file")
    assert(ddlSegment == "mysql-bin.000002")
    val proposal = p1.evolutionProposals match {
      case Seq(one) => one
      case other => fail(s"expected one proposal, got $other")
    }
    // DDL _ts 1700000002000 = 2023-11-14 → dated version name
    assert(proposal.newTableName == "users_v20231114")
    val v2Schema = proposal.schema.getOrElse(
      fail("ADD COLUMN is in the mechanical subset"))
    assert(v2Schema.fieldNames.toSeq == Seq("id", "name", "age"))

    // ---- phase 2: the proposed v2 config, restart just past the DDL
    // (the DDL record is the whole segment → resume at its end BYTE —
    // the feed's pos is a byte offset, the unit a live binlog
    // connector's "restart at the DDL's end position" uses too)
    // the v2 config is produced by applyProposal — a pure rewrite of
    // the flat v1 config (name map + evolved schema entry), so the
    // restart consumes the proposal VERBATIM, no hand-assembled
    // registry anywhere in the loop
    val v1Cfg = Map(
      "source.id" -> "evo", "source.type" -> "mysql",
      "sink.path" -> out.toString,
      "offset.store.path" -> off.toString,
      "table.schemas" -> """{"testdb.users": "id:INT,name:VARCHAR(50)"}""")
    val v2Cfg = graft.ops.DdlEvolution.applyProposal(v1Cfg, proposal)
    val v2Config = graft.streaming.CdcJob.configFromMap(v2Cfg)
    assert(v2Config.registry.routed("testdb.users").schema == v2Schema)
    assert(v2Config.registry.tableNameMap ==
      Map("testdb.users" -> "users_v20231114"))
    val p2 = new CdcPipeline(spark, v2Config)
    p2.startFeed(
      graft.source.Dsv2Feed(feed.toString, options = Map(
        "startup.mode" -> "offset",
        "startup.offset" ->
          s"$ddlSegment,${Files.size(feed.resolve(ddlSegment))}")),
      tmp().resolve("ck2").toString,
      org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .awaitTermination()
    assert(!p2.gate.stopped) // the DDL itself was skipped, not replayed

    // old dir FROZEN: exactly the pre-DDL rows, pre-DDL schema
    val oldDir = spark.read.parquet(s"$out/evo_testdb__users")
    assert(oldDir.count() == 2)
    assert(oldDir.select("id").collect().map(_.getInt(0)).sorted.toSeq
      == Seq(1, 2))
    assert(!oldDir.schema.fieldNames.contains("age"))

    // v2 dir: exactly the post-DDL rows, evolved schema
    val v2Dir = spark.read.parquet(s"$out/evo_testdb__users_v20231114")
    assert(v2Dir.count() == 1)
    val r = v2Dir.collect()(0)
    assert(r.getAs[Int]("id") == 9 && r.getAs[Int]("age") == 30)

    // offsets continuous: strictly past phase 1's, no gap row lost —
    // 2 + 1 rows total across both dirs, none duplicated
    assert(p2.readStoredOffset(off.toString).contains("mysql-bin.000003,10"))
    assert(p2.recordCount == 1)
  }
}
