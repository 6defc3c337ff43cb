package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.model.TableSpec
import graft.ops.{EnvelopeDecoder, MongoModes}
import graft.streaming.{JobConfig, StartupMode}

/** Unit coverage for startup-mode resolution (S5), config loading
  * (S7), Mongo output modes (T4), and Postgres-flavor routing.
  */
class StreamingOpsSpec extends AnyFunSuite {
  lazy val spark: SparkSession = TestSpark.session

  test("startup mode resolution with override rules (S5)") {
    import StartupMode._
    assert(resolve(None, None, None, snapshotOnly = false) == Initial)
    assert(resolve(Some("earliest"), None, None, false) == Earliest)
    assert(resolve(Some("latest"), None, None, false) == Latest)
    // stored offset overrides configured mode (S6 restore)
    assert(resolve(Some("latest"), Some("mysql-bin.01,5"), None, false)
      == Offset("mysql-bin.01,5"))
    // timestamp overrides mode when no offset
    assert(resolve(Some("latest"), None, Some(1700000000000L), false)
      == Timestamp(1700000000000L))
    // snapshot-only forces initial over everything
    assert(resolve(Some("latest"), Some("x,1"), Some(5L), true) == Initial)
    intercept[IllegalArgumentException] {
      resolve(Some("bogus"), None, None, false)
    }
  }

  test("config JSON parse + required keys (S7)") {
    val cfg = JobConfig.parse(
      """{"source.id": "s1", "source.type": "mysql",
        | "sink.path": "/data/lake", "checkpoint.interval": 30,
        | "snapshot.only": true,
        | "table.name.map": "{\"db.t1\": \"t1_v2\"}"}""".stripMargin)
    assert(cfg("source.id") == "s1")
    assert(cfg("checkpoint.interval") == "30")
    assert(cfg("snapshot.only") == "true")
    assert(JobConfig.nameMap(cfg, "table.name.map") == Map("db.t1" -> "t1_v2"))
    assert(JobConfig.nameMap(cfg, "database.name.map").isEmpty)
  }

  test("name map written as natural nested JSON parses whole") {
    val cfg = JobConfig.parse(
      """{"source.id": "s1",
        | "table.name.map": {"db.t1": "t1_v2", "db.t2": "t2_v2"},
        | "sink.path": "/lake"}""".stripMargin)
    assert(JobConfig.nameMap(cfg, "table.name.map") ==
      Map("db.t1" -> "t1_v2", "db.t2" -> "t2_v2"))
    // inner pairs must NOT leak into the top-level config
    assert(!cfg.contains("db.t1"))
    assert(cfg("sink.path") == "/lake")
  }

  test("config value unescape round-trips arbitrary strings") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    // JSON-escape exactly as a writer would; parse must invert it
    def esc(s: String): String = s.flatMap {
      case '\\' => "\\\\"
      case '"' => "\\\""
      case '\n' => "\\n"
      case '\t' => "\\t"
      case '\r' => "\\r"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    }
    val strGen = Gen.listOf(Gen.frequency(
      8 -> Gen.alphaNumChar,
      3 -> Gen.oneOf('\\', '"', '\n', '\t', '\r', '/', 'n', 'u'),
      1 -> Gen.oneOf("C:\\network", "a\\\\n", "\\u0041")
        .flatMap(s => Gen.oneOf(s.toList)))).map(_.mkString)
    val prop = Prop.forAll(strGen) { v =>
      JobConfig.parse(s"""{"k": "${esc(v)}"}""")("k") == v
    }
    assert(SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(500), prop).passed)
  }

  test("postgres-flavor envelope routes on bare table with _schema") {
    import spark.implicits._
    val lines = Seq(
      """{"_op":"CREATE","_ts":1,"_schema":"public","_tbl":"users","id":{"int":1},"_lsn":"101"}""")
      .toDF("value")
    val frame = EnvelopeDecoder.decode(lines)
    val r = frame.select("_tbl_key", "_lsn").head
    assert(r.getString(0) == "users") // bare key, not schema-qualified
    assert(r.getString(1) == "101")
  }

  test("mongo output modes project the same document three ways (T4)") {
    import spark.implicits._
    val spec = TableSpec("", "coll1", StructType(Seq(
      StructField("_id", StringType), StructField("n", IntegerType),
      StructField("tag", StringType))))
    val lines = Seq(
      """{"_op":"READ","_ts":5,"_coll":"coll1","_txn_op_index":"3",""" +
        """"_doc":{"_id":{"$oid": "abc123"},"n":{"$numberLong": "42"},"tag":"x"}}""")
      .toDF("value")
    val frame = EnvelopeDecoder.decode(lines)

    val doc = MongoModes.project(frame, spec, MongoModes.DocString).head
    assert(doc.getString(0) == "abc123")       // _id normalized
    assert(doc.getString(1).contains("\"n\"")) // whole doc as JSON

    val str = MongoModes.project(frame, spec, MongoModes.TopLevelString).head
    assert(str.getString(1) == "42")  // $numberLong unwrapped, string

    val typed = MongoModes.project(frame, spec, MongoModes.TopLevelType).head
    assert(typed.getInt(1) == 42)     // typed per sampled schema
    assert(typed.getString(2) == "x")
  }

  test("top-level-string drift check finds unexpected fields") {
    import spark.implicits._
    val spec = TableSpec("", "coll1", StructType(Seq(
      StructField("n", IntegerType))))
    val lines = Seq(
      """{"_op":"CREATE","_ts":6,"_coll":"coll1","_doc":{"_id":1,"n":2,"surprise":3}}""")
      .toDF("value")
    val drift = MongoModes.driftCheck(EnvelopeDecoder.decode(lines), spec)
    assert(drift == Set("surprise"))
  }

  test("mongo typed mode null-fills missing fields") {
    import spark.implicits._
    val spec = TableSpec("", "coll1", StructType(Seq(
      StructField("n", IntegerType), StructField("absent", StringType))))
    val lines = Seq(
      """{"_op":"CREATE","_ts":7,"_coll":"coll1","_doc":{"n":2}}""")
      .toDF("value")
    val row = MongoModes.project(EnvelopeDecoder.decode(lines), spec,
      MongoModes.TopLevelType).head
    assert(row.getInt(0) == 2 && row.isNullAt(1))
  }
}
