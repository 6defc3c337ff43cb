package graft

import java.nio.file.{Files, Path}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.model.{TableRegistry, TableSpec}
import graft.ops.{MongoModes, ResumeToken}
import graft.streaming.{CdcConfig, CdcPipeline}

/** Mongo flavor END-TO-END through the full pipeline (envelope →
  * MongoModes → dt-partitioned sink), not just the unit-tested
  * deserializer pieces: doc-string and top-level-type output modes,
  * offsets and `_txn_op_index` derived from REAL (hand-encoded v1)
  * resume tokens, and the (ts, txn_op_index) write order surviving to
  * parquet — the contract of
  * `MongoDBDebeziumToJSONDeserializer.java:44-258` +
  * `MongoDBStreamer.java:308-310`.
  */
class MongoPipelineSpec extends AnyFunSuite {
  lazy val spark: SparkSession = TestSpark.session

  def tmp(): Path = Files.createTempDirectory("graft-mongo-")

  /** v1 KeyString resume token (layout per ResumeTokenSpec): ts,
    * increment, version 1, tokenType 2, txnOpIndex, fromInvalidate,
    * uuid, empty documentKey.
    */
  def token(tsSec: Long, inc: Long, txn: Int): String =
    f"82$tsSec%08x$inc%08x" + "2b02" + "2b04" + f"2b${2 * txn}%02x" + "6e" +
      "5a1004" + "000102030405060708090a0b0c0d0e0f" + "4604"

  /** Envelope as the reference's Mongo deserializer emits it: op, ms
    * timestamp and txn-op-index both DERIVED from the resume token,
    * collection routing key, extended-JSON document.
    */
  def env(op: String, coll: String, tok: String, doc: String): String = {
    val d = ResumeToken.decode(tok)
    s"""{"_op":"$op","_ts":${d.timestampSeconds * 1000},"_coll":"$coll",""" +
      s""""_txn_op_index":"${d.txnOpIndex}","_doc":$doc}"""
  }

  val ordersSchema = StructType(Seq(
    StructField("_id", StringType), StructField("sku", StringType),
    StructField("qty", LongType)))

  def registry = TableRegistry(Seq(TableSpec("", "orders", ordersSchema)))

  // one transaction at ts 1700000000: three ops sharing the second,
  // fed OUT of txn order inside the batch file
  val t1 = token(1700000000L, 1, 1)
  val t2 = token(1700000000L, 1, 2)
  val t3 = token(1700000000L, 1, 3)
  val tSnap = token(1699990000L, 0, 0)

  def lines: Seq[Seq[String]] = Seq(
    Seq(env("READ", "orders", tSnap,
      """{"_id":{"$oid":"0102030405060708090a0b0c"},"sku":"ab","qty":{"$numberLong":"1"}}""")),
    Seq( // deliberately shuffled: txn 3, 1, 2
      env("UPDATE", "orders", t3, """{"_id":"k1","sku":"c3","qty":3}"""),
      env("CREATE", "orders", t1, """{"_id":"k1","sku":"c1","qty":1}"""),
      env("UPDATE", "orders", t2, """{"_id":"k1","sku":"c2","qty":2}""")))

  def run(mode: MongoModes.Mode): (CdcPipeline, Path, Path) = {
    val in = tmp(); val out = tmp(); val off = tmp()
    lines.zipWithIndex.foreach { case (ls, i) =>
      Files.write(in.resolve(f"$i%02d.jsonl"),
        String.join("\n", ls: _*).getBytes)
    }
    val p = new CdcPipeline(spark, CdcConfig("msrc", registry, out.toString,
      sourceType = "mongodb", offsetStorePath = Some(off.toString),
      mongoMode = Some(mode)))
    p.runAvailableNow(in.toString, tmp().resolve("ck").toString)
    (p, out, off)
  }

  test("top-level-type mode e2e: typed columns, txn order to parquet") {
    val (p, out, off) = run(MongoModes.TopLevelType)
    val sink = spark.read.parquet(s"$out/msrc_orders")
    assert(sink.count() == 4)
    assert(sink.schema("qty").dataType == LongType)
    assert(sink.schema("sku").dataType == StringType)
    // rows of the change batch in FILE order (no re-sort on read):
    // the pipeline's (ts, _txn_op_index) sort must have fixed the
    // shuffled input — c1, c2, c3
    val changed = sink.filter(col("_op") =!= "READ")
      .select("sku", "_txn_op_index").collect()
      .map(r => (r.getString(0), r.getString(1))).toSeq
    assert(changed == Seq(("c1", "1"), ("c2", "2"), ("c3", "3")))
    // ext-JSON unwrap: $oid normalized away in typed mode
    val snap = sink.filter(col("_op") === "READ").collect()(0)
    assert(snap.getAs[Long]("qty") == 1L)
    // offset store: resume-token-derived ms of the last non-READ op
    assert(p.readStoredOffset(off.toString).contains("1700000000000"))
  }

  test("doc-string mode e2e: _id + whole-document column") {
    val (_, out, _) = run(MongoModes.DocString)
    val sink = spark.read.parquet(s"$out/msrc_orders")
    assert(sink.columns.toSet ==
      Set("_id", "doc", "_op", "_ts", "_txn_op_index", "dt"))
    // $oid unwraps to the plain id; the doc column keeps the raw json
    val snap = sink.filter(col("_op") === "READ").collect()(0)
    assert(snap.getAs[String]("_id") == "0102030405060708090a0b0c")
    assert(snap.getAs[String]("doc").contains("\"sku\":\"ab\""))
    // string _id passes through
    val ids = sink.filter(col("_op") =!= "READ")
      .select("_id").distinct().collect().map(_.getString(0)).toSet
    assert(ids == Set("k1"))
  }

  test("top-level projection parses JSON twice per row, not per field") {
    import spark.implicits._
    val frame = Seq((
      """{"_doc":{"_id":{"$oid":"a"},"sku":"x","qty":{"$numberLong":"5"}}}""",
      "CREATE", 1L, "0")).toDF("_raw", "_op", "_ts", "_txn_op_index")
    val out = MongoModes.project(frame,
      TableSpec("", "orders", ordersSchema), MongoModes.TopLevelType)
    // the parse-discipline contract COVERAGE claims: ONE envelope
    // parse (get_json_object staging _doc) + ONE document parse
    // (json_tuple for every field) — a per-field get_json_object
    // regression would show N>1 parses here. The ANALYZED plan (the
    // optimizer constant-folds this literal fixture into the
    // LocalRelation, hiding the expressions entirely)
    val plan = out.queryExecution.analyzed.toString
    assert("get_json_object".r.findAllMatchIn(plan).size == 1, plan)
    assert(plan.contains("json_tuple"), plan)
    val row = out.collect()(0)
    assert(row.getAs[String]("sku") == "x" && row.getAs[Long]("qty") == 5L)
  }

  test("top-level-string mode drift aborts the job") {
    val in = tmp(); val out = tmp()
    Files.write(in.resolve("00.jsonl"),
      env("CREATE", "orders", t1,
        """{"_id":"k9","sku":"x","qty":1,"surprise":"f"}""").getBytes)
    val p = new CdcPipeline(spark, CdcConfig("msrc2", registry,
      out.toString, sourceType = "mongodb",
      mongoMode = Some(MongoModes.TopLevelString)))
    val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      p.runAvailableNow(in.toString, tmp().resolve("ck").toString)
    }
    assert(e.getMessage.contains("SCHEMA DRIFT") ||
      Option(e.getCause).exists(_.getMessage.contains("SCHEMA DRIFT")))
  }

  test("drift abort emits the ready-made proposal; phase-2 config " +
      "built FROM it ingests the new field into the dated collection") {
    val in = tmp(); val out = tmp()
    // token t1 → ts 1700000000 → 2023-11-14: the dated version name
    Files.write(in.resolve("00.jsonl"),
      env("CREATE", "orders", t1,
        """{"_id":"k9","sku":"x","qty":1,"surprise":"f"}""").getBytes)
    val p = new CdcPipeline(spark, CdcConfig("msrc3", registry,
      out.toString, sourceType = "mongodb",
      mongoMode = Some(MongoModes.TopLevelString)))
    intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      p.runAvailableNow(in.toString, tmp().resolve("ck").toString)
    }
    // the abort surfaced the same ready-made proposal a MySQL
    // structural-DDL stop gets: dated collection name map + evolved
    // sampled schema (existing fields ∪ new field as string)
    val proposal = p.evolutionProposals match {
      case Seq(one) => one
      case other => fail(s"expected one proposal, got $other")
    }
    assert(proposal.routeKey == "orders")
    assert(proposal.newTableName == "orders_v20231114")
    val evolved = proposal.schema.getOrElse(fail("drift schema is mechanical"))
    assert(evolved.fieldNames.toSeq == Seq("_id", "sku", "qty", "surprise"))
    assert(evolved("surprise").dataType == StringType)
    // the pasteable rendering uses the MONGO config spelling — the
    // reference's MongoDB streamer reads renames from
    // collection.name.map, not table.name.map
    assert(proposal.nameMapKey == "collection.name.map")
    assert(proposal.configJson.contains("\"collection.name.map\""))

    // phase 2, like SchemaEvolutionSpec: the v2 config is the PURE
    // applyProposal rewrite of the flat v1 config — no hand-assembly
    val v1Cfg = Map(
      "source.id" -> "msrc3", "source.type" -> "mongodb",
      "sink.path" -> out.toString,
      "table.schemas" ->
        """{"orders": "_id:VARCHAR(24),sku:VARCHAR(10),qty:BIGINT"}""")
    val v2Cfg = graft.ops.DdlEvolution.applyProposal(v1Cfg, proposal)
    // the rewrite landed under the mongo-flavored key, and the config
    // loader's collection.name.map alias picks it up
    assert(v2Cfg.contains("collection.name.map") &&
      !v2Cfg.contains("table.name.map"))
    val v2Registry = graft.streaming.CdcJob.registryFromConfig(v2Cfg)
    assert(v2Registry.routed("orders").schema == evolved)
    assert(v2Registry.tableNameMap == Map("orders" -> "orders_v20231114"))
    val p2 = new CdcPipeline(spark, CdcConfig("msrc3", v2Registry,
      out.toString, sourceType = "mongodb",
      mongoMode = Some(MongoModes.TopLevelString)))
    p2.runAvailableNow(in.toString, tmp().resolve("ck2").toString)
    // no drift this time — the row landed in the DATED sink with the
    // new field populated; the old dir was never written
    val sink = spark.read.parquet(s"$out/msrc3_orders_v20231114")
    assert(sink.count() == 1)
    val r = sink.collect()(0)
    assert(r.getAs[String]("surprise") == "f" &&
      r.getAs[String]("sku") == "x")
    assert(!Files.exists(out.resolve("msrc3_orders")))
  }

  test("reference-shaped config: collection.name.map routes a renamed " +
      "collection end to end") {
    val in = tmp(); val out = tmp()
    Files.write(in.resolve("00.jsonl"),
      env("CREATE", "orders", t1,
        """{"_id":"k1","sku":"a","qty":2}""").getBytes)
    // the key spelling the reference's Mongo configs use
    // (MongoDBStreamer.java:65) — loaded through the normal config
    // path, not a hand-built registry
    val config = graft.streaming.CdcJob.configFromMap(Map(
      "source.id" -> "msrc5", "source.type" -> "mongodb",
      "sink.path" -> out.toString,
      "mongodb.deserialization.mode" -> "top-level-type",
      "table.schemas" ->
        """{"orders": "_id:VARCHAR(24),sku:VARCHAR(10),qty:BIGINT"}""",
      "collection.name.map" -> """{"orders": "orders_live"}"""))
    val p = new CdcPipeline(spark, config)
    p.runAvailableNow(in.toString, tmp().resolve("ck").toString)
    val sink = spark.read.parquet(s"$out/msrc5_orders_live")
    assert(sink.count() == 1)
    assert(sink.collect()(0).getAs[Long]("qty") == 2L)
    assert(!Files.exists(out.resolve("msrc5_orders")))
  }

  test("drift check stays RAW-keyed: a doc key the sanitizer would " +
      "change can never be extracted, so it must abort loudly") {
    import spark.implicits._
    // doc key "sku-2" vs schema field "sku_2": json_tuple extracts by
    // the schema name as the LITERAL json key, so "sku-2" is
    // unreachable — treating it as known would turn the loud abort
    // into a permanently-null column
    val frame = Seq((
      """{"_doc":{"_id":"k","sku-2":"x","newf":"y"}}""",
      "CREATE", 1L, "0")).toDF("_raw", "_op", "_ts", "_txn_op_index")
    val spec = TableSpec("", "orders", StructType(Seq(
      StructField("_id", StringType), StructField("sku_2", StringType))))
    assert(MongoModes.driftCheck(frame, spec) == Set("sku-2", "newf"))
  }

  test("document field shadowing a metadata column fails with the real cause") {
    // json_tuple outputs are renamed positionally to the schema field
    // names; a collection field named _op would collide with the
    // pipeline metadata column and fail later as an opaque
    // ambiguous-reference error — project fails up front instead
    val shadowSchema = StructType(Seq(
      StructField("_id", StringType), StructField("_op", StringType)))
    import spark.implicits._
    val frame = Seq(("{}", "CREATE", 1L, "0"))
      .toDF("_raw", "_op", "_ts", "_txn_op_index")
    val e = intercept[IllegalArgumentException] {
      MongoModes.project(frame, TableSpec("", "orders", shadowSchema),
        MongoModes.TopLevelString)
    }
    assert(e.getMessage.contains("shadow"), e.getMessage)
  }
}
