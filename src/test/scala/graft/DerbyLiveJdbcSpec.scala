package graft

import java.nio.file.{Files, Path}
import java.sql.{Connection, DriverManager}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.model.{TableRegistry, TableSpec}
import graft.schema.JdbcRegistry
import graft.streaming.{CdcConfig, CdcPipeline, JdbcSnapshot, SnapshotOverrides}

/** The live-database path end to end, against embedded Derby (in the
  * Spark jars dir — no new dependency): the REAL `DatabaseMetaData`
  * walk through `schema.JdbcRegistry` (every other spec mocks the
  * `MetadataProvider`), a REAL server-side snapshot through
  * `SnapshotOverrides.asJdbcSubquery` + `spark.read.jdbc` (previously
  * rendered but never executed), and the snapshot composed with the
  * binlog-tail feed into one coherent sink — the reference's
  * snapshot-then-stream startup (`MySQLStreamer.java:269-291,313-457`)
  * with no mock anywhere in the JDBC half.
  */
class DerbyLiveJdbcSpec extends AnyFunSuite with BeforeAndAfterAll {
  lazy val spark: SparkSession = TestSpark.session

  private val url = "jdbc:derby:memory:graftlive"
  private val connProps = Map("driver" -> "org.apache.derby.jdbc.EmbeddedDriver")

  def tmp(): Path = Files.createTempDirectory("graft-derby-")

  override def beforeAll(): Unit = {
    // keep derby.log out of the repo root
    System.setProperty("derby.system.home",
      Files.createTempDirectory("graft-derby-home-").toString)
    val c = DriverManager.getConnection(s"$url;create=true")
    try init(c) finally c.close()
  }

  private def init(c: Connection): Unit = {
    val st = c.createStatement()
    // two "databases" (Derby namespaces them as schemas — the
    // PG/Oracle-style walk, dbIsSchema = true), three tables with the
    // §1.3 type spread, plus a LIKE-pattern decoy: USER_EVENTS's `_`
    // must not also match USERXEVENTS when getColumns treats the
    // table name as a pattern
    for (ddl <- Seq(
      "CREATE SCHEMA SALES",
      "CREATE SCHEMA HR",
      """CREATE TABLE SALES.CUSTOMER(
        ID INTEGER NOT NULL, NAME VARCHAR(50), BALANCE DECIMAL(10,2),
        CREATED_AT TIMESTAMP, ACTIVE BOOLEAN)""",
      """CREATE TABLE SALES.USER_EVENTS(
        ID BIGINT, KIND CHAR(4), SCORE DOUBLE, EVENT_DATE DATE)""",
      "CREATE TABLE SALES.USERXEVENTS(BOGUS INTEGER)",
      """CREATE TABLE HR.EMPLOYEE(
        ID INTEGER, SALARY DECIMAL(8,2), HIRED TIMESTAMP, GRADE SMALLINT)""",
      """INSERT INTO SALES.CUSTOMER VALUES
        (1, 'alice', 10.50, TIMESTAMP('2024-03-01 10:30:00'), true),
        (2, 'bob', NULL, TIMESTAMP('2024-03-02 11:00:00'), false),
        (3, 'carol', 3.25, NULL, true),
        (4, 'dave', 99.00, TIMESTAMP('2024-03-04 09:00:00'), true),
        (5, 'erin', 1.00, TIMESTAMP('2024-03-05 08:15:00'), false)""",
      """INSERT INTO SALES.USER_EVENTS VALUES
        (100, 'clik', 0.5, DATE('2024-03-01')),
        (101, 'view', 1.5, DATE('2024-03-02')),
        (102, 'clik', 2.5, NULL)""",
      """INSERT INTO HR.EMPLOYEE VALUES
        (7, 1234.56, TIMESTAMP('2020-01-15 09:00:00'), 3),
        (8, NULL, NULL, NULL)""",
      // ~1k-row table for the chunked resumable snapshot: big enough
      // that 4 chunks are all non-empty, small enough to stay fast
      "CREATE TABLE SALES.BIGSEQ(ID INTEGER NOT NULL, VAL INTEGER)",
      // 2 rows spanning ~5e9: the sparse-key hazard for span-based
      // chunk sizing
      "CREATE TABLE SALES.SPARSEQ(ID BIGINT NOT NULL)",
      "INSERT INTO SALES.SPARSEQ VALUES (1), (5000000000)",
      // nullable chunk key: NULL rows live outside every range
      "CREATE TABLE SALES.NULLSEQ(ID INTEGER, VAL INTEGER)",
      "INSERT INTO SALES.NULLSEQ VALUES (1, 10), (2, 20), (NULL, 30), (8, 80)",
      // every key NULL: no bounds at all
      "CREATE TABLE SALES.ALLNULL(ID INTEGER, VAL INTEGER)",
      "INSERT INTO SALES.ALLNULL VALUES (NULL, 1), (NULL, 2)",
      // heterogeneous PK names for chunk-auto: AID vs BID, plus the
      // two shapes auto must DECLINE (string PK, composite PK)
      "CREATE TABLE SALES.PKA(AID INTEGER NOT NULL PRIMARY KEY, VAL INTEGER)",
      "CREATE TABLE SALES.PKB(BID BIGINT NOT NULL PRIMARY KEY, VAL INTEGER)",
      """CREATE TABLE SALES.PKSTR(
        SID VARCHAR(10) NOT NULL PRIMARY KEY, VAL INTEGER)""",
      "INSERT INTO SALES.PKSTR VALUES ('a', 1), ('b', 2), ('c', 3)",
      """CREATE TABLE SALES.PKCOMP(
        A INTEGER NOT NULL, B INTEGER NOT NULL, VAL INTEGER,
        PRIMARY KEY (A, B))""",
      "INSERT INTO SALES.PKCOMP VALUES (1, 1, 10), (1, 2, 20)"))
      st.executeUpdate(ddl)
    st.close()
    val ps = c.prepareStatement("INSERT INTO SALES.BIGSEQ VALUES (?, ?)")
    for (i <- 1 to 1000) {
      ps.setInt(1, i); ps.setInt(2, i * 2); ps.addBatch()
      if (i % 200 == 0) ps.executeBatch()
    }
    ps.executeBatch()
    ps.close()
    // PKA: 400 rows on AID; PKB: 600 rows on BID — big enough that a
    // 4-chunk plan is all-non-empty for both
    for ((table, col, n) <- Seq(("PKA", "AID", 400), ("PKB", "BID", 600))) {
      val ins = c.prepareStatement(
        s"INSERT INTO SALES.$table ($col, VAL) VALUES (?, ?)")
      for (i <- 1 to n) {
        ins.setInt(1, i); ins.setInt(2, i * 3); ins.addBatch()
        if (i % 200 == 0) ins.executeBatch()
      }
      ins.executeBatch()
      ins.close()
    }
  }

  /** What the walk SHOULD produce: the declared-config registry for
    * the same tables under the §1.3 collapse (decimal/timestamp →
    * string, DATE → int epoch-days, SMALLINT → int, BIGINT → long).
    */
  private val declared = TableRegistry(Seq(
    TableSpec("SALES", "CUSTOMER", StructType(Seq(
      StructField("ID", IntegerType),
      StructField("NAME", StringType),
      StructField("BALANCE", StringType),
      StructField("CREATED_AT", StringType),
      StructField("ACTIVE", BooleanType)))),
    TableSpec("SALES", "USER_EVENTS", StructType(Seq(
      StructField("ID", LongType),
      StructField("KIND", StringType),
      StructField("SCORE", DoubleType),
      StructField("EVENT_DATE", IntegerType)))),
    TableSpec("HR", "EMPLOYEE", StructType(Seq(
      StructField("ID", IntegerType),
      StructField("SALARY", StringType),
      StructField("HIRED", StringType),
      StructField("GRADE", IntegerType))))))

  private def walkRegistry(): TableRegistry = {
    val c = DriverManager.getConnection(url)
    try JdbcRegistry.build(
      JdbcRegistry.fromDatabaseMetaData(c.getMetaData, dbIsSchema = true),
      databases = Seq("SALES", "HR"),
      // specific entries for SALES (excludes the decoy), wildcard for
      // HR — both reference filter shapes against live metadata
      tableFilter = Seq("SALES.CUSTOMER", "SALES.USER_EVENTS", "HR.*"))
    finally c.close()
  }

  test("real DatabaseMetaData walk equals the declared-config registry") {
    val walked = walkRegistry()
    assert(walked.routed.keySet == declared.routed.keySet)
    for ((key, spec) <- declared.routed)
      assert(walked.routed(key).schema == spec.schema,
        s"$key: ${walked.routed(key).schema} != ${spec.schema}")
    // the decoy never leaked in (neither as a table nor as columns)
    assert(!walked.routed.keySet.exists(_.contains("USERXEVENTS")))
    assert(!walked.routed("SALES.USER_EVENTS").schema.fieldNames
      .contains("BOGUS"))
  }

  test("typo'd specific table entry fails fast against live metadata") {
    val c = DriverManager.getConnection(url)
    try {
      val e = intercept[IllegalArgumentException] {
        JdbcRegistry.build(
          JdbcRegistry.fromDatabaseMetaData(c.getMetaData, dbIsSchema = true),
          databases = Seq("SALES"), tableFilter = Seq("SALES.CUSTOMRE"))
      }
      assert(e.getMessage.contains("CUSTOMRE"))
    } finally c.close()
  }

  test("snapshot override executes server-side through the dbtable subquery") {
    val spec = declared.routed("SALES.CUSTOMER")
    val frame = JdbcSnapshot.snapshotFrame(spark, url, connProps,
      "SALES.CUSTOMER", spec,
      Some("SELECT id, name FROM SALES.CUSTOMER WHERE id <= 3"),
      snapshotTsMs = 1700000000000L)
    // the subquery IS the scanned relation — predicate and projection
    // never reach Spark (plan shows the aliased override, and the
    // scan's own schema is just the two selected columns)
    val plan = frame.queryExecution.optimizedPlan.toString
    assert(plan.contains("graft_snapshot_override"), plan)
    val rows = frame.orderBy("ID").collect()
    assert(rows.map(_.getInt(0)).toSeq == Seq(1, 2, 3))
    // unselected payload columns are null-filled, never dropped — the
    // sink schema cannot fork from the tail's
    assert(frame.schema.fieldNames.toSeq ==
      spec.schema.fieldNames.toSeq ++ Seq("_op", "_ts",
        "_binlog_file_internal", "_binlog_pos_internal"))
    assert(rows.forall(_.isNullAt(frame.schema.fieldIndex("BALANCE"))))
    assert(rows.forall(_.getAs[String]("_op") == "READ"))
  }

  test("§1.3 policy casts: decimal/timestamp→string, date→epoch days") {
    val events = JdbcSnapshot.snapshotFrame(spark, url, connProps,
      "SALES.USER_EVENTS", declared.routed("SALES.USER_EVENTS"), None,
      1700000000000L)
      .orderBy("ID").collect()
    // DATE → int epoch days (Debezium envelope semantics — the same
    // encoding the feed path's {"int": N} payloads carry)
    assert(events(0).getInt(3) == 19783) // 2024-03-01
    assert(events(1).getInt(3) == 19784)
    assert(events(2).isNullAt(3))
    assert(events(0).getAs[String]("KIND").trim == "clik")

    val cust = JdbcSnapshot.snapshotFrame(spark, url, connProps,
      "SALES.CUSTOMER", declared.routed("SALES.CUSTOMER"), None,
      1700000000000L)
      .orderBy("ID").collect()
    assert(cust(0).getAs[String]("BALANCE") == "10.50")
    assert(cust(0).getAs[String]("CREATED_AT").startsWith("2024-03-01 10:30"))
    assert(cust(1).isNullAt(2)) // NULL decimal stays null, not "null"
    assert(cust(0).getAs[Boolean]("ACTIVE"))
  }

  test("partition options shard the snapshot read server-side") {
    val spec = declared.routed("SALES.CUSTOMER")
    val frame = JdbcSnapshot.snapshotFrame(spark, url, connProps,
      "SALES.CUSTOMER", spec,
      None, 1700000000000L, partitionOptions = Map(
        "partitionColumn" -> "ID", "lowerBound" -> "1",
        "upperBound" -> "6", "numPartitions" -> "2"))
    // Spark's JDBC source turned the options into 2 range-predicate
    // scans — the parallel path a 100 TB table's snapshot needs
    assert(frame.rdd.getNumPartitions == 2)
    // sharding must not change the result
    assert(frame.select("ID").collect().map(_.getInt(0)).sorted.toSeq
      == Seq(1, 2, 3, 4, 5))
    // the snapshot shape work is map-only: scan → project, no
    // Exchange anywhere (the whole frame is embarrassingly parallel)
    assert(!frame.queryExecution.executedPlan.toString.contains("Exchange"))
  }

  test("name-mapped registry snapshots the SOURCE table into the renamed sink") {
    val out = tmp()
    // the evolution-runbook shape: sink renamed to a version name that
    // does NOT exist at the source — the snapshot must read the
    // original identity and write the renamed one
    val registry = TableRegistry(Seq(
      TableSpec("SALES", "CUSTOMER", declared.routed("SALES.CUSTOMER").schema)),
      tableNameMap = Map("SALES.CUSTOMER" -> "CUSTOMER_V2"))
    val counts = JdbcSnapshot.writeSnapshot(spark,
      CdcConfig("nmsrc", registry, out.toString), url, connProps,
      1700000000000L)
    assert(counts("SALES.CUSTOMER") == 5)
    assert(spark.read.parquet(s"$out/nmsrc_SALES__CUSTOMER_V2").count() == 5)
  }

  test("config-driven snapshot-then-stream through CdcJob.run; restart never re-snapshots") {
    val out = tmp(); val off = tmp(); val in = tmp()
    def cfg(schemas: String) = Map(
      "source.id" -> "livejob",
      "source.type" -> "mysql",
      "sink.path" -> out.toString,
      "offset.store.path" -> off.toString,
      "snapshot.only" -> "true",
      "table.schemas" -> schemas,
      "snapshot.jdbc.url" -> url,
      "snapshot.jdbc.driver" -> "org.apache.derby.jdbc.EmbeddedDriver")
    val empOnly =
      """{"HR.EMPLOYEE":"ID:INTEGER,SALARY:DECIMAL(8,2),HIRED:TIMESTAMP,GRADE:SMALLINT"}"""
    val withEvents =
      """{"HR.EMPLOYEE":"ID:INTEGER,SALARY:DECIMAL(8,2),HIRED:TIMESTAMP,GRADE:SMALLINT",""" +
        """"SALES.USER_EVENTS":"ID:BIGINT,KIND:CHAR(4),SCORE:DOUBLE,EVENT_DATE:DATE"}"""
    // run 1: empty feed — the snapshot lands, NO tail batch runs, so
    // the offset store stays empty: exactly the crash-between-
    // snapshot-and-first-batch window the completion marker closes
    graft.streaming.CdcJob.run(spark, cfg(empOnly), in.toString,
      tmp().resolve("ck1").toString)
    val emp1 = spark.read.parquet(s"$out/livejob_HR__EMPLOYEE")
    assert(emp1.count() == 2) // server-side snapshot rows
    assert(Files.exists(off.resolve("livejob_snapshot.done")))

    // run 2 (restart, STILL no offset): a table was added to the
    // registry — the per-table marker snapshots ONLY the new table;
    // the old one is not duplicated
    graft.streaming.CdcJob.run(spark, cfg(withEvents), in.toString,
      tmp().resolve("ck2").toString)
    assert(spark.read.parquet(s"$out/livejob_HR__EMPLOYEE").count() == 2)
    assert(spark.read.parquet(s"$out/livejob_SALES__USER_EVENTS").count() == 3)

    // run 3 (the tail): one change row; snapshot-only stops at the
    // first non-READ op per table, so the run drains
    Files.write(in.resolve("00-tail.jsonl"), String.join("\n",
      """{"_op":"CREATE","_ts":1700000100000,"_db":"HR","_tbl":"EMPLOYEE","ID":{"int":11},"SALARY":{"string":"50.00"},"HIRED":null,"GRADE":{"int":1},"_binlog_file":"bin.000001","_binlog_pos_end":"10","_binlog_file_internal":"bin.000001","_binlog_pos_internal":"16"}""").getBytes)
    val p = graft.streaming.CdcJob.run(spark, cfg(empOnly), in.toString,
      tmp().resolve("ck3").toString)
    assert(p.gate.stopped) // snapshot-only completion
    val emp = spark.read.parquet(s"$out/livejob_HR__EMPLOYEE")
    // 2 snapshot rows (NOT 4/6 — the marker blocked re-snapshots) +
    // the 1 tail row, one schema
    assert(emp.count() == 3)
    assert(emp.filter(org.apache.spark.sql.functions.col("_op") === "READ")
      .count() == 2)
  }

  test("live snapshot composes with the binlog tail into one sink") {
    val out = tmp(); val off = tmp(); val in = tmp()
    val registry = walkRegistry() // the REAL walk feeds the pipeline
    val cfg = CdcConfig("livesrc", registry, out.toString,
      offsetStorePath = Some(off.toString),
      snapshotOverrides = SnapshotOverrides.fromConfig(Map(
        "snapshot.select.statement.overrides" -> "SALES.CUSTOMER",
        "snapshot.select.statement.overrides.SALES.CUSTOMER" ->
          "SELECT id, name FROM SALES.CUSTOMER WHERE id <= 3")))

    // phase 1: server-side snapshot into the sink layout
    val counts = JdbcSnapshot.writeSnapshot(spark, cfg, url, connProps,
      snapshotTsMs = 1700000000000L)
    assert(counts("SALES.CUSTOMER") == 3) // override pushed down
    assert(counts("SALES.USER_EVENTS") == 3 && counts("HR.EMPLOYEE") == 2)

    // phase 2: the tail — change rows only, appended by the pipeline
    // into the SAME sink dirs (field names match the walked registry)
    Files.write(in.resolve("00-tail.jsonl"), String.join("\n",
      """{"_op":"CREATE","_ts":1700000100000,"_db":"SALES","_tbl":"CUSTOMER","ID":{"int":9},"NAME":{"string":"dan"},"BALANCE":{"string":"7.25"},"CREATED_AT":null,"ACTIVE":{"boolean":true},"_binlog_file":"bin.000001","_binlog_pos_end":"10","_binlog_file_internal":"bin.000001","_binlog_pos_internal":"16"}""",
      """{"_op":"UPDATE","_ts":1700000200000,"_db":"SALES","_tbl":"CUSTOMER","ID":{"int":2},"NAME":{"string":"bob2"},"BALANCE":null,"CREATED_AT":null,"ACTIVE":{"boolean":false},"_binlog_file":"bin.000001","_binlog_pos_end":"20","_binlog_file_internal":"bin.000001","_binlog_pos_internal":"26"}""",
      """{"_op":"CREATE","_ts":1700000300000,"_db":"HR","_tbl":"EMPLOYEE","ID":{"int":11},"SALARY":{"string":"50.00"},"HIRED":null,"GRADE":{"int":1},"_binlog_file":"bin.000001","_binlog_pos_end":"30","_binlog_file_internal":"bin.000001","_binlog_pos_internal":"36"}""").getBytes)
    new CdcPipeline(spark, cfg)
      .runAvailableNow(in.toString, tmp().resolve("ck").toString)

    // one coherent dataset per table: snapshot READs + tail changes,
    // one schema, no duplicates
    val cust = spark.read.parquet(s"$out/livesrc_SALES__CUSTOMER")
    assert(cust.count() == 5) // 3 snapshot + 2 tail
    val byOp = cust.collect().groupBy(_.getAs[String]("_op"))
    assert(byOp("READ").length == 3 && byOp("CREATE").length == 1 &&
      byOp("UPDATE").length == 1)
    // tail rows are NOT snapshot-gated: ID 9 > 3 passed through
    assert(byOp("CREATE")(0).getAs[Int]("ID") == 9)
    // snapshot rows carry the override's projection (BALANCE nulled),
    // tail rows carry full payloads
    assert(byOp("READ").forall(r => r.isNullAt(r.fieldIndex("BALANCE"))))
    assert(byOp("CREATE")(0).getAs[String]("BALANCE") == "7.25")
    val emp = spark.read.parquet(s"$out/livesrc_HR__EMPLOYEE")
    assert(emp.count() == 3) // 2 snapshot + 1 tail
    // the tail published its offset — the batch MAX across tables
    // (snapshot itself writes none: READ rows don't move the binlog
    // position, same as the feed path)
    assert(Files.readString(off.resolve("livesrc_offset.txt")).trim
      == "bin.000001,30")
  }

  // ---- pg/oracle flavor composition: keptMetadata + offset formats ----

  test("postgres and oracle flavors: composed snapshot+tail keeps only " +
      "the flavor's metadata and writes the flavor's offset format") {
    // (flavor, §1.3-collapsed payload schema, tail lines, expected
    // published offset). PG/Oracle route by BARE table name (`_schema`
    // carries the namespace — EnvelopeDecoder routing), so the
    // snapshot reads HR.EMPLOYEE via an override statement, the same
    // mechanism a live pg/oracle job uses for schema-qualified reads.
    val flavors = Seq(
      ("postgres",
        StructType(Seq(
          StructField("ID", IntegerType), StructField("SALARY", StringType),
          StructField("HIRED", StringType), StructField("GRADE", IntegerType))),
        Seq("""{"_op":"CREATE","_ts":1700000100000,"_schema":"HR","_tbl":"EMPLOYEE","ID":{"int":11},"SALARY":{"string":"50.00"},"HIRED":null,"GRADE":{"int":1},"_lsn":"1001"}"""),
        "1001"),
      ("oracle",
        StructType(Seq(
          StructField("ID", StringType), StructField("SALARY", StringType),
          StructField("HIRED", StringType), StructField("GRADE", StringType))),
        // oracle raw ops: "r" snapshot (skipped for offsets), "c" change
        Seq("""{"_op":"r","_ts":1700000100000,"_schema":"HR","_tbl":"EMPLOYEE","ID":{"string":"12"},"SALARY":null,"HIRED":null,"GRADE":null,"_scn":"7000"}""",
          """{"_op":"c","_ts":1700000200000,"_schema":"HR","_tbl":"EMPLOYEE","ID":{"string":"11"},"SALARY":{"string":"50.00"},"HIRED":null,"GRADE":{"string":"1"},"_scn":"5007"}"""),
        "5007"))
    for ((flavor, schema, tail, expectedOffset) <- flavors) {
      val out = tmp(); val off = tmp(); val in = tmp()
      val registry = TableRegistry(Seq(TableSpec("", "EMPLOYEE", schema)))
      val cfg = CdcConfig(s"live_$flavor", registry, out.toString,
        sourceType = flavor,
        offsetStorePath = Some(off.toString),
        snapshotOverrides = SnapshotOverrides.fromConfig(Map(
          "snapshot.select.statement.overrides" -> "EMPLOYEE",
          "snapshot.select.statement.overrides.EMPLOYEE" ->
            "SELECT * FROM HR.EMPLOYEE")))

      val counts = JdbcSnapshot.writeSnapshot(spark, cfg, url, connProps,
        snapshotTsMs = 1700000000000L)
      assert(counts("EMPLOYEE") == 2, s"$flavor snapshot count")
      val dir = s"$out/live_${flavor}_EMPLOYEE"
      // keptMetadata per flavor: pg/oracle sinks carry ONLY _op/_ts
      // after the payload — no binlog columns, no _txn_op_index
      // (PostgresStreamer.java:257-258, OracleStreamer.java:254-255)
      val snapCols = spark.read.parquet(dir).columns.toSeq
      assert(snapCols.sorted ==
        (schema.fieldNames.toSeq ++ Seq("_op", "_ts", "dt")).sorted,
        s"$flavor snapshot columns: $snapCols")

      Files.write(in.resolve("00-tail.jsonl"),
        String.join("\n", tail: _*).getBytes)
      new CdcPipeline(spark, cfg)
        .runAvailableNow(in.toString, tmp().resolve("ck").toString)

      val sink = spark.read.parquet(dir)
      assert(sink.count() == 2 + tail.length, s"$flavor composed rows")
      // ONE schema for snapshot + tail — composition did not fork it
      assert(sink.columns.toSeq.sorted == snapCols.sorted, s"$flavor schema")
      // the flavor's offset format wrote back: numeric LSN / SCN of the
      // max non-snapshot op (oracle's "r" and the READ rows are skipped)
      assert(Files.readString(off.resolve(s"live_${flavor}_offset.txt")).trim
        == expectedOffset, s"$flavor offset")
    }
  }

  // ---- chunked resumable snapshot (JdbcSnapshot.writeSnapshotChunked) ----

  private val bigseqSchema = StructType(Seq(
    StructField("ID", IntegerType), StructField("VAL", IntegerType)))

  /** Forwards to `inner` but throws after `n` chunks have landed —
    * the crash-between-chunks injection point. The marker is written
    * BEFORE the throw, exactly like a real crash after the marker
    * create.
    */
  private final class CrashAfter(inner: JdbcSnapshot.ChunkProgress, n: Int)
      extends JdbcSnapshot.ChunkProgress {
    var landed = 0
    def plan(key: String): Option[JdbcSnapshot.ChunkPlan] = inner.plan(key)
    def savePlan(p: JdbcSnapshot.ChunkPlan): Unit = inner.savePlan(p)
    def doneChunks(key: String): Set[Int] = inner.doneChunks(key)
    def chunkDone(key: String, i: Int): Unit = {
      inner.chunkDone(key, i)
      landed += 1
      if (landed >= n) throw new RuntimeException("injected crash")
    }
    override def saveManifest(key: String, i: Int,
        files: Seq[String]): Unit = inner.saveManifest(key, i, files)
    override def manifest(key: String, i: Int): Option[Seq[String]] =
      inner.manifest(key, i)
    override def clearManifest(key: String, i: Int): Unit =
      inner.clearManifest(key, i)
  }

  /** Forwards to `inner`, recording which chunks land and whether the
    * plan was re-cut (savePlan called again = the restart re-probed).
    */
  private final class Recording(inner: JdbcSnapshot.ChunkProgress)
      extends JdbcSnapshot.ChunkProgress {
    var saved = 0
    var landedChunks = Vector.empty[Int]
    def plan(key: String): Option[JdbcSnapshot.ChunkPlan] = inner.plan(key)
    def savePlan(p: JdbcSnapshot.ChunkPlan): Unit = {
      saved += 1; inner.savePlan(p)
    }
    def doneChunks(key: String): Set[Int] = inner.doneChunks(key)
    def chunkDone(key: String, i: Int): Unit = {
      landedChunks :+= i; inner.chunkDone(key, i)
    }
    override def saveManifest(key: String, i: Int,
        files: Seq[String]): Unit = inner.saveManifest(key, i, files)
    override def manifest(key: String, i: Int): Option[Seq[String]] =
      inner.manifest(key, i)
    override def clearManifest(key: String, i: Int): Unit =
      inner.clearManifest(key, i)
  }

  test("chunk range composes with the override subquery, both server-side") {
    val spec = TableSpec("SALES", "BIGSEQ", bigseqSchema)
    val frame = JdbcSnapshot.snapshotFrame(spark, url, connProps,
      "SALES.BIGSEQ", spec,
      Some("SELECT id, val FROM SALES.BIGSEQ WHERE id <= 900"),
      1700000000000L, chunk = Some(("ID", 251, 500)))
    // the scanned relation IS the nested subquery: chunk range wrapped
    // around the override alias — neither predicate reaches Spark
    val plan = frame.queryExecution.optimizedPlan.toString
    assert(plan.contains("graft_chunk"), plan)
    assert(plan.contains("graft_snapshot_override"), plan)
    val ids = frame.select("ID").collect().map(_.getInt(0)).sorted
    assert(ids.head == 251 && ids.last == 500 && ids.length == 250)
  }

  test("chunked snapshot crash after chunk 1 resumes the SAME plan, " +
      "re-runs only the remaining chunks, exact counts") {
    val out = tmp(); val progDir = tmp().resolve("chunks").toString
    val registry = TableRegistry(Seq(TableSpec("SALES", "BIGSEQ", bigseqSchema)))
    val cfg = CdcConfig("chunksrc", registry, out.toString,
      snapshotOverrides = SnapshotOverrides.fromConfig(Map(
        "snapshot.select.statement.overrides" -> "SALES.BIGSEQ",
        "snapshot.select.statement.overrides.SALES.BIGSEQ" ->
          "SELECT id, val FROM SALES.BIGSEQ WHERE id <= 900")))
    val file = new JdbcSnapshot.FileChunkProgress(spark, progDir)

    // run 1: crashes after the first chunk's marker lands
    val crash = new CrashAfter(file, 1)
    intercept[RuntimeException] {
      JdbcSnapshot.writeSnapshotChunked(spark, cfg, url, connProps,
        1700000000000L, _ => Some("ID"), 4, crash)
    }
    val dir = s"$out/chunksrc_SALES__BIGSEQ"
    // plan cut once, bounds probed THROUGH the override (id<=900):
    // [1,900] in 4 chunks of 225; chunk 0 landed
    assert(spark.read.parquet(dir).count() == 225)
    val planBefore = file.plan("SALES.BIGSEQ").get
    assert(planBefore == JdbcSnapshot.ChunkPlan("SALES.BIGSEQ", "ID", 4, 1,
      900, Some(1700000000000L)))
    assert(file.doneChunks("SALES.BIGSEQ") == Set(0))

    // a row arrives at the source AFTER the plan was cut: a restart
    // that re-probed bounds would widen the last range to include it
    val c = DriverManager.getConnection(url)
    try {
      val st = c.createStatement()
      st.executeUpdate("INSERT INTO SALES.BIGSEQ VALUES (2000, 4000)")
      st.close()
    } finally c.close()

    // run 2 (restart): same progress dir — resumes, never re-probes.
    // The restart's OWN clock is a day later: the persisted plan's
    // tsMs must win, or this table's READ rows would carry two `_ts`
    // values and straddle two `dt=` partitions
    val rec = new Recording(file)
    val counts = JdbcSnapshot.writeSnapshotChunked(spark, cfg, url,
      connProps, 1700000000000L + 86400000L, _ => Some("ID"), 4, rec)
    assert(rec.saved == 0, "restart re-cut the plan (re-probe!)")
    assert(rec.landedChunks == Vector(1, 2, 3), rec.landedChunks)
    assert(file.plan("SALES.BIGSEQ").get == planBefore)
    // this run wrote only chunks 2-4: ids 226..900 under the override
    assert(counts("SALES.BIGSEQ") == 675)
    val snap = spark.read.parquet(dir)
    // single _ts and single dt across ALL chunks, both runs
    assert(snap.select("_ts").distinct().collect()
      .map(_.getLong(0)).toSeq == Seq(1700000000000L))
    assert(snap.select("dt").distinct().count() == 1)
    val ids = snap.select("ID").collect()
      .map(_.getInt(0)).sorted
    // exact rows: 1..900 once each; the post-plan insert (id 2000) is
    // NOT here — it belongs to the binlog tail, like any other write
    // after the snapshot point
    assert(ids.length == 900 && ids.head == 1 && ids.last == 900)
    assert(ids.distinct.length == 900)

    // cleanup: keep BIGSEQ deterministic for other tests
    val c2 = DriverManager.getConnection(url)
    try {
      val st = c2.createStatement()
      st.executeUpdate("DELETE FROM SALES.BIGSEQ WHERE ID = 2000")
      st.close()
    } finally c2.close()
  }

  test("numPartitions shards each chunk's scan; result identical to unsharded") {
    val registry = TableRegistry(Seq(TableSpec("SALES", "BIGSEQ", bigseqSchema)))
    def snapAll(parts: Int): Seq[Int] = {
      val out = tmp()
      val cfg = CdcConfig(s"shard$parts", registry, out.toString)
      val file = new JdbcSnapshot.FileChunkProgress(spark,
        tmp().resolve("chunks").toString)
      JdbcSnapshot.writeSnapshotChunked(spark, cfg, url, connProps,
        1700000000000L, _ => Some("ID"), 4, file, numPartitions = parts)
      spark.read.parquet(s"$out/shard${parts}_SALES__BIGSEQ")
        .select("ID").collect().map(_.getInt(0)).sorted.toSeq
    }
    // chunk = resume unit, partitions = parallelism unit: the sharded
    // run reads through 2 range partitions per chunk (the JDBC bounds
    // are the chunk's own range, so the shards tile the chunk), and
    // the rows are exactly the unsharded rows
    val plain = snapAll(1)
    val sharded = snapAll(2)
    assert(plain == (1 to 1000) && sharded == plain)
    // plan-level: a sharded chunk frame has 2 partitions, no Exchange
    val frame = JdbcSnapshot.snapshotFrame(spark, url, connProps,
      "SALES.BIGSEQ", registry.routed("SALES.BIGSEQ"), None,
      1700000000000L,
      partitionOptions = Map("partitionColumn" -> "ID",
        "lowerBound" -> "251", "upperBound" -> "500",
        "numPartitions" -> "2"),
      chunk = Some(("ID", 251, 500)))
    assert(frame.rdd.getNumPartitions == 2)
    assert(frame.select("ID").collect().map(_.getInt(0)).sorted.toSeq
      == (251 to 500))
    assert(!frame.queryExecution.executedPlan.toString.contains("Exchange"))
  }

  test("chunk.rows sizes the plan per table from the probed span " +
      "(the reference's rows-per-split knob)") {
    val out = tmp(); val progDir = tmp().resolve("chunks").toString
    val registry = TableRegistry(Seq(TableSpec("SALES", "BIGSEQ", bigseqSchema)))
    val cfg = CdcConfig("rowchunks", registry, out.toString)
    val file = new JdbcSnapshot.FileChunkProgress(spark, progDir)
    val counts = JdbcSnapshot.writeSnapshotChunked(spark, cfg, url,
      connProps, 1700000000000L, _ => Some("ID"), chunks = 999 /* overridden */,
      file, rowsPerChunk = Some(300L))
    // span [1,1000] at 300 rows/chunk → ceil(1000/300) = 4 chunks,
    // persisted in the plan (not the ignored `chunks` arg)
    assert(file.plan("SALES.BIGSEQ").get ==
      JdbcSnapshot.ChunkPlan("SALES.BIGSEQ", "ID", 4, 1, 1000,
        Some(1700000000000L)))
    assert(file.doneChunks("SALES.BIGSEQ") == Set(0, 1, 2, 3))
    assert(counts("SALES.BIGSEQ") == 1000)
  }

  test("chunk.rows sizing probes bounds THROUGH a narrowing override: " +
      "the plan spans the data actually read, not the raw table") {
    val out = tmp(); val progDir = tmp().resolve("chunks").toString
    val registry = TableRegistry(Seq(TableSpec("SALES", "BIGSEQ", bigseqSchema)))
    val cfg = CdcConfig("ovchunks", registry, out.toString,
      snapshotOverrides = SnapshotOverrides.fromConfig(Map(
        "snapshot.select.statement.overrides" -> "SALES.BIGSEQ",
        "snapshot.select.statement.overrides.SALES.BIGSEQ" ->
          "SELECT id, val FROM SALES.BIGSEQ WHERE id <= 300")))
    val file = new JdbcSnapshot.FileChunkProgress(spark, progDir)
    val counts = JdbcSnapshot.writeSnapshotChunked(spark, cfg, url,
      connProps, 1700000000000L, _ => Some("ID"), chunks = 999 /* overridden */,
      file, rowsPerChunk = Some(100L))
    // overridden span [1,300] at 100 rows/chunk → 3 chunks — NOT
    // ceil(1000/100)=10 from the raw table's span: a narrowing
    // override over a wide key range must not inflate the chunk
    // count (or, at a sparse extreme, trip the MaxChunks guard)
    assert(file.plan("SALES.BIGSEQ").get ==
      JdbcSnapshot.ChunkPlan("SALES.BIGSEQ", "ID", 3, 1, 300,
        Some(1700000000000L)))
    assert(counts("SALES.BIGSEQ") == 300)
    val ids = spark.read.parquet(s"$out/ovchunks_SALES__BIGSEQ")
      .select("ID").collect().map(_.getInt(0)).sorted.toSeq
    assert(ids == (1 to 300))
  }

  test("NULL-keyed rows land exactly once (chunk 0 sweeps them); " +
      "an all-NULL table is not silently skipped") {
    val nullSchema = StructType(Seq(
      StructField("ID", IntegerType), StructField("VAL", IntegerType)))
    // nullable key: 3 keyed rows + 1 NULL-keyed row, 2 chunks sharded
    // 2 ways — the NULL row is outside every range WHERE and outside
    // Spark's range partitions; only chunk 0's IS NULL arm can see it
    val out1 = tmp()
    val reg1 = TableRegistry(Seq(TableSpec("SALES", "NULLSEQ", nullSchema)))
    val counts1 = JdbcSnapshot.writeSnapshotChunked(spark,
      CdcConfig("nullsnap", reg1, out1.toString), url, connProps,
      1700000000000L, _ => Some("ID"), 2,
      new JdbcSnapshot.FileChunkProgress(spark,
        tmp().resolve("chunks").toString),
      numPartitions = 2)
    assert(counts1("SALES.NULLSEQ") == 4)
    val rows = spark.read.parquet(s"$out1/nullsnap_SALES__NULLSEQ")
      .select("VAL").collect().map(_.getInt(0)).sorted.toSeq
    assert(rows == Seq(10, 20, 30, 80)) // NULL-keyed row 30 exactly once

    // all keys NULL: chunkBounds probes no bounds — the synthetic
    // one-chunk plan's IS NULL arm still snapshots the rows
    val out2 = tmp()
    val reg2 = TableRegistry(Seq(TableSpec("SALES", "ALLNULL", nullSchema)))
    val prog2 = new JdbcSnapshot.FileChunkProgress(spark,
      tmp().resolve("chunks").toString)
    val counts2 = JdbcSnapshot.writeSnapshotChunked(spark,
      CdcConfig("allnull", reg2, out2.toString), url, connProps,
      1700000000000L, _ => Some("ID"), 4, prog2)
    assert(counts2("SALES.ALLNULL") == 2)
    // the synthetic plan persisted + chunk marked: restart writes nothing
    assert(prog2.plan("SALES.ALLNULL").contains(
      JdbcSnapshot.ChunkPlan("SALES.ALLNULL", "ID", 1, 0, 0,
        Some(1700000000000L))))
    val counts2b = JdbcSnapshot.writeSnapshotChunked(spark,
      CdcConfig("allnull", reg2, out2.toString), url, connProps,
      1700000000000L, _ => Some("ID"), 4, prog2)
    assert(counts2b("SALES.ALLNULL") == 0)
  }

  test("chunk.rows.exact sizes by COUNT(*): a sparse key that would " +
      "trip the span guard plans from true rows") {
    // SPARSEQ: 2 rows spanning ~5e9 — span-based sizing at 4096
    // rows/chunk derives ~1.2M chunks and fails the MaxChunks guard
    // (the test below); COUNT(*)-probed sizing sees 2 rows → 1 chunk
    val out = tmp()
    val registry = TableRegistry(Seq(TableSpec("SALES", "SPARSEQ",
      StructType(Seq(StructField("ID", LongType))))))
    val cfg = CdcConfig("exactrows", registry, out.toString)
    val file = new JdbcSnapshot.FileChunkProgress(spark,
      tmp().resolve("chunks").toString)
    val counts = JdbcSnapshot.writeSnapshotChunked(spark, cfg, url,
      connProps, 1700000000000L, _ => Some("ID"), 4, file,
      rowsPerChunk = Some(4096L), exactRows = true)
    assert(counts("SALES.SPARSEQ") == 2)
    assert(file.plan("SALES.SPARSEQ").get ==
      JdbcSnapshot.ChunkPlan("SALES.SPARSEQ", "ID", 1, 1, 5000000000L,
        Some(1700000000000L)))
    // the count is probed THROUGH a narrowing override, like bounds:
    // BIGSEQ under id<=300 has 300 rows → 3 chunks at 100 rows each
    val out2 = tmp()
    val reg2 = TableRegistry(Seq(TableSpec("SALES", "BIGSEQ", bigseqSchema)))
    val cfg2 = CdcConfig("exactov", reg2, out2.toString,
      snapshotOverrides = SnapshotOverrides.fromConfig(Map(
        "snapshot.select.statement.overrides" -> "SALES.BIGSEQ",
        "snapshot.select.statement.overrides.SALES.BIGSEQ" ->
          "SELECT id, val FROM SALES.BIGSEQ WHERE id <= 300")))
    val file2 = new JdbcSnapshot.FileChunkProgress(spark,
      tmp().resolve("chunks").toString)
    val counts2 = JdbcSnapshot.writeSnapshotChunked(spark, cfg2, url,
      connProps, 1700000000000L, _ => Some("ID"), 4, file2,
      rowsPerChunk = Some(100L), exactRows = true)
    assert(counts2("SALES.BIGSEQ") == 300)
    assert(file2.plan("SALES.BIGSEQ").get.chunks == 3)
  }

  private val pkaSchema = StructType(Seq(
    StructField("AID", IntegerType), StructField("VAL", IntegerType)))
  private val pkbSchema = StructType(Seq(
    StructField("BID", LongType), StructField("VAL", IntegerType)))
  private val pkstrSchema = StructType(Seq(
    StructField("SID", StringType), StructField("VAL", IntegerType)))
  private val pkcompSchema = StructType(Seq(
    StructField("A", IntegerType), StructField("B", IntegerType),
    StructField("VAL", IntegerType)))

  test("getPrimaryKeys walk finds each table's own key under either " +
      "namespace convention and any declared case") {
    val c = DriverManager.getConnection(url)
    try {
      // Derby namespaces as schemas — the matching convention...
      val meta = JdbcRegistry.fromDatabaseMetaData(c.getMetaData,
        dbIsSchema = true)
      assert(meta.primaryKeys("SALES", "PKA") == Seq("AID"))
      assert(meta.primaryKeys("SALES", "PKB") == Seq("BID"))
      assert(meta.primaryKeys("SALES", "PKSTR") == Seq("SID"))
      assert(meta.primaryKeys("SALES", "PKCOMP") == Seq("A", "B"))
      assert(meta.primaryKeys("SALES", "BIGSEQ").isEmpty) // no PK at all
      // ...and the MySQL-shaped one (catalog-first): the opposite-
      // convention fallback still finds it — a mysql-typed config
      // against a schema-namespaced engine must not silently lose
      // every PK
      val metaCat = JdbcRegistry.fromDatabaseMetaData(c.getMetaData,
        dbIsSchema = false)
      assert(metaCat.primaryKeys("SALES", "PKA") == Seq("AID"))
      // case-insensitive: a lowercase declared spelling still matches
      // Derby's upcased catalog names
      assert(meta.primaryKeys("sales", "pka") == Seq("AID"))
    } finally c.close()
  }

  test("discoverChunkColumns: numeric single-column PK chunks, " +
      "string/composite/absent PKs decline with a reason") {
    val registry = TableRegistry(Seq(
      TableSpec("SALES", "PKA", pkaSchema),
      TableSpec("SALES", "PKB", pkbSchema),
      TableSpec("SALES", "PKSTR", pkstrSchema),
      TableSpec("SALES", "PKCOMP", pkcompSchema),
      TableSpec("SALES", "BIGSEQ", bigseqSchema)))
    val cfg = CdcConfig("pkdisc", registry, tmp().toString)
    val cols = graft.streaming.CdcJob.discoverChunkColumns(cfg, url,
      connProps, registry.keys,
      org.slf4j.LoggerFactory.getLogger(getClass))
    assert(cols == Map(
      "SALES.PKA" -> Some("AID"),
      "SALES.PKB" -> Some("BID"),
      "SALES.PKSTR" -> None, // string PK: not a numeric range
      "SALES.PKCOMP" -> None, // composite PK
      "SALES.BIGSEQ" -> None)) // no PK
  }

  test("two tables with different PK names chunk-snapshot in one run; " +
      "crash-resume is still exact per table") {
    val out = tmp(); val progDir = tmp().resolve("chunks").toString
    val registry = TableRegistry(Seq(
      TableSpec("SALES", "PKA", pkaSchema),
      TableSpec("SALES", "PKB", pkbSchema)))
    val cfg = CdcConfig("multipk", registry, out.toString)
    val resolver: String => Option[String] = Map(
      "SALES.PKA" -> Some("AID"), "SALES.PKB" -> Some("BID"))
    val file = new JdbcSnapshot.FileChunkProgress(spark, progDir)

    // run 1 crashes after two chunk markers — mid-first-table
    // whichever table the registry iterates first
    val crash = new CrashAfter(file, 2)
    intercept[RuntimeException] {
      JdbcSnapshot.writeSnapshotChunked(spark, cfg, url, connProps,
        1700000000000L, resolver, 4, crash)
    }
    // run 2 resumes: plans kept (each on its OWN column), every chunk
    // lands exactly once across the two runs
    JdbcSnapshot.writeSnapshotChunked(spark, cfg, url, connProps,
      1700000000000L, resolver, 4, file)
    assert(file.plan("SALES.PKA").get.column == "AID")
    assert(file.plan("SALES.PKB").get.column == "BID")
    assert(file.doneChunks("SALES.PKA") == Set(0, 1, 2, 3))
    assert(file.doneChunks("SALES.PKB") == Set(0, 1, 2, 3))
    val a = spark.read.parquet(s"$out/multipk_SALES__PKA")
      .select("AID").collect().map(_.getInt(0)).sorted.toSeq
    assert(a == (1 to 400))
    val b = spark.read.parquet(s"$out/multipk_SALES__PKB")
      .select("BID").collect().map(_.getLong(0)).sorted.toSeq
    assert(b == (1L to 600L))
  }

  test("snapshot.jdbc.chunk.auto: a heterogeneous registry chunks " +
      "each table on its discovered PK; non-chunkable tables " +
      "single-shot in the same run; per-table override wins") {
    val out = tmp(); val off = tmp(); val in = tmp()
    val cfg = Map(
      "source.id" -> "autopk",
      "source.type" -> "mysql",
      "sink.path" -> out.toString,
      "offset.store.path" -> off.toString,
      "snapshot.only" -> "true",
      "table.schemas" -> ("""{"SALES.PKA":"AID:INTEGER,VAL:INTEGER",""" +
        """"SALES.PKB":"BID:BIGINT,VAL:INTEGER",""" +
        """"SALES.PKSTR":"SID:VARCHAR(10),VAL:INTEGER",""" +
        """"SALES.PKCOMP":"A:INTEGER,B:INTEGER,VAL:INTEGER"}"""),
      "snapshot.jdbc.url" -> url,
      "snapshot.jdbc.driver" -> "org.apache.derby.jdbc.EmbeddedDriver",
      "snapshot.jdbc.chunk.auto" -> "true",
      // PKSTR's PK is a string — but its VAL is numeric: the
      // per-table override makes even that table chunkable
      "snapshot.jdbc.chunk.column.SALES.PKSTR" -> "VAL")
    graft.streaming.CdcJob.run(spark, cfg, in.toString,
      tmp().resolve("ck").toString)
    assert(spark.read.parquet(s"$out/autopk_SALES__PKA").count() == 400)
    assert(spark.read.parquet(s"$out/autopk_SALES__PKB").count() == 600)
    assert(spark.read.parquet(s"$out/autopk_SALES__PKSTR").count() == 3)
    assert(spark.read.parquet(s"$out/autopk_SALES__PKCOMP").count() == 2)
    // the durable plans prove who chunked on what: PKA/PKB on their
    // own PKs, PKSTR on the overridden column, PKCOMP (composite)
    // fell back to single-shot — no plan at all
    val prog = new JdbcSnapshot.FileChunkProgress(spark,
      s"$off/autopk_snapshot.chunks")
    assert(prog.plan("SALES.PKA").get.column == "AID")
    assert(prog.plan("SALES.PKB").get.column == "BID")
    assert(prog.plan("SALES.PKSTR").get.column == "VAL")
    assert(prog.plan("SALES.PKCOMP").isEmpty)
  }

  test("crash BETWEEN a chunk's publish and its marker cannot " +
      "duplicate rows: the staged-commit manifest heals the re-run") {
    val out = tmp(); val progDir = tmp().resolve("chunks").toString
    val registry = TableRegistry(Seq(TableSpec("SALES", "BIGSEQ", bigseqSchema)))
    val cfg = CdcConfig("stagecrash", registry, out.toString)
    val file = new JdbcSnapshot.FileChunkProgress(spark, progDir)
    // run 1 dies INSIDE the r9 duplicate window: chunk 1's files are
    // already renamed into the sink, but the done marker never lands
    // (before the staged commit, this exact shape re-ran chunk 1 on
    // resume and appended its 250 rows a second time)
    val crash = new JdbcSnapshot.ChunkProgress {
      def plan(key: String) = file.plan(key)
      def savePlan(p: JdbcSnapshot.ChunkPlan): Unit = file.savePlan(p)
      def doneChunks(key: String) = file.doneChunks(key)
      def chunkDone(key: String, i: Int): Unit =
        if (i == 1) throw new RuntimeException("crash before marker")
        else file.chunkDone(key, i)
      override def saveManifest(key: String, i: Int,
          files: Seq[String]): Unit = file.saveManifest(key, i, files)
      override def manifest(key: String, i: Int) = file.manifest(key, i)
      override def clearManifest(key: String, i: Int): Unit =
        file.clearManifest(key, i)
    }
    intercept[RuntimeException] {
      JdbcSnapshot.writeSnapshotChunked(spark, cfg, url, connProps,
        1700000000000L, _ => Some("ID"), 4, crash)
    }
    val dir = s"$out/stagecrash_SALES__BIGSEQ"
    // the window's exact on-disk shape: chunk 1 published (500 rows
    // visible), marked NOT done, manifest still present
    assert(spark.read.parquet(dir).count() == 500)
    assert(file.doneChunks("SALES.BIGSEQ") == Set(0))
    val m = file.manifest("SALES.BIGSEQ", 1)
      .getOrElse(fail("manifest should survive the crash"))
    assert(m.nonEmpty && m.forall(_.startsWith("dt=")))
    // chunk 0 committed cleanly — its manifest was cleared
    assert(file.manifest("SALES.BIGSEQ", 0).isEmpty)

    // resume: the heal deletes chunk 1's published files before the
    // re-run — every id exactly once, no duplicate from the replay
    JdbcSnapshot.writeSnapshotChunked(spark, cfg, url, connProps,
      1700000000000L, _ => Some("ID"), 4, file)
    val ids = spark.read.parquet(dir).select("ID").collect()
      .map(_.getInt(0)).sorted.toSeq
    assert(ids == (1 to 1000))
    assert(file.doneChunks("SALES.BIGSEQ") == Set(0, 1, 2, 3))
    assert(file.manifest("SALES.BIGSEQ", 1).isEmpty) // cleared on commit
    // no staging remnant inside the sink
    assert(!Files.exists(java.nio.file.Paths.get(dir, ".graft_stage_chunk1")))
  }

  test("table.parallelism overlaps per-table snapshots (barrier-proven) " +
      "with exact per-table counts") {
    val out = tmp()
    val registry = TableRegistry(Seq(
      TableSpec("SALES", "PKA", pkaSchema),
      TableSpec("SALES", "PKB", pkbSchema)))
    val cfg = CdcConfig("partab", registry, out.toString)
    val file = new JdbcSnapshot.FileChunkProgress(spark,
      tmp().resolve("chunks").toString)
    // both tables must be INSIDE their plan cut simultaneously to
    // pass the barrier — deterministic proof of overlap (sequential
    // execution times out and fails, it cannot pass by luck)
    val barrier = new java.util.concurrent.CyclicBarrier(2)
    val meet = new JdbcSnapshot.ChunkProgress {
      def plan(key: String) = file.plan(key)
      def savePlan(p: JdbcSnapshot.ChunkPlan): Unit = {
        barrier.await(60, java.util.concurrent.TimeUnit.SECONDS)
        file.savePlan(p)
      }
      def doneChunks(key: String) = file.doneChunks(key)
      def chunkDone(key: String, i: Int): Unit = file.chunkDone(key, i)
    }
    val counts = JdbcSnapshot.writeSnapshotChunked(spark, cfg, url,
      connProps, 1700000000000L,
      Map("SALES.PKA" -> Some("AID"), "SALES.PKB" -> Some("BID")), 4,
      meet, tableParallelism = 2)
    assert(counts == Map("SALES.PKA" -> 400L, "SALES.PKB" -> 600L))
    assert(spark.read.parquet(s"$out/partab_SALES__PKA").count() == 400)
    assert(spark.read.parquet(s"$out/partab_SALES__PKB").count() == 600)

    // the single-shot path takes the same knob: exact counts with a
    // 2-thread pool over two plain scans
    val out2 = tmp()
    val counts2 = JdbcSnapshot.writeSnapshot(spark,
      CdcConfig("partab2", registry, out2.toString), url, connProps,
      1700000000000L, tableParallelism = 2)
    assert(counts2 == Map("SALES.PKA" -> 400L, "SALES.PKB" -> 600L))
  }

  test("a chunk column for an unknown table fails fast") {
    val out = tmp(); val off = tmp(); val in = tmp()
    val cfg = Map(
      "source.id" -> "badchunk",
      "source.type" -> "mysql",
      "sink.path" -> out.toString,
      "offset.store.path" -> off.toString,
      "snapshot.only" -> "true",
      "table.schemas" -> """{"SALES.PKA":"AID:INTEGER,VAL:INTEGER"}""",
      "snapshot.jdbc.url" -> url,
      "snapshot.jdbc.chunk.column.SALES.NOPE" -> "ID")
    val e = intercept[IllegalArgumentException] {
      graft.streaming.CdcJob.run(spark, cfg, in.toString,
        tmp().resolve("ck").toString)
    }
    assert(e.getMessage.contains("UNKNOWN TABLE"), e.getMessage)
  }

  test("chunk.rows on a sparse key fails fast, not a persisted death march") {
    val registry = TableRegistry(Seq(TableSpec("SALES", "SPARSEQ",
      StructType(Seq(StructField("ID", LongType))))))
    val cfg = CdcConfig("sparse", registry, tmp().toString)
    val file = new JdbcSnapshot.FileChunkProgress(spark,
      tmp().resolve("chunks").toString)
    // span ~5e9 at 4096 rows/chunk → ~1.2M chunks, over MaxChunks:
    // the column is too sparse for span-based sizing — the plan must
    // never be cut (a persisted pathological plan would resume on
    // every restart)
    val e = intercept[IllegalArgumentException] {
      JdbcSnapshot.writeSnapshotChunked(spark, cfg, url, connProps,
        1700000000000L, _ => Some("ID"), 4, file, rowsPerChunk = Some(4096L))
    }
    assert(e.getMessage.contains("too sparse"), e.getMessage)
    assert(file.plan("SALES.SPARSEQ").isEmpty)
  }

  test("a 4-field plan file from before the timestamp field still " +
      "parses and resumes (ts falls back to the resuming run)") {
    val dir = tmp().resolve("chunks")
    Files.createDirectories(dir)
    // the exact on-disk shape round 9 wrote: no 5th field
    Files.write(dir.resolve("SALES.BIGSEQ.plan"),
      "ID 4 1 1000\n".getBytes("UTF-8"))
    val file = new JdbcSnapshot.FileChunkProgress(spark, dir.toString)
    assert(file.plan("SALES.BIGSEQ").contains(
      JdbcSnapshot.ChunkPlan("SALES.BIGSEQ", "ID", 4, 1, 1000, None)))
    // the old plan resumes; rows stamp the RESUMING run's ts (the
    // pre-field behavior — only plans cut after the field exists can
    // promise a single ts across a crash)
    val out = tmp()
    val registry = TableRegistry(Seq(TableSpec("SALES", "BIGSEQ", bigseqSchema)))
    val counts = JdbcSnapshot.writeSnapshotChunked(spark,
      CdcConfig("oldplan", registry, out.toString), url, connProps,
      1712345678000L, _ => Some("ID"), 999 /* plan wins */, file)
    assert(counts("SALES.BIGSEQ") == 1000)
    val ts = spark.read.parquet(s"$out/oldplan_SALES__BIGSEQ")
      .select("_ts").distinct().collect().map(_.getLong(0)).toSeq
    assert(ts == Seq(1712345678000L))
  }

  test("an empty plan file (crash between create and write) self-heals") {
    val dir = tmp().resolve("chunks")
    Files.createDirectories(dir)
    Files.write(dir.resolve("SALES.BIGSEQ.plan"), Array.empty[Byte])
    val file = new JdbcSnapshot.FileChunkProgress(spark, dir.toString)
    // the empty file is the savePlan create→write crash window: no
    // plan was recorded, so it reads as absent (and is deleted) —
    // create-once must NOT wedge the table forever
    assert(file.plan("SALES.BIGSEQ").isEmpty)
    assert(!Files.exists(dir.resolve("SALES.BIGSEQ.plan")))
    val p = JdbcSnapshot.ChunkPlan("SALES.BIGSEQ", "ID", 4, 1, 1000)
    file.savePlan(p) // re-cut succeeds after self-heal
    assert(file.plan("SALES.BIGSEQ").contains(p))
  }

  test("savePlan is create-once: a second cut of the same table fails") {
    val file = new JdbcSnapshot.FileChunkProgress(spark,
      tmp().resolve("chunks").toString)
    val p = JdbcSnapshot.ChunkPlan("SALES.BIGSEQ", "ID", 4, 1, 1000)
    file.savePlan(p)
    assert(file.plan("SALES.BIGSEQ").contains(p))
    intercept[Exception] { file.savePlan(p.copy(chunks = 8)) }
    assert(file.plan("SALES.BIGSEQ").contains(p)) // original untouched
  }

  test("a torn snapshot marker (pre-atomic-write crash shape) " +
      "re-snapshots the unmatched table, never silently skips it") {
    val out = tmp(); val off = tmp(); val in = tmp()
    // the torn line "SALES.BIG" matches no registry key: the table
    // re-snapshots (at-least-once, the safe direction) and the
    // rewritten marker carries the full name — markers are written
    // atomically now, so new tears cannot occur, but an old one must
    // still resolve loudly-and-safely
    Files.write(off.resolve("tornjob_snapshot.done"),
      "SALES.BIG".getBytes("UTF-8"))
    val cfg = Map(
      "source.id" -> "tornjob",
      "source.type" -> "mysql",
      "sink.path" -> out.toString,
      "offset.store.path" -> off.toString,
      "snapshot.only" -> "true",
      "table.schemas" -> """{"SALES.BIGSEQ":"ID:INTEGER,VAL:INTEGER"}""",
      "snapshot.jdbc.url" -> url,
      "snapshot.jdbc.driver" -> "org.apache.derby.jdbc.EmbeddedDriver")
    graft.streaming.CdcJob.run(spark, cfg, in.toString,
      tmp().resolve("ck").toString)
    assert(spark.read.parquet(s"$out/tornjob_SALES__BIGSEQ").count() == 1000)
    val marker = new String(Files.readAllBytes(
      off.resolve("tornjob_snapshot.done")), "UTF-8")
    assert(marker.linesIterator.toSet.contains("SALES.BIGSEQ"), marker)
    // restart: the full name now matches — no duplicate snapshot
    graft.streaming.CdcJob.run(spark, cfg, in.toString,
      tmp().resolve("ck2").toString)
    assert(spark.read.parquet(s"$out/tornjob_SALES__BIGSEQ").count() == 1000)
  }

  test("snapshot.jdbc.chunk.* config wires the chunked path through CdcJob.run") {
    val out = tmp(); val off = tmp(); val in = tmp()
    val cfg = Map(
      "source.id" -> "chunkjob",
      "source.type" -> "mysql",
      "sink.path" -> out.toString,
      "offset.store.path" -> off.toString,
      "snapshot.only" -> "true",
      "table.schemas" -> """{"SALES.BIGSEQ":"ID:INTEGER,VAL:INTEGER"}""",
      "snapshot.jdbc.url" -> url,
      "snapshot.jdbc.driver" -> "org.apache.derby.jdbc.EmbeddedDriver",
      "snapshot.jdbc.chunk.column" -> "ID",
      "snapshot.jdbc.chunks" -> "4")
    graft.streaming.CdcJob.run(spark, cfg, in.toString,
      tmp().resolve("ck").toString)
    assert(spark.read.parquet(s"$out/chunkjob_SALES__BIGSEQ").count() == 1000)
    // durable progress landed beside the marker: the cut plan + all 4
    // chunk markers, and the table-level completion marker
    val progDir = off.resolve("chunkjob_snapshot.chunks")
    assert(Files.exists(progDir.resolve("SALES.BIGSEQ.plan")))
    assert((0 until 4).forall(i =>
      Files.exists(progDir.resolve(s"SALES.BIGSEQ.chunk$i.done"))))
    assert(Files.exists(off.resolve("chunkjob_snapshot.done")))

    // restart: marker short-circuits — no re-snapshot, rows unchanged
    graft.streaming.CdcJob.run(spark, cfg, in.toString,
      tmp().resolve("ck2").toString)
    assert(spark.read.parquet(s"$out/chunkjob_SALES__BIGSEQ").count() == 1000)
  }
}
