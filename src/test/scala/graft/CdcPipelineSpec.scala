package graft

import java.nio.file.{Files, Path, Paths}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.model.{TableRegistry, TableSpec}
import graft.streaming.{CdcConfig, CdcPipeline}

/** End-to-end CDC replay scenarios (FIXTURES.md §A.2): JSON-lines
  * envelope feed → gate → demux → dt-partitioned Parquet, offset and
  * status write-back, stop semantics. One fixture file per micro-batch
  * (maxFilesPerTrigger=1) so multi-batch behavior is exercised.
  */
class CdcPipelineSpec extends AnyFunSuite {
  lazy val spark: SparkSession = TestSpark.session

  val usersSchema = StructType(Seq(
    StructField("id", IntegerType), StructField("name", StringType),
    StructField("balance", StringType))) // decimal-as-string policy
  val itemsSchema = StructType(Seq(
    StructField("id", IntegerType), StructField("qty", LongType)))

  def registry = TableRegistry(Seq(
    TableSpec("testdb", "users", usersSchema),
    TableSpec("testdb", "items", itemsSchema)))

  def row(op: String, tbl: String, ts: Long, file: String, pos: Long,
      fields: String): String =
    s"""{"_op":"$op","_ts":$ts,"_db":"testdb","_database":"testdb",""" +
      s""""_tbl":"$tbl",$fields,"_binlog_file":"$file","_binlog_pos_end":"$pos",""" +
      s""""_binlog_file_internal":"$file","_binlog_pos_internal":"${pos + 6}"}"""

  def ddl(stmt: String, tbl: String, ts: Long): String =
    s"""{"_ddl":"$stmt","_ddl_tbl":"$tbl","_ts":$ts,"_db":"testdb",""" +
      s""""_binlog_file":"mysql-bin.000002","_binlog_pos_end":"999"}"""

  def tmp(): Path = Files.createTempDirectory("graft-cdc-")

  def writeFixture(dir: Path, name: String, lines: Seq[String]): Unit =
    Files.write(dir.resolve(name), String.join("\n", lines: _*).getBytes)

  def run(cfg: CdcConfig, in: Path): CdcPipeline = {
    val p = new CdcPipeline(spark, cfg)
    p.runAvailableNow(in.toString, tmp().resolve("ckpt").toString)
    p
  }

  test("snapshot-insert-update-delete scenario writes change rows") {
    val in = tmp(); val out = tmp(); val off = tmp()
    writeFixture(in, "00-snapshot.jsonl", Seq(
      row("READ", "users", 1700000000000L, "mysql-bin.000001", 0,
        """"id":{"int":1},"name":{"string":"alice"},"balance":{"string":"10.50"}"""),
      row("READ", "users", 1700000000000L, "mysql-bin.000001", 0,
        """"id":{"int":2},"name":{"string":"bob"},"balance":null"""),
      row("READ", "items", 1700000000000L, "mysql-bin.000001", 0,
        """"id":{"int":7},"qty":{"long":3}""")))
    writeFixture(in, "01-changes.jsonl", Seq(
      row("CREATE", "users", 1700000100000L, "mysql-bin.000001", 100,
        """"id":{"int":3},"name":{"string":"carol"},"balance":{"string":"7.25"}"""),
      row("UPDATE", "users", 1700000200000L, "mysql-bin.000001", 200,
        """"id":{"int":1},"name":{"string":"alice2"},"balance":{"string":"11.00"}"""),
      // DELETE carries the before image (T1)
      row("DELETE", "users", 1700086600000L, "mysql-bin.000001", 300,
        """"id":{"int":2},"name":{"string":"bob"},"balance":null""")))

    val p = run(CdcConfig("src1", registry, out.toString,
      offsetStorePath = Some(off.toString),
      statusStorePath = Some(off.resolve("status").toString)), in)

    val users = spark.read.parquet(s"$out/src1_testdb__users")
    assert(users.count() == 5)
    // append-only lake keeps every change row incl. delete before-image
    val ops = users.groupBy("_op").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(ops == Map("READ" -> 2L, "CREATE" -> 1L, "UPDATE" -> 1L,
      "DELETE" -> 1L))
    // typed payload, routing metadata stripped
    assert(users.schema.fieldNames.toSet ==
      Set("id", "name", "balance", "_op", "_ts",
        "_binlog_file_internal", "_binlog_pos_internal", "dt"))
    assert(users.schema("id").dataType == IntegerType)
    // dt bucketing from _ts: delete happened next day
    // partition-column inference reads dt back as DATE — compare as string
    val dts = users.select(org.apache.spark.sql.functions.col("dt")
      .cast("string")).distinct().collect().map(_.getString(0)).toSet
    assert(dts == Set("2023-11-14", "2023-11-15"))
    val items = spark.read.parquet(s"$out/src1_testdb__items")
    assert(items.count() == 1 && items.schema("qty").dataType == LongType)
    // offset write-back: last non-READ offset, "{file},{pos}" format
    assert(p.readStoredOffset(off.toString).contains("mysql-bin.000001,300"))
    // status file exists with cumulative count
    val statusFiles = Files.list(off.resolve("status")).toArray
    assert(statusFiles.nonEmpty)
    assert(p.recordCount == 6 && p.lastEventTs == 1700086600000L)
    assert(!p.gate.stopped)
  }

  test("sink zone-map manifests are maintained per batch and serve " +
      "pruned reads") {
    val in = tmp(); val out = tmp()
    writeFixture(in, "00-snapshot.jsonl", Seq(
      row("READ", "users", 1700000000000L, "mysql-bin.000001", 0,
        """"id":{"int":1},"name":{"string":"alice"},"balance":null"""),
      row("READ", "users", 1700000000000L, "mysql-bin.000001", 0,
        """"id":{"int":2},"name":{"string":"bob"},"balance":null"""),
      row("READ", "items", 1700000000000L, "mysql-bin.000001", 0,
        """"id":{"int":7},"qty":{"long":3}""")))
    writeFixture(in, "01-changes.jsonl", Seq(
      row("CREATE", "users", 1700000100000L, "mysql-bin.000001", 100,
        """"id":{"int":30},"name":{"string":"carol"},"balance":null""")))
    run(CdcConfig("srcZm", registry, out.toString,
      // "qty" exists only in items — per-table column intersection
      zonemapColumns = Seq("id", "_ts", "qty")), in)
    val dir = s"$out/srcZm_testdb__users"
    val man = s"$dir._zonemaps"
    val m = spark.read.parquet(man)
    // one manifest row per data file (batch 1 built, batch 2 refreshed)
    val dataFiles = java.nio.file.Files
      .walk(java.nio.file.Paths.get(dir)).toArray.map(_.toString)
      .count { p =>
        val n = p.substring(p.lastIndexOf('/') + 1)
        n.endsWith(".parquet") && !n.startsWith("_") && !n.startsWith(".") &&
          !p.contains("_zonemaps")
      }
    assert(m.count() == dataFiles && dataFiles >= 2)
    // users indexed id and _ts, but not items' qty
    assert(m.columns.toSet ==
      Set("file", "n_rows", "id_min", "id_max", "_ts_min", "_ts_max"))
    // the manifest prunes: id=30 lives only in batch 2's file(s)
    val cand = graft.ops.ZoneMaps
      .candidateFiles(spark, dir, man, "id", 30L, 30L)
    assert(cand.size < dataFiles && cand.nonEmpty)
    val got = graft.ops.ZoneMaps.prunedRead(spark, dir, man, "id", 30L, 30L)
      .select("name").collect().map(_.getString(0)).toSet
    assert(got == Set("carol"))
    // items got its own manifest with its own column intersection
    val mi = spark.read.parquet(s"$out/srcZm_testdb__items._zonemaps")
    assert(mi.columns.contains("qty_min"))
  }

  test("auto-compaction keeps hot dt partitions at a bounded file " +
      "count, preserves rows/order, and patches the manifest") {
    val in = tmp(); val out = tmp(); val off = tmp()
    // 6 micro-batches (one file each), all landing in ONE dt bucket —
    // the hot-partition fragmentation pattern
    for (b <- 0 until 6)
      writeFixture(in, f"$b%02d-changes.jsonl", Seq(
        row("CREATE", "users", 1700000000000L + b * 1000,
          "mysql-bin.000001", 100 + b * 10,
          s""""id":{"int":${2 * b + 1}},"name":{"string":"u${2 * b + 1}"},""" +
            """"balance":null"""),
        row("CREATE", "users", 1700000000000L + b * 1000 + 500,
          "mysql-bin.000001", 105 + b * 10,
          s""""id":{"int":${2 * b + 2}},"name":{"string":"u${2 * b + 2}"},""" +
            """"balance":null""")))
    val p = run(CdcConfig("srcAc", registry, out.toString,
      offsetStorePath = Some(off.toString),
      zonemapColumns = Seq("id"),
      compactAfterFiles = 3), in)

    val dir = s"$out/srcAc_testdb__users"
    val users = spark.read.parquet(dir)
    assert(users.count() == 12)
    assert(users.select("id").collect().map(_.getInt(0)).toSet
      == (1 to 12).toSet)
    // the hot partition stayed bounded: 6 appended files would exist
    // without the compactor; threshold 3 caps live files well below
    val dtDir = new java.io.File(s"$dir/dt=2023-11-14")
    val live = dtDir.listFiles().map(_.getName)
      .count(n => n.endsWith(".parquet") && !n.startsWith("."))
    assert(live <= 4, s"auto-compact did not bound the partition: $live")
    // within-file offset order survived the rewrite
    val violations = users
      .withColumn("f", org.apache.spark.sql.functions.input_file_name())
      .withColumn("prev", org.apache.spark.sql.functions.lag(
        org.apache.spark.sql.functions.col("_binlog_pos_internal"), 1)
        .over(org.apache.spark.sql.expressions.Window.partitionBy("f")
          .orderBy(org.apache.spark.sql.functions
            .monotonically_increasing_id())))
      .filter(org.apache.spark.sql.functions.col("prev").isNotNull &&
        org.apache.spark.sql.functions.col("prev") >
          org.apache.spark.sql.functions.col("_binlog_pos_internal"))
      .count()
    assert(violations == 0)
    // manifest PATCHED, not stale: one row per live data file, and it
    // still prunes/answers exactly
    val man = spark.read.parquet(s"$dir._zonemaps")
    val allFiles = java.nio.file.Files.walk(java.nio.file.Paths.get(dir))
      .toArray.map(_.toString).count { q =>
        val n = q.substring(q.lastIndexOf('/') + 1)
        n.endsWith(".parquet") && !n.startsWith(".") && !n.startsWith("_") &&
          !q.contains("_zonemaps")
      }
    assert(man.count() == allFiles,
      s"manifest rows ${man.count()} != live files $allFiles")
    assert(graft.ops.ZoneMaps.prunedRead(spark, dir, s"$dir._zonemaps",
      "id", 12L, 12L).select("name").collect().map(_.getString(0)).toSet
      == Set("u12"))
    // offsets unaffected by maintenance
    assert(p.readStoredOffset(off.toString)
      .contains("mysql-bin.000001,155"))
  }

  test("sink.current.keys maintains a queryable current-state table " +
      "beside the changelog, incrementally across runs") {
    val in = tmp(); val out = tmp()
    writeFixture(in, "00-snapshot.jsonl", Seq(
      row("READ", "users", 1700000000000L, "mysql-bin.000001", 0,
        """"id":{"int":1},"name":{"string":"alice"},"balance":null"""),
      row("READ", "users", 1700000000000L, "mysql-bin.000001", 0,
        """"id":{"int":2},"name":{"string":"bob"},"balance":null""")))
    writeFixture(in, "01-changes.jsonl", Seq(
      row("UPDATE", "users", 1700000100000L, "mysql-bin.000001", 100,
        """"id":{"int":1},"name":{"string":"alice2"},"balance":null""")))
    val cfg = CdcConfig("srcCt", registry, out.toString,
      currentKeys = Map("testdb.users" -> Seq("id")))
    run(cfg, in)
    val cur = s"$out/srcCt_testdb__users__current"
    def state(): Set[(Int, String)] =
      graft.streaming.CurrentTable.read(spark, cur)
        .select("id", "name").collect()
        .map(r => (r.getInt(0), r.getString(1))).toSet
    assert(state() == Set((1, "alice2"), (2, "bob")))

    // second run: bob deleted, carol created — only the NEW sink
    // files fold (the current table's own cursor tracks them)
    writeFixture(in, "02-changes.jsonl", Seq(
      row("DELETE", "users", 1700000200000L, "mysql-bin.000001", 200,
        """"id":{"int":2},"name":{"string":"bob"},"balance":null"""),
      row("CREATE", "users", 1700000300000L, "mysql-bin.000001", 300,
        """"id":{"int":3},"name":{"string":"carol"},"balance":null""")))
    run(cfg, in) // fresh checkpoint replays all files; the current
    // table's cursor makes the refold converge, not duplicate
    assert(state() == Set((1, "alice2"), (3, "carol")))
    // and it matches the full-log reconstruction
    val oracle = graft.ops.TimeTravel.currentState(spark,
        s"$out/srcCt_testdb__users", Seq("id"))
      .select("id", "name").collect()
      .map(r => (r.getInt(0), r.getString(1))).toSet
    assert(state() == oracle)
  }

  test("an attached rollup is maintained by the pipeline's own syncs " +
      "with no extra wiring") {
    val in = tmp(); val out = tmp()
    writeFixture(in, "00-snapshot.jsonl", Seq(
      row("READ", "users", 1700000000000L, "mysql-bin.000001", 0,
        """"id":{"int":1},"name":{"string":"alice"},"balance":null"""),
      row("READ", "users", 1700000000000L, "mysql-bin.000001", 0,
        """"id":{"int":2},"name":{"string":"bob"},"balance":null""")))
    val cfg = CdcConfig("srcRu", registry, out.toString,
      currentKeys = Map("testdb.users" -> Seq("id")))
    run(cfg, in)
    val cur = s"$out/srcRu_testdb__users__current"
    // one-time attach (the operator action); every later pipeline
    // batch's CurrentTable.sync maintains it as part of the fold
    graft.ops.RollupTable.attach(spark, cur, "by_name",
      graft.ops.RollupTable.Spec(Nil, Seq(
        graft.ops.RollupTable.Agg("count", "*", "n"),
        graft.ops.RollupTable.Agg("max", "name", "last_name"))))
    writeFixture(in, "01-changes.jsonl", Seq(
      row("DELETE", "users", 1700000200000L, "mysql-bin.000001", 200,
        """"id":{"int":2},"name":{"string":"bob"},"balance":null"""),
      row("CREATE", "users", 1700000300000L, "mysql-bin.000001", 300,
        """"id":{"int":3},"name":{"string":"zed"},"balance":null""")))
    run(cfg, in)
    val r = graft.ops.RollupTable.read(spark, cur, "by_name").collect()
    assert(r.length == 1 && r(0).getLong(0) == 2L &&
      r(0).getString(1) == "zed",
      s"rollup after pipeline batches: ${r.mkString}")
  }

  test("sink.current.rollup auto-attaches a configured rollup the " +
      "pipeline then maintains at delta cost") {
    val in = tmp(); val out = tmp()
    writeFixture(in, "00-snapshot.jsonl", Seq(
      row("READ", "users", 1700000000000L, "mysql-bin.000001", 0,
        """"id":{"int":1},"name":{"string":"alice"},"balance":null"""),
      row("READ", "users", 1700000000000L, "mysql-bin.000001", 0,
        """"id":{"int":2},"name":{"string":"bob"},"balance":null""")))
    val cfg = CdcConfig("srcCr", registry, out.toString,
      currentKeys = Map("testdb.users" -> Seq("id")),
      currentRollups = Map("testdb.users" -> Seq(
        "by_name" -> graft.ops.RollupTable.Spec(Seq("name"), Seq(
          graft.ops.RollupTable.Agg("count", "*", "n"))))))
    run(cfg, in)
    val cur = s"$out/srcCr_testdb__users__current"
    assert(graft.ops.RollupTable.list(spark, cur) == Seq("by_name"))
    writeFixture(in, "01-changes.jsonl", Seq(
      row("CREATE", "users", 1700000100000L, "mysql-bin.000001", 100,
        """"id":{"int":3},"name":{"string":"alice"},"balance":null""")))
    run(cfg, in)
    val got = graft.ops.RollupTable.read(spark, cur, "by_name")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == Map("alice" -> 2L, "bob" -> 1L), got.toString)
  }

  test("sink.current.index.columns auto-attaches a bloom index the " +
      "pipeline then maintains; lookupBy prunes to candidate buckets") {
    val in = tmp(); val out = tmp()
    writeFixture(in, "00-snapshot.jsonl", (1 to 24).map(i =>
      row("READ", "users", 1700000000000L, "mysql-bin.000001", 0,
        s""""id":{"int":$i},"name":{"string":"u$i"},"balance":null""")))
    val cfg = CdcConfig("srcIx", registry, out.toString,
      currentKeys = Map("testdb.users" -> Seq("id")),
      currentIndexColumns = Map("testdb.users" -> Seq("name")),
      currentBuckets = 8)
    run(cfg, in)
    val cur = s"$out/srcIx_testdb__users__current"
    assert(graft.ops.BucketIndex.list(spark, cur) == Seq("name"))
    // a later batch updates a value; the maintained index must follow
    writeFixture(in, "01-changes.jsonl", Seq(
      row("UPDATE", "users", 1700000100000L, "mysql-bin.000001", 100,
        """"id":{"int":7},"name":{"string":"renamed"},"balance":null""")))
    run(cfg, in)
    import spark.implicits._
    val hit = graft.ops.BucketIndex.lookupBy(spark, cur, "name",
      Seq("renamed").toDF("name"))
    assert(hit.select("id").collect().map(_.getInt(0)).toSeq == Seq(7))
    assert(graft.ops.BucketIndex.lookupBy(spark, cur, "name",
      Seq("u7").toDF("name")).count() == 0)
    // and the probe read fewer buckets than the table holds
    val nBuckets = new java.io.File(cur).listFiles()
      .count(_.getName.startsWith("kb="))
    val readBuckets = hit.inputFiles
      .flatMap(_.split('/').find(_.startsWith("kb="))).toSet
    assert(readBuckets.size < nBuckets,
      s"no prune: $readBuckets of $nBuckets")
  }

  test("rescale advice lands in the status store as a machine-readable " +
      "record when layout drift >= 2x, naming the exact maintenance call") {
    val in = tmp(); val out = tmp(); val status = tmp()
    writeFixture(in, "00-snapshot.jsonl", Seq(
      row("READ", "users", 1700000000000L, "mysql-bin.000001", 0,
        """"id":{"int":1},"name":{"string":"alice"},"balance":null"""),
      row("READ", "users", 1700000000000L, "mysql-bin.000001", 0,
        """"id":{"int":2},"name":{"string":"bob"},"balance":null""")))
    // 64 buckets of a KB-scale table against a 1 MB/bucket target:
    // the shrink advice (>= 2x drift) must fire on the full sync
    run(CdcConfig("srca", registry, out.toString,
      statusStorePath = Some(status.toString),
      currentKeys = Map("testdb.users" -> Seq("id")),
      currentBuckets = 64, currentTargetBucketMb = 1), in)
    val records = Files.walk(status).toArray.map(_.toString)
      .filter(_.endsWith(".json"))
      .map(p => new String(Files.readAllBytes(Paths.get(p)), "UTF-8"))
    val advice = records.filter(_.contains(""""advice":"rescale""""))
    assert(advice.nonEmpty, s"no advice record in: ${records.toSeq}")
    val a = advice.head
    assert(a.contains(""""table":"testdb.users""""), a)
    assert(a.contains(""""buckets":64"""), a)
    assert(a.contains(""""recommended_buckets":1"""), a)
    assert(a.contains("CurrentTable.rescale(spark, "), a)
    assert(a.contains("""keys, 1)"""), a)
    // plain status records still present beside it
    assert(records.exists(r => r.contains(""""record_count":""") &&
      !r.contains(""""advice"""")), records.toSeq.toString)
  }

  test("index capacity advice lands in the status store when the " +
      "table outgrows the attach sizing; a healthy index stays silent") {
    val in = tmp(); val out = tmp(); val status = tmp()
    // batch 1: 20 rows into 4 buckets — the auto attach sizes ~1024
    // bits for ~5 rows/bucket
    writeFixture(in, "00-snapshot.jsonl", (1 to 20).map(i =>
      row("READ", "users", 1700000000000L, "mysql-bin.000001", 0,
        s""""id":{"int":$i},"name":{"string":"u$i"},"balance":null""")))
    // fullsync cadence 1: every sync is a full walk, so the advisory
    // (full syncs only) runs each batch
    val cfg = CdcConfig("srcCap", registry, out.toString,
      statusStorePath = Some(status.toString),
      currentKeys = Map("testdb.users" -> Seq("id")),
      currentIndexColumns = Map("testdb.users" -> Seq("name")),
      currentBuckets = 4, currentFullsyncBatches = 1)
    run(cfg, in)
    def records(): Seq[String] = Files.walk(status).toArray
      .map(_.toString).filter(_.endsWith(".json"))
      .map(p => new String(Files.readAllBytes(Paths.get(p)), "UTF-8"))
      .toSeq
    assert(!records().exists(_.contains(""""advice":"reattach-index"""")),
      "a freshly-attached index is healthy — no advice expected")
    // batch 2 grows the table ~100x: ~505 rows/bucket against 1024
    // bits ≈ 2 bits/row — the advisory must fire on the full sync,
    // measured from the sidecar's own per-bucket counts
    writeFixture(in, "01-growth.jsonl", (21 to 2020).map(i =>
      row("CREATE", "users", 1700000100000L, "mysql-bin.000001", i,
        s""""id":{"int":$i},"name":{"string":"u$i"},"balance":null""")))
    run(cfg, in)
    val advice = records()
      .filter(_.contains(""""advice":"reattach-index""""))
    assert(advice.nonEmpty, s"no reattach advice in: ${records()}")
    // CONSUMER CONTRACT (writeAdviceFile doc): records repeat once
    // per full sync while the condition persists — at fullsync
    // cadence 1 a second batch would write a second identical-shaped
    // record; consumers dedupe by (table, advice, column) and act on
    // the latest measurement, never one job per record
    val a = advice.head
    assert(a.contains(""""reason":"outgrown""""), a)
    assert(a.contains(""""unknown_buckets":0"""), a)
    // fully-counted: the size signal is the (exact-known) estimate
    // of the ~2020-row table
    val aAlr = """"approx_live_rows":(-?\d+)""".r
      .findFirstMatchIn(a).map(_.group(1).toLong)
    assert(aAlr.exists(n => n > 1500L && n < 2600L), a)
    assert(a.contains(""""table":"testdb.users""""), a)
    assert(a.contains(""""column":"name""""), a)
    assert(a.contains(""""bits":1024"""), a)
    assert(a.contains("""BucketIndex.detach(spark, """), a)
    assert(a.contains("""BucketIndex.attach(spark, """), a)
    assert(a.contains("""\"name\")"""), a)
    // plain status records still present beside it
    assert(records().exists(r => r.contains(""""record_count":""") &&
      !r.contains(""""advice"""")), records().toString)
  }

  test("a count-less pre-measurement sidecar surfaces through the " +
      "pipeline as reason=counts-unknown; counts regained by later " +
      "syncs return it to measured silence") {
    val in = tmp(); val out = tmp(); val status = tmp()
    writeFixture(in, "00-snapshot.jsonl", (1 to 32).map(i =>
      row("READ", "users", 1700000000000L, "mysql-bin.000001", 0,
        s""""id":{"int":$i},"name":{"string":"u$i"},"balance":null""")))
    val cfg = CdcConfig("srcCuk", registry, out.toString,
      statusStorePath = Some(status.toString),
      currentKeys = Map("testdb.users" -> Seq("id")),
      currentIndexColumns = Map("testdb.users" -> Seq("name")),
      currentBuckets = 4, currentFullsyncBatches = 1)
    run(cfg, in)
    def records(): Seq[String] = Files.walk(status).toArray
      .map(_.toString).filter(_.endsWith(".json"))
      .map(p => new String(Files.readAllBytes(Paths.get(p)), "UTF-8"))
      .toSeq
    assert(!records().exists(_.contains(""""advice":"reattach-index"""")))
    // fabricate a pre-measurement sidecar: every bucket's counts gone
    val cur = s"$out/srcCuk_testdb__users__current"
    SidecarTestOps.dropCounts(spark, cur, "name", keepKb = Set.empty)
    // a 1-row batch refreshes only ITS bucket's count — the unknown
    // majority must surface as the measuring re-attach, not silence
    // and not a verdict measured from the one hot bucket
    writeFixture(in, "01-one.jsonl", Seq(
      row("CREATE", "users", 1700000100000L, "mysql-bin.000001", 33,
        """"id":{"int":33},"name":{"string":"u33"},"balance":null""")))
    run(cfg, in)
    val unknown = records()
      .filter(_.contains(""""reason":"counts-unknown""""))
    assert(unknown.nonEmpty, s"no counts-unknown advice in ${records()}")
    assert(unknown.head.contains(""""advice":"reattach-index""""),
      unknown.head)
    assert(unknown.head.contains(""""unknown_buckets":3"""), unknown.head)
    assert(unknown.head.contains("""BucketIndex.detach"""), unknown.head)
    // the record carries the size signal so a fleet-upgrade wave of
    // counts-unknown advisories can be worked biggest-first (here one
    // bucket is counted, so the estimate is positive, not -1)
    val alr = """"approx_live_rows":(-?\d+)""".r
      .findFirstMatchIn(unknown.head).map(_.group(1).toLong)
    assert(alr.exists(_ > 0L),
      s"size signal missing or unmeasured: ${unknown.head}")
    // a batch touching every bucket re-stamps all counts: healthy and
    // fully measured again, so no NEW advice lands
    val before = records().size
    writeFixture(in, "02-refresh.jsonl", (34 to 65).map(i =>
      row("CREATE", "users", 1700000200000L, "mysql-bin.000001", i,
        s""""id":{"int":$i},"name":{"string":"u$i"},"balance":null""")))
    run(cfg, in)
    val fresh = records().filter(
      _.contains(""""advice":"reattach-index""""))
    assert(records().size > before, "batch 3 wrote no status records")
    assert(fresh.size == unknown.size,
      s"advice kept firing after counts were re-stamped: $fresh")
  }

  test("zone-map grid saturation after auto-compaction lands in the " +
      "status store naming the exact rebuild with re-sized grids") {
    val in = tmp(); val out = tmp(); val status = tmp()
    // 4096-bit default grids saturate past ~700 distinct keys per
    // file (K=4): three 400-row batches compact into one 1200-row
    // file at ~0.69 fill — past the 0.5 advisory band
    val cfg = CdcConfig("srcZm", registry, out.toString,
      statusStorePath = Some(status.toString),
      zonemapColumns = Seq("name"), zonemapBloomColumns = Seq("name"),
      compactAfterFiles = 2)
    for (b <- 0 until 3) {
      writeFixture(in, f"0$b-batch.jsonl", (b * 400 until (b + 1) * 400)
        .map(i => row("CREATE", "users", 1700000000000L + i,
          "mysql-bin.000001", i,
          s""""id":{"int":$i},"name":{"string":"u$i"},"balance":null""")))
      run(cfg, in)
    }
    val records = Files.walk(status).toArray.map(_.toString)
      .filter(_.endsWith(".json"))
      .map(p => new String(Files.readAllBytes(Paths.get(p)), "UTF-8"))
    val advice = records
      .filter(_.contains(""""advice":"rebuild-zonemaps""""))
    assert(advice.nonEmpty, s"no rebuild advice in: ${records.toSeq}")
    val a = advice.head
    assert(a.contains(""""table":"testdb.users""""), a)
    assert(a.contains(""""column":"name""""), a)
    // ~10 bits per row of the compactor's rows-per-file (default 1M)
    assert(a.contains("bloomBits = 16777216"), a)
    assert(a.contains("""ZoneMaps.build(spark, """), a)
    assert(a.contains("""\"name\")""") || a.contains("""\"name\"),"""), a)
    // the measured fill is a JSON number past the band
    val fill = """"fill":([0-9.]+)""".r.findFirstMatchIn(a)
      .get.group(1).toDouble
    assert(fill > 0.5, a)
  }

  test("sink.current.order.by flows config -> pipeline -> sorted " +
      "bucket files in the maintained current table") {
    val in = tmp(); val out = tmp()
    // shuffled _ts values within one bucket's worth of keys so sorted
    // files cannot happen by accident
    writeFixture(in, "00-data.jsonl", (1 to 20).map(i =>
      row("CREATE", "users", 1700000000000L + ((i * 7) % 20) * 1000L,
        "mysql-bin.000001", i,
        s""""id":{"int":$i},"name":{"string":"u$i"},"balance":null""")))
    val cfg = CdcConfig("srcOb", registry, out.toString,
      currentKeys = Map("testdb.users" -> Seq("id")),
      currentOrderBy = Map("testdb.users" -> Seq("_ts")),
      currentBuckets = 2)
    run(cfg, in)
    val cur = s"$out/srcOb_testdb__users__current"
    // the layout root persists the order...
    assert(scala.io.Source.fromFile(s"$cur/_synced.txt").mkString
      .contains("#order _ts"))
    // ...and every bucket file is sorted on it
    val files = new java.io.File(cur).listFiles()
      .filter(_.getName.startsWith("kb="))
      .flatMap(_.listFiles()).filter(_.getName.endsWith(".parquet"))
    assert(files.nonEmpty)
    for (f <- files) {
      val ts = spark.read.parquet(f.toString)
        .select("_ts").collect().map(_.getLong(0)).toSeq
      assert(ts == ts.sorted, s"${f.getName} unsorted: $ts")
    }
  }

  test("sink.current.fullsync.batches folds an out-of-band backfill " +
      "within N batches; scoped syncs alone never see it") {
    val in = tmp(); val out = tmp()
    val ckpt = tmp().resolve("ckpt").toString
    // batch 1 (first sync = full walk): one 2023-11-14 row
    writeFixture(in, "00.jsonl", Seq(
      row("READ", "users", 1700000000000L, "mysql-bin.000001", 0,
        """"id":{"int":1},"name":{"string":"alice"},"balance":null""")))
    val cfg = CdcConfig("srcFs", registry, out.toString,
      currentKeys = Map("testdb.users" -> Seq("id")),
      currentFullsyncBatches = 2)
    val p = new CdcPipeline(spark, cfg)
    val q = p.start(in.toString, ckpt,
      org.apache.spark.sql.streaming.Trigger.ProcessingTime(
        "100 milliseconds"), maxFilesPerTrigger = Some(1))
    try {
      q.processAllAvailable()
      val cur = s"$out/srcFs_testdb__users__current"
      def state(): Set[(Int, String)] =
        graft.streaming.CurrentTable.read(spark, cur)
          .select("id", "name").collect()
          .map(r => (r.getInt(0), r.getString(1))).toSet
      assert(state() == Set((1, "alice")))
      // OUT-OF-BAND backfill: a writer outside the pipeline appends
      // a new key's file straight into the already-synced partition
      val sinkDir = s"$out/srcFs_testdb__users"
      val part = new java.io.File(sinkDir).listFiles()
        .filter(_.getName.startsWith("dt=")).head
      val raw = spark.read.parquet(part.getAbsolutePath)
      raw.limit(1)
        .withColumn("id", org.apache.spark.sql.functions.lit(9))
        .withColumn("name", org.apache.spark.sql.functions.lit("backfill"))
        .withColumn("_op", org.apache.spark.sql.functions.lit("CREATE"))
        .write.mode("append").parquet(part.getAbsolutePath)
      // batch 2 lands in a DIFFERENT partition (2023-11-15): the
      // scoped sync lists only that partition — the backfill stays
      // invisible (this is the hazard the cadence bounds)
      writeFixture(in, "01.jsonl", Seq(
        row("UPDATE", "users", 1700086600000L, "mysql-bin.000001", 100,
          """"id":{"int":1},"name":{"string":"alice2"},"balance":null""")))
      q.processAllAvailable()
      assert(state() == Set((1, "alice2")),
        "a scoped sync must not have seen the backfill yet")
      // batch 3 trips the every-2nd-sync cadence: full listing finds
      // the backfill file and folds it
      writeFixture(in, "02.jsonl", Seq(
        row("UPDATE", "users", 1700086700000L, "mysql-bin.000001", 200,
          """"id":{"int":1},"name":{"string":"alice3"},"balance":null""")))
      q.processAllAvailable()
      assert(state() == Set((1, "alice3"), (9, "backfill")),
        "the cadence's full walk must fold the out-of-band file")
    } finally q.stop()
  }

  test("sink.retention.days expires old partitions at write time; " +
      "a generous horizon keeps everything") {
    // fixture events are dated 2023-11-14/15 — far past any small
    // wall-clock horizon, inside a 100k-day one
    def feed(): Path = {
      val in = tmp()
      writeFixture(in, "00-snapshot.jsonl", Seq(
        row("READ", "users", 1700000000000L, "mysql-bin.000001", 0,
          """"id":{"int":1},"name":{"string":"alice"},"balance":null"""),
        row("CREATE", "users", 1700086600000L, "mysql-bin.000001", 100,
          """"id":{"int":2},"name":{"string":"bob"},"balance":null""")))
      in
    }
    val keepOut = tmp()
    run(CdcConfig("srcKeep", registry, keepOut.toString,
      retentionDays = 100000), feed())
    val kept = spark.read.parquet(s"$keepOut/srcKeep_testdb__users")
    assert(kept.count() == 2)

    val dropOut = tmp()
    val p = run(CdcConfig("srcDrop", registry, dropOut.toString,
      offsetStorePath = Some(tmp().toString),
      retentionDays = 30), feed())
    // both 2023 partitions expired right after the batch committed —
    // the table dir remains, with no dt= children
    val dtDirs = new java.io.File(s"$dropOut/srcDrop_testdb__users")
      .listFiles().filter(_.isDirectory).map(_.getName)
      .filter(_.startsWith("dt="))
    assert(dtDirs.isEmpty, s"retention kept: ${dtDirs.mkString(",")}")
    // bookkeeping unaffected: the batch committed BEFORE expiry
    assert(p.recordCount == 2)
  }

  test("retention prunes current-table tombstones past the same " +
      "horizon it expires sink partitions") {
    val in = tmp(); val out = tmp()
    writeFixture(in, "00-snapshot.jsonl", Seq(
      row("READ", "users", 1700000000000L, "mysql-bin.000001", 0,
        """"id":{"int":1},"name":{"string":"alice"},"balance":null"""),
      row("CREATE", "users", 1700000100000L, "mysql-bin.000001", 100,
        """"id":{"int":2},"name":{"string":"bob"},"balance":null""")))
    writeFixture(in, "01-changes.jsonl", Seq(
      row("DELETE", "users", 1700000200000L, "mysql-bin.000001", 200,
        """"id":{"int":2},"name":{"string":"bob"},"balance":null""")))
    run(CdcConfig("srcTp", registry, out.toString,
      retentionDays = 30, // 2023-dated fixtures: everything expires
      currentKeys = Map("testdb.users" -> Seq("id")),
      currentBuckets = 4), in)
    val cur = s"$out/srcTp_testdb__users__current"
    // the current table was synced BEFORE the partitions expired, so
    // alice survives retention of her changelog...
    assert(graft.streaming.CurrentTable.read(spark, cur)
      .select("id", "name").collect()
      .map(r => (r.getInt(0), r.getString(1))).toSet
      == Set((1, "alice")))
    // ...and bob's tombstone — older than the horizon, with no sink
    // file left that could ever re-fold past it — was reclaimed
    assert(spark.read.parquet(cur)
      .filter(org.apache.spark.sql.functions.col("_op") === "DELETE")
      .count() == 0)
    // the cursor holds no entries for the vanished sink files: every
    // expired partition's sidecar is gone with it
    val staleSidecars = Option(new java.io.File(s"$cur/_cursor")
        .listFiles()).getOrElse(Array.empty)
      .filter(_.getName.endsWith(".txt"))
      .filter(f => scala.io.Source.fromFile(f).getLines()
        .exists(_.trim.nonEmpty))
    assert(staleSidecars.isEmpty,
      s"stale cursor entries: ${staleSidecars.mkString(",")}")
  }

  test("a fixed bucket never prunes tombstones: retention cannot " +
      "expire a constant bucket, so old changes stay re-foldable") {
    val in = tmp(); val out = tmp()
    writeFixture(in, "00-snapshot.jsonl", Seq(
      row("READ", "users", 1700000000000L, "mysql-bin.000001", 0,
        """"id":{"int":1},"name":{"string":"alice"},"balance":null""")))
    writeFixture(in, "01-changes.jsonl", Seq(
      row("DELETE", "users", 1700000200000L, "mysql-bin.000001", 200,
        """"id":{"int":1},"name":{"string":"alice"},"balance":null""")))
    run(CdcConfig("srcFb", registry, out.toString,
      fixedBucket = Some("static"),
      retentionDays = 30,
      currentKeys = Map("testdb.users" -> Seq("id"))), in)
    val cur = s"$out/srcFb_testdb__users__current"
    // the bucket survives retention (non-date dt), and so MUST the
    // tombstone — its older CREATE is still on disk, re-foldable
    assert(new java.io.File(s"$out/srcFb_testdb__users/dt=static")
      .exists())
    assert(spark.read.parquet(cur)
      .filter(org.apache.spark.sql.functions.col("_op") === "DELETE")
      .count() == 1)
    assert(graft.streaming.CurrentTable.read(spark, cur).count() == 0)
  }

  test("retention cutoff is derived in the session timezone — the " +
      "clock that assigned dt") {
    val key = "spark.sql.session.timeZone"
    val orig = spark.conf.get(key)
    try {
      // two zones a calendar day apart for ~22h of every day: the
      // cutoff must follow the session zone, not UTC
      for (tz <- Seq("Pacific/Kiritimati", "Etc/GMT+12", "UTC")) {
        spark.conf.set(key, tz)
        val want = java.time.LocalDate.now(java.time.ZoneId.of(tz))
          .minusDays(7L).toString
        assert(graft.streaming.CdcPipeline.retentionCutoff(spark, 7)
          == want, s"tz=$tz")
      }
      // and it disagrees with a UTC-fixed cutoff when the zones
      // straddle midnight (true for at least one of the two offsets
      // at any wall-clock instant except within ±2h of UTC midnight)
      val utcDay = java.time.LocalDate.now(java.time.ZoneOffset.UTC)
      val straddles = Seq("Pacific/Kiritimati", "Etc/GMT+12").exists(
        tz => java.time.LocalDate.now(java.time.ZoneId.of(tz)) != utcDay)
      val hour = java.time.LocalTime.now(java.time.ZoneOffset.UTC).getHour
      if (hour >= 2 && hour < 22) assert(straddles)
    } finally spark.conf.set(key, orig)
  }

  test("snapshot override restricts the snapshot; binlog tail unaffected") {
    val in = tmp(); val out = tmp()
    // snapshot: 3 users rows; the override keeps id <= 2 and selects
    // only (id, name) — balance must come back NULL on snapshot rows
    writeFixture(in, "00-snapshot.jsonl", Seq(
      row("READ", "users", 1700000000000L, "mysql-bin.000001", 0,
        """"id":{"int":1},"name":{"string":"alice"},"balance":{"string":"10.50"}"""),
      row("READ", "users", 1700000000000L, "mysql-bin.000001", 0,
        """"id":{"int":2},"name":{"string":"bob"},"balance":{"string":"5.00"}"""),
      row("READ", "users", 1700000000000L, "mysql-bin.000001", 0,
        """"id":{"int":3},"name":{"string":"carol"},"balance":{"string":"1.00"}"""),
      row("READ", "items", 1700000000000L, "mysql-bin.000001", 0,
        """"id":{"int":7},"qty":{"long":3}""")))
    // binlog tail: an id the snapshot WHERE would exclude, with a
    // balance the select list would drop — both must survive intact
    writeFixture(in, "01-changes.jsonl", Seq(
      row("CREATE", "users", 1700000100000L, "mysql-bin.000001", 100,
        """"id":{"int":9},"name":{"string":"dan"},"balance":{"string":"7.25"}""")))

    val cfg = graft.streaming.CdcJob.configFromMap(Map(
      "source.id" -> "srcOv", "source.type" -> "mysql",
      "sink.path" -> out.toString,
      "table.schemas" -> ("""{"testdb.users":"id:INT,name:VARCHAR(10),""" +
        """balance:DECIMAL(10,2)","testdb.items":"id:INT,qty:BIGINT"}"""),
      "snapshot.select.statement.overrides" -> "testdb.users",
      "snapshot.select.statement.overrides.testdb.users" ->
        "SELECT id, name FROM testdb.users WHERE id <= 2"))
    assert(cfg.snapshotOverrides.keySet == Set("testdb.users"))
    val p = new CdcPipeline(spark, cfg)
    p.runAvailableNow(in.toString, tmp().resolve("ckpt").toString)

    val users = spark.read.parquet(s"$out/srcOv_testdb__users")
      .orderBy("id").collect()
    // carol (id 3) filtered out of the snapshot; dan's CREATE kept
    assert(users.map(_.getInt(0)).toSeq == Seq(1, 2, 9))
    val byId = users.map(r => r.getInt(0) ->
      (r.getAs[String]("balance"), r.getAs[String]("_op"))).toMap
    // unselected column nulled on snapshot rows ONLY
    assert(byId(1) == (null, "READ") && byId(2) == (null, "READ"))
    assert(byId(9) == ("7.25", "CREATE"))
    // sink schema did not fork
    assert(spark.read.parquet(s"$out/srcOv_testdb__users")
      .schema.fieldNames.contains("balance"))
    // non-overridden table untouched
    assert(spark.read.parquet(s"$out/srcOv_testdb__items").count() == 1)
  }

  test("K3 debug print sink runs alongside; K4 fixed bucket replaces dt") {
    val in = tmp(); val out = tmp()
    writeFixture(in, "00-data.jsonl", Seq(
      row("CREATE", "users", 1700000000000L, "mysql-bin.000001", 10,
        """"id":{"int":1},"name":{"string":"a"},"balance":null""")))
    val p = new CdcPipeline(spark, CdcConfig("srcDbg", registry, out.toString,
      debugPrint = true, fixedBucket = Some("static")))
    p.runAvailableNow(in.toString, tmp().resolve("ckpt").toString)
    // K4 (`FixedNameBucketAssigner.java:14-16`): the constant bucket,
    // not the event date
    val users = spark.read.parquet(s"$out/srcDbg_testdb__users")
    assert(users.count() == 1)
    assert(users.select(org.apache.spark.sql.functions.col("dt")
      .cast("string")).distinct().collect().map(_.getString(0)).toSeq
      == Seq("static"))
    // K3 (`FlinkCDCMulti.java:148-154`): the console echo is a second
    // AvailableNow query on the same feed — it drains and terminates
    val deadline = System.currentTimeMillis() + 30000
    while (spark.streams.active.exists(_.name == "JOB-srcDbg-debug") &&
        System.currentTimeMillis() < deadline) Thread.sleep(100)
    assert(!spark.streams.active.exists(_.name == "JOB-srcDbg-debug"))
  }

  test("K4 mixed-bucket guard flags dt dirs differing from the fixed bucket") {
    val in = tmp(); val out = tmp()
    writeFixture(in, "00-data.jsonl", Seq(
      row("CREATE", "users", 1700000000000L, "mysql-bin.000001", 10,
        """"id":{"int":1},"name":{"string":"a"},"balance":null""")))
    // date-bucketed sink first (default mode): _ts → dt=2023-11-14
    run(CdcConfig("srcMix", registry, out.toString), in)
    // reopening the SAME sink with a fixed bucket is the hazard the
    // guard exists for — read-back partition inference would see Date
    // and String dt values under one dataset
    val p2 = new CdcPipeline(spark, CdcConfig("srcMix", registry,
      out.toString, fixedBucket = Some("static")))
    assert(p2.mixedBucketDirs.exists(_.endsWith("dt=2023-11-14")), p2.mixedBucketDirs)
    // a fixed bucket over its own sink (or a fresh one) is clean
    val out2 = tmp()
    val p3 = new CdcPipeline(spark, CdcConfig("srcMix2", registry,
      out2.toString, fixedBucket = Some("static")))
    p3.runAvailableNow(in.toString, tmp().resolve("ckpt").toString)
    assert(new CdcPipeline(spark, CdcConfig("srcMix2", registry,
      out2.toString, fixedBucket = Some("static"))).mixedBucketDirs.isEmpty)
  }

  test("dry-run mode counts routed rows; writes and publishes nothing") {
    val in = tmp(); val out = tmp(); val off = tmp()
    writeFixture(in, "00-data.jsonl", Seq(
      row("CREATE", "users", 1700000000000L, "mysql-bin.000001", 10,
        """"id":{"int":1},"name":{"string":"a"},"balance":null"""),
      row("CREATE", "users", 1700000001000L, "mysql-bin.000001", 20,
        """"id":{"int":2},"name":{"string":"b"},"balance":null"""),
      row("CREATE", "items", 1700000002000L, "mysql-bin.000001", 30,
        """"id":{"int":7},"qty":{"long":3}""")))
    val p = run(CdcConfig("srcDry", registry, out.toString,
      offsetStorePath = Some(off.toString), dryRun = true), in)
    // the full demux ran — routed counts are visible to the caller
    assert(p.dryRunCounts.get("testdb.users").contains(2L), p.dryRunCounts)
    assert(p.dryRunCounts.get("testdb.items").contains(1L))
    // ...but nothing durable happened: no sink dirs, no offset file
    // (an advanced offset store would make the next REAL run skip
    // these events)
    assert(!Files.exists(Paths.get(s"$out/srcDry_testdb__users")))
    assert(!Files.exists(Paths.get(s"$out/srcDry_testdb__items")))
    assert(!Files.exists(off.resolve("srcDry_offset.txt")))
  }

  test("structural DDL stops; later batches are swallowed") {
    val in = tmp(); val out = tmp()
    writeFixture(in, "00-data.jsonl", Seq(
      row("CREATE", "users", 1700000000000L, "mysql-bin.000001", 10,
        """"id":{"int":1},"name":{"string":"a"},"balance":null""")))
    writeFixture(in, "01-ddl.jsonl", Seq(
      ddl("ALTER TABLE users ADD COLUMN age INT", "users", 1700000001000L)))
    writeFixture(in, "02-after.jsonl", Seq(
      row("CREATE", "users", 1700000002000L, "mysql-bin.000001", 20,
        """"id":{"int":9},"name":{"string":"late"},"balance":null""")))

    val p = run(CdcConfig("src2", registry, out.toString), in)
    assert(p.gate.stopped)
    assert(p.gate.reason.exists(_.startsWith("STRUCTURAL-DDL")))
    // the triggering batch committed (drain), the later batch did not
    val users = spark.read.parquet(s"$out/src2_testdb__users")
    assert(users.count() == 1)
    // DDL event landed in the {db}_ddl side table
    val ddlT = spark.read.parquet(s"$out/src2_testdb_ddl")
    assert(ddlT.count() == 1)
    assert(ddlT.select("_ddl").head.getString(0)
      .startsWith("ALTER TABLE users ADD COLUMN"))
  }

  test("batch replay is idempotent; replayed DDL still trips the gate") {
    import spark.implicits._
    val out = tmp()
    val data = Seq(
      row("CREATE", "users", 1700000000000L, "mysql-bin.000001", 10,
        """"id":{"int":1},"name":{"string":"a"},"balance":null"""),
      ddl("ALTER TABLE users DROP COLUMN balance", "users", 1700000001000L))
    def batchDf = data.toDF("value")
    val cfg = CdcConfig("srcRp", registry, out.toString,
      offsetStorePath = Some(tmp().toString))
    val p1 = new CdcPipeline(spark, cfg)
    p1.processBatch(batchDf, 0L)
    assert(p1.gate.stopped) // structural DDL observed
    assert(spark.read.parquet(s"$out/srcRp_testdb__users").count() == 1)
    // crash-restart simulation: fresh pipeline replays the same batch
    val p2 = new CdcPipeline(spark, cfg)
    p2.processBatch(batchDf, 0L)
    // no duplicate appends, but the stop signal is re-observed
    assert(spark.read.parquet(s"$out/srcRp_testdb__users").count() == 1)
    assert(spark.read.parquet(s"$out/srcRp_testdb_ddl").count() == 1)
    assert(p2.gate.stopped)
    // same id with DIFFERENT content (fresh checkpoint reusing batch
    // ids over this sink) must process, not skip
    val p3 = new CdcPipeline(spark, cfg)
    p3.processBatch(Seq(
      row("CREATE", "users", 1700000002000L, "mysql-bin.000001", 30,
        """"id":{"int":2},"name":{"string":"b"},"balance":null"""))
      .toDF("value"), 0L)
    assert(spark.read.parquet(s"$out/srcRp_testdb__users").count() == 2)
  }

  test("malformed envelope fails the job unless opted into warn mode") {
    import spark.implicits._
    val out = tmp()
    val lines = Seq(
      row("CREATE", "users", 1700000000000L, "mysql-bin.000001", 10,
        """"id":{"int":1},"name":{"string":"a"},"balance":null"""),
      "this is not json at all")
    val strict = new CdcPipeline(spark,
      CdcConfig("srcBadS", registry, tmp().toString))
    val e = intercept[IllegalStateException] {
      strict.processBatch(lines.toDF("value"), 0L)
    }
    assert(e.getMessage.startsWith("MALFORMED ENVELOPE"))
    // warn mode: good rows land, bad row is logged and skipped
    val lax = new CdcPipeline(spark,
      CdcConfig("srcBadW", registry, out.toString,
        failOnUnknownTables = false))
    lax.processBatch(lines.toDF("value"), 0L)
    assert(spark.read.parquet(s"$out/srcBadW_testdb__users").count() == 1)
  }

  test("wide registry: 50-table batch demuxes every table correctly") {
    import spark.implicits._
    val out = tmp()
    val wide = TableRegistry((0 until 50).map(i =>
      TableSpec("db", s"t$i", itemsSchema)))
    val lines = (0 until 200).map { i =>
      s"""{"_op":"CREATE","_ts":${1700000000000L + i},"_db":"db","_tbl":"t${i % 50}","id":{"int":$i},"qty":{"long":${i * 2}},"_binlog_file":"f1","_binlog_pos_end":"$i"}"""
    }
    val p = new CdcPipeline(spark, CdcConfig("srcWide", wide, out.toString))
    p.processBatch(lines.toDF("value"), 0L)
    assert(p.recordCount == 200)
    for (t <- Seq(0, 17, 49))
      assert(spark.read.parquet(s"$out/srcWide_db__t$t").count() == 4)
  }

  test("non-structural DDL does not stop") {
    val in = tmp(); val out = tmp()
    writeFixture(in, "00.jsonl", Seq(
      ddl("CREATE INDEX idx1 ON users (name)", "users", 1700000001000L),
      row("CREATE", "users", 1700000002000L, "mysql-bin.000001", 20,
        """"id":{"int":5},"name":{"string":"x"},"balance":null""")))
    val p = run(CdcConfig("src3", registry, out.toString), in)
    assert(!p.gate.stopped)
    assert(spark.read.parquet(s"$out/src3_testdb__users").count() == 1)
  }

  test("snapshot-only stops once all target tables complete") {
    val in = tmp(); val out = tmp()
    writeFixture(in, "00-reads.jsonl", Seq(
      row("READ", "users", 1L, "f", 0, """"id":{"int":1},"name":null,"balance":null"""),
      row("READ", "items", 1L, "f", 0, """"id":{"int":1},"qty":{"long":1}""")))
    writeFixture(in, "01-users-done.jsonl", Seq(
      row("CREATE", "users", 2L, "f", 1, """"id":{"int":2},"name":null,"balance":null""")))
    writeFixture(in, "02-items-done.jsonl", Seq(
      row("CREATE", "items", 3L, "f", 2, """"id":{"int":2},"qty":{"long":2}""")))
    writeFixture(in, "03-late.jsonl", Seq(
      row("CREATE", "users", 4L, "f", 3, """"id":{"int":9},"name":null,"balance":null""")))

    val p = run(CdcConfig("src4", registry, out.toString,
      snapshotOnly = true), in)
    assert(p.gate.stopped && p.gate.reason.contains("SNAPSHOT-COMPLETE"))
    assert(p.gate.snapshotCompleted ==
      Set("testdb.users", "testdb.items"))
    // batch 03 swallowed: users has READ + first CREATE only
    assert(spark.read.parquet(s"$out/src4_testdb__users").count() == 2)
  }

  test("unknown table fails the job (fail.on.unknown.tables)") {
    val in = tmp(); val out = tmp()
    writeFixture(in, "00.jsonl", Seq(
      row("CREATE", "ghosts", 1L, "f", 0, """"id":{"int":1}""")))
    val p = new CdcPipeline(spark,
      CdcConfig("src5", registry, out.toString))
    val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      p.runAvailableNow(in.toString, tmp().resolve("ck").toString)
    }
    assert(e.getCause.getMessage.contains("UNKNOWN TABLES"))
  }

  test("unknown table warns when fail.on.unknown.tables=false") {
    val in = tmp(); val out = tmp()
    writeFixture(in, "00.jsonl", Seq(
      row("CREATE", "ghosts", 1L, "f", 0, """"id":{"int":1}"""),
      row("CREATE", "users", 2L, "f", 1,
        """"id":{"int":1},"name":null,"balance":null""")))
    val p = run(CdcConfig("src6", registry, out.toString,
      failOnUnknownTables = false), in)
    assert(!p.gate.stopped)
    assert(spark.read.parquet(s"$out/src6_testdb__users").count() == 1)
  }

  test("offset bootstrap reads back what the job stored") {
    val off = tmp()
    val p = new CdcPipeline(spark, CdcConfig("src7", registry, "/tmp/x",
      offsetStorePath = Some(off.toString)))
    assert(p.readStoredOffset(off.toString).isEmpty)
    Files.write(off.resolve("src7_offset.txt"), "mysql-bin.000009,42".getBytes)
    assert(p.readStoredOffset(off.toString).contains("mysql-bin.000009,42"))
  }
}
