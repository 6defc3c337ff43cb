package graft

import java.nio.file.{Files, Path}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.api.Graft
import graft.model.{TableRegistry, TableSpec}
import graft.streaming.{CdcConfig, CdcPipeline}

/** The maintained LLM indexes as PIPELINE citizens (`sink.index.*`):
  * a CDC feed replayed through the real pipeline must leave a
  * searchable BM25 / near-dup / ANN index beside the sink table —
  * index-served results equal to the oracle-checked kernels over the
  * keep-latest state of the feed — and full syncs must publish the
  * one-call maintenance verdicts into the P7 status store beside
  * `advice:rescale`.
  */
class CdcIndexSyncSpec extends AnyFunSuite {
  lazy val spark: SparkSession = TestSpark.session
  import spark.implicits._

  private val docsSchema = StructType(Seq(
    StructField("doc_id", LongType), StructField("body", StringType)))
  private val vecsSchema = StructType(Seq(
    StructField("vec_id", LongType), StructField("emb", StringType)))

  private def registry = TableRegistry(Seq(
    TableSpec("testdb", "docs", docsSchema),
    TableSpec("testdb", "vecs", vecsSchema)))

  private def row(op: String, tbl: String, ts: Long, pos: Long,
      fields: String): String =
    s"""{"_op":"$op","_ts":$ts,"_db":"testdb","_tbl":"$tbl",$fields,""" +
      s""""_binlog_file":"mysql-bin.000001","_binlog_pos_end":"$pos",""" +
      s""""_binlog_file_internal":"mysql-bin.000001",""" +
      s""""_binlog_pos_internal":"$pos"}"""

  private def doc(op: String, id: Long, body: String, ts: Long,
      pos: Long): String =
    row(op, "docs", ts, pos,
      s""""doc_id":{"long":$id},"body":{"string":"$body"}""")

  private def vec(op: String, id: Long, emb: String, ts: Long,
      pos: Long): String =
    row(op, "vecs", ts, pos,
      s""""vec_id":{"long":$id},"emb":${
        if (emb == null) "null" else s"""{"string":"$emb"}"""}""")

  private def tmp(): Path = Files.createTempDirectory("graft-cis-")

  private def write(dir: Path, name: String, lines: Seq[String]): Unit = {
    val p = Files.write(dir.resolve(name),
      String.join("\n", lines: _*).getBytes)
    // fixture files land microseconds apart, and the file source
    // orders batches by MODIFICATION TIME — a millisecond tie would
    // replay the feed out of order (observed: the churn batch ran
    // before the changes batch), so stamp a deterministic, strictly
    // increasing mtime from the fixture's numeric prefix
    val idx = name.takeWhile(_.isDigit).toLong
    Files.setLastModifiedTime(p, java.nio.file.attribute.FileTime
      .fromMillis(1700000000000L + idx * 60000L))
  }

  private def scores(df: DataFrame): Map[Long, Double] =
    df.select("doc_id", "bm25").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap

  private val terms = Seq("quick", "dog", "spark")

  // the corpus the feed below converges to under keep-latest:
  // doc 2 deleted, doc 3 updated-then-deleted IN ONE BATCH, doc 1
  // rewritten, doc 13 created
  private def liveCorpus: DataFrame = Seq(
    (1L, "the quick brown fox leaps again"),
    (4L, "quick quick quick brown foxes"),
    (5L, "an unrelated document about spark and scala"),
    (6L, "dog dog dog dog"),
    (13L, "a late arriving quick dog")).toDF("doc_id", "text")

  private def docsFeed(in: Path): Unit = {
    write(in, "00-snapshot.jsonl", Seq(
      doc("READ", 1L, "the quick brown fox jumps over the lazy dog",
        1700000000000L, 0),
      doc("READ", 2L, "the quick red fox", 1700000000000L, 0),
      doc("READ", 3L, "lazy dogs sleep all day", 1700000000000L, 0),
      doc("READ", 4L, "quick quick quick brown foxes", 1700000000000L, 0),
      doc("READ", 5L, "an unrelated document about spark and scala",
        1700000000000L, 0),
      doc("READ", 6L, "dog dog dog dog", 1700000000000L, 0)))
    write(in, "01-changes.jsonl", Seq(
      doc("UPDATE", 1L, "the quick brown fox leaps again",
        1700000100000L, 100),
      doc("DELETE", 2L, "the quick red fox", 1700000200000L, 200),
      // within-batch keep-latest: the UPDATE must lose to the DELETE
      doc("UPDATE", 3L, "rewritten then removed", 1700000300000L, 300),
      doc("DELETE", 3L, "rewritten then removed", 1700000400000L, 400),
      doc("CREATE", 13L, "a late arriving quick dog",
        1700000500000L, 500)))
  }

  test("sink.index.text: the feed leaves a BM25 index equal to the " +
      "kernel over the keep-latest corpus; replay applies no second " +
      "delta") {
    val in = tmp(); val out = tmp(); val ck = tmp()
    docsFeed(in)
    val cfg = CdcConfig("ix1", registry, out.toString,
      currentKeys = Map("testdb.docs" -> Seq("doc_id")),
      indexText = Map("testdb.docs" -> "body"))
    val idx = s"$out/ix1_testdb__docs__textindex"
    // a stale staging dir from a torn attach attempt must be swept,
    // not healed into the fresh build's path
    Files.createDirectories(java.nio.file.Paths.get(s"$idx._attach_tmp"))
    Files.write(java.nio.file.Paths.get(s"$idx._attach_tmp/junk"),
      "torn".getBytes)
    new CdcPipeline(spark, cfg)
      .runAvailableNow(in.toString, ck.resolve("c").toString)
    assert(!Files.exists(java.nio.file.Paths.get(s"$idx._attach_tmp")),
      "stale attach staging not swept")
    // the junk must not have been HEALED into the committed index by
    // the rename (the dir-gone assert alone passes either way)
    assert(!Files.exists(java.nio.file.Paths.get(s"$idx/junk")),
      "torn-attempt junk healed into the committed index")
    val got = scores(graft.ops.TextIndex.search(spark, idx, terms))
    val want = scores(Graft.bm25(liveCorpus, terms))
    assert(got == want, s"index $got vs kernel $want")
    // the current table rode along (the index requires its key config)
    assert(graft.streaming.CurrentTable
      .read(spark, s"$out/ix1_testdb__docs__current").count() == 5)
    // replay: a second pipeline on the SAME checkpoint re-runs the
    // committed batches as marker-skipped replays — the index must
    // not receive duplicate deltas (generation unchanged)
    val gen = graft.ops.TextIndex.currentGen(spark, idx)
    new CdcPipeline(spark, cfg)
      .runAvailableNow(in.toString, ck.resolve("c").toString)
    assert(graft.ops.TextIndex.currentGen(spark, idx) == gen)
    assert(scores(graft.ops.TextIndex.search(spark, idx, terms)) == want)
  }

  test("sink.index.neardup: the feed leaves a band index that gates " +
      "a near-duplicate of a live doc and passes one of a deleted doc") {
    val in = tmp(); val out = tmp(); val ck = tmp()
    docsFeed(in)
    new CdcPipeline(spark, CdcConfig("ix2", registry, out.toString,
        currentKeys = Map("testdb.docs" -> Seq("doc_id")),
        indexNeardup = Map("testdb.docs" -> "body")))
      .runAvailableNow(in.toString, ck.resolve("c").toString)
    val idx = s"$out/ix2_testdb__docs__neardup"
    // exact duplicates of a LIVE doc (4) and a DELETED doc (2)
    val probe = Seq((101L, "quick quick quick brown foxes"),
      (102L, "the quick red fox")).toDF("doc_id", "text")
    val hits = graft.ops.NeardupIndex.probe(spark, idx, probe)
      .select("new_id").distinct().collect().map(_.getLong(0)).toSet
    assert(hits.contains(101L), s"live dup not gated: $hits")
    assert(!hits.contains(102L),
      s"deleted doc's duplicate still gated: $hits")
  }

  test("sink.index.ann: the codebook attaches from the snapshot " +
      "batch, deltas fold, a null embedding deletes its vector") {
    val in = tmp(); val out = tmp(); val ck = tmp()
    write(in, "00-snapshot.jsonl", Seq(
      vec("READ", 1L, "[1.0,0.0]", 1700000000000L, 0),
      vec("READ", 2L, "[0.9,0.1]", 1700000000000L, 0),
      vec("READ", 3L, "[0.0,1.0]", 1700000000000L, 0),
      vec("READ", 4L, "[0.1,0.9]", 1700000000000L, 0)))
    write(in, "01-changes.jsonl", Seq(
      // vector 2 moves to the y-axis cluster
      vec("UPDATE", 2L, "[0.05,1.0]", 1700000100000L, 100),
      // vector 4 loses its embedding — treated as its DELETE
      vec("UPDATE", 4L, null, 1700000200000L, 200),
      vec("CREATE", 5L, "[0.95,0.05]", 1700000300000L, 300),
      // a null ELEMENT is as unusable as a null embedding — never
      // indexed (it would poison norms and centroid folds silently)
      vec("CREATE", 6L, "[0.5,null]", 1700000400000L, 400)))
    write(in, "02-more.jsonl", Seq(
      // an EXISTING vector degrading to a null element = its DELETE
      vec("UPDATE", 3L, "[1.0,null]", 1700000500000L, 500)))
    new CdcPipeline(spark, CdcConfig("ix3", registry, out.toString,
        currentKeys = Map("testdb.vecs" -> Seq("vec_id")),
        indexAnn = Map("testdb.vecs" -> "emb"), indexAnnK = 2))
      .runAvailableNow(in.toString, ck.resolve("c").toString)
    val idx = s"$out/ix3_testdb__vecs__annindex"
    assert(graft.ops.AnnIndex.codebook(spark, idx).count() == 2)
    val live = graft.ops.AnnIndex.live(spark, idx)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(live == Set(1L, 2L, 5L), s"live vectors: $live")
    // nearest to x-axis query at full probe = 1 then 5
    val q = Seq((10L, Seq(1.0, 0.0))).toDF("qid", "qe")
    val top = graft.ops.AnnIndex.search(spark, idx, q, nprobe = 2, k = 2)
      .orderBy("rn").select("vec_id").collect().map(_.getLong(0)).toSeq
    assert(top == Seq(1L, 5L), s"top-2: $top")
  }

  test("full syncs publish the one-call maintenance verdict into the " +
      "status store; the fleet floor defers it with the numbers intact") {
    val in = tmp(); val out = tmp(); val ck = tmp(); val st = tmp()
    docsFeed(in)
    // churn past the compact threshold: delete most of the live set
    // in a third batch (backlog >= live fires CompactFirst)
    write(in, "02-churn.jsonl", Seq(
      doc("DELETE", 1L, "x", 1700000600000L, 600),
      doc("DELETE", 4L, "x", 1700000700000L, 700),
      doc("DELETE", 5L, "x", 1700000800000L, 800),
      doc("DELETE", 6L, "x", 1700000900000L, 900)))
    val base = CdcConfig("ix4", registry, out.toString,
      statusStorePath = Some(st.toString),
      currentKeys = Map("testdb.docs" -> Seq("doc_id")),
      currentFullsyncBatches = 1, // every sync full -> verdict measured
      indexText = Map("testdb.docs" -> "body"))
    new CdcPipeline(spark, base)
      .runAvailableNow(in.toString, ck.resolve("c").toString)
    val recs = spark.read.json(s"$st/dt=*")
      .filter(col("advice") === "index-maintenance")
    val first = recs.filter(col("verdict") === "compact-first")
      .orderBy(col("timestamp").desc).collect()
    assert(first.nonEmpty, "no compact-first record published")
    val r = first.head
    assert(r.getAs[String]("table") == "testdb.docs")
    assert(r.getAs[String]("kind") == "text")
    assert(r.getAs[String]("call").contains("TextIndex.compact"))
    assert(r.getAs[Long]("approx_live_rows") >= 0L)
    assert(r.getAs[Long]("reclaimable") > 0L)
    // acting on the verdict then re-running a (replayed) pass stays
    // silent: compact, drain the same feed again on a FRESH
    // checkpoint whose batches all replay as committed no-ops — no
    // new verdict records land because replays skip maintenance, and
    // the index reads identically after the compact
    graft.ops.TextIndex.compact(spark,
      s"$out/ix4_testdb__docs__textindex")
    val got = scores(graft.ops.TextIndex.search(spark,
      s"$out/ix4_testdb__docs__textindex", terms))
    val want = scores(Graft.bm25(
      liveCorpus.filter(!col("doc_id").isin(1L, 4L, 5L, 6L)), terms))
    assert(got == want, s"post-compact $got vs kernel $want")

    // the fleet floor: a fresh identical run under a huge
    // minReclaimable must surface the owed compact as DEFERRED (call
    // comment-prefixed) instead of hiding it
    val out2 = tmp(); val ck2 = tmp(); val st2 = tmp()
    new CdcPipeline(spark, base.copy(sinkPath = out2.toString,
        statusStorePath = Some(st2.toString),
        indexMinReclaimable = 1000000L))
      .runAvailableNow(in.toString, ck2.resolve("c").toString)
    val deferred = spark.read.json(s"$st2/dt=*")
      .filter(col("advice") === "index-maintenance" &&
        col("verdict") === "compact-deferred").collect()
    assert(deferred.nonEmpty, "owed compact hidden under the floor")
    assert(deferred.head.getAs[String]("call").startsWith("//"))
    assert(deferred.head.getAs[Long]("approx_live_rows") >= 0L)
  }

  test("index config validation fails at construction, not mid-stream") {
    val out = tmp()
    def cfg(ck: Map[String, Seq[String]],
        ix: Map[String, String]): CdcConfig =
      CdcConfig("ix5", registry, out.toString, currentKeys = ck,
        indexText = ix)
    // no current keys for the indexed table
    val e1 = intercept[IllegalArgumentException] {
      new CdcPipeline(spark, cfg(Map.empty, Map("testdb.docs" -> "body")))
    }
    assert(e1.getMessage.contains("sink.current.keys"))
    // composite key cannot be a posting id
    val e2 = intercept[IllegalArgumentException] {
      new CdcPipeline(spark,
        cfg(Map("testdb.docs" -> Seq("doc_id", "body")),
          Map("testdb.docs" -> "body")))
    }
    assert(e2.getMessage.contains("SINGLE-column"))
    // unknown indexed column
    val e3 = intercept[IllegalArgumentException] {
      new CdcPipeline(spark, cfg(Map("testdb.docs" -> Seq("doc_id")),
        Map("testdb.docs" -> "nope")))
    }
    assert(e3.getMessage.contains("nope"))
    // unknown table
    val e4 = intercept[IllegalArgumentException] {
      new CdcPipeline(spark, cfg(Map("testdb.docs" -> Seq("doc_id")),
        Map("testdb.ghost" -> "body")))
    }
    assert(e4.getMessage.toLowerCase.contains("unknown"))
    // the config-file surface speaks the same rules (CdcJob)
    val e5 = intercept[IllegalArgumentException] {
      graft.streaming.CdcJob.configFromMap(Map(
        "source.id" -> "ix5", "source.type" -> "mysql",
        "sink.path" -> out.toString,
        "table.schemas" -> """{"testdb.docs": "doc_id:BIGINT,body:TEXT"}""",
        "sink.index.text" -> """{"testdb.docs": "body"}"""))
    }
    assert(e5.getMessage.contains("sink.current.keys"))
    // a config-file string key is refused as non-integral
    val e6 = intercept[IllegalArgumentException] {
      graft.streaming.CdcJob.configFromMap(Map(
        "source.id" -> "ix5", "source.type" -> "mysql",
        "sink.path" -> out.toString,
        "table.schemas" -> """{"testdb.docs": "doc_id:BIGINT,body:TEXT"}""",
        "sink.current.keys" -> """{"testdb.docs": "body"}""",
        "sink.index.text" -> """{"testdb.docs": "body"}"""))
    }
    assert(e6.getMessage.contains("not integral"))
    // sink.index.ann refuses a scalar-typed embedding column at
    // construction — the delta's cast would AnalysisException on the
    // FIRST batch otherwise, the exact crash-loop validation exists
    // to prevent
    val scalarReg = TableRegistry(Seq(TableSpec("testdb", "vecs",
      StructType(Seq(StructField("vec_id", LongType),
        StructField("emb", DoubleType))))))
    val e7 = intercept[IllegalArgumentException] {
      new CdcPipeline(spark, CdcConfig("ix5b", scalarReg, out.toString,
        currentKeys = Map("testdb.vecs" -> Seq("vec_id")),
        indexAnn = Map("testdb.vecs" -> "emb")))
    }
    assert(e7.getMessage.contains("castable to array<double>"),
      e7.getMessage)
    // ...but a typed numeric-array column passes (non-envelope feeds
    // deliver it already parsed; the delta casts, never from_jsons)
    val arrReg = TableRegistry(Seq(TableSpec("testdb", "vecs",
      StructType(Seq(StructField("vec_id", LongType),
        StructField("emb", ArrayType(FloatType)))))))
    new CdcPipeline(spark, CdcConfig("ix5c", arrReg, out.toString,
      currentKeys = Map("testdb.vecs" -> Seq("vec_id")),
      indexAnn = Map("testdb.vecs" -> "emb")))
    // validation resolves names CASE-INSENSITIVELY, like Spark's own
    // analyzer and CdcJob's file validator: a case-only difference in
    // the key must still run the integral check (a silently-skipped
    // check here means every posting id casts to null at runtime)
    new CdcPipeline(spark, CdcConfig("ix5d", registry, out.toString,
      currentKeys = Map("testdb.docs" -> Seq("DOC_ID")),
      indexText = Map("testdb.docs" -> "BODY")))
    val e8 = intercept[IllegalArgumentException] {
      new CdcPipeline(spark, CdcConfig("ix5e", registry, out.toString,
        currentKeys = Map("testdb.docs" -> Seq("BODY")),
        indexText = Map("testdb.docs" -> "body")))
    }
    assert(e8.getMessage.contains("not integral"), e8.getMessage)
    // a key column entirely ABSENT from the schema (typo) is refused
    // at construction too — col(pk) would fail resolution at the
    // first batch otherwise
    val e9 = intercept[IllegalArgumentException] {
      new CdcPipeline(spark, CdcConfig("ix5f", registry, out.toString,
        currentKeys = Map("testdb.docs" -> Seq("doc_idd")),
        indexText = Map("testdb.docs" -> "body")))
    }
    assert(e9.getMessage.contains("not in the table schema"),
      e9.getMessage)
    val e10 = intercept[IllegalArgumentException] {
      graft.streaming.CdcJob.configFromMap(Map(
        "source.id" -> "ix5g", "source.type" -> "mysql",
        "sink.path" -> out.toString,
        "table.schemas" -> """{"testdb.docs": "doc_id:BIGINT,body:TEXT"}""",
        "sink.current.keys" -> """{"testdb.docs": "doc_idd"}""",
        "sink.index.text" -> """{"testdb.docs": "body"}"""))
    }
    // the file surface's own currentKeys validator fires first with
    // its friendlier spelling — either refusal closes the gap
    assert(e10.getMessage.contains("UNKNOWN CURRENT-TABLE KEY COLUMN"),
      e10.getMessage)
  }

  test("an index configured onto an existing sink absorbs the " +
      "table's history at attach (the JDBC-snapshot shape: sink rows " +
      "no batch frame will ever carry)") {
    val in = tmp(); val out = tmp(); val ck = tmp()
    // phase 1: run WITHOUT an index config — the sink accumulates
    // history the way a server-side JDBC snapshot writes READ rows
    // straight to the sink before any stream starts
    write(in, "00-snapshot.jsonl", Seq(
      doc("READ", 1L, "the quick brown fox", 1700000000000L, 0),
      doc("READ", 2L, "dog dog dog", 1700000000000L, 0)))
    new CdcPipeline(spark, CdcConfig("ix9", registry, out.toString,
        currentKeys = Map("testdb.docs" -> Seq("doc_id"))))
      .runAvailableNow(in.toString, ck.resolve("c").toString)
    // phase 2: the index is configured onto the SAME job (same
    // checkpoint — file 00 is already processed and never re-delivered
    // as a batch frame); its attach must build from the sink's
    // keep-latest state, not empty, or docs 1 and 2 are unsearchable
    // forever
    write(in, "01-changes.jsonl", Seq(
      doc("DELETE", 2L, "dog dog dog", 1700000100000L, 100),
      doc("CREATE", 8L, "a late spark doc", 1700000200000L, 200)))
    new CdcPipeline(spark, CdcConfig("ix9", registry, out.toString,
        currentKeys = Map("testdb.docs" -> Seq("doc_id")),
        indexText = Map("testdb.docs" -> "body")))
      .runAvailableNow(in.toString, ck.resolve("c").toString)
    val got = scores(graft.ops.TextIndex.search(spark,
      s"$out/ix9_testdb__docs__textindex", terms))
    val want = scores(Graft.bm25(Seq(
      (1L, "the quick brown fox"),
      (8L, "a late spark doc")).toDF("doc_id", "text"), terms))
    assert(got == want, s"index $got vs kernel $want")
  }

  test("a case-only config spelling of the indexed column still " +
      "feeds the index (canonicalized to the schema's casing)") {
    val in = tmp(); val out = tmp(); val ck = tmp()
    docsFeed(in)
    new CdcPipeline(spark, CdcConfig("ix6", registry, out.toString,
        currentKeys = Map("testdb.docs" -> Seq("doc_id")),
        indexText = Map("testdb.docs" -> "BODY")))
      .runAvailableNow(in.toString, ck.resolve("c").toString)
    val got = scores(graft.ops.TextIndex.search(spark,
      s"$out/ix6_testdb__docs__textindex", terms))
    val want = scores(Graft.bm25(liveCorpus, terms))
    assert(got == want, s"index $got vs kernel $want")
  }

  test("null-_ts changes are quarantined from the index exactly as " +
      "the current table's fold quarantines them") {
    val in = tmp(); val out = tmp(); val ck = tmp()
    // _ts:null — the warn-mode quarantine shape (unparseable source
    // timestamp): CurrentTable.sync's fold drops these rows, so the
    // index must too, or it serves docs the table never has
    def nullTsDoc(op: String, id: Long, body: String, pos: Long): String =
      s"""{"_op":"$op","_ts":null,"_db":"testdb","_tbl":"docs",""" +
        s""""doc_id":{"long":$id},"body":{"string":"$body"},""" +
        s""""_binlog_file":"mysql-bin.000001","_binlog_pos_end":"$pos",""" +
        s""""_binlog_file_internal":"mysql-bin.000001",""" +
        s""""_binlog_pos_internal":"$pos"}"""
    write(in, "00-snapshot.jsonl", Seq(
      doc("READ", 1L, "the quick brown fox", 1700000000000L, 0),
      doc("READ", 2L, "dog dog dog", 1700000000000L, 0)))
    write(in, "01-changes.jsonl", Seq(
      nullTsDoc("UPDATE", 1L, "spark spark rewritten", 100),
      nullTsDoc("CREATE", 7L, "a quarantined spark doc", 200),
      doc("CREATE", 8L, "a well formed spark doc", 1700000100000L, 300)))
    new CdcPipeline(spark, CdcConfig("ix7", registry, out.toString,
        currentKeys = Map("testdb.docs" -> Seq("doc_id")),
        indexText = Map("testdb.docs" -> "body")))
      .runAvailableNow(in.toString, ck.resolve("c").toString)
    // the current table's view: doc 1 KEEPS its snapshot text, doc 7
    // never lands, doc 8 lands — and the index serves exactly that
    val cur = graft.streaming.CurrentTable
      .read(spark, s"$out/ix7_testdb__docs__current")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(cur == Set(1L, 2L, 8L), s"current table keys: $cur")
    val got = scores(graft.ops.TextIndex.search(spark,
      s"$out/ix7_testdb__docs__textindex", terms))
    val want = scores(Graft.bm25(Seq(
      (1L, "the quick brown fox"), (2L, "dog dog dog"),
      (8L, "a well formed spark doc")).toDF("doc_id", "text"), terms))
    assert(got == want, s"index $got vs kernel $want")
  }

  test("a cadence full sync flags out-of-band sink rows the index " +
      "never saw (advice:index-content-drift)") {
    val in = tmp(); val out = tmp(); val ck = tmp(); val st = tmp()
    write(in, "00-snapshot.jsonl", Seq(
      doc("READ", 1L, "the quick brown fox", 1700000000000L, 0),
      doc("READ", 2L, "dog dog dog", 1700000000000L, 0)))
    val pipeline = new CdcPipeline(spark, CdcConfig("ix8", registry,
      out.toString, statusStorePath = Some(st.toString),
      currentKeys = Map("testdb.docs" -> Seq("doc_id")),
      currentFullsyncBatches = 1, // every later sync takes the cadence
      indexText = Map("testdb.docs" -> "body")))
    val q = pipeline.start(in.toString, ck.resolve("c").toString,
      org.apache.spark.sql.streaming.Trigger
        .ProcessingTime("500 milliseconds"),
      maxFilesPerTrigger = Some(1))
    try {
      val sinkDir = s"$out/ix8_testdb__docs"
      def waitFor(what: String)(cond: => Boolean): Unit = {
        val deadline = System.currentTimeMillis() + 120000L
        while (!cond) {
          if (System.currentTimeMillis() > deadline)
            fail(s"timed out waiting for $what")
          Thread.sleep(250L)
        }
      }
      val fs = new org.apache.hadoop.fs.Path(out.toString)
        .getFileSystem(spark.sessionState.newHadoopConf())
      // batch 1 (the snapshot file) fully processed: current table up
      waitFor("first sync")(
        fs.exists(new org.apache.hadoop.fs.Path(
          s"${sinkDir}__current/_cursor")) ||
        fs.exists(new org.apache.hadoop.fs.Path(s"${sinkDir}__current")))
      waitFor("first table rows")(
        try graft.streaming.CurrentTable
          .read(spark, s"${sinkDir}__current").count() == 2
        catch { case _: Exception => false })
      // OUT-OF-BAND backfill: a sink-shaped file written straight to
      // the table dir, in a dt partition no feed batch will claim —
      // cloned from a real sink row so the shape always matches
      val template = spark.read.option("basePath", sinkDir)
        .parquet(sinkDir)
      template.withColumn("doc_id", lit(99L))
        .withColumn("body", lit("backfilled quick doc"))
        .withColumn("_ts", lit(1500000000000L))
        .limit(1)
        .withColumn("dt", lit("2017-07-14"))
        .write.partitionBy("dt").mode("append").parquet(sinkDir)
      // second feed file -> batch 2: its sync is cadence-due and must
      // run SPLIT, folding the backfill in the full pass and flagging
      // it as content the index never saw
      write(in, "01-changes.jsonl", Seq(
        doc("CREATE", 8L, "a well formed spark doc",
          1700000100000L, 300)))
      waitFor("drift advisory")(
        try spark.read.json(s"$st/dt=*")
          .filter(col("advice") === "index-content-drift").count() > 0
        catch { case _: Exception => false })
    } finally q.stop()
    val rec = spark.read.json(s"$st/dt=*")
      .filter(col("advice") === "index-content-drift").collect().head
    assert(rec.getAs[String]("table") == "testdb.docs")
    assert(rec.getAs[String]("kind") == "text")
    assert(rec.getAs[Long]("out_of_band_files") >= 1L)
    assert(rec.getAs[String]("call").contains("TextIndex.build"))
    // the divergence the advisory names, shown directly: the current
    // table HAS the backfilled doc, the index does not
    assert(graft.streaming.CurrentTable
      .read(spark, s"$out/ix8_testdb__docs__current")
      .filter(col("doc_id") === 99L).count() == 1)
    assert(graft.ops.TextIndex.search(spark,
        s"$out/ix8_testdb__docs__textindex", Seq("backfilled"))
      .filter(col("doc_id") === 99L).count() == 0)
  }
}
