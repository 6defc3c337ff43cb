package graft

import java.nio.file.{Files, Paths}

import scala.collection.JavaConverters._

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import graft.source.{CdcBinlogSource, Dsv2Feed}

/** DSv2 CDC binlog source: (file,pos) offset algebra, admission
  * control (rows/files per trigger), checkpoint resume, and drop-in
  * use as the pipeline's feed.
  */
class CdcDsv2SourceSpec extends AnyFunSuite {
  lazy val spark: SparkSession = TestSpark.session

  private def writeSeg(dir: java.nio.file.Path, name: String,
      lines: Seq[String]): Unit =
    Files.write(dir.resolve(name), lines.asJava)

  private def lines(n: Range, seg: String): Seq[String] =
    n.map(i => s"""{"seg":"$seg","n":$i}""")

  test("offset json round-trip and ordering") {
    import CdcBinlogSource.CdcOffset
    val o = CdcOffset("binlog.000042", 1337L)
    assert(CdcOffset.parse(o.json()) == o)
    // hostile segment names: quotes, backslashes, control chars must
    // survive the checkpoint offset log
    for (name <- Seq("a\"b", "a\\b", "a\nb", "a\\\"b", "a\tb"))
      assert(CdcOffset.parse(CdcOffset(name, 7L).json()) ==
        CdcOffset(name, 7L), name)
    assert(CdcOffset.ordering.lt(CdcOffset("a", 9), CdcOffset("b", 0)))
    assert(CdcOffset.ordering.lt(CdcOffset("a", 1), CdcOffset("a", 2)))
  }

  test("reads all segments in order with file/pos metadata") {
    val in = Files.createTempDirectory("dsv2-in-")
    writeSeg(in, "seg.000", lines(0 until 3, "a"))
    writeSeg(in, "seg.001", lines(0 until 2, "b"))
    val out = Files.createTempDirectory("dsv2-out-").toString
    spark.readStream.format("graft-cdc").option("path", in.toString).load()
      .writeStream.format("parquet")
      .option("path", out)
      .option("checkpointLocation",
        Files.createTempDirectory("dsv2-ck-").toString)
      .trigger(Trigger.AvailableNow()).start().awaitTermination()
    val got = spark.read.parquet(out)
      .orderBy("_feed_file", "_feed_pos")
      .select("_feed_file", "_feed_pos", "value").collect()
    assert(got.length == 5)
    assert(got.map(_.getString(0)).toSeq ==
      Seq("seg.000", "seg.000", "seg.000", "seg.001", "seg.001"))
    // _feed_pos is each line's START BYTE (binlog pos semantics):
    // line i starts at the sum of the prior lines' byte lengths + 1
    // newline each
    def starts(ls: Seq[String]): Seq[Long] =
      ls.map(_.getBytes("UTF-8").length.toLong + 1)
        .scanLeft(0L)(_ + _).init
    val expected = starts(lines(0 until 3, "a")) ++ starts(lines(0 until 2, "b"))
    assert(got.map(_.getLong(1)).toSeq == expected)
    assert(got.head.getString(2) == """{"seg":"a","n":0}""")
  }

  test("maxRecordsPerTrigger splits batches mid-file; resume from checkpoint") {
    val in = Files.createTempDirectory("dsv2-in-")
    writeSeg(in, "s.0", lines(0 until 5, "x"))
    val out = Files.createTempDirectory("dsv2-out-").toString
    val ck = Files.createTempDirectory("dsv2-ck-").toString
    def run(): Unit =
      spark.readStream.format("graft-cdc").option("path", in.toString)
        .option("maxRecordsPerTrigger", 2).load()
        .writeStream.format("parquet").option("path", out)
        .option("checkpointLocation", ck)
        .trigger(Trigger.AvailableNow()).start().awaitTermination()
    run()
    assert(spark.read.parquet(out).count() == 5)
    // 2+2+1 admission: a batch boundary falls inside the file
    // (mid-file (file,pos) offsets really are honored)
    val batchFiles = spark.read.parquet(out).inputFiles.length
    assert(batchFiles >= 3, s"expected >=3 output files, got $batchFiles")
    // append one more segment; restart consumes ONLY the new rows
    writeSeg(in, "s.1", lines(0 until 3, "y"))
    run()
    val all = spark.read.parquet(out)
    assert(all.count() == 8)
    assert(all.filter(col("_feed_file") === "s.1").count() == 3)
  }

  test("maxFilesPerTrigger admission; empty dir yields no-op batch") {
    val in = Files.createTempDirectory("dsv2-in-")
    val out = Files.createTempDirectory("dsv2-out-").toString
    val ck = Files.createTempDirectory("dsv2-ck-").toString
    def run(): Unit =
      spark.readStream.format("graft-cdc").option("path", in.toString)
        .option("maxFilesPerTrigger", 1).load()
        .writeStream.format("parquet").option("path", out)
        .option("checkpointLocation", ck)
        .trigger(Trigger.AvailableNow()).start().awaitTermination()
    run() // empty dir: zero rows, no crash (sink may write a 0-row file)
    assert(spark.read.parquet(out).count() == 0)
    for (i <- 0 until 3) writeSeg(in, s"f.$i", lines(0 until 2, s"s$i"))
    run()
    assert(spark.read.parquet(out).count() == 6)
  }

  test("batch read scans the whole log") {
    val in = Files.createTempDirectory("dsv2-batch-in-")
    writeSeg(in, "a.0", lines(0 until 4, "p"))
    writeSeg(in, "a.1", lines(0 until 3, "q"))
    val got = spark.read.format("graft-cdc").option("path", in.toString)
      .load()
    assert(got.count() == 7)
    assert(got.filter(col("_feed_file") === "a.1").count() == 3)
  }

  test("startup modes: latest skips backlog, offset and timestamp seek") {
    val in = Files.createTempDirectory("dsv2-su-in-")
    writeSeg(in, "b.0", Seq(
      """{"n":0,"_ts":1000}""", """{"n":1,"_ts":2000}"""))
    writeSeg(in, "b.1", Seq(
      """{"n":2,"_ts":3000}""", """{"n":3,"_ts":4000}"""))
    def run(opts: (String, String)*): Seq[String] = {
      val out = Files.createTempDirectory("dsv2-su-out-").toString
      val r = spark.readStream.format("graft-cdc").option("path", in.toString)
      opts.foreach { case (k, v) => r.option(k, v) }
      r.load().writeStream.format("parquet").option("path", out)
        .option("checkpointLocation",
          Files.createTempDirectory("dsv2-su-ck-").toString)
        .trigger(Trigger.AvailableNow()).start().awaitTermination()
      spark.read.parquet(out).orderBy("_feed_file", "_feed_pos")
        .select("value").collect().map(_.getString(0)).toSeq
    }
    // latest: nothing until new segments arrive
    assert(run("startup.mode" -> "latest").isEmpty)
    // offset "file,pos": resume mid-segment, reference P3 format —
    // pos is the BYTE offset of the resume line, like a binlog pos
    val line1Start = """{"n":0,"_ts":1000}""".getBytes("UTF-8").length + 1
    assert(run("startup.mode" -> "offset",
        "startup.offset" -> s"b.0,$line1Start")
      .map(s => "\"n\":(\\d)".r.findFirstMatchIn(s).get.group(1)) ==
      Seq("1", "2", "3"))
    // timestamp: first event at/after _ts
    assert(run("startup.timestamp.ms" -> "3000")
      .map(s => "\"n\":(\\d)".r.findFirstMatchIn(s).get.group(1)) ==
      Seq("2", "3"))
  }

  test("composite admission: rows and files caps both bind") {
    val in = Files.createTempDirectory("dsv2-comp-in-")
    for (i <- 0 until 3) writeSeg(in, s"c.$i", lines(0 until 4, s"s$i"))
    val out = Files.createTempDirectory("dsv2-comp-out-").toString
    spark.readStream.format("graft-cdc").option("path", in.toString)
      .option("maxRecordsPerTrigger", 10) // would span 3 files
      .option("maxFilesPerTrigger", 1) // ...but files cap is tighter
      .load()
      .writeStream.format("parquet").option("path", out)
      .option("checkpointLocation",
        Files.createTempDirectory("dsv2-comp-ck-").toString)
      .trigger(Trigger.AvailableNow()).start().awaitTermination()
    val got = spark.read.parquet(out)
    assert(got.count() == 12)
    // one file per batch => each parquet output holds a single segment
    val perFile = got.withColumn("pf", input_file_name())
      .groupBy("pf").agg(countDistinct("_feed_file").as("n"))
      .select("n").collect().map(_.getLong(0))
    assert(perFile.nonEmpty && perFile.forall(_ == 1L))
  }

  test("a big segment splits into byte-range partitions: exact rows, " +
      "no duplicate or dropped line at any cut") {
    val in = Files.createTempDirectory("dsv2-split-in-")
    // varied-length lines so split cuts land mid-line, at line starts,
    // and just past terminators — the Hadoop-handshake edge cases
    val ls = (0 until 2000).map(i => s"""{"n":$i,"pad":"${"x" * (i % 37)}"}""")
    writeSeg(in, "big.0", ls)
    val prevMax = spark.conf.get("spark.sql.files.maxPartitionBytes")
    val prevOpen = spark.conf.get("spark.sql.files.openCostInBytes")
    try {
      spark.conf.set("spark.sql.files.maxPartitionBytes", (4 * 1024).toString)
      spark.conf.set("spark.sql.files.openCostInBytes", "1024")
      val df = spark.read.format("graft-cdc").option("path", in.toString)
        .option("min.split.bytes", "1") // exercise every cut alignment
        .load()
      // the plan really fans out (one file, many partitions)...
      assert(df.rdd.getNumPartitions > 4, df.rdd.getNumPartitions)
      // ...and the rows are exactly the lines, each exactly once, with
      // byte-accurate positions (sorting by _feed_pos restores order)
      val got = df.orderBy("_feed_pos").select("value", "_feed_pos")
        .collect()
      assert(got.length == ls.length)
      assert(got.map(_.getString(0)).toSeq == ls)
      val starts = ls.map(_.getBytes("UTF-8").length.toLong + 1)
        .scanLeft(0L)(_ + _).init
      assert(got.map(_.getLong(1)).toSeq == starts)
    } finally {
      spark.conf.set("spark.sql.files.maxPartitionBytes", prevMax)
      spark.conf.set("spark.sql.files.openCostInBytes", prevOpen)
    }
  }

  test("split reads compose with mid-file admission resume: " +
      "cap mid-segment, restart finishes the rest, nothing twice") {
    val in = Files.createTempDirectory("dsv2-split-adm-in-")
    val ls = (0 until 500).map(i => s"""{"n":$i,"p":"${"y" * (i % 23)}"}""")
    writeSeg(in, "s.0", ls)
    val out = Files.createTempDirectory("dsv2-split-adm-out-").toString
    val ck = Files.createTempDirectory("dsv2-split-adm-ck-").toString
    val prevMax = spark.conf.get("spark.sql.files.maxPartitionBytes")
    val prevOpen = spark.conf.get("spark.sql.files.openCostInBytes")
    try {
      spark.conf.set("spark.sql.files.maxPartitionBytes", (2 * 1024).toString)
      spark.conf.set("spark.sql.files.openCostInBytes", "512")
      def run(): Unit =
        spark.readStream.format("graft-cdc").option("path", in.toString)
          .option("min.split.bytes", "1") // force real byte splits
          .option("maxRecordsPerTrigger", 180).load()
          .writeStream.format("parquet").option("path", out)
          .option("checkpointLocation", ck)
          .trigger(Trigger.AvailableNow()).start().awaitTermination()
      run()
      val got = spark.read.parquet(out).orderBy("_feed_pos")
        .select("value").collect().map(_.getString(0)).toSeq
      // 180+180+140 admission across byte-split partitions: complete,
      // ordered, exactly once
      assert(got == ls)
    } finally {
      spark.conf.set("spark.sql.files.maxPartitionBytes", prevMax)
      spark.conf.set("spark.sql.files.openCostInBytes", prevOpen)
    }
  }

  test("live tailing: segments appended mid-stream arrive in later batches") {
    val in = Files.createTempDirectory("dsv2-live-in-")
    val out = Files.createTempDirectory("dsv2-live-out-").toString
    writeSeg(in, "s.000", lines(0 until 3, "a"))
    val q = spark.readStream.format("graft-cdc").option("path", in.toString)
      .load()
      .writeStream.format("parquet").option("path", out)
      .option("checkpointLocation",
        Files.createTempDirectory("dsv2-live-ck-").toString)
      .trigger(Trigger.ProcessingTime("100 milliseconds")).start()
    try {
      def rows(): Long =
        try spark.read.parquet(out).count() catch { case _: Throwable => 0L }
      val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
      while (rows() < 3 && System.nanoTime() < deadline) Thread.sleep(100)
      assert(rows() == 3, "initial backlog not consumed")
      // append while the query is live — the next trigger must see it
      writeSeg(in, "s.001", lines(0 until 2, "b"))
      while (rows() < 5 && System.nanoTime() < deadline) Thread.sleep(100)
      assert(rows() == 5, "mid-stream append not consumed")
    } finally q.stop()
  }

  test("Dsv2Feed drives CdcPipeline end-to-end") {
    val in = Files.createTempDirectory("dsv2-pipe-in-")
    val sink = Files.createTempDirectory("dsv2-pipe-out-").toString
    writeSeg(in, "b.0", Seq(
      """{"_tbl":"users","_db":"testdb","_op":"c","_ts":1700000000000,"id":{"int":1},"name":{"string":"ada"}}"""))
    import org.apache.spark.sql.types._
    import graft.model.{TableRegistry, TableSpec}
    import graft.streaming.{CdcConfig, CdcPipeline}
    val registry = TableRegistry(Seq(TableSpec("testdb", "users",
      StructType(Seq(StructField("id", IntegerType),
        StructField("name", StringType))))))
    val p = new CdcPipeline(spark,
      CdcConfig("dsv2src", registry, sink))
    p.startFeed(Dsv2Feed(in.toString),
        Files.createTempDirectory("dsv2-pipe-ck-").toString,
        Trigger.AvailableNow())
      .awaitTermination()
    val users = spark.read.parquet(s"$sink/dsv2src_testdb__users")
    assert(users.count() == 1)
    assert(users.select("name").head.getString(0) == "ada")
  }
}
