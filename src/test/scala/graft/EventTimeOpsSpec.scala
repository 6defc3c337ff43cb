package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.EventTimeOps
import graft.streaming.EventTimeOps.SessionEvent

/** Event-time streaming operators driven through real streaming
  * queries (file source → memory sink, AvailableNow).
  */
class EventTimeOpsSpec extends AnyFunSuite {
  lazy val spark: SparkSession = TestSpark.session

  val schema = StructType(Seq(
    StructField("event_id", LongType), StructField("ts", TimestampType),
    StructField("user_id", LongType), StructField("event_type", StringType),
    StructField("value", DoubleType)))

  def jsonl(lines: Seq[String]): String = {
    val dir = Files.createTempDirectory("graft-et-")
    Files.write(dir.resolve("part0.jsonl"),
      String.join("\n", lines: _*).getBytes)
    dir.toString
  }

  def ev(id: Long, t: String, user: Long, typ: String, v: Double): String =
    s"""{"event_id":$id,"ts":"$t","user_id":$user,"event_type":"$typ","value":$v}"""

  def runToMemory(df: org.apache.spark.sql.DataFrame, name: String,
      mode: String): Unit = {
    val q = df.writeStream.format("memory").queryName(name)
      .outputMode(mode)
      .option("checkpointLocation",
        Files.createTempDirectory("graft-ck-").toString)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
  }

  test("watermarked tumbling window aggregate") {
    val in = jsonl(Seq(
      ev(1, "2024-01-01 10:01:00", 1, "view", 1.0),
      ev(2, "2024-01-01 10:20:00", 1, "view", 2.0),
      ev(3, "2024-01-01 11:05:00", 2, "click", 5.0),
      ev(4, "2024-01-01 12:30:00", 2, "view", 3.0))) // advances watermark
    val stream = spark.readStream.schema(schema).json(in)
    runToMemory(EventTimeOps.windowedStats(stream, "ts", "10 minutes",
      "1 hour"), "win_out", "append")
    // append mode emits only windows sealed by the watermark (12:30-10m)
    val rows = spark.table("win_out")
      .select(date_format(col("window_start"), "HH:mm").as("w"),
        col("event_type"), col("n"), col("sum_value"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getDouble(3))).toSet
    assert(rows == Set(("10:00", "view", 2L, 3.0), ("11:00", "click", 1L, 5.0)))
  }

  test("streaming dedup within watermark") {
    val in = jsonl(Seq(
      ev(1, "2024-01-01 10:00:00", 1, "view", 1.0),
      ev(1, "2024-01-01 10:00:30", 1, "view", 1.0), // dup event_id
      ev(2, "2024-01-01 10:01:00", 1, "view", 2.0)))
    val stream = spark.readStream.schema(schema).json(in)
    runToMemory(EventTimeOps.streamingDedup(stream, "ts", "1 hour",
      Seq("event_id")), "dedup_out", "append")
    assert(spark.table("dedup_out").count() == 2)
  }

  test("stream-static broadcast enrichment") {
    import spark.implicits._
    val in = jsonl(Seq(
      ev(1, "2024-01-01 10:00:00", 1, "view", 1.0),
      ev(2, "2024-01-01 10:01:00", 2, "click", 2.0),
      ev(3, "2024-01-01 10:02:00", 9, "view", 3.0))) // no dim match
    val dim = Seq((1L, "alice"), (2L, "bob")).toDF("user_id", "user_name")
    val stream = spark.readStream.schema(schema).json(in)
    runToMemory(EventTimeOps.enrich(stream, dim, "user_id"),
      "enrich_out", "append")
    val out = spark.table("enrich_out")
      .select("event_id", "user_name").collect()
      .map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    assert(out == Map(1L -> Some("alice"), 2L -> Some("bob"), 3L -> None))
  }

  test("stream-stream interval join drops out-of-horizon matches") {
    val imps = jsonl(Seq(
      ev(10, "2024-01-01 10:00:00", 1, "imp", 0.0),
      ev(20, "2024-01-01 10:00:00", 2, "imp", 0.0)))
    val clicks = jsonl(Seq(
      ev(11, "2024-01-01 10:00:30", 1, "click", 1.0), // within 60s
      ev(21, "2024-01-01 10:30:00", 2, "click", 1.0))) // beyond horizon
    val l = spark.readStream.schema(schema).json(imps)
      .select(col("user_id"), col("ts").as("imp_ts"))
    val r = spark.readStream.schema(schema).json(clicks)
      .select(col("user_id").as("c_user"), col("ts").as("click_ts"))
    val joined = EventTimeOps.intervalJoin(
      l.withColumnRenamed("user_id", "k"),
      "imp_ts",
      r.withColumnRenamed("c_user", "k"),
      "click_ts", "k", 60L)
    runToMemory(joined.select(col("l.k").as("k")), "ivj_out", "append")
    assert(spark.table("ivj_out").collect().map(_.getLong(0)).toSeq == Seq(1L))
  }

  test("declarative session_window sessions seal at the watermark") {
    val in = jsonl(Seq(
      ev(1, "2024-01-01 10:00:00", 7, "view", 1.0),
      ev(2, "2024-01-01 10:10:00", 7, "view", 2.0), // merges (gap 30m)
      ev(3, "2024-01-01 11:30:00", 7, "view", 4.0), // new session
      ev(4, "2024-01-01 15:00:00", 8, "view", 8.0))) // advances watermark
    val stream = spark.readStream.schema(schema).json(in)
    runToMemory(EventTimeOps.gapSessions(stream, "ts", "10 minutes",
      "30 minutes", "user_id"), "gsess_out", "append")
    // user 7's two sessions are sealed by the 15:00-10m watermark;
    // user 8's own session is still open and not emitted
    val rows = spark.table("gsess_out")
      .select(col("user_id"),
        date_format(col("session_start"), "HH:mm").as("s"),
        col("n_events"), col("sum_value"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getDouble(3))).toSet
    assert(rows == Set((7L, "10:00", 2L, 3.0), (7L, "11:30", 1L, 4.0)))
  }

  test("stateful session counts across batches") {
    import spark.implicits._
    val in = jsonl(Seq(
      ev(1, "2024-01-01 10:00:00", 7, "view", 1.0),
      ev(2, "2024-01-01 10:10:00", 7, "view", 1.0), // same session (10m gap)
      ev(3, "2024-01-01 12:00:00", 7, "view", 1.0), // new session
      ev(4, "2024-01-01 10:00:00", 8, "view", 1.0)))
    val stream = spark.readStream.schema(schema).json(in)
      .select(col("user_id"), col("ts"), col("value")).as[SessionEvent]
    runToMemory(EventTimeOps.sessionCounts(stream, gapSeconds = 1800).toDF(),
      "sess_out", "append")
    val byUser = spark.table("sess_out").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(byUser(7L) == ((3L, 2L)))
    assert(byUser(8L) == ((1L, 1L)))
  }

  test("streaming near-dup gate agrees with the batch probe") {
    // index = the %10!=0 corpus's band buckets (what the batch
    // pipeline would store); stream = the %10==0 "new batch". The
    // gate's candidate doc set must equal the batch-side asymmetric
    // bucket join — same banding kernel, so any drift is a bug.
    val dir = "/root/testdata/sf0.001"
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("text"))
    val index = graft.queries.TextQueries
      .docBands(spark, docs.filter(col("doc_id") % 10 =!= 0))
      .select("band", "bucket").distinct()
    val expected = graft.queries.TextQueries
      .docBands(spark, docs.filter(col("doc_id") % 10 === 0))
      .join(index, Seq("band", "bucket"), "left_semi")
      .select("doc_id").distinct()
      .collect().map(_.getLong(0)).toSet

    val feedDir = Files.createTempDirectory("graft-ndg-")
    docs.filter(col("doc_id") % 10 === 0)
      .write.mode("overwrite").json(feedDir.toString)
    val docSchema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType)))
    val stream = spark.readStream.schema(docSchema).json(feedDir.toString)
    runToMemory(EventTimeOps.nearDupGate(spark, stream, index),
      "ndg_out", "append")
    val got = spark.table("ndg_out")
      .select("doc_id").distinct().collect().map(_.getLong(0)).toSet
    assert(got == expected)
    assert(got.nonEmpty, "fixture produced no candidates — weak test")
  }

  test("streaming ANN gate agrees with the batch index search") {
    // index = the %10!=0 embeddings as a maintained AnnIndex; stream
    // = the %10==0 "new batch". The gate's threshold-hit set must
    // equal the batch search with an unbounded k filtered at the same
    // threshold — same codebook, same tie rules, so drift is a bug.
    val dir = "/root/testdata/sf0.001"
    val e0 = spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("e"))
    val corpus = e0.filter(col("vec_id") % 10 =!= 0)
    val idxDir = Files.createTempDirectory("graft-anng-idx-").toString
    graft.ops.AnnIndex.build(spark, corpus,
      graft.ops.AnnIndex.seedCentroids(spark, corpus, 8), idxDir)

    val newBatch = e0.filter(col("vec_id") % 10 === 0)
    val minCos = 0.3
    val expected = graft.ops.AnnIndex.search(spark, idxDir,
        newBatch.select(col("vec_id").as("qid"), col("e").as("qe")),
        nprobe = 2, k = Int.MaxValue)
      .filter(col("cos") >= minCos)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    val feedDir = Files.createTempDirectory("graft-anng-")
    newBatch.write.mode("overwrite").json(feedDir.toString)
    val vecSchema = StructType(Seq(
      StructField("vec_id", LongType),
      StructField("e", ArrayType(DoubleType))))
    val stream = spark.readStream.schema(vecSchema).json(feedDir.toString)
    runToMemory(EventTimeOps.annGate(spark, stream,
        graft.ops.AnnIndex.codebook(spark, idxDir),
        graft.ops.AnnIndex.live(spark, idxDir), nprobe = 2, minCos),
      "anng_out", "append")
    val got = spark.table("anng_out")
      .select("vec_id", "index_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == expected)
    assert(got.nonEmpty, "fixture produced no hits — weak test")
  }
}
