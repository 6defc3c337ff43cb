package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.TimeTravel
import graft.streaming.CurrentTable

/** The copy-on-write current-state table: sync must equal
  * TimeTravel.currentState over the full changelog after every
  * incremental fold, rewrite only the touched key-buckets, and
  * converge under the crash-replay the durable cursor allows.
  */
class CurrentTableSpec extends AnyFunSuite {
  lazy val spark = TestSpark.session
  import spark.implicits._

  /** A mysql-shaped sink table dir: append change rows with the kept
    * metadata the pipeline writes.
    */
  private def append(dir: String,
      rows: Seq[(Long, String, String, Long, String, Long)]): Unit =
    rows.toDF("id", "name", "_op", "_ts", "_binlog_file_internal",
        "_binlog_pos_internal")
      .withColumn("dt", lit("2024-01-01"))
      .coalesce(1)
      .write.mode("append").partitionBy("dt").parquet(dir)

  private def stateOf(dir: String): Set[(Long, String)] =
    CurrentTable.read(spark, dir)
      .select("id", "name").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet

  private def oracleOf(sink: String): Set[(Long, String)] =
    TimeTravel.currentState(spark, sink, Seq("id"))
      .select("id", "name").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet

  test("incremental syncs track the changelog exactly; only touched " +
      "buckets rewrite; replay converges") {
    val sink = Files.createTempDirectory("graft-ct-")
      .resolve("sink").toString
    val cur = Files.createTempDirectory("graft-ct-cur-").toString

    append(sink, Seq(
      (1L, "alice", "CREATE", 1000L, "f1", 10L),
      (2L, "bob", "CREATE", 1100L, "f1", 20L),
      (3L, "carol", "CREATE", 1200L, "f1", 30L)))
    val (f1, b1) = CurrentTable.sync(spark, sink, cur, Seq("id"),
      buckets = 8)
    assert(f1 == 1 && b1 >= 1)
    assert(stateOf(cur) == oracleOf(sink))
    assert(stateOf(cur) ==
      Set((1L, "alice"), (2L, "bob"), (3L, "carol")))

    // nothing new → no-op
    assert(CurrentTable.sync(spark, sink, cur, Seq("id")) == ((0, 0)))

    // delta 2: update alice, delete bob, create dave — note which
    // bucket dirs change
    def bucketMtimes(): Map[String, Long] =
      new java.io.File(cur).listFiles().filter(_.isDirectory)
        .filter(_.getName.startsWith("kb="))
        .map(d => d.getName -> d.lastModified()).toMap
    val before = bucketMtimes()
    append(sink, Seq(
      (1L, "alice2", "UPDATE", 2000L, "f1", 40L),
      (2L, "bob", "DELETE", 2100L, "f1", 50L),
      (4L, "dave", "CREATE", 2200L, "f1", 60L)))
    val (f2, b2) = CurrentTable.sync(spark, sink, cur, Seq("id"))
    assert(f2 == 1)
    assert(stateOf(cur) == oracleOf(sink))
    assert(stateOf(cur) ==
      Set((1L, "alice2"), (3L, "carol"), (4L, "dave")))
    // only the touched buckets were rewritten (a delete-emptied
    // bucket counts: its dir is REMOVED, not rewritten)
    val after = bucketMtimes()
    val changed = (before.keySet ++ after.keySet).filter(k =>
      before.get(k) != after.get(k))
    assert(changed.size == b2 && b2 < 8,
      s"expected $b2 touched buckets, dirs changed: $changed")

    // crash replay: revert the cursor to its pre-fold nb-only form
    // (the real crash window — the bucket count lands BEFORE any
    // fold) and re-sync, even with a DIFFERENT buckets argument: the
    // persisted modulus wins, the same files re-fold, keep-latest
    // converges
    val fs = new org.apache.hadoop.fs.Path(cur)
      .getFileSystem(spark.sessionState.newHadoopConf())
    graft.streaming.AtomicFiles.write(s"$cur/_synced.txt", "8\n",
      spark.sparkContext.hadoopConfiguration)
    val (f3, _) = CurrentTable.sync(spark, sink, cur, Seq("id"),
      buckets = 4) // mismatched arg must NOT change the layout
    assert(f3 == 2) // everything re-folded
    assert(stateOf(cur) == oracleOf(sink))

    // a wholly-missing cursor beside existing bucket dirs is an
    // unknowable modulus — loud failure, never a silent guess
    fs.delete(new org.apache.hadoop.fs.Path(s"$cur/_synced.txt"), false)
    val e = intercept[IllegalArgumentException] {
      CurrentTable.sync(spark, sink, cur, Seq("id"), buckets = 8)
    }
    assert(e.getMessage.contains("unknowable"))
  }

  test("an interrupted bucket swap heals on the next sync") {
    val sink = Files.createTempDirectory("graft-ct2-")
      .resolve("sink").toString
    val cur = Files.createTempDirectory("graft-ct2-cur-").toString
    append(sink, Seq((1L, "a", "CREATE", 1000L, "f1", 10L),
      (2L, "b", "CREATE", 1100L, "f1", 20L)))
    CurrentTable.sync(spark, sink, cur, Seq("id"), buckets = 4)
    val fs = new org.apache.hadoop.fs.Path(cur)
      .getFileSystem(spark.sessionState.newHadoopConf())
    // simulate the crash strictly between the two renames of one
    // bucket's swap
    val kb = new java.io.File(cur).listFiles()
      .filter(_.getName.startsWith("kb=")).head.getName
    assert(fs.rename(new org.apache.hadoop.fs.Path(s"$cur/$kb"),
      new org.apache.hadoop.fs.Path(s"$cur/._ct_trash_$kb")))
    // new changes for that bucket's keys (and others): the sync must
    // restore the trash first, then fold
    append(sink, Seq((1L, "a2", "UPDATE", 2000L, "f1", 30L),
      (2L, "b2", "UPDATE", 2100L, "f1", 40L)))
    CurrentTable.sync(spark, sink, cur, Seq("id"))
    assert(stateOf(cur) == Set((1L, "a2"), (2L, "b2")))
    assert(stateOf(cur) == oracleOf(sink))
    assert(!new java.io.File(cur).listFiles()
      .exists(_.getName.contains("_ct_trash")))
  }
}
