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
      rows: Seq[(Long, String, String, Long, String, Long)],
      dt: String = "2024-01-01"): Unit =
    rows.toDF("id", "name", "_op", "_ts", "_binlog_file_internal",
        "_binlog_pos_internal")
      .withColumn("dt", lit(dt))
      .coalesce(1)
      .write.mode("append").partitionBy("dt").parquet(dir)

  private val mysqlOrder = graft.ops.TimeTravel.defaultOrder("mysql")

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
    // bob's DELETE is RETAINED as a tombstone row (hidden by read):
    // what makes any later re-fold of his older CREATE lose the
    // keep-latest rematch instead of resurrecting him
    assert(spark.read.parquet(cur)
      .filter(col("_op") === "DELETE").select("id")
      .collect().map(_.getLong(0)).toSeq == Seq(2L))
    // only the touched buckets were rewritten
    val after = bucketMtimes()
    val changed = (before.keySet ++ after.keySet).filter(k =>
      before.get(k) != after.get(k))
    assert(changed.size == b2 && b2 < 8,
      s"expected $b2 touched buckets, dirs changed: $changed")

    // crash replay: revert the cursor to its pre-fold nb-only form
    // (the real crash window — the bucket count lands BEFORE any
    // fold, the sidecars after) and re-sync, even with a DIFFERENT
    // buckets argument: the persisted modulus wins, the same files
    // re-fold, keep-latest converges
    val fs = new org.apache.hadoop.fs.Path(cur)
      .getFileSystem(spark.sessionState.newHadoopConf())
    graft.streaming.AtomicFiles.write(s"$cur/_synced.txt", "8\n",
      spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(s"$cur/_cursor"), true)
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

  test("a compaction rewrite cannot resurrect a deleted key: the " +
      "re-folded older INSERT loses to the stored tombstone") {
    val sink = Files.createTempDirectory("graft-ct3-")
      .resolve("sink").toString
    val cur = Files.createTempDirectory("graft-ct3-cur-").toString
    // key 1's INSERT lives in dt=2024-01-01; its DELETE in 01-02
    append(sink, Seq((1L, "doomed", "CREATE", 1000L, "f1", 10L),
      (2L, "keeper", "CREATE", 1100L, "f1", 20L)), dt = "2024-01-01")
    append(sink, Seq((1L, "doomed", "DELETE", 2000L, "f1", 30L)),
      dt = "2024-01-02")
    CurrentTable.sync(spark, sink, cur, Seq("id"), buckets = 4)
    assert(stateOf(cur) == Set((2L, "keeper")))
    // compact ONLY the partition holding the older INSERT — new file
    // names, same rows; the DELETE's partition is untouched
    graft.streaming.Compaction.compactPartitions(spark, sink,
      Seq("2024-01-01"), 1000000L, mysqlOrder)
    // no cursor swap: the rewritten files look fresh and re-fold —
    // pre-tombstone semantics would merge key 1's INSERT back in
    val (nf, _) = CurrentTable.sync(spark, sink, cur, Seq("id"))
    assert(nf > 0, "rewritten files should have re-folded")
    assert(stateOf(cur) == Set((2L, "keeper")))
    assert(stateOf(cur) == oracleOf(sink))
  }

  test("onSinkRewrite swaps the cursor to rewritten file names so a " +
      "compacted partition never re-folds") {
    val sink = Files.createTempDirectory("graft-ct4-")
      .resolve("sink").toString
    val cur = Files.createTempDirectory("graft-ct4-cur-").toString
    append(sink, Seq((1L, "a", "CREATE", 1000L, "f1", 10L)))
    append(sink, Seq((2L, "b", "CREATE", 1100L, "f1", 20L)))
    CurrentTable.sync(spark, sink, cur, Seq("id"), buckets = 4)
    graft.streaming.Compaction.compactPartitions(spark, sink,
      Seq("2024-01-01"), 1000000L, mysqlOrder)
    // list the rewritten partition's files and swap them in as done
    val dtDir = s"$sink/dt=2024-01-01"
    val added = new java.io.File(dtDir).listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.toString).toSeq
    assert(added.nonEmpty)
    CurrentTable.onSinkRewrite(spark, sink, cur, Seq(dtDir), added)
    assert(CurrentTable.sync(spark, sink, cur, Seq("id")) == ((0, 0)))
    assert(stateOf(cur) == Set((1L, "a"), (2L, "b")))
    // retention shape: prefixes removed with nothing added — the
    // partition's sidecar empties and is deleted outright, leaving
    // no cursor file at all for the vanished partition
    new java.io.File(dtDir).listFiles().foreach(_.delete())
    new java.io.File(dtDir).delete()
    CurrentTable.onSinkRewrite(spark, sink, cur, Seq(dtDir), Nil)
    val sidecars = Option(new java.io.File(s"$cur/_cursor").listFiles())
      .getOrElse(Array.empty).filter(_.getName.endsWith(".txt"))
    assert(sidecars.isEmpty,
      s"cursor should hold no entries, got ${sidecars.mkString(",")}")
    // the root state never carries file entries in the sharded layout
    val rootLines = scala.io.Source.fromFile(s"$cur/_synced.txt")
      .getLines().toVector
    assert(rootLines.tail.forall(_.startsWith("#")),
      s"file entries leaked into the root state: $rootLines")
  }

  test("scoped sync lists only the named partitions; a later full " +
      "sync catches the rest") {
    val sink = Files.createTempDirectory("graft-ct5-")
      .resolve("sink").toString
    val cur = Files.createTempDirectory("graft-ct5-cur-").toString
    append(sink, Seq((1L, "a", "CREATE", 1000L, "f1", 10L)),
      dt = "2024-01-01")
    // FIRST sync ignores scope — history may live anywhere
    CurrentTable.sync(spark, sink, cur, Seq("id"), buckets = 4,
      scope = Some(Seq("dt=2024-01-01")))
    assert(stateOf(cur) == Set((1L, "a")))
    append(sink, Seq((1L, "a2", "UPDATE", 2000L, "f1", 20L)),
      dt = "2024-01-01")
    append(sink, Seq((2L, "b", "CREATE", 2100L, "f1", 30L)),
      dt = "2024-01-02")
    // scoped to 01-01: folds that partition's new file only
    val (nf, _) = CurrentTable.sync(spark, sink, cur, Seq("id"),
      scope = Some(Seq("dt=2024-01-01")))
    assert(nf == 1)
    assert(stateOf(cur) == Set((1L, "a2")))
    // unscoped: the 01-02 file it skipped folds now
    val (nf2, _) = CurrentTable.sync(spark, sink, cur, Seq("id"))
    assert(nf2 == 1)
    assert(stateOf(cur) == Set((1L, "a2"), (2L, "b")))
    assert(stateOf(cur) == oracleOf(sink))
  }

  test("pruneTombstones reclaims only tombstones older than the " +
      "horizon, atomically per bucket") {
    val sink = Files.createTempDirectory("graft-ct6-")
      .resolve("sink").toString
    val cur = Files.createTempDirectory("graft-ct6-cur-").toString
    append(sink, Seq(
      (1L, "a", "CREATE", 1000L, "f1", 10L),
      (1L, "a", "DELETE", 1500L, "f1", 20L),
      (2L, "b", "CREATE", 1600L, "f1", 30L),
      (2L, "b", "DELETE", 2500L, "f1", 40L),
      (3L, "c", "CREATE", 2600L, "f1", 50L)))
    CurrentTable.sync(spark, sink, cur, Seq("id"), buckets = 4)
    assert(stateOf(cur) == Set((3L, "c")))
    assert(spark.read.parquet(cur)
      .filter(col("_op") === "DELETE").count() == 2)
    // horizon between the two deletes: only key 1's goes
    assert(CurrentTable.pruneTombstones(spark, cur, 2000L) == 1L)
    assert(spark.read.parquet(cur)
      .filter(col("_op") === "DELETE").select("id")
      .collect().map(_.getLong(0)).toSeq == Seq(2L))
    assert(stateOf(cur) == Set((3L, "c"))) // live rows untouched
    assert(CurrentTable.pruneTombstones(spark, cur, 2000L) == 0L)
    // no swap debris
    assert(!new java.io.File(cur).listFiles()
      .exists(f => f.getName.contains("_ct_trash") ||
        f.getName.contains("_ct_stage")))
    // a crash mid-prune-swap heals at the NEXT prune entry, even with
    // no fresh sink files to drive a sync there (prune never advances
    // the cursor, so sync's early return would never reach its heal)
    val fs = new org.apache.hadoop.fs.Path(cur)
      .getFileSystem(spark.sessionState.newHadoopConf())
    val kb = new java.io.File(cur).listFiles()
      .filter(_.getName.startsWith("kb=")).head.getName
    assert(fs.rename(new org.apache.hadoop.fs.Path(s"$cur/$kb"),
      new org.apache.hadoop.fs.Path(s"$cur/._ct_trash_$kb")))
    assert(CurrentTable.pruneTombstones(spark, cur, 2000L) == 0L)
    assert(new java.io.File(s"$cur/$kb").exists(), "prune did not heal")
    assert(stateOf(cur) == Set((3L, "c")))
    // ...and at sync entry, BEFORE the no-fresh-files early return
    assert(fs.rename(new org.apache.hadoop.fs.Path(s"$cur/$kb"),
      new org.apache.hadoop.fs.Path(s"$cur/._ct_trash_$kb")))
    assert(CurrentTable.sync(spark, sink, cur, Seq("id")) == ((0, 0)))
    assert(new java.io.File(s"$cur/$kb").exists(), "sync did not heal")
  }

  test("lookup reads only the buckets the keys hash into; tombstoned " +
      "keys do not match") {
    val sink = Files.createTempDirectory("graft-ct8-")
      .resolve("sink").toString
    val cur = Files.createTempDirectory("graft-ct8-cur-").toString
    append(sink, Seq(
      (1L, "a", "CREATE", 1000L, "f1", 10L),
      (2L, "b", "CREATE", 1100L, "f1", 20L),
      (3L, "c", "CREATE", 1200L, "f1", 30L),
      (4L, "d", "CREATE", 1300L, "f1", 40L),
      (2L, "b", "DELETE", 2000L, "f1", 50L)))
    CurrentTable.sync(spark, sink, cur, Seq("id"), buckets = 8)
    val keys = Seq(1L, 2L, 9L).toDF("id") // live, deleted, never-seen
    val got = CurrentTable.lookup(spark, cur, Seq("id"), keys)
    assert(got.select("id", "name").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet == Set((1L, "a")))
    // the scan read ONLY the buckets the probe keys hash into — the
    // layout prune, visible through the frame's input files
    val nBuckets = new java.io.File(cur).listFiles()
      .count(_.getName.startsWith("kb="))
    val readBuckets = got.inputFiles
      .flatMap(_.split('/').find(_.startsWith("kb="))).toSet
    assert(readBuckets.size <= 3 && readBuckets.size < nBuckets,
      s"no bucket prune: read $readBuckets of $nBuckets")
    // empty key set / all-unknown keys yield an empty, well-shaped frame
    assert(CurrentTable.lookup(spark, cur, Seq("id"),
      Seq(99L).toDF("id")).count() == 0)
    // shape mismatch fails loudly
    val e = intercept[IllegalArgumentException] {
      CurrentTable.lookup(spark, cur, Seq("id"),
        Seq((1L, "x")).toDF("id", "extra"))
    }
    assert(e.getMessage.contains("key columns"))
    // probe types: the bucket hash keys on the STRING RENDERING of
    // the key (concat_ws), so an int probe of a long column renders
    // — and hashes — identically and must WORK...
    assert(CurrentTable.lookup(spark, cur, Seq("id"), Seq(1).toDF("id"))
      .select("name").collect().map(_.getString(0)).toSeq == Seq("a"))
    // ...while a type whose rendering can diverge (double 1.0 → "1.0"
    // vs long 1 → "1" — wrong bucket, silent miss) fails loudly
    val te = intercept[IllegalArgumentException] {
      CurrentTable.lookup(spark, cur, Seq("id"), Seq(1.0).toDF("id"))
    }
    assert(te.getMessage.contains("rendering"))
    // a cursor-only table (nothing folded yet) is loud, not a crash
    // deep in schema inference
    val empty = Files.createTempDirectory("graft-ct8e-").toString
    graft.streaming.AtomicFiles.write(s"$empty/_synced.txt", "8\n",
      spark.sparkContext.hadoopConfiguration)
    val ee = intercept[IllegalStateException] {
      CurrentTable.lookup(spark, empty, Seq("id"), Seq(1L).toDF("id"))
    }
    assert(ee.getMessage.contains("no data"))
  }

  test("a fold writes ONE file per touched bucket, not one per " +
      "upstream task") {
    import spark.implicits._
    val sink = Files.createTempDirectory("graft-ct9-")
      .resolve("sink").toString
    val cur = Files.createTempDirectory("graft-ct9-cur-").toString
    // enough keys that the pk-hash shuffle spreads every bucket's
    // rows across many tasks — without the kb repartition the write
    // emits tasks × buckets files
    spark.range(2000)
      .select(col("id"), concat(lit("v"), col("id")).as("name"),
        lit("UPDATE").as("_op"), (lit(1000L) + col("id")).as("_ts"),
        lit("f1").as("_binlog_file_internal"),
        col("id").as("_binlog_pos_internal"),
        lit("2024-01-01").as("dt"))
      .write.mode("append").partitionBy("dt").parquet(sink)
    CurrentTable.sync(spark, sink, cur, Seq("id"), buckets = 4)
    for (d <- new java.io.File(cur).listFiles()
        if d.getName.startsWith("kb=")) {
      val files = d.listFiles()
        .count(f => f.getName.endsWith(".parquet"))
      assert(files == 1, s"${d.getName}: $files files (want 1)")
    }
    assert(CurrentTable.read(spark, cur).count() == 2000)
  }

  test("a scoped sync touches ONLY the batch partitions' cursor " +
      "sidecars — per-batch cursor IO is delta-sized, not table-sized") {
    val sink = Files.createTempDirectory("graft-ct10-")
      .resolve("sink").toString
    val cur = Files.createTempDirectory("graft-ct10-cur-").toString
    // history across many partitions
    for (d <- 1 to 8)
      append(sink, Seq((d.toLong, s"v$d", "CREATE", 1000L + d, "f1",
        d.toLong)), dt = f"2024-01-$d%02d")
    CurrentTable.sync(spark, sink, cur, Seq("id"), buckets = 4)
    val cursorFiles = new java.io.File(s"$cur/_cursor").listFiles()
      .filter(_.getName.endsWith(".txt"))
    assert(cursorFiles.length == 8, "one sidecar per partition")
    val before = cursorFiles.map(f => f.getName -> f.lastModified()).toMap
    Thread.sleep(1100) // mtime granularity
    // a delta in ONE partition, scoped sync
    append(sink, Seq((1L, "v1b", "UPDATE", 9000L, "f1", 100L)),
      dt = "2024-01-01")
    val (nf, _) = CurrentTable.sync(spark, sink, cur, Seq("id"),
      scope = Some(Seq("dt=2024-01-01")))
    assert(nf == 1)
    val after = new java.io.File(s"$cur/_cursor").listFiles()
      .filter(_.getName.endsWith(".txt"))
      .map(f => f.getName -> f.lastModified()).toMap
    val rewritten = after.keySet.filter(k =>
      before.get(k) != after.get(k))
    assert(rewritten == Set("dt=2024-01-01.txt"),
      s"scoped sync rewrote sidecars $rewritten")
    assert(stateOf(cur) == oracleOf(sink))
  }

  test("legacy whole-table cursor migrates into per-partition " +
      "sidecars without re-folding anything") {
    val sink = Files.createTempDirectory("graft-ct11-")
      .resolve("sink").toString
    val cur = Files.createTempDirectory("graft-ct11-cur-").toString
    append(sink, Seq((1L, "a", "CREATE", 1000L, "f1", 10L)),
      dt = "2024-01-01")
    append(sink, Seq((2L, "b", "CREATE", 1100L, "f1", 20L)),
      dt = "2024-01-02")
    CurrentTable.sync(spark, sink, cur, Seq("id"), buckets = 4)
    // rewrite the cursor in the PRE-SHARDING format: nb + all file
    // entries in the root, no _cursor dir
    val entries = new java.io.File(s"$cur/_cursor").listFiles()
      .filter(_.getName.endsWith(".txt"))
      .flatMap(f => scala.io.Source.fromFile(f).getLines())
      .filter(_.trim.nonEmpty).toVector
    assert(entries.size == 2)
    val fs = new org.apache.hadoop.fs.Path(cur)
      .getFileSystem(spark.sessionState.newHadoopConf())
    fs.delete(new org.apache.hadoop.fs.Path(s"$cur/_cursor"), true)
    graft.streaming.AtomicFiles.write(s"$cur/_synced.txt",
      ("4" +: entries).mkString("\n"),
      spark.sparkContext.hadoopConfiguration)
    // next sync migrates — and folds NOTHING (the entries were done)
    assert(CurrentTable.sync(spark, sink, cur, Seq("id")) == ((0, 0)))
    val migrated = new java.io.File(s"$cur/_cursor").listFiles()
      .filter(_.getName.endsWith(".txt")).map(_.getName).toSet
    assert(migrated == Set("dt=2024-01-01.txt", "dt=2024-01-02.txt"))
    val rootLines = scala.io.Source.fromFile(s"$cur/_synced.txt")
      .getLines().toVector
    assert(rootLines.tail.forall(_.startsWith("#")),
      s"legacy entries not cleaned from root: $rootLines")
    assert(stateOf(cur) == oracleOf(sink))
  }

  test("sync drops cursor entries for vanished files — an unreported " +
      "compaction cannot grow the cursor forever") {
    val sink = Files.createTempDirectory("graft-ct12-")
      .resolve("sink").toString
    val cur = Files.createTempDirectory("graft-ct12-cur-").toString
    append(sink, Seq((1L, "a", "CREATE", 1000L, "f1", 10L)))
    append(sink, Seq((2L, "b", "CREATE", 1100L, "f1", 20L)))
    CurrentTable.sync(spark, sink, cur, Seq("id"), buckets = 4)
    def sidecarEntries(): Set[String] =
      new java.io.File(s"$cur/_cursor").listFiles()
        .filter(_.getName.endsWith(".txt"))
        .flatMap(f => scala.io.Source.fromFile(f).getLines())
        .filter(_.trim.nonEmpty).toSet
    val old = sidecarEntries()
    assert(old.size == 2)
    // compact WITHOUT the onSinkRewrite hook: old names vanish, new
    // names appear, the cursor still lists the dead ones
    graft.streaming.Compaction.compactPartitions(spark, sink,
      Seq("2024-01-01"), 1000000L, mysqlOrder)
    // the next sync re-lists the partition in full: the rewritten
    // file folds as fresh (tombstones make that safe) and the dead
    // entries drop in the same pass
    val (nf, _) = CurrentTable.sync(spark, sink, cur, Seq("id"),
      scope = Some(Seq("dt=2024-01-01")))
    assert(nf > 0)
    val now = sidecarEntries()
    assert(now.intersect(old).isEmpty,
      s"dead cursor entries survived: ${now.intersect(old)}")
    assert(stateOf(cur) == oracleOf(sink))
    // ...and the no-fresh-work path drops dead entries too: delete a
    // file out-of-band, sync again
    val f = new java.io.File(s"$sink/dt=2024-01-01").listFiles()
      .filter(_.getName.endsWith(".parquet")).head
    assert(f.delete())
    assert(CurrentTable.sync(spark, sink, cur, Seq("id"),
      scope = Some(Seq("dt=2024-01-01"))) == ((0, 0)))
    assert(!sidecarEntries().exists(_.endsWith(f.getName)),
      "vanished file's entry survived a no-op sync")
  }

  test("an oversized probe frame falls back to the full semi-join " +
      "instead of collecting keys to the driver") {
    val sink = Files.createTempDirectory("graft-ct13-")
      .resolve("sink").toString
    val cur = Files.createTempDirectory("graft-ct13-cur-").toString
    append(sink, (1 to 40).map(i =>
      (i.toLong, s"v$i", "CREATE", 1000L + i, "f1", i.toLong)))
    CurrentTable.sync(spark, sink, cur, Seq("id"), buckets = 8)
    val probe = (1 to 10).map(_.toLong).toDF("id")
    // small bound → fallback path; result still exact
    val got = CurrentTable.lookup(spark, cur, Seq("id"), probe,
      maxDriverKeys = 4)
    assert(got.select("id").collect().map(_.getLong(0)).toSet ==
      (1L to 10L).toSet)
    // the fallback scans every bucket (no driver-side plan to prune
    // with) — that's the documented trade
    val readBuckets = got.inputFiles
      .flatMap(_.split('/').find(_.startsWith("kb="))).toSet
    assert(readBuckets.size == 8, s"fallback should scan all: $readBuckets")
    // same probe above the bound uses the pruned path
    val pruned = CurrentTable.lookup(spark, cur, Seq("id"),
      Seq(1L).toDF("id"), maxDriverKeys = 4)
    assert(pruned.inputFiles
      .flatMap(_.split('/').find(_.startsWith("kb="))).toSet.size == 1)
  }

  test("read and lookup refuse a table with a crashed bucket swap " +
      "instead of silently dropping its keys; heal restores it") {
    val sink = Files.createTempDirectory("graft-ct14-")
      .resolve("sink").toString
    val cur = Files.createTempDirectory("graft-ct14-cur-").toString
    append(sink, Seq((1L, "a", "CREATE", 1000L, "f1", 10L),
      (2L, "b", "CREATE", 1100L, "f1", 20L),
      (3L, "c", "CREATE", 1200L, "f1", 30L)))
    CurrentTable.sync(spark, sink, cur, Seq("id"), buckets = 4)
    val fs = new org.apache.hadoop.fs.Path(cur)
      .getFileSystem(spark.sessionState.newHadoopConf())
    val kb = new java.io.File(cur).listFiles()
      .filter(_.getName.startsWith("kb=")).head.getName
    assert(fs.rename(new org.apache.hadoop.fs.Path(s"$cur/$kb"),
      new org.apache.hadoop.fs.Path(s"$cur/._ct_trash_$kb")))
    val re = intercept[IllegalStateException] {
      CurrentTable.read(spark, cur).count()
    }
    assert(re.getMessage.contains("heal"))
    val le = intercept[IllegalStateException] {
      CurrentTable.lookup(spark, cur, Seq("id"), Seq(1L).toDF("id"))
        .count()
    }
    assert(le.getMessage.contains("heal"))
    CurrentTable.heal(spark, cur)
    assert(stateOf(cur) == Set((1L, "a"), (2L, "b"), (3L, "c")))
  }

  test("the tombstone census keeps young-tombstone prunes from " +
      "scanning any bucket, and self-heals on census-less tables") {
    val sink = Files.createTempDirectory("graft-ct15-")
      .resolve("sink").toString
    val cur = Files.createTempDirectory("graft-ct15-cur-").toString
    append(sink, Seq(
      (1L, "a", "CREATE", 1000L, "f1", 10L),
      (1L, "a", "DELETE", 5000L, "f1", 20L),
      (2L, "b", "CREATE", 1100L, "f1", 30L)))
    CurrentTable.sync(spark, sink, cur, Seq("id"), buckets = 4)
    def rootText(): String =
      scala.io.Source.fromFile(s"$cur/_synced.txt").mkString
    // the sync maintained the census: the tombstone's bucket and min
    assert(rootText().contains("#tomb"), s"no census in: ${rootText()}")
    assert(rootText().contains("=5000"), s"census missing ts: ${rootText()}")
    // horizon below every tombstone: zero buckets rewritten, and the
    // census is what proves the scan never ran (bucket mtimes still)
    def bucketMtimes(): Map[String, Long] =
      new java.io.File(cur).listFiles()
        .filter(_.getName.startsWith("kb="))
        .map(d => d.getName -> d.lastModified()).toMap
    val before = bucketMtimes()
    assert(CurrentTable.pruneTombstones(spark, cur, 2000L) == 0L)
    assert(bucketMtimes() == before, "young-tombstone prune touched buckets")
    // past the horizon: reclaimed, census entry dropped
    assert(CurrentTable.pruneTombstones(spark, cur, 9000L) == 1L)
    assert(!rootText().contains("=5000"),
      s"census kept a pruned tombstone: ${rootText()}")
    // census-less legacy root: prune full-scans once and births it
    val nbLine = rootText().linesIterator.next()
    graft.streaming.AtomicFiles.write(s"$cur/_synced.txt", nbLine,
      spark.sparkContext.hadoopConfiguration)
    append(sink, Seq((2L, "b", "DELETE", 7000L, "f1", 40L)))
    CurrentTable.sync(spark, sink, cur, Seq("id"))
    assert(!rootText().contains("#tomb"),
      "census must stay absent until a prune scan heals it")
    assert(CurrentTable.pruneTombstones(spark, cur, 6000L) == 0L)
    assert(rootText().contains("#tomb") && rootText().contains("=7000"),
      s"prune did not heal the census: ${rootText()}")
  }

  test("readEvolved merges maintained current tables across schema " +
      "forks: latest change wins, fork tombstones keep base keys dead") {
    val root = Files.createTempDirectory("graft-ct-evo-").toString
    val base = s"$root/s1_db__t"
    val fork = s"$root/s1_db__t_v20240401"
    // base era (no `extra` column): four keys, one deleted in-era
    append(base, Seq(
      (1L, "a1", "CREATE", 1000L, "f1", 10L),
      (2L, "b1", "CREATE", 1100L, "f1", 20L),
      (3L, "c1", "CREATE", 1200L, "f1", 30L),
      (4L, "d1", "CREATE", 1300L, "f1", 40L),
      (4L, "d1", "DELETE", 1400L, "f1", 50L)))
    // fork era ADDS a column: key 2 updated (fork row must win), key 3
    // DELETED post-fork (must stay dead despite its live base row)
    Seq((2L, "b2", "x", "UPDATE", 2000L, "f1", 60L),
        (3L, "c1", "x", "DELETE", 2100L, "f1", 70L))
      .toDF("id", "name", "extra", "_op", "_ts",
        "_binlog_file_internal", "_binlog_pos_internal")
      .withColumn("dt", lit("2024-04-01"))
      .coalesce(1).write.mode("append").partitionBy("dt").parquet(fork)
    // each fork maintains its OWN current table — required, loudly
    CurrentTable.sync(spark, base, s"${base}__current", Seq("id"),
      buckets = 4)
    val missing = intercept[IllegalArgumentException] {
      CurrentTable.readEvolved(spark, root, "s1", "db", "t", Seq("id"))
    }
    assert(missing.getMessage.contains("no maintained current table"))
    CurrentTable.sync(spark, fork, s"${fork}__current", Seq("id"),
      buckets = 4)
    val got = CurrentTable.readEvolved(spark, root, "s1", "db", "t",
        Seq("id"))
      .select("id", "name", "extra", "_table_version").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getString(3))).toSet
    assert(got == Set(
      (1L, "a1", null, "base"),      // untouched since the fork
      (2L, "b2", "x", "v20240401"))) // fork row wins; 3 and 4 dead
    // matches the full-log cross-fork oracle
    val oracle = graft.ops.EvolvedRead.stateAll(spark, root, "s1",
        "db", "t", Seq("id"), Long.MaxValue)
      .select("id", "name", "extra", "_table_version").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getString(3))).toSet
    assert(got == oracle)

    // lookupEvolved on the same table: probing keys 1/2/3 returns
    // exactly readEvolved restricted to those keys — key 3's
    // post-fork tombstone must reach the cross-fork keep-latest (a
    // per-fork FILTERED lookup would revive its live base row)
    val probe = Seq(1L, 2L, 3L).toDF("id")
    val looked = CurrentTable.lookupEvolved(spark, root, "s1", "db",
        "t", Seq("id"), probe)
      .select("id", "name", "extra", "_table_version").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getString(3))).toSet
    assert(looked == Set(
      (1L, "a1", null, "base"),
      (2L, "b2", "x", "v20240401")),
      s"lookupEvolved mismatch: $looked")
    // ...and reads only the probed buckets of each fork, not the
    // whole tables
    val lookedDf = CurrentTable.lookupEvolved(spark, root, "s1", "db",
      "t", Seq("id"), probe)
    val perFork = lookedDf.inputFiles
      .groupBy(f => if (f.contains("_v20240401")) "fork" else "base")
      .view.mapValues(_.flatMap(_.split('/').find(_.startsWith("kb=")))
        .toSet).toMap
    assert(perFork.values.forall(_.size <= 3),
      s"lookup should prune to <= probe-count buckets: $perFork")
    // an oversized probe falls back to the full evolved read —
    // same rows, every bucket scanned
    val fb = CurrentTable.lookupEvolved(spark, root, "s1", "db", "t",
      Seq("id"), probe, maxDriverKeys = 2)
    assert(fb.select("id", "name", "extra", "_table_version").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getString(3))).toSet == looked)
  }

  test("a prepared EvolvedReader matches lookupEvolved through a " +
      "schedule with a mid-run fork, per-fork folds, a rescale and " +
      "post-fork deletes") {
    val root = Files.createTempDirectory("graft-ct-evr-").toString
    val base = s"$root/s1_db__t"
    val fork = s"$root/s1_db__t_v20240401"
    append(base, Seq(
      (1L, "a1", "CREATE", 1000L, "f1", 10L),
      (2L, "b1", "CREATE", 1100L, "f1", 20L),
      (3L, "c1", "CREATE", 1200L, "f1", 30L)))
    CurrentTable.sync(spark, base, s"${base}__current", Seq("id"),
      buckets = 4)
    val rd = CurrentTable.evolvedReader(spark, root, "s1", "db", "t",
      Seq("id"))
    def both(ids: Long*): Set[(Long, String, String)] = {
      def shape(df: org.apache.spark.sql.DataFrame) =
        df.select("id", "name", "_table_version").collect()
          .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
      val held = shape(rd.lookup(ids.toDF("id")))
      val oneShot = shape(CurrentTable.lookupEvolved(spark, root, "s1",
        "db", "t", Seq("id"), ids.toDF("id")))
      assert(held == oneShot, s"handle diverged: $held vs $oneShot")
      held
    }
    assert(both(1L, 2L, 99L) == Set((1L, "a1", "base"), (2L, "b1", "base")))
    // MID-RUN FORK: a new evolution fork (extra column) lands between
    // calls — the handle's per-call fork listing must pick it up,
    // including its tombstone for key 3 outranking the live base row
    Seq((2L, "b2", "x", "UPDATE", 2000L, "f1", 60L),
        (3L, "c1", "x", "DELETE", 2100L, "f1", 70L))
      .toDF("id", "name", "extra", "_op", "_ts",
        "_binlog_file_internal", "_binlog_pos_internal")
      .withColumn("dt", lit("2024-04-01"))
      .coalesce(1).write.mode("append").partitionBy("dt").parquet(fork)
    CurrentTable.sync(spark, fork, s"${fork}__current", Seq("id"),
      buckets = 4)
    assert(both(1L, 2L, 3L) ==
      Set((1L, "a1", "base"), (2L, "b2", "v20240401")))
    // a fold on ONE fork only: that fork's root signature re-prepares
    // its reader; the other fork's stays cached
    Seq((4L, "d2", "y", "CREATE", 3000L, "f1", 80L))
      .toDF("id", "name", "extra", "_op", "_ts",
        "_binlog_file_internal", "_binlog_pos_internal")
      .withColumn("dt", lit("2024-04-02"))
      .coalesce(1).write.mode("append").partitionBy("dt").parquet(fork)
    CurrentTable.sync(spark, fork, s"${fork}__current", Seq("id"))
    assert(both(3L, 4L) == Set((4L, "d2", "v20240401")))
    // a rescale on the BASE fork: the handle replans under the new
    // modulus without help
    CurrentTable.rescale(spark, s"${base}__current", Seq("id"), 9)
    assert(both(1L, 2L, 4L) == Set((1L, "a1", "base"),
      (2L, "b2", "v20240401"), (4L, "d2", "v20240401")))
    // oversized probe: the readEvolved fallback, same rows
    def shape(df: org.apache.spark.sql.DataFrame) =
      df.select("id", "name", "_table_version").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
    assert(shape(rd.lookup((1L to 5L).toDF("id"), maxDriverKeys = 2))
      == Set((1L, "a1", "base"), (2L, "b2", "v20240401"),
        (4L, "d2", "v20240401")))
    // probe stays bucket-pruned per fork (the handle must not have
    // traded the prune away for its caching)
    val perFork = rd.lookup(Seq(1L, 2L).toDF("id")).inputFiles
      .groupBy(f => if (f.contains("_v20240401")) "fork" else "base")
      .view.mapValues(_.flatMap(_.split('/').find(_.startsWith("kb=")))
        .toSet).toMap
    assert(perFork.values.forall(_.size <= 2),
      s"lookup should prune to <= probe-count buckets: $perFork")
  }

  test("pruneCursorExpired sweeps date-partition entries past the " +
      "horizon, keeping non-date buckets") {
    val sink = Files.createTempDirectory("graft-ct7-")
      .resolve("sink").toString
    val cur = Files.createTempDirectory("graft-ct7-cur-").toString
    append(sink, Seq((1L, "a", "CREATE", 1000L, "f1", 10L)),
      dt = "2023-01-01")
    append(sink, Seq((2L, "b", "CREATE", 1100L, "f1", 20L)),
      dt = "2024-06-01")
    append(sink, Seq((3L, "c", "CREATE", 1200L, "f1", 30L)),
      dt = "static") // fixed-bucket-style value: never expires
    CurrentTable.sync(spark, sink, cur, Seq("id"), buckets = 4)
    def cursorSize(): Int =
      Option(new java.io.File(s"$cur/_cursor").listFiles())
        .getOrElse(Array.empty).filter(_.getName.endsWith(".txt"))
        .map(f => scala.io.Source.fromFile(f).getLines()
          .count(_.trim.nonEmpty)).sum
    assert(cursorSize() == 3)
    // horizon between the two dates: only the 2023 entry goes —
    // even though its partition was deleted out-of-band (the crashed
    // retention-run shape: partitions gone, cursor hook never ran)
    val fs = new org.apache.hadoop.fs.Path(sink)
      .getFileSystem(spark.sessionState.newHadoopConf())
    fs.delete(new org.apache.hadoop.fs.Path(s"$sink/dt=2023-01-01"), true)
    assert(CurrentTable.pruneCursorExpired(spark, cur, "2024-01-01") == 1)
    assert(cursorSize() == 2)
    assert(CurrentTable.pruneCursorExpired(spark, cur, "2024-01-01") == 0)
    // the table itself is untouched; a later full sync stays converged
    assert(CurrentTable.sync(spark, sink, cur, Seq("id")) == ((0, 0)))
    assert(stateOf(cur) == Set((1L, "a"), (2L, "b"), (3L, "c")))
  }

  test("a file nested deeper under a dt= partition shards with the " +
      "partition's sidecar, and _root entries survive scoped syncs") {
    val sink = Files.createTempDirectory("graft-ct16-")
      .resolve("sink").toString
    val cur = Files.createTempDirectory("graft-ct16-cur-").toString
    append(sink, Seq((1L, "a", "CREATE", 1000L, "f1", 10L),
      (2L, "b", "CREATE", 1100L, "f1", 20L)))
    CurrentTable.sync(spark, sink, cur, Seq("id"), buckets = 4)
    // a compactor-style writer nests a file under the partition:
    // copy an already-folded file one level down — re-folding it is
    // idempotent, so only its CURSOR placement is at stake
    val part = new java.io.File(s"$sink/dt=2024-01-01")
    val src = part.listFiles().filter(_.getName.endsWith(".parquet")).head
    val sub = new java.io.File(part, "sub"); sub.mkdirs()
    java.nio.file.Files.copy(src.toPath,
      new java.io.File(sub, "nested.parquet").toPath)
    val (f2, _) = CurrentTable.sync(spark, sink, cur, Seq("id"),
      scope = Some(Seq("dt=2024-01-01")))
    assert(f2 == 1, "the nested file should fold as fresh")
    def sidecar(name: String): Seq[String] = {
      val f = new java.io.File(s"$cur/_cursor/$name")
      if (!f.exists()) Nil
      else scala.io.Source.fromFile(f).getLines()
        .filter(_.trim.nonEmpty).toSeq
    }
    // sharded with its FIRST dt= component, never _root — a scoped
    // sync's gc would otherwise intersect _root against a partial
    // listing and drop live entries
    assert(sidecar("dt=2024-01-01.txt").exists(_.contains("nested")),
      "nested file must land in its partition's sidecar")
    assert(sidecar("_root.txt").isEmpty)
    assert(stateOf(cur) == oracleOf(sink))

    // a genuine _root file (outside any dt= partition, dt as a data
    // column): folds on a FULL sync into _root.txt...
    Seq((3L, "c", "CREATE", 1200L, "f1", 30L))
      .toDF("id", "name", "_op", "_ts", "_binlog_file_internal",
        "_binlog_pos_internal")
      .withColumn("dt", lit("2024-01-01")).coalesce(1)
      .write.mode("append").parquet(s"$sink/flat")
    CurrentTable.sync(spark, sink, cur, Seq("id"))
    val rootEntries = sidecar("_root.txt")
    assert(rootEntries.nonEmpty, "flat file should shard to _root")
    // ...and a later SCOPED sync — whose listing never walks the flat
    // dir — must leave those _root entries alone
    append(sink, Seq((4L, "d", "CREATE", 1300L, "f1", 40L)))
    CurrentTable.sync(spark, sink, cur, Seq("id"),
      scope = Some(Seq("dt=2024-01-01")))
    assert(sidecar("_root.txt") == rootEntries,
      "scoped sync must not gc _root against its partial listing")
    // the flat file never re-folds on the next full walk
    assert(CurrentTable.sync(spark, sink, cur, Seq("id")) == ((0, 0)))
    assert(stateOf(cur) == Set((1L, "a"), (2L, "b"), (3L, "c"), (4L, "d")))
  }

  test("pre-r13 cursor entries for nested files migrate to their " +
      "partition's sidecar without re-folding anything") {
    val sink = Files.createTempDirectory("graft-ct20-")
      .resolve("sink").toString
    val cur = Files.createTempDirectory("graft-ct20-cur-").toString
    append(sink, Seq((1L, "a", "CREATE", 1000L, "f1", 10L)))
    CurrentTable.sync(spark, sink, cur, Seq("id"), buckets = 4)
    val part = new java.io.File(s"$sink/dt=2024-01-01")
    val src = part.listFiles().filter(_.getName.endsWith(".parquet")).head
    val sub = new java.io.File(part, "sub"); sub.mkdirs()
    java.nio.file.Files.copy(src.toPath,
      new java.io.File(sub, "nested.parquet").toPath)
    CurrentTable.sync(spark, sink, cur, Seq("id"))
    // reconstruct the PRE-r13 layout: the nested file's entry keyed
    // by immediate parent, i.e. sitting in _root.txt
    def lines(f: java.io.File): Seq[String] =
      scala.io.Source.fromFile(f).getLines().filter(_.trim.nonEmpty).toSeq
    // through the hadoop fs, not raw java.io: the local fs keeps .crc
    // sidecars that a raw rewrite would invalidate
    def write(f: java.io.File, ls: Seq[String]): Unit =
      graft.streaming.AtomicFiles.write(f.toString, ls.mkString("\n"),
        spark.sparkContext.hadoopConfiguration)
    val dtSc = new java.io.File(s"$cur/_cursor/dt=2024-01-01.txt")
    val rootSc = new java.io.File(s"$cur/_cursor/_root.txt")
    val (nested, rest) = lines(dtSc).partition(_.contains("nested"))
    assert(nested.size == 1, s"fixture: $nested")
    write(dtSc, rest)
    write(rootSc, nested)
    // a sync must MIGRATE the entry — zero files re-folded (a re-fold
    // would resurrect deleted keys on tables whose tombstones were
    // pruned under the old folded-files-never-re-fold contract)
    assert(CurrentTable.sync(spark, sink, cur, Seq("id")) == ((0, 0)))
    assert(lines(dtSc).exists(_.contains("nested")),
      "entry must land in its partition's sidecar")
    assert(!rootSc.exists(), "_root must drop the migrated entry")
    // same through a SCOPED sync (the batch-steady-state path)
    write(dtSc, rest)
    write(rootSc, nested)
    assert(CurrentTable.sync(spark, sink, cur, Seq("id"),
      scope = Some(Seq("dt=2024-01-01"))) == ((0, 0)))
    assert(lines(dtSc).exists(_.contains("nested")) && !rootSc.exists())
    assert(stateOf(cur) == Set((1L, "a")))
  }

  test("within-bucket order: every rewrite (fold and prune) leaves " +
      "each bucket file sorted; the order persists like the bucket count") {
    val sink = Files.createTempDirectory("graft-ct21-")
      .resolve("sink").toString
    val cur = Files.createTempDirectory("graft-ct21-cur-").toString
    // shuffled _ts values so a sorted file cannot happen by accident
    append(sink, (1 to 60).map(i =>
      (i.toLong, s"v$i", if (i == 5) "DELETE" else "CREATE",
        1000L + ((i * 37) % 60), "f1", i.toLong)))
    CurrentTable.sync(spark, sink, cur, Seq("id"), buckets = 4,
      orderBy = Seq("_ts"))
    def bucketFiles(): Seq[java.io.File] =
      new java.io.File(cur).listFiles().filter(_.getName.startsWith("kb="))
        .flatMap(_.listFiles()).filter(_.getName.endsWith(".parquet")).toSeq
    def assertSorted(why: String): Unit =
      for (f <- bucketFiles()) {
        val ts = spark.read.parquet(f.toString)
          .select("_ts").collect().map(_.getLong(0)).toSeq
        assert(ts == ts.sorted, s"$why: ${f.getName} unsorted: $ts")
      }
    assertSorted("first fold")
    // a later sync WITHOUT the parameter applies the persisted order
    append(sink, (61 to 90).map(i =>
      (i.toLong, s"v$i", "CREATE", 1000L + ((i * 37) % 60), "f1",
        i.toLong)))
    CurrentTable.sync(spark, sink, cur, Seq("id"))
    assertSorted("delta fold")
    // a DIFFERENT explicit order fails loudly (layout constant)
    assert(intercept[IllegalArgumentException] {
      CurrentTable.sync(spark, sink, cur, Seq("id"),
        orderBy = Seq("name"))
    }.getMessage.contains("persisted within-bucket order"))
    // the tombstone prune's rewrite preserves the order
    assert(CurrentTable.pruneTombstones(spark, cur, 5000L) == 1L)
    assertSorted("post-prune")
    assert(stateOf(cur) == oracleOf(sink))
    // recovery: a typo'd FIRST sync persists the bad order but folds
    // nothing — a corrected retry ADOPTS the fix (the order is fixed
    // by data, not the root file alone) instead of wedging the table
    val cur2 = Files.createTempDirectory("graft-ct21b-cur-").toString
    assert(intercept[IllegalArgumentException] {
      CurrentTable.sync(spark, sink, cur2, Seq("id"), buckets = 4,
        orderBy = Seq("nope"))
    }.getMessage.contains("order column"))
    CurrentTable.sync(spark, sink, cur2, Seq("id"), buckets = 4,
      orderBy = Seq("_ts"))
    assert(stateOf(cur2) == oracleOf(sink))
  }

  test("a zero-row fresh file advances the cursor instead of wedging " +
      "every later sync") {
    val sink = Files.createTempDirectory("graft-ct19-")
      .resolve("sink").toString
    val cur = Files.createTempDirectory("graft-ct19-cur-").toString
    append(sink, Seq((1L, "a", "CREATE", 1000L, "f1", 10L)))
    CurrentTable.sync(spark, sink, cur, Seq("id"), buckets = 4)
    // an external writer's empty part file (schema, no rows) lands in
    // the partition: rows to fold = 0 but the file must still be
    // marked done, or it re-lists as fresh forever
    val tmp = Files.createTempDirectory("graft-ct19-empty-").toString
    Seq((1L, "a", "CREATE", 1000L, "f1", 10L))
      .toDF("id", "name", "_op", "_ts", "_binlog_file_internal",
        "_binlog_pos_internal")
      .limit(0).repartition(1).write.parquet(s"$tmp/e")
    val emptyPart = new java.io.File(s"$tmp/e").listFiles()
      .filter(_.getName.endsWith(".parquet"))
    assert(emptyPart.nonEmpty, "fixture: expected an empty part file")
    java.nio.file.Files.copy(emptyPart.head.toPath,
      new java.io.File(s"$sink/dt=2024-01-01/empty.parquet").toPath)
    assert(CurrentTable.sync(spark, sink, cur, Seq("id")) == ((1, 0)))
    // done: the empty file is in the cursor, the next sync is a no-op,
    // and the table still matches the oracle
    assert(CurrentTable.sync(spark, sink, cur, Seq("id")) == ((0, 0)))
    assert(stateOf(cur) == Set((1L, "a")))
  }

  test("a wide fold (more touched buckets than the observe-metric " +
      "cap) still writes the exact tombstone census, off the stage") {
    val sink = Files.createTempDirectory("graft-ct18-")
      .resolve("sink").toString
    val cur = Files.createTempDirectory("graft-ct18-cur-").toString
    // 300 keys over 100 buckets: the first fold touches ~all of them,
    // past CensusObserveMaxMetrics — the stage-aggregate path
    append(sink, (1 to 300).map(i =>
      (i.toLong, s"v$i", if (i == 7) "DELETE" else "CREATE",
        1000L + i, "f1", i.toLong)))
    CurrentTable.sync(spark, sink, cur, Seq("id"), buckets = 100)
    def rootText(): String =
      scala.io.Source.fromFile(s"$cur/_synced.txt").mkString
    assert(rootText().contains("#tomb"), s"no census in: ${rootText()}")
    assert(rootText().contains("=1007"),
      s"wide-fold census missing the delete's ts: ${rootText()}")
    // ...and the narrow follow-up delta keeps it exact via observe
    append(sink, Seq((9L, "x", "DELETE", 5000L, "f1", 400L)))
    CurrentTable.sync(spark, sink, cur, Seq("id"))
    assert(rootText().contains("=5000"), rootText())
    assert(rootText().contains("=1007"), rootText())
    // both census entries prune away past the horizon, exactly
    assert(CurrentTable.pruneTombstones(spark, cur, 9000L) == 2L)
    assert(!rootText().contains("=1007") && !rootText().contains("=5000"),
      rootText())
    assert(stateOf(cur) == oracleOf(sink))
  }

  test("the heal grace window is session-configurable, and the lookup " +
      "probe bound falls back to the session conf when not passed") {
    val sink = Files.createTempDirectory("graft-ct17-")
      .resolve("sink").toString
    val cur = Files.createTempDirectory("graft-ct17-cur-").toString
    append(sink, (1 to 20).map(i =>
      (i.toLong, s"v$i", "CREATE", 1000L + i, "f1", i.toLong)))
    CurrentTable.sync(spark, sink, cur, Seq("id"), buckets = 4)
    // conf-resolved probe bound: 3 keys over a bound of 2 → fallback
    // (scans every bucket); unset → default 10000 → pruned path
    spark.conf.set("spark.graft.current.lookup.maxDriverKeys", "2")
    try {
      val probe = Seq(1L, 2L, 3L).toDF("id")
      val fb = CurrentTable.lookup(spark, cur, Seq("id"), probe)
      assert(fb.inputFiles
        .flatMap(_.split('/').find(_.startsWith("kb="))).toSet.size == 4,
        "conf-bounded lookup should take the full-scan fallback")
    } finally spark.conf.unset("spark.graft.current.lookup.maxDriverKeys")
    val pruned = CurrentTable.lookup(spark, cur, Seq("id"),
      Seq(1L).toDF("id"))
    assert(pruned.inputFiles
      .flatMap(_.split('/').find(_.startsWith("kb="))).toSet.size == 1)
    // heal grace: with the window at 0 a crashed swap fails the read
    // immediately — no 1 s poll (the knob object stores raise instead)
    val fs = new org.apache.hadoop.fs.Path(cur)
      .getFileSystem(spark.sessionState.newHadoopConf())
    val kb = new java.io.File(cur).listFiles()
      .filter(_.getName.startsWith("kb=")).head.getName
    assert(fs.rename(new org.apache.hadoop.fs.Path(s"$cur/$kb"),
      new org.apache.hadoop.fs.Path(s"$cur/._ct_trash_$kb")))
    spark.conf.set("spark.graft.current.healGraceMs", "0")
    try {
      val t0 = System.nanoTime()
      intercept[IllegalStateException] {
        CurrentTable.read(spark, cur).count()
      }
      assert((System.nanoTime() - t0) / 1e6 < 900,
        "grace=0 must not poll before refusing")
    } finally spark.conf.unset("spark.graft.current.healGraceMs")
    CurrentTable.heal(spark, cur)
    assert(CurrentTable.read(spark, cur).count() == 20)
  }

  test("rescale re-buckets a live table: state, census, order and " +
      "later delta syncs survive a grow and a shrink") {
    val sink = Files.createTempDirectory("graft-ct18-")
      .resolve("sink").toString
    val cur = Files.createTempDirectory("graft-ct18-cur-").toString
    append(sink, (1 to 30).map(i =>
      (i.toLong, s"v$i", "CREATE", 1000L + i, "f1", i.toLong)))
    append(sink, Seq((5L, "gone", "DELETE", 2000L, "f1", 100L)))
    CurrentTable.sync(spark, sink, cur, Seq("id"), buckets = 4,
      orderBy = Seq("name"))
    val before = stateOf(cur)
    assert(before == oracleOf(sink))

    // grow 4 → 8: every row must land in its NEW hash bucket, the
    // tombstone census must follow the tombstone to its new bucket,
    // and the persisted within-bucket order must hold in the new files
    assert(CurrentTable.rescale(spark, cur, Seq("id"), 8) == 8)
    val fs = new org.apache.hadoop.fs.Path(cur)
      .getFileSystem(spark.sessionState.newHadoopConf())
    def rootLines() = {
      val in = fs.open(new org.apache.hadoop.fs.Path(s"$cur/_synced.txt"))
      try scala.io.Source.fromInputStream(in, "UTF-8").getLines().toVector
      finally in.close()
    }
    assert(rootLines().head.trim == "8")
    assert(stateOf(cur) == before)
    // layout contract: stored kb equals the hash under the NEW modulus
    // for every row — a drifted row would be invisible to lookup
    val misplaced = spark.read.parquet(cur)
      .filter(col("kb") =!= pmod(xxhash64(concat_ws("\u0001", col("id"))),
        lit(8L)).cast("int"))
      .count()
    assert(misplaced == 0, "rows must sit in their new-modulus bucket")
    // the census moved with the tombstone: a prune past its ts drops
    // it, and ONLY its bucket can have been scanned (young horizon
    // sanity is covered by the census test; here: the drop works)
    assert(CurrentTable.pruneTombstones(spark, cur, 2001L) == 1L)
    // within-bucket order survived: each new bucket file is sorted
    val unsortedBuckets = new java.io.File(cur).listFiles()
      .filter(_.getName.startsWith("kb=")).count { d =>
        val names = spark.read.parquet(d.toString)
          .select("name").collect().map(_.getString(0)).toSeq
        names != names.sorted
      }
    assert(unsortedBuckets == 0, "rescale must preserve the bucket order")

    // the cursor is untouched, so the next delta folds incrementally
    // into the NEW layout
    append(sink, Seq((31L, "new", "CREATE", 3000L, "f1", 200L)))
    val (f, b) = CurrentTable.sync(spark, sink, cur, Seq("id"))
    assert(f == 1 && b < 8)
    assert(stateOf(cur) == oracleOf(sink))
    // bucket-pruned lookup through the new modulus
    val hit = CurrentTable.lookup(spark, cur, Seq("id"),
      Seq(31L).toDF("id"))
    assert(hit.inputFiles
      .flatMap(_.split('/').find(_.startsWith("kb="))).toSet.size == 1)
    assert(hit.select("name").collect().map(_.getString(0)).toSeq ==
      Seq("new"))

    // same count → no-op; shrink 8 → 3 → still the oracle
    assert(CurrentTable.rescale(spark, cur, Seq("id"), 8) == 0)
    assert(CurrentTable.rescale(spark, cur, Seq("id"), 3) == 3)
    assert(rootLines().head.trim == "3")
    assert(new java.io.File(cur).listFiles()
      .count(_.getName.startsWith("kb=")) <= 3)
    assert(stateOf(cur) == oracleOf(sink))
  }

  test("a rescale interrupted after the marker rolls forward at every " +
      "entry point; readers refuse the mid-swap table") {
    val sink = Files.createTempDirectory("graft-ct19-")
      .resolve("sink").toString
    val cur = Files.createTempDirectory("graft-ct19-cur-").toString
    append(sink, (1 to 25).map(i =>
      (i.toLong, s"v$i", "CREATE", 1000L + i, "f1", i.toLong)))
    CurrentTable.sync(spark, sink, cur, Seq("id"), buckets = 4)
    val want = stateOf(cur)

    // fabricate the exact crash state rescale leaves right after its
    // marker write: a COMPLETE staged 8-bucket layout (a second sync
    // of the same sink produces byte-equivalent bucket contents)
    // plus the marker — then interrupt the swap by hand
    val fs = new org.apache.hadoop.fs.Path(cur)
      .getFileSystem(spark.sessionState.newHadoopConf())
    val twin = Files.createTempDirectory("graft-ct19-twin-").toString
    CurrentTable.sync(spark, sink, twin, Seq("id"), buckets = 8)
    val stage = new org.apache.hadoop.fs.Path(s"$cur/._ct_stage_rescale")
    fs.mkdirs(stage)
    for (d <- new java.io.File(twin).listFiles()
        if d.getName.startsWith("kb="))
      assert(fs.rename(new org.apache.hadoop.fs.Path(d.toString),
        new org.apache.hadoop.fs.Path(stage, d.getName)))
    for (i <- 0 until 8) {
      val p = new org.apache.hadoop.fs.Path(stage, s"kb=$i")
      if (!fs.exists(p)) fs.mkdirs(p)
    }
    graft.streaming.AtomicFiles.write(s"$cur/_rescale.txt", "8",
      spark.sparkContext.hadoopConfiguration)
    // a partial swap: one staged bucket already renamed over its twin
    if (fs.exists(new org.apache.hadoop.fs.Path(s"$cur/kb=0")))
      fs.delete(new org.apache.hadoop.fs.Path(s"$cur/kb=0"), true)
    fs.rename(new org.apache.hadoop.fs.Path(stage, "kb=0"),
      new org.apache.hadoop.fs.Path(s"$cur/kb=0"))

    // mid-swap, the table is a MIX of two moduli — reads must refuse
    // (immediately at grace 0), naming the heal lever
    spark.conf.set("spark.graft.current.healGraceMs", "0")
    try {
      val e = intercept[IllegalStateException] {
        CurrentTable.read(spark, cur).count()
      }
      assert(e.getMessage.contains("heal"))
      intercept[IllegalStateException] {
        CurrentTable.lookup(spark, cur, Seq("id"), Seq(1L).toDF("id"))
          .count()
      }
    } finally spark.conf.unset("spark.graft.current.healGraceMs")

    // ANY maintenance entry completes it — here the next sync, which
    // must then fold the delta into the COMPLETED 8-bucket layout
    append(sink, Seq((26L, "late", "CREATE", 5000L, "f1", 300L)))
    CurrentTable.sync(spark, sink, cur, Seq("id"))
    def rootNb() = {
      val in = fs.open(new org.apache.hadoop.fs.Path(s"$cur/_synced.txt"))
      try scala.io.Source.fromInputStream(in, "UTF-8")
        .getLines().next().trim.toInt
      finally in.close()
    }
    assert(rootNb() == 8)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$cur/_rescale.txt")))
    assert(!fs.exists(stage))
    assert(stateOf(cur) == want + ((26L, "late")))
    val misplaced = spark.read.parquet(cur)
      .filter(col("kb") =!= pmod(xxhash64(concat_ws("\u0001", col("id"))),
        lit(8L)).cast("int"))
      .count()
    assert(misplaced == 0)

    // and heal() alone also rolls a fresh marker forward (crash after
    // root write, marker still present — the last crash window)
    graft.streaming.AtomicFiles.write(s"$cur/_rescale.txt", "8",
      spark.sparkContext.hadoopConfiguration)
    CurrentTable.heal(spark, cur)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$cur/_rescale.txt")))
    assert(stateOf(cur) == want + ((26L, "late")))
  }

  test("layoutStats measures the live layout; rescaleAdvice fires only " +
      "outside the 2x band and never on skew or a pending rescale") {
    val sink = Files.createTempDirectory("graft-ct20-")
      .resolve("sink").toString
    val cur = Files.createTempDirectory("graft-ct20-cur-").toString
    assert(CurrentTable.layoutStats(spark, cur).isEmpty) // no table yet
    append(sink, (1 to 40).map(i =>
      (i.toLong, s"v$i", "CREATE", 1000L + i, "f1", i.toLong)))
    CurrentTable.sync(spark, sink, cur, Seq("id"), buckets = 4)
    val st = CurrentTable.layoutStats(spark, cur).get
    assert(st.buckets == 4 && !st.pendingRescale)
    assert(st.liveBuckets > 0 && st.liveBuckets <= 4)
    assert(st.bytes > 0 && st.maxBucketBytes <= st.bytes)
    // inside the band (target ≈ current mean): hold
    assert(CurrentTable.rescaleAdvice(st, st.bytes / 4).isEmpty)
    // target far under the mean: grow to a power of two ≥ 2× current
    val grow = CurrentTable.rescaleAdvice(st, math.max(1L, st.bytes / 64))
    assert(grow.exists(n => n >= 8 && Integer.bitCount(n) == 1), grow)
    // target far over the table: shrink advice bottoms out at 1
    assert(CurrentTable.rescaleAdvice(st, st.bytes * 4).contains(1))
    // a fat bucket is a hot KEY, not a layout problem — re-hashing
    // spreads nothing, so skewed stats advise nothing
    val skewed = CurrentTable.LayoutStats(8, 8, 800L << 20, 790L << 20,
      pendingRescale = false)
    assert(CurrentTable.rescaleAdvice(skewed, 50L << 20).isEmpty)
    val even = CurrentTable.LayoutStats(8, 8, 800L << 20, 110L << 20,
      pendingRescale = false)
    assert(CurrentTable.rescaleAdvice(even, 50L << 20).contains(16))
    // a staged-but-unswapped rescale makes the numbers a layout mix:
    // flagged, and advice stays quiet until it rolls forward
    graft.streaming.AtomicFiles.write(s"$cur/_rescale.txt", "8",
      spark.sparkContext.hadoopConfiguration)
    val pending = CurrentTable.layoutStats(spark, cur).get
    assert(pending.pendingRescale)
    assert(CurrentTable.rescaleAdvice(pending,
      math.max(1L, pending.bytes / 64)).isEmpty)
    val fs = new org.apache.hadoop.fs.Path(cur)
      .getFileSystem(spark.sessionState.newHadoopConf())
    fs.delete(new org.apache.hadoop.fs.Path(s"$cur/_rescale.txt"), false)
    assert(!CurrentTable.layoutStats(spark, cur).get.pendingRescale)
  }

  test("a lookup that outwaits a concurrent rescale replans its probe " +
      "under the NEW modulus instead of silently missing keys") {
    val sink = Files.createTempDirectory("graft-ct21-")
      .resolve("sink").toString
    val cur = Files.createTempDirectory("graft-ct21-cur-").toString
    append(sink, (1 to 30).map(i =>
      (i.toLong, s"v$i", "CREATE", 1000L + i, "f1", i.toLong)))
    CurrentTable.sync(spark, sink, cur, Seq("id"), buckets = 4)
    // fabricate a rescale paused right after its marker write: a
    // complete staged 8-bucket layout (a sync of the same sink into a
    // twin dir yields byte-equivalent buckets) + the marker
    val fs = new org.apache.hadoop.fs.Path(cur)
      .getFileSystem(spark.sessionState.newHadoopConf())
    val twin = Files.createTempDirectory("graft-ct21-twin-").toString
    CurrentTable.sync(spark, sink, twin, Seq("id"), buckets = 8)
    val stage = new org.apache.hadoop.fs.Path(s"$cur/._ct_stage_rescale")
    fs.mkdirs(stage)
    for (d <- new java.io.File(twin).listFiles()
        if d.getName.startsWith("kb="))
      assert(fs.rename(new org.apache.hadoop.fs.Path(d.toString),
        new org.apache.hadoop.fs.Path(stage, d.getName)))
    for (i <- 0 until 8) {
      val p = new org.apache.hadoop.fs.Path(stage, s"kb=$i")
      if (!fs.exists(p)) fs.mkdirs(p)
    }
    graft.streaming.AtomicFiles.write(s"$cur/_rescale.txt", "8",
      spark.sparkContext.hadoopConfiguration)
    // the maintainer finishes the roll-forward while the reader is
    // inside its heal-grace poll — exactly the window the grace
    // exists for. The lookup must plan its buckets AFTER the wait:
    // a modulus read before it would probe mod-4 bucket ids against
    // the mod-8 layout — dirs that exist but hold different keys, a
    // silent miss
    spark.conf.set("spark.graft.current.healGraceMs", "15000")
    val healer = new Thread(() => {
      Thread.sleep(600)
      CurrentTable.heal(spark, cur)
    })
    healer.start()
    try {
      val got = CurrentTable.lookup(spark, cur, Seq("id"),
          (1L to 9L).toDF("id"))
        .select("id", "name").collect()
        .map(r => r.getLong(0) -> r.getString(1)).toSet
      assert(got == (1L to 9L).map(i => i -> s"v$i").toSet)
    } finally {
      healer.join()
      spark.conf.unset("spark.graft.current.healGraceMs")
    }
    // and the table really is at 8 buckets now
    assert(CurrentTable.layoutStats(spark, cur).get.buckets == 8)
  }

  test("a prepared Reader matches lookup, tracks folds and rescales " +
      "through the root signature, and fails loudly on a crashed swap") {
    val sink = Files.createTempDirectory("graft-ct23-")
      .resolve("sink").toString
    val cur = Files.createTempDirectory("graft-ct23-cur-").toString
    append(sink, (1 to 30).map(i =>
      (i.toLong, s"v$i", "CREATE", 1000L + i, "f1", i.toLong)))
    append(sink, Seq((5L, "gone", "DELETE", 2000L, "f1", 100L)))
    CurrentTable.sync(spark, sink, cur, Seq("id"), buckets = 4)
    val r = CurrentTable.reader(spark, cur, Seq("id"))
    def probe(ids: Long*): Set[(Long, String)] =
      r.lookup(ids.toDF("id")).select("id", "name").collect()
        .map(x => (x.getLong(0), x.getString(1))).toSet
    // matches the one-shot lookup exactly, tombstoned + absent keys out
    assert(probe(1L, 5L, 7L, 99999L) == Set(1L -> "v1", 7L -> "v7"))
    assert(probe(1L, 5L, 7L) == CurrentTable.lookup(spark, cur,
        Seq("id"), Seq(1L, 5L, 7L).toDF("id"))
      .select("id", "name").collect()
      .map(x => (x.getLong(0), x.getString(1))).toSet)
    // bucket-pruned: a one-key probe reads ONE bucket dir
    assert(r.lookup(Seq(3L).toDF("id")).inputFiles
      .flatMap(_.split('/').find(_.startsWith("kb="))).toSet.size == 1)
    // a fold lands: visible on the very next call (root #seq changed)
    append(sink, Seq((31L, "late", "CREATE", 3000L, "f1", 200L)))
    CurrentTable.sync(spark, sink, cur, Seq("id"))
    assert(probe(31L) == Set(31L -> "late"))
    // a rescale flips the modulus: the reader replans under it
    CurrentTable.rescale(spark, cur, Seq("id"), 9)
    assert(probe(2L, 5L, 31L) == Set(2L -> "v2", 31L -> "late"))
    // prune drops the tombstone rows physically; still no resurrection
    assert(CurrentTable.pruneTombstones(spark, cur, 2001L) == 1L)
    assert(probe(5L).isEmpty)
    // an oversized probe falls back to the full-scan semi-join —
    // built from the prep's CACHED listing and schema (CurrentTable
    // .read here would re-pay the orphan check, the full bucket
    // listing and a footer-open schema inference per probe): its
    // scan reads exactly the live bucket dirs
    val fb = r.lookup((1L to 4L).toDF("id"), maxDriverKeys = 2)
    assert(fb.select("id").collect().map(_.getLong(0)).toSet
      == Set(1L, 2L, 3L, 4L))
    assert(fb.inputFiles.nonEmpty && fb.inputFiles.forall(_.contains("/kb=")),
      "bucket files only")
    assert(fb.inputFiles
      .flatMap(_.split('/').find(_.startsWith("kb="))).toSet.size
      == new java.io.File(cur).listFiles()
        .count(f => f.getName.startsWith("kb=") && f.listFiles().nonEmpty),
      "full scan over the cached listing expected")
    // a crashed swap (never reached its root write) fails LOUDLY
    // instead of serving a partial table; heal restores service with
    // no re-prepare needed (the layout is back to what the signature
    // describes)
    val dirs = new java.io.File(cur).listFiles()
      .filter(_.getName.startsWith("kb="))
    for (d <- dirs)
      assert(d.renameTo(new java.io.File(cur,
        s"._ct_trash_${d.getName}")))
    intercept[Exception] { probe(1L) }
    // the OVERSIZED probe would scan every listed bucket, so the
    // parked dir is a guaranteed hit there — it gets buildHealed's
    // GUIDED refusal naming the heal remedy, not a raw planner
    // file-not-found over the cached listing
    spark.conf.set("spark.graft.current.healGraceMs", "0")
    try {
      val ov = intercept[IllegalStateException] {
        r.lookup((1L to 4L).toDF("id"), maxDriverKeys = 2)
      }
      assert(ov.getMessage.contains("CurrentTable.heal"),
        s"guided refusal expected, got: ${ov.getMessage}")
    } finally spark.conf.unset("spark.graft.current.healGraceMs")
    CurrentTable.heal(spark, cur)
    assert(probe(1L) == Set(1L -> "v1"))
    // a rescale mid-swap: the marker makes the reader refuse (at
    // grace 0) — its probed dirs could hold another modulus's keys —
    // and once rolled forward it serves through the NEW modulus
    val twin = Files.createTempDirectory("graft-ct23-twin-").toString
    CurrentTable.sync(spark, sink, twin, Seq("id"), buckets = 5)
    val fs = new org.apache.hadoop.fs.Path(cur)
      .getFileSystem(spark.sessionState.newHadoopConf())
    val stage = new org.apache.hadoop.fs.Path(s"$cur/._ct_stage_rescale")
    fs.mkdirs(stage)
    for (d <- new java.io.File(twin).listFiles()
        if d.getName.startsWith("kb="))
      assert(fs.rename(new org.apache.hadoop.fs.Path(d.toString),
        new org.apache.hadoop.fs.Path(stage, d.getName)))
    for (i <- 0 until 5) {
      val p = new org.apache.hadoop.fs.Path(stage, s"kb=$i")
      if (!fs.exists(p)) fs.mkdirs(p)
    }
    graft.streaming.AtomicFiles.write(s"$cur/_rescale.txt", "5",
      spark.sparkContext.hadoopConfiguration)
    spark.conf.set("spark.graft.current.healGraceMs", "0")
    try {
      val re = intercept[IllegalStateException] { probe(1L) }
      assert(re.getMessage.contains("heal"))
    } finally spark.conf.unset("spark.graft.current.healGraceMs")
    CurrentTable.heal(spark, cur)
    assert(probe(1L, 31L) == Set(1L -> "v1", 31L -> "late"))
    assert(CurrentTable.layoutStats(spark, cur).get.buckets == 5)
    // trash WITH its live bucket present — the leftover of a swap
    // that completed BOTH renames and crashed only before the trash
    // delete: the listed data is fully intact, so this is a harmless
    // leftover, not interrupted maintenance (orphanTrash counts only
    // trash whose live twin is MISSING), and the oversized probe must
    // keep serving at grace 0 instead of sleeping-then-refusing — the
    // availability half of the heal-or-refuse contract
    val doneKb = new java.io.File(cur).listFiles()
      .filter(f => f.getName.startsWith("kb=") &&
        f.listFiles().nonEmpty).head
    val leftover = new org.apache.hadoop.fs.Path(cur,
      s"._ct_trash_${doneKb.getName}")
    org.apache.hadoop.fs.FileUtil.copy(fs,
      new org.apache.hadoop.fs.Path(doneKb.toString), fs, leftover,
      false, spark.sparkContext.hadoopConfiguration)
    spark.conf.set("spark.graft.current.healGraceMs", "0")
    try assert(r.lookup((1L to 4L).toDF("id"), maxDriverKeys = 2)
        .select("id").collect().map(_.getLong(0)).toSet
        == Set(1L, 2L, 3L, 4L),
      "a completed swap's trash leftover must not refuse service")
    finally {
      // leftover removal belongs in the finally: a failed lookup
      // assertion must not leak the fake trash dir into the shared
      // fixture and confound the remaining assertions
      spark.conf.unset("spark.graft.current.healGraceMs")
      fs.delete(leftover, true)
    }
    // census-less legacy tables are refused at creation, naming the lever
    val nbLine = scala.io.Source.fromFile(s"$cur/_synced.txt")
      .getLines().next()
    graft.streaming.AtomicFiles.write(s"$cur/_synced.txt", nbLine,
      spark.sparkContext.hadoopConfiguration)
    val e = intercept[IllegalArgumentException] {
      CurrentTable.reader(spark, cur, Seq("id"))
    }
    assert(e.getMessage.contains("pruneTombstones"))
  }

  test("a fully-deleted table pruned to ZERO buckets keeps serving — " +
      "typed empty reads and lookups, working maintenance, " +
      "repopulation — instead of bricking on schema inference") {
    val sink = Files.createTempDirectory("graft-ct23-")
      .resolve("sink").toString
    val cur = Files.createTempDirectory("graft-ct23-cur-").toString
    append(sink, Seq(
      (1L, "alice", "CREATE", 1000L, "f1", 10L),
      (2L, "bob", "CREATE", 1100L, "f1", 20L)))
    CurrentTable.sync(spark, sink, cur, Seq("id"), buckets = 4)
    val populatedShape = CurrentTable.read(spark, cur).schema.fields
      .map(f => (f.name, f.dataType)).toSeq
    // a handle prepared while POPULATED must survive the transition
    val handle = CurrentTable.reader(spark, cur, Seq("id"))
    assert(handle.lookup(Seq(1L).toDF("id")).count() == 1L)
    append(sink, Seq(
      (1L, "alice", "DELETE", 2000L, "f1", 30L),
      (2L, "bob", "DELETE", 2100L, "f1", 40L)))
    CurrentTable.sync(spark, sink, cur, Seq("id"))
    assert(CurrentTable.pruneTombstones(spark, cur, Long.MaxValue) == 2L)
    // zero bucket dirs now — empty buckets drop at swap (a designed
    // layout state); before the #schema root line every one of these
    // calls threw UNABLE_TO_INFER_SCHEMA or refused service
    val fs = new org.apache.hadoop.fs.Path(cur)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(!fs.listStatus(new org.apache.hadoop.fs.Path(cur))
      .exists(_.getPath.getName.startsWith("kb=")),
      "fixture must reach the zero-bucket state")
    val empty = CurrentTable.read(spark, cur)
    assert(empty.isEmpty)
    // the typed empty read matches the populated read's shape, so
    // downstream consumers (joins, unions) never fork on emptiness
    assert(empty.schema.fields.map(f => (f.name, f.dataType)).toSeq
      == populatedShape)
    assert(CurrentTable.lookup(spark, cur, Seq("id"),
      Seq(1L).toDF("id")).isEmpty)
    assert(handle.lookup(Seq(1L).toDF("id")).isEmpty,
      "the prepared handle must serve the emptied table")
    // probe typing still enforced on the empty table
    intercept[IllegalArgumentException] {
      CurrentTable.lookup(spark, cur, Seq("id"),
        Seq("1").toDF("id")).collect()
    }
    // maintenance keeps working: rescale the empty layout, then
    // repopulate through the ordinary sync path
    assert(CurrentTable.rescale(spark, cur, Seq("id"), 8) == 8)
    append(sink, Seq((3L, "carol", "CREATE", 3000L, "f1", 50L)))
    CurrentTable.sync(spark, sink, cur, Seq("id"))
    assert(stateOf(cur) == Set((3L, "carol")))
    assert(handle.lookup(Seq(3L).toDF("id")).count() == 1L)
    assert(stateOf(cur) == oracleOf(sink))
  }

  test("an all-buckets-in-trash swap window refuses handle " +
      "preparation loudly — never confirmed as the zero-bucket state") {
    val sink = Files.createTempDirectory("graft-ct25-")
      .resolve("sink").toString
    val cur = Files.createTempDirectory("graft-ct25-cur-").toString
    append(sink, Seq((1L, "alice", "CREATE", 1000L, "f1", 10L)))
    // ONE bucket: the realistic worst case — a live swap parks the
    // whole table in trash for its rename window
    CurrentTable.sync(spark, sink, cur, Seq("id"), buckets = 1)
    val fs = new org.apache.hadoop.fs.Path(cur)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(fs.rename(new org.apache.hadoop.fs.Path(s"$cur/kb=0"),
      new org.apache.hadoop.fs.Path(s"$cur/._ct_trash_kb=0")))
    // grace 0: the confirmation must REFUSE immediately (naming the
    // heal), not trust the empty listing and prepare a handle that
    // silently serves typed emptiness for a key that exists
    spark.conf.set("spark.graft.current.healGraceMs", "0")
    try {
      val e = intercept[IllegalStateException] {
        CurrentTable.reader(spark, cur, Seq("id"))
      }
      assert(e.getMessage.contains("interrupted maintenance") ||
        e.getMessage.contains("heal"), e.getMessage)
      val e2 = intercept[IllegalStateException] {
        graft.ops.BucketIndex.reader(spark, cur, "name")
      }
      assert(e2.getMessage.contains("interrupted maintenance") ||
        e2.getMessage.contains("heal"), e2.getMessage)
      // the confirmation helper itself, pinned directly: it guards
      // the race where the swap starts AFTER prepare's entry heal
      // check passed — degenerating it to "trust the listing" would
      // slip past the two intercepts above (their prepare entry
      // checks fire first) but not past this one
      val e3 = intercept[IllegalStateException] {
        CurrentTable.confirmedBuckets(spark, fs, cur)
      }
      assert(e3.getMessage.contains("interrupted maintenance") ||
        e3.getMessage.contains("heal"), e3.getMessage)
    } finally {
      spark.conf.unset("spark.graft.current.healGraceMs")
      // restore the parked bucket so the fixture dirs clean up sanely
      fs.rename(new org.apache.hadoop.fs.Path(s"$cur/._ct_trash_kb=0"),
        new org.apache.hadoop.fs.Path(s"$cur/kb=0"))
    }
    // healed: the handle prepares and serves again
    assert(CurrentTable.reader(spark, cur, Seq("id"))
      .lookup(Seq(1L).toDF("id")).count() == 1L)
  }

  test("a cursor-only pre-schema table still refuses reads with an " +
      "actionable message, not parquet's inference error") {
    val sink = Files.createTempDirectory("graft-ct24-")
      .resolve("sink").toString
    val cur = Files.createTempDirectory("graft-ct24-cur-").toString
    new java.io.File(sink).mkdirs()
    // a sync over an empty sink writes the first-cut root (no fold
    // has run, so no schema is recorded) and no buckets
    CurrentTable.sync(spark, sink, cur, Seq("id"), buckets = 4)
    val e = intercept[IllegalStateException] {
      CurrentTable.read(spark, cur).collect()
    }
    assert(e.getMessage.contains("records no schema") &&
      e.getMessage.contains("sync"), e.getMessage)
    val e2 = intercept[IllegalStateException] {
      CurrentTable.reader(spark, cur, Seq("id"))
    }
    assert(e2.getMessage.contains("records no schema"), e2.getMessage)
  }

  test("a case-only orderBy change matches the persisted order instead " +
      "of crash-looping sync") {
    val sink = Files.createTempDirectory("graft-ct22-")
      .resolve("sink").toString
    val cur = Files.createTempDirectory("graft-ct22-cur-").toString
    append(sink, (1 to 10).map(i =>
      (i.toLong, s"v$i", "CREATE", 1000L + i, "f1", i.toLong)))
    CurrentTable.sync(spark, sink, cur, Seq("id"), buckets = 2,
      orderBy = Seq("name"))
    append(sink, Seq((11L, "w", "CREATE", 2000L, "f1", 99L)))
    // column resolution and the config validator are both
    // case-insensitive — the persisted-order guard must be too, or a
    // config normalization ("NAME" -> "name") wedges the pipeline
    CurrentTable.sync(spark, sink, cur, Seq("id"), orderBy = Seq("NAME"))
    assert(stateOf(cur) == oracleOf(sink))
    // a genuinely different order still fails loudly
    append(sink, Seq((12L, "x", "CREATE", 3000L, "f1", 100L)))
    val e = intercept[IllegalArgumentException] {
      CurrentTable.sync(spark, sink, cur, Seq("id"), orderBy = Seq("id"))
    }
    assert(e.getMessage.contains("persisted"))
  }
}
