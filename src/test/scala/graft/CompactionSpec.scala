package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.Compaction

/** Sink compaction: file-count reduction, data equality, and the
  * within-file offset-order contract.
  */
class CompactionSpec extends AnyFunSuite {
  lazy val spark: SparkSession = TestSpark.session

  test("compacts a fragmented dt-partitioned sink without losing rows") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-compact-").resolve("tbl").toString
    // simulate many small appended batches: 10 appends x 2 dt days
    for (b <- 0 until 10) {
      (0 until 50).map(i => (b * 50 + i, s"2024-01-0${1 + i % 2}", i.toLong))
        .toDF("id", "dt", "pos")
        .repartition(4)
        .write.mode("append").partitionBy("dt").parquet(dir)
    }
    val beforeRows = spark.read.parquet(dir).orderBy("dt", "pos", "id")
      .collect().toSeq
    val (before, after) = Compaction.compact(spark, dir,
      rowsPerFile = 250, order = Seq(col("pos")))
    assert(before > 20, s"fixture not fragmented: $before files")
    assert(after <= 4, s"still fragmented after compact: $after files")
    val afterDf = spark.read.parquet(dir)
    assert(afterDf.orderBy("dt", "pos", "id").collect().toSeq == beforeRows)
    // within-file order: pos is non-decreasing inside each output file
    val violations = afterDf
      .withColumn("f", input_file_name())
      .withColumn("prev", lag("pos", 1).over(
        org.apache.spark.sql.expressions.Window.partitionBy("f")
          .orderBy(monotonically_increasing_id())))
      .filter(col("prev").isNotNull && col("prev") > col("pos"))
      .count()
    assert(violations == 0)
  }

  test("compaction rebuilds the zone-map manifest it finds beside " +
      "the table") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-compact-zm-")
      .resolve("tbl").toString
    for (b <- 0 until 6) {
      (0 until 50).map(i => (b * 50 + i, "2024-01-01", i.toLong))
        .toDF("id", "dt", "pos")
        .repartition(2)
        .write.mode("append").partitionBy("dt").parquet(dir)
    }
    val man = s"$dir._zonemaps"
    graft.ops.ZoneMaps.build(spark, dir, man, Seq("id"))
    val rowsBefore = spark.read.parquet(man).count()
    val (before, after) = Compaction.compact(spark, dir,
      rowsPerFile = 300, order = Seq(col("pos")))
    assert(after < before)
    // the manifest now lists exactly the REWRITTEN files — a stale
    // manifest would point prunedRead at vanished paths
    val m = spark.read.parquet(man)
    assert(m.count() == after && m.count() < rowsBefore)
    val got = graft.ops.ZoneMaps
      .prunedRead(spark, dir, man, "id", 100L, 149L)
      .select("id").as[Int].collect().toSet
    assert(got == (100 to 149).toSet)
  }

  test("clustered compaction turns a scattered layout into one the " +
      "zone-map manifest prunes tightly") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-compact-zo-")
      .resolve("tbl").toString
    // hash-scattered appends: every file spans ~the whole (u, h)
    // domain, so the maintained manifest is correct but prunes nothing
    (0 until 4096).map(i => (i % 251 % 64, i % 241 % 64, i.toLong))
      .toDF("u", "h", "v")
      .repartition(16) // round-robin-ish: scatters both dimensions
      .write.mode("overwrite").parquet(dir)
    val man = s"$dir._zonemaps"
    graft.ops.ZoneMaps.build(spark, dir, man, Seq("u", "h"))
    val range = Seq(("u", 0, 15), ("h", 0, 15))
    val scattered = graft.ops.ZoneMaps
      .candidateFilesAll(spark, dir, man, range).size
    val rowsBefore = spark.read.parquet(dir)
      .collect().map(_.toSeq).toSet

    val (before, after) = Compaction.compactClustered(spark, dir,
      rowsPerFile = 256, x = col("u"), y = col("h"), bits = 6)
    assert(before == 16 && after >= 8, s"unexpected counts: $before/$after")
    // answers unchanged
    assert(spark.read.parquet(dir).collect().map(_.toSeq).toSet
      == rowsBefore)
    // the swap rebuilt the manifest over the NEW files, and the 2-D
    // range now prunes: the quarter-domain box touches a fraction of
    // the files where the scattered layout kept all of them
    val clustered = graft.ops.ZoneMaps
      .candidateFilesAll(spark, dir, man, range).size
    assert(scattered == 16, s"fixture not scattered: $scattered")
    assert(clustered * 2 <= after,
      s"clustering did not tighten pruning: $clustered of $after files")
    // and the planner-integrated path sees the same tight layout
    val zm = graft.ops.ZoneMapTable(spark, dir, man)
    assert(zm.filter(col("u") <= 15 && col("h") <= 15).count()
      == spark.read.parquet(dir)
        .filter(col("u") <= 15 && col("h") <= 15).count())
  }

  test("a dt-partitioned table keeps partition dirs through the " +
      "clustered rewrite") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-compact-zodt-")
      .resolve("tbl").toString
    (0 until 1000)
      .map(i => (i % 61, i % 53, s"2024-01-0${1 + i % 2}", i.toLong))
      .toDF("u", "h", "dt", "v")
      .repartition(8)
      .write.mode("overwrite").partitionBy("dt").parquet(dir)
    val rowsBefore = spark.read.parquet(dir).collect().map(_.toSeq).toSet
    Compaction.compactClustered(spark, dir, rowsPerFile = 250,
      x = col("u"), y = col("h"), bits = 6)
    val got = spark.read.parquet(dir)
    assert(got.collect().map(_.toSeq).toSet == rowsBefore)
    assert(got.select("dt").distinct().as[String].collect().sorted.toSeq
      == Seq("2024-01-01", "2024-01-02"))
    // partition dirs physically present (partition pruning intact)
    val dtDirs = new java.io.File(dir).listFiles()
      .filter(_.isDirectory).map(_.getName).filter(_.startsWith("dt="))
    assert(dtDirs.sorted.toSeq
      == Seq("dt=2024-01-01", "dt=2024-01-02"))
  }

  test("multi-partition compaction fuses every fragmented dt into one " +
      "rewrite and keeps each partition's rows and dirs intact") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-compact-multi-")
      .resolve("tbl").toString
    // three fragmented days (4 appends each), one cold day
    for (b <- 0 until 4; d <- 1 to 3)
      (0 until 25).map(i => (b * 100 + d * 25 + i, s"2024-02-0$d",
          (b * 25 + i).toLong))
        .toDF("id", "dt", "pos").coalesce(1)
        .write.mode("append").partitionBy("dt").parquet(dir)
    (5000 until 5050).map(i => (i, "2024-02-09", i.toLong))
      .toDF("id", "dt", "pos").coalesce(1)
      .write.mode("append").partitionBy("dt").parquet(dir)
    val rowsBefore = spark.read.parquet(dir).collect().map(_.toSeq).toSet
    def filesIn(d: String) = new java.io.File(d).listFiles()
      .map(_.getName).filter(n => n.endsWith(".parquet") &&
        !n.startsWith(".")).sorted.toSeq
    val coldBefore = filesIn(s"$dir/dt=2024-02-09")
    val (before, after) = Compaction.compactPartitions(spark, dir,
      Seq("2024-02-01", "2024-02-02", "2024-02-03"),
      rowsPerFile = 1000, order = Seq(col("pos"), col("id")))
    assert(before == 12, s"got before=$before")
    // per-dt ceil(100/1000)=1 each → 3 target partitions; a range
    // boundary straddling a dt adds at most one extra file per dt
    assert(after >= 3 && after <= 6, s"got after=$after")
    assert(spark.read.parquet(dir).collect().map(_.toSeq).toSet
      == rowsBefore)
    for (d <- 1 to 3)
      assert(filesIn(s"$dir/dt=2024-02-0$d").nonEmpty, s"dt=02-0$d empty")
    assert(filesIn(s"$dir/dt=2024-02-09") == coldBefore)
    // no staging debris (the fused stage name is hash-suffixed)
    assert(!new java.io.File(dir).listFiles()
      .exists(_.getName.startsWith("._compact_tmp")))
    // rows within each rewritten partition are sorted by the order
    // columns (the offset-order contract the per-dt path kept)
    for (d <- 1 to 3) {
      val pos = spark.read.parquet(s"$dir/dt=2024-02-0$d")
        .select("pos").as[Long].collect()
      // each FILE is sorted; with one file per dt the whole read is
      val grouped = spark.read.parquet(s"$dir/dt=2024-02-0$d")
        .withColumn("f", org.apache.spark.sql.functions
          .input_file_name())
        .select("f", "pos").as[(String, Long)].collect()
        .groupBy(_._1).values
      assert(grouped.forall(g => g.map(_._2).toSeq == g.map(_._2)
        .toSeq.sorted), s"dt=02-0$d files not pos-sorted")
      assert(pos.length == 100)
    }
  }

  test("multi-partition compaction tolerates zero-row and data-less " +
      "partitions: the wave proceeds and emptied dirs stay readable") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-compact-empty-")
      .resolve("tbl").toString
    for (b <- 0 until 3)
      (0 until 10).map(i => (b * 10 + i, "2024-03-01", i.toLong))
        .toDF("id", "dt", "pos").coalesce(1)
        .write.mode("append").partitionBy("dt").parquet(dir)
    // a partition that emptied out: schema-bearing empty parquet
    Seq.empty[(Int, Long)].toDF("id", "pos").coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/dt=2024-03-02")
    // a DATA-LESS dir (no files at all — the state a crashed writer
    // or a pre-fix zero-row swap leaves): must skip, not abort
    new java.io.File(s"$dir/dt=2024-03-03").mkdirs()
    val rowsBefore = spark.read.parquet(dir).collect().map(_.toSeq).toSet
    val (b1, a1) = Compaction.compactPartitions(spark, dir,
      Seq("2024-03-01", "2024-03-02", "2024-03-03"),
      rowsPerFile = 1000, order = Seq(col("pos"), col("id")))
    assert(b1 >= 3, s"got before=$b1")
    assert(spark.read.parquet(dir).collect().map(_.toSeq).toSet
      == rowsBefore)
    // the zero-row partition swapped in a SCHEMA-BEARING layout: a
    // plain read of it works, and a SECOND wave over it succeeds
    assert(spark.read.parquet(s"$dir/dt=2024-03-02").count() == 0)
    val (_, _) = Compaction.compactPartitions(spark, dir,
      Seq("2024-03-01", "2024-03-02"),
      rowsPerFile = 1000, order = Seq(col("pos"), col("id")))
    assert(spark.read.parquet(dir).collect().map(_.toSeq).toSet
      == rowsBefore)
  }

  test("multi-partition compaction routes a reserved staging column " +
      "collision to the per-dt rewrite instead of corrupting it") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-compact-reserved-")
      .resolve("tbl").toString
    for (b <- 0 until 3)
      (0 until 10).map(i => (b * 10 + i, "2024-02-01",
          (b * 10 + i).toLong, s"x${b * 10 + i}"))
        .toDF("id", "dt", "pos", "_graft_compact_dt").coalesce(1)
        .write.mode("append").partitionBy("dt").parquet(dir)
    val rowsBefore = spark.read.parquet(dir).collect().map(_.toSeq).toSet
    val (before, after) = Compaction.compactPartitions(spark, dir,
      Seq("2024-02-01"), rowsPerFile = 1000, order = Seq(col("pos")))
    assert(before == 3 && after == 1, s"got ($before, $after)")
    // rows — the physical reserved column included — survive intact
    assert(spark.read.parquet(dir).collect().map(_.toSeq).toSet
      == rowsBefore)
  }

  test("partition-scoped compaction rewrites only the named dt dirs " +
      "and patches the manifest incrementally") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-compact-part-")
      .resolve("tbl").toString
    // day 1 fragmented by 6 appends; day 2 written once (cold)
    for (b <- 0 until 6)
      (0 until 20).map(i => (b * 20 + i, "2024-01-01", i.toLong))
        .toDF("id", "dt", "pos").coalesce(2)
        .write.mode("append").partitionBy("dt").parquet(dir)
    (1000 until 1050).map(i => (i, "2024-01-02", i.toLong))
      .toDF("id", "dt", "pos").coalesce(1)
      .write.mode("append").partitionBy("dt").parquet(dir)
    val man = s"$dir._zonemaps"
    graft.ops.ZoneMaps.build(spark, dir, man, Seq("id"))
    val rowsBefore = spark.read.parquet(dir).collect().map(_.toSeq).toSet
    def filesIn(d: String) = new java.io.File(d).listFiles()
      .map(_.getName).filter(n => n.endsWith(".parquet") &&
        !n.startsWith(".")).sorted.toSeq
    val coldBefore = filesIn(s"$dir/dt=2024-01-02")

    val (before, after) = Compaction.compactPartitions(spark, dir,
      Seq("2024-01-01", "2024-09-09"), // unknown dt skipped with a log
      rowsPerFile = 1000, order = Seq(col("pos"), col("id")))
    assert(before == 12 && after == 1, s"got $before -> $after")
    assert(spark.read.parquet(dir).collect().map(_.toSeq).toSet
      == rowsBefore)
    // the cold partition's files are BYTE-identical (untouched)
    assert(filesIn(s"$dir/dt=2024-01-02") == coldBefore)
    // manifest: replaced rows dropped, new file indexed, cold rows kept
    val m = spark.read.parquet(man)
    assert(m.count() == 2) // 1 compacted day-1 file + 1 cold day-2 file
    assert(graft.ops.ZoneMaps.prunedRead(spark, dir, man, "id", 1000L,
      1009L).count() == 10)
    assert(graft.ops.ZoneMaps.prunedRead(spark, dir, man, "id", 0L,
      19L).count() == 20)
  }

  test("partition compaction that replaces EVERY indexed file keeps a " +
      "bloom-carrying manifest alive (empty-manifest refresh)") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-compact-bloom-")
      .resolve("tbl").toString
    // everything in ONE partition (the day-one / fixed-bucket shape):
    // the patch drops every manifest row before re-indexing
    for (b <- 0 until 4)
      (0 until 50).map(i => (b * 50 + i, "2024-01-01", i.toLong))
        .toDF("id", "dt", "pos").coalesce(1)
        .write.mode("append").partitionBy("dt").parquet(dir)
    val man = s"$dir._zonemaps"
    graft.ops.ZoneMaps.build(spark, dir, man, Seq("id"),
      bloomColumns = Seq("id"))
    val (before, after) = Compaction.compactPartitions(spark, dir,
      Seq("2024-01-01"), rowsPerFile = 500,
      order = Seq(col("pos"), col("id")))
    assert(before == 4 && after == 1)
    // manifest survived the zero-row window: one row, grids intact,
    // point lookup still answers through the bloom path
    val m = spark.read.parquet(man)
    assert(m.count() == 1 && m.columns.contains("id_bloom"))
    assert(graft.ops.ZoneMaps.prunedLookup(spark, dir, man, "id", 123L)
      .count() == 1)
  }

  test("compactPartitions hands its single post-patch manifest audit " +
      "to the caller: the callback sees the same health pairs and " +
      "stat columns a direct read would, exactly once, and never " +
      "fires without a manifest or a rewritten partition") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-compact-health-")
      .resolve("tbl").toString
    for (b <- 0 until 3)
      (0 until 50).map(i => (b * 50 + i, "2024-01-01", i.toLong))
        .toDF("id", "dt", "pos").coalesce(1)
        .write.mode("append").partitionBy("dt").parquet(dir)
    val man = s"$dir._zonemaps"
    graft.ops.ZoneMaps.build(spark, dir, man, Seq("id", "pos"),
      bloomColumns = Seq("id"))
    val seen = scala.collection.mutable
      .Buffer[(Seq[(String, Double)], Seq[String])]()
    Compaction.compactPartitions(spark, dir, Seq("2024-01-01"),
      rowsPerFile = 500, order = Seq(col("pos"), col("id")),
      onManifestHealth = (h, sc) => seen += ((h, sc)))
    // exactly ONE audit per compaction — the advice consumer reuses
    // it instead of re-scanning the manifest (the seam that keeps an
    // auto-compaction at one health read total)
    assert(seen.size == 1, s"audits: ${seen.size}")
    val (health, statCols) = seen.head
    assert(health == graft.ops.ZoneMaps.gridHealth(spark, man),
      s"callback health $health")
    assert(statCols == graft.ops.ZoneMaps.statColumns(spark, man) &&
      statCols.toSet == Set("id", "pos"), s"callback stats $statCols")
    // only unknown dts → nothing rewritten → no audit
    seen.clear()
    Compaction.compactPartitions(spark, dir, Seq("2099-01-01"),
      rowsPerFile = 500, order = Seq(col("pos"), col("id")),
      onManifestHealth = (h, sc) => seen += ((h, sc)))
    assert(seen.isEmpty, "audit fired with no rewritten partition")
    // no manifest beside the table → no audit
    val bare = Files.createTempDirectory("graft-compact-nomani-")
      .resolve("tbl").toString
    (0 until 50).map(i => (i, "2024-01-01", i.toLong))
      .toDF("id", "dt", "pos").coalesce(1)
      .write.mode("append").partitionBy("dt").parquet(bare)
    Compaction.compactPartitions(spark, bare, Seq("2024-01-01"),
      rowsPerFile = 500, order = Seq(col("pos"), col("id")),
      onManifestHealth = (h, sc) => seen += ((h, sc)))
    assert(seen.isEmpty, "audit fired without a manifest")
  }

  test("patch matches scheme-qualified and bare prefixes alike") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-compact-scheme-")
      .resolve("tbl").toString
    (0 until 100).map(i =>
        (i, if (i < 50) "2024-01-01" else "2024-01-02"))
      .toDF("id", "dt")
      .repartition(2)
      .write.mode("overwrite").partitionBy("dt").parquet(dir)
    val man = s"$dir._zonemaps"
    graft.ops.ZoneMaps.build(spark, dir, man, Seq("id"))
    val total = spark.read.parquet(man).count()
    // the retention shape: the partition's files are GONE, and the
    // patch prefix arrives scheme-qualified (file:/...) — it must
    // still match the manifest's normalized bare keys, or the
    // manifest keeps listing vanished files and prunedRead dies
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sessionState.newHadoopConf())
    fs.delete(new org.apache.hadoop.fs.Path(s"$dir/dt=2024-01-01"), true)
    val indexed = graft.ops.ZoneMaps.patch(spark, dir, man,
      Seq(s"file:$dir/dt=2024-01-01"))
    assert(indexed == 0) // nothing new to index
    val m = spark.read.parquet(man)
    assert(!m.select("file").as[String].collect()
      .exists(_.contains("dt=2024-01-01")))
    assert(m.count() < total && m.count() > 0)
    assert(graft.ops.ZoneMaps.prunedRead(spark, dir, man, "id", 50L, 99L)
      .count() == 50)
  }

  test("vacuum sweeps stale staging and dead trash, never live data " +
      "or recovery trash") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-compact-vac-")
      .resolve("tbl").toString
    (0 until 40).map(i => (i, "2024-01-01")).toDF("id", "dt")
      .write.mode("overwrite").partitionBy("dt").parquet(dir)
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sessionState.newHadoopConf())
    def mk(n: String): Unit =
      fs.mkdirs(new org.apache.hadoop.fs.Path(s"$dir/$n"))
    mk("._compact_tmp_dt=2024-01-01") // crashed rewrite's staging
    mk(".graft_stage_chunk3") // crashed chunk snapshot's staging
    mk("._compact_trash_dt=2024-01-01") // dead: live dt dir EXISTS
    mk("._compact_trash_dt=2024-09-09") // recovery: live dir MISSING
    mk("._ct_stage") // crashed current-table fold staging
    mk("._ct_trash_kb=3"); mk("kb=3") // dead current-table trash
    mk("._ct_trash_kb=9") // recovery trash: kb=9 missing — keep
    // whole-table compact stages at SIBLING paths
    fs.mkdirs(new org.apache.hadoop.fs.Path(s"$dir._compact_tmp"))
    fs.mkdirs(new org.apache.hadoop.fs.Path(s"$dir._compact_trash"))
    // manifest patch staging: tmp is debris; trash is the
    // interrupted-swap recovery source while no live manifest exists
    fs.mkdirs(new org.apache.hadoop.fs.Path(s"$dir._zonemaps._patch_tmp"))
    fs.mkdirs(new org.apache.hadoop.fs.Path(s"$dir._zonemaps._patch_trash"))
    // too-young staging is protected by the age guard
    val swept0 = Compaction.vacuum(spark, dir, minAgeMs = 3600000L)
    assert(swept0.isEmpty)
    val swept = Compaction.vacuum(spark, dir, minAgeMs = 0L)
    assert(swept.map(_.split('/').last).toSet == Set(
      "._compact_tmp_dt=2024-01-01", ".graft_stage_chunk3",
      "._compact_trash_dt=2024-01-01", "._ct_stage", "._ct_trash_kb=3",
      new java.io.File(dir).getName + "._compact_tmp",
      new java.io.File(dir).getName + "._compact_trash",
      new java.io.File(dir).getName + "._zonemaps._patch_tmp"))
    // the recovery trashes (no live twin) survived, data intact
    assert(fs.exists(new org.apache.hadoop.fs.Path(
      s"$dir/._compact_trash_dt=2024-09-09")))
    assert(fs.exists(new org.apache.hadoop.fs.Path(
      s"$dir/._ct_trash_kb=9")))
    assert(fs.exists(new org.apache.hadoop.fs.Path(
      s"$dir._zonemaps._patch_trash")))
    // once a live manifest exists the patch trash is dead debris
    fs.mkdirs(new org.apache.hadoop.fs.Path(s"$dir._zonemaps"))
    assert(Compaction.vacuum(spark, dir, minAgeMs = 0L)
      .map(_.split('/').last).toSet ==
        Set(new java.io.File(dir).getName + "._zonemaps._patch_trash"))
    assert(spark.read.parquet(dir).count() == 40)
  }

  test("retention drops only date-shaped partitions older than the " +
      "cutoff and patches the manifest") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-compact-ret-")
      .resolve("tbl").toString
    (0 until 80).map { i =>
      val dt = i % 4 match {
        case 0 => "2023-12-30"
        case 1 => "2024-01-01"
        case 2 => "2024-01-02"
        case _ => "constant" // a fixed-bucket-style value
      }
      (i, dt, i.toLong)
    }.toDF("id", "dt", "pos")
      .repartition(2)
      .write.mode("overwrite").partitionBy("dt").parquet(dir)
    val man = s"$dir._zonemaps"
    graft.ops.ZoneMaps.build(spark, dir, man, Seq("id"))
    val manBefore = spark.read.parquet(man).count()

    val dropped = Compaction.expirePartitions(spark, dir, "2024-01-01")
    assert(dropped == Seq("2023-12-30"))
    val left = spark.read.parquet(dir)
    assert(left.select("dt").distinct().as[String].collect().sorted.toSeq
      == Seq("2024-01-01", "2024-01-02", "constant"))
    assert(left.count() == 60)
    // manifest patched: no rows for the vanished partition, and the
    // pruned read over the survivors still answers
    val man2 = spark.read.parquet(man)
    assert(man2.count() < manBefore)
    assert(!man2.select("file").as[String].collect()
      .exists(_.contains("dt=2023-12-30")))
    assert(graft.ops.ZoneMaps.prunedRead(spark, dir, man, "id", 0L, 79L)
      .count() == 60)
    // idempotent; nothing else date-shaped is old enough
    assert(Compaction.expirePartitions(spark, dir, "2024-01-01").isEmpty)
  }

  test("a crashed PARTITION swap exposes no phantom dt value to " +
      "readers and heals on the next partition compact") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-compact-pcrash-")
      .resolve("tbl").toString
    (0 until 100).map(i =>
        (i, if (i < 50) "2024-01-01" else "2024-01-02", i.toLong))
      .toDF("id", "dt", "pos")
      .repartition(2)
      .write.mode("overwrite").partitionBy("dt").parquet(dir)
    val rowsBefore = spark.read.parquet(dir).collect().map(_.toSeq).toSet
    // crash strictly between the partition swap's two renames: the
    // live dt dir moved to the DOT-PREFIXED trash name, tmp→live never
    // happened
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sessionState.newHadoopConf())
    assert(fs.rename(
      new org.apache.hadoop.fs.Path(s"$dir/dt=2024-01-01"),
      new org.apache.hadoop.fs.Path(s"$dir/._compact_trash_dt=2024-01-01")))
    // a plain table reader in the crash window: the surviving
    // partition only — NO mangled phantom dt value from the trash dir
    val mid = spark.read.parquet(dir)
    assert(mid.select("dt").distinct().as[String].collect().toSeq
      == Seq("2024-01-02"))
    assert(mid.count() == 50)
    // the next partition compact restores the trash FIRST, then
    // rewrites — full row set back, staging names gone
    Compaction.compactPartitions(spark, dir, Seq("2024-01-01"),
      rowsPerFile = 100, order = Seq(col("pos")))
    assert(spark.read.parquet(dir).collect().map(_.toSeq).toSet
      == rowsBefore)
    assert(new java.io.File(dir).listFiles().map(_.getName)
      .count(_.contains("_compact_")) == 0)
  }

  test("an interrupted swap (live dir gone, trash intact) is restored " +
      "by the next compact run") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-compact-crash-")
      .resolve("tbl").toString
    (0 until 100).map(i => (i, "2024-01-01", i.toLong))
      .toDF("id", "dt", "pos")
      .repartition(4)
      .write.mode("overwrite").partitionBy("dt").parquet(dir)
    val rowsBefore = spark.read.parquet(dir).collect().map(_.toSeq).toSet
    // simulate a crash strictly between the two swap renames:
    // live → trash happened, tmp → live did not
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sessionState.newHadoopConf())
    assert(fs.rename(new org.apache.hadoop.fs.Path(dir),
      new org.apache.hadoop.fs.Path(dir + "._compact_trash")))
    assert(!fs.exists(new org.apache.hadoop.fs.Path(dir)))
    // the next run must restore BEFORE reading the table — a
    // restore-after-read would throw on the missing path
    val (_, after) = Compaction.compact(spark, dir,
      rowsPerFile = 100, order = Seq(col("pos")))
    assert(after >= 1)
    assert(spark.read.parquet(dir).collect().map(_.toSeq).toSet
      == rowsBefore)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(dir + "._compact_trash")))
  }
}
