package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{ZOrder, ZoneMaps}

/** File-level zone maps: manifest build/refresh, the skipping rule
  * (over-read on stale, skip on all-NULL), and the composition with
  * the Z-order layout that makes pruning effective in two dimensions.
  */
class ZoneMapsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.session
  import spark.implicits._

  private def tmp(prefix: String) =
    Files.createTempDirectory(prefix).toString

  test("pruned read equals the full filter while reading a fraction " +
      "of the files") {
    val dir = tmp("graft-zm-")
    val man = tmp("graft-zm-man-")
    // 10 range-partitioned files: k is contiguous per file
    spark.range(1000).select(col("id").as("k"),
        concat(lit("v"), lpad(col("id").cast("string"), 4, "0")).as("s"))
      .repartitionByRange(10, col("k"))
      .write.mode("overwrite").parquet(dir)
    val nFiles = new java.io.File(dir).listFiles()
      .count(f => !f.getName.startsWith("_") && !f.getName.startsWith("."))
    assert(nFiles >= 8, s"fixture wrote too few files: $nFiles")
    ZoneMaps.build(spark, dir, man, Seq("k", "s"))

    val cand = ZoneMaps.candidateFiles(spark, dir, man, "k", 100L, 199L)
    assert(cand.size <= 2, s"no pruning: ${cand.size} of $nFiles files")
    val got = ZoneMaps.prunedRead(spark, dir, man, "k", 100L, 199L)
      .select("k").as[Long].collect().toSet
    assert(got == (100L to 199L).toSet)

    // string-typed stats prune lexically the same way
    val scand = ZoneMaps.candidateFiles(spark, dir, man, "s", "v0100", "v0199")
    assert(scand.size <= 2, s"no string pruning: ${scand.size}")
    assert(ZoneMaps.prunedRead(spark, dir, man, "s", "v0100", "v0199")
      .count() == 100)

    // an empty range reads zero files but keeps the schema
    val none = ZoneMaps.prunedRead(spark, dir, man, "k", 5000L, 6000L)
    assert(none.columns.toSeq == Seq("k", "s") && none.count() == 0)
  }

  test("stale manifest over-reads (never wrong); refresh indexes only " +
      "the new files; all-NULL stats files are skipped") {
    val dir = tmp("graft-zm-")
    val man = tmp("graft-zm-man-")
    spark.range(100).select(col("id").as("k"))
      .repartitionByRange(4, col("k"))
      .write.mode("overwrite").parquet(dir)
    ZoneMaps.build(spark, dir, man, Seq("k"))

    // append out-of-range data AND an all-NULL file, no refresh yet
    spark.range(1000, 1100).select(col("id").as("k")).coalesce(1)
      .write.mode("append").parquet(dir)
    Seq.fill(5)(Option.empty[Long]).toDF("k").coalesce(1)
      .write.mode("append").parquet(dir)
    // unindexed files are candidates for ANY range: correct, not tight
    val stale = ZoneMaps.candidateFiles(spark, dir, man, "k", 0L, 24L)
    assert(stale.size == 3) // 1 indexed hit + 2 unindexed
    assert(ZoneMaps.prunedRead(spark, dir, man, "k", 0L, 24L)
      .count() == 25)

    assert(ZoneMaps.refresh(spark, dir, man) == 2)
    assert(ZoneMaps.refresh(spark, dir, man) == 0) // idempotent
    // indexed now: out-of-range file and the all-NULL file both skip
    assert(ZoneMaps.candidateFiles(spark, dir, man, "k", 0L, 24L).size == 1)
    // and the appended range is found through the refreshed manifest
    assert(ZoneMaps.candidateFiles(spark, dir, man, "k", 1000L, 1099L)
      .size == 1)
    assert(ZoneMaps.prunedRead(spark, dir, man, "k", 1000L, 1099L)
      .count() == 100)
  }

  test("z-ordered layout prunes on BOTH dimensions; a 1-D sort prunes " +
      "only its own") {
    val grid = spark.range(64 * 64).select(
      (col("id") % 64).as("x"), (col("id") / 64).cast("long").as("y"))
    val zDir = tmp("graft-zm-z-")
    ZOrder.layout(grid, col("x"), col("y"), bits = 6, partitions = 16)
      .write.mode("overwrite").parquet(zDir)
    val zMan = tmp("graft-zm-zman-")
    ZoneMaps.build(spark, zDir, zMan, Seq("x", "y"))
    val sDir = tmp("graft-zm-s-")
    grid.repartitionByRange(16, col("x")).sortWithinPartitions("x")
      .write.mode("overwrite").parquet(sDir)
    val sMan = tmp("graft-zm-sman-")
    ZoneMaps.build(spark, sDir, sMan, Seq("x", "y"))

    def nCand(dir: String, man: String, c: String) =
      ZoneMaps.candidateFiles(spark, dir, man, c, 0L, 7L).size
    // x-sorted layout: perfect on x, hopeless on y (every file spans y)
    assert(nCand(sDir, sMan, "x") <= 2)
    assert(nCand(sDir, sMan, "y") == 16)
    // z-ordered: BOTH dimensions prune (each file is a z-range, tight
    // in x and y simultaneously)
    assert(nCand(zDir, zMan, "x") < 16)
    assert(nCand(zDir, zMan, "y") < 16)
    // and the pruned reads agree with the truth either way
    assert(ZoneMaps.prunedRead(spark, zDir, zMan, "y", 0L, 7L).count()
      == 64 * 8)
    assert(ZoneMaps.prunedRead(spark, sDir, sMan, "y", 0L, 7L).count()
      == 64 * 8)

    // conjunction: the x∧y intersection prunes at least as hard as
    // either dimension alone, and the answer is still exact
    val both = Seq(("x", 0L: Any, 7L: Any), ("y", 0L: Any, 7L: Any))
    val nBoth = ZoneMaps.candidateFilesAll(spark, zDir, zMan, both).size
    assert(nBoth <= math.min(nCand(zDir, zMan, "x"), nCand(zDir, zMan, "y")))
    assert(ZoneMaps.prunedReadAll(spark, zDir, zMan, both).count() == 8 * 8)
  }

  test("bloom point-lookup skips files min/max can't (scattered keys), " +
      "never loses a hit, and survives refresh + compaction rebuild") {
    val dir = tmp("graft-zm-bloom-")
    val man = tmp("graft-zm-bloom-man-")
    // keys deliberately SCATTERED across files (id % 8): every file's
    // [min, max] spans nearly the whole domain, so range stats prune
    // nothing — the bloom grid is what can still skip
    spark.range(800).select(col("id").as("k"))
      .repartition(8, col("id") % 8)
      .write.mode("overwrite").parquet(dir)
    ZoneMaps.build(spark, dir, man, Seq("k"), bloomColumns = Seq("k"))
    val nFiles = new java.io.File(dir).listFiles()
      .count(f => !f.getName.startsWith("_") && !f.getName.startsWith("."))
    // range stats are useless on this layout…
    assert(ZoneMaps.candidateFiles(spark, dir, man, "k", 400L, 400L)
      .size == nFiles)
    // …the bloom grid prunes to (nearly) the one holding file
    val cand = ZoneMaps.candidateFilesPoint(spark, dir, man, "k", 400L)
    assert(cand.size < nFiles, s"bloom pruned nothing: ${cand.size}")
    assert(ZoneMaps.prunedLookup(spark, dir, man, "k", 400L)
      .select("k").as[Long].collect().toSeq == Seq(400L))
    // an absent key usually hits no file; correctness either way
    assert(ZoneMaps.prunedLookup(spark, dir, man, "k", 12345L).count() == 0)

    // refresh appends compatible grids for new files
    spark.range(1000, 1010).select(col("id").as("k")).coalesce(1)
      .write.mode("append").parquet(dir)
    assert(ZoneMaps.refresh(spark, dir, man) == 1)
    assert(ZoneMaps.prunedLookup(spark, dir, man, "k", 1005L)
      .count() == 1)
    assert(ZoneMaps.candidateFilesPoint(spark, dir, man, "k", 1005L)
      .size < nFiles + 1)

    // compaction-style rebuild keeps the bloom columns
    ZoneMaps.rebuild(spark, dir, man)
    val m = spark.read.parquet(man)
    assert(m.columns.contains("k_bloom"))
    assert(ZoneMaps.prunedLookup(spark, dir, man, "k", 400L).count() == 1)
  }

  test("patch swaps the manifest atomically: staging never lands " +
      "under the live name, and an interrupted swap heals") {
    val dir = tmp("graft-zm-")
    val man = tmp("graft-zm-pm-") + "/t._zonemaps"
    spark.range(100).select(col("id").as("k"))
      .withColumn("g", (col("k") / 50).cast("int"))
      .repartitionByRange(2, col("k")).write.mode("overwrite").parquet(dir)
    ZoneMaps.build(spark, dir, man, Seq("k"))
    val rowsBefore = spark.read.parquet(man).count()
    assert(rowsBefore >= 2)
    // patch with a prefix matching nothing: pure rewrite of the same
    // content through the staged swap
    ZoneMaps.patch(spark, dir, man, Seq(s"$dir/nonexistent"))
    val after = spark.read.parquet(man)
    assert(after.count() == rowsBefore)
    // no staging debris under or beside the live name
    val parent = new java.io.File(man).getParentFile
    assert(parent.listFiles().map(_.getName).toSet == Set("t._zonemaps"),
      parent.listFiles().map(_.getName).mkString(","))
    // the pruning path still answers exactly
    assert(ZoneMaps.prunedRead(spark, dir, man, "k", 10L, 19L).count() == 10)

    // interrupted swap: live manifest gone, original parked in trash —
    // every entry point restores it before reading
    val fs = new org.apache.hadoop.fs.Path(man)
      .getFileSystem(spark.sessionState.newHadoopConf())
    assert(fs.rename(new org.apache.hadoop.fs.Path(man),
      new org.apache.hadoop.fs.Path(man + "._patch_trash")))
    assert(ZoneMaps.candidateFiles(spark, dir, man, "k", 0L, 9L).nonEmpty)
    assert(fs.exists(new org.apache.hadoop.fs.Path(man)))
    assert(!fs.exists(new org.apache.hadoop.fs.Path(man + "._patch_trash")))
    assert(spark.read.parquet(man).count() == rowsBefore)

    // a real removal still prunes rows and re-indexes replacements
    val files = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".parquet"))
    assert(ZoneMaps.patch(spark, dir, man, Seq(dir)) == files.length)
    assert(spark.read.parquet(man).count() == files.length)

    // the planner-integrated table heals the same interruption before
    // its driver-side manifest snapshot
    assert(fs.rename(new org.apache.hadoop.fs.Path(man),
      new org.apache.hadoop.fs.Path(man + "._patch_trash")))
    assert(graft.ops.ZoneMapTable(spark, dir, man)
      .filter(col("k") === 42L).count() == 1)
    assert(fs.exists(new org.apache.hadoop.fs.Path(man)))
  }

  test("patch detects a lost swap race via the nonce stamp: a live " +
      "manifest that is not the staged one fails loudly") {
    val dir = tmp("graft-zm-st-")
    val man = tmp("graft-zm-stm-") + "/t._zonemaps"
    spark.range(100).select(col("id").as("k"))
      .repartitionByRange(2, col("k")).write.mode("overwrite").parquet(dir)
    ZoneMaps.build(spark, dir, man, Seq("k"))
    val fs = new org.apache.hadoop.fs.Path(man)
      .getFileSystem(spark.sessionState.newHadoopConf())
    // a normal patch leaves its own stamp at the live name (proof the
    // read-back verification saw the staged dir), invisible to readers
    ZoneMaps.patch(spark, dir, man, Seq(s"$dir/nonexistent"))
    val live = new org.apache.hadoop.fs.Path(man)
    assert(ZoneMaps.readStamp(fs, live).nonEmpty)
    assert(spark.read.parquet(man).count() >= 2) // stamp not parsed as data
    // the stamp helpers adjudicate the race exactly: no stamp (a
    // crash-restored pre-stamp manifest) and a foreign stamp (another
    // writer's staged dir) both read back as NOT this patch's nonce
    ZoneMaps.writeStamp(fs, live, "other-nonce")
    assert(ZoneMaps.readStamp(fs, live).contains("other-nonce"))
    fs.delete(new org.apache.hadoop.fs.Path(live, "_patch_stamp"), false)
    assert(ZoneMaps.readStamp(fs, live).isEmpty)
    // the lost-race exit cleans the NESTED staged dir: on HDFS/local
    // semantics, renaming tmp onto a restored live moves it INSIDE as
    // <live>/<tmpName> — a non-dot name whose parquet a recursive
    // manifest read would surface as phantom rows. Reproduce that end
    // state and run the exit the mismatch branch takes.
    val beforeRows = spark.read.parquet(man).count()
    val tmpName = new org.apache.hadoop.fs.Path(man + "._patch_tmp")
    val nested = new org.apache.hadoop.fs.Path(live, tmpName.getName)
    spark.range(5).select(lit("phantom").as("file"))
      .write.mode("overwrite").parquet(nested.toString)
    // nested residue IS visible to a recursive read — the hazard
    assert(spark.read.option("recursiveFileLookup", "true")
      .parquet(man).count() > beforeRows)
    val marker = new org.apache.hadoop.fs.Path(man + "._patch_inflight")
    fs.create(marker, true).close()
    val ex = intercept[IllegalStateException] {
      ZoneMaps.failLostRace(fs, live, tmpName, marker)
    }
    assert(ex.getMessage.contains("lost a race"))
    assert(!fs.exists(nested), "lost-race exit must drop nested residue")
    assert(!fs.exists(marker))
    assert(spark.read.parquet(man).count() == beforeRows)
  }
}
