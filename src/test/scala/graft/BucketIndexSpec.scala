package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.BucketIndex
import graft.streaming.CurrentTable

/** Secondary bloom indexes: lookupBy must equal the full-scan filter
  * exactly (blooms admit a superset of buckets, the IN filter is
  * exact), read fewer buckets than the table holds on selective
  * probes, and stay correct through syncs, deletes, crash replays
  * and rescales.
  */
class BucketIndexSpec extends AnyFunSuite {
  lazy val spark = TestSpark.session
  import spark.implicits._

  private def append(dir: String,
      rows: Seq[(Long, String, String, Long)],
      dt: String = "2024-01-01"): Unit =
    rows.toDF("id", "email", "_op", "_ts")
      .withColumn("_binlog_file_internal", lit("f1"))
      .withColumn("_binlog_pos_internal", col("_ts"))
      .withColumn("dt", lit(dt))
      .coalesce(1)
      .write.mode("append").partitionBy("dt").parquet(dir)

  private def fullScan(cur: String, email: String): Set[Long] =
    CurrentTable.read(spark, cur).filter(col("email") === email)
      .select("id").collect().map(_.getLong(0)).toSet

  private def byIndex(cur: String, email: String) =
    BucketIndex.lookupBy(spark, cur, "email", Seq(email).toDF("email"))

  private def idsByIndex(cur: String, email: String): Set[Long] =
    byIndex(cur, email).select("id").collect().map(_.getLong(0)).toSet

  /** The sidecar manifest's group pointers, `"g<N>" -> dirName` —
    * the shared parser, pinned to this suite's "email" column.
    */
  private def pointersOf(cur: String): Map[String, String] =
    SidecarTestOps.pointersOf(cur, "email")

  test("lookupBy equals the exact filter, reads fewer buckets, and " +
      "syncs keep the index fresh through updates and deletes") {
    val sink = Files.createTempDirectory("graft-bi-").resolve("s").toString
    val cur = Files.createTempDirectory("graft-bi-cur-").toString
    append(sink, (1L to 64L).map(i => (i, s"u$i@x.com", "CREATE", 1000L + i)))
    CurrentTable.sync(spark, sink, cur, Seq("id"), buckets = 16)
    BucketIndex.attach(spark, cur, "email")
    assert(BucketIndex.list(spark, cur) == Seq("email"))

    // selective probe: right rows, and a real bucket prune
    assert(idsByIndex(cur, "u7@x.com") == Set(7L))
    assert(idsByIndex(cur, "u7@x.com") == fullScan(cur, "u7@x.com"))
    val nBuckets = new java.io.File(cur).listFiles()
      .count(_.getName.startsWith("kb="))
    val readBuckets = byIndex(cur, "u7@x.com").inputFiles
      .flatMap(_.split('/').find(_.startsWith("kb="))).toSet
    assert(readBuckets.size < nBuckets,
      s"no prune: read $readBuckets of $nBuckets")

    // a value nobody has reads nothing (or only bloom false positives)
    assert(idsByIndex(cur, "nobody@x.com").isEmpty)

    // UPDATE moves a value: the new value must hit, the old must miss
    append(sink, Seq((7L, "moved@x.com", "UPDATE", 9000L)))
    CurrentTable.sync(spark, sink, cur, Seq("id"))
    assert(idsByIndex(cur, "moved@x.com") == Set(7L))
    assert(idsByIndex(cur, "u7@x.com").isEmpty)

    // DELETE kills the row; the recomputed bloom TIGHTENS (the value's
    // only bucket re-bloomed without it, so no bucket is even read)
    append(sink, Seq((8L, "u8@x.com", "DELETE", 9100L)))
    CurrentTable.sync(spark, sink, cur, Seq("id"))
    assert(idsByIndex(cur, "u8@x.com").isEmpty)
    assert(byIndex(cur, "u8@x.com").inputFiles.isEmpty,
      "the delete's bucket re-bloomed without u8 — no read expected")
  }

  test("crash replay republishes identical blooms; duplicate probe " +
      "values and multi-value probes behave like IN") {
    val sink = Files.createTempDirectory("graft-bi-").resolve("s").toString
    val cur = Files.createTempDirectory("graft-bi-cur-").toString
    append(sink, Seq(
      (1L, "a@x", "CREATE", 1000L), (2L, "b@x", "CREATE", 1100L)))
    CurrentTable.sync(spark, sink, cur, Seq("id"), buckets = 4)
    BucketIndex.attach(spark, cur, "email")
    append(sink, Seq((3L, "c@x", "CREATE", 2000L)), dt = "2024-01-02")
    CurrentTable.sync(spark, sink, cur, Seq("id"))
    // crash before the cursor advanced: re-fold must converge
    val side = new java.io.File(s"$cur/_cursor")
      .listFiles().find(_.getName.contains("2024-01-02")).get
    assert(side.delete())
    CurrentTable.sync(spark, sink, cur, Seq("id"))
    assert(idsByIndex(cur, "c@x") == Set(3L))
    // multi-value probe, duplicates included — semi-join semantics
    val multi = BucketIndex.lookupBy(spark, cur, "email",
      Seq("a@x", "c@x", "a@x").toDF("email"))
      .select("id").collect().map(_.getLong(0)).toSet
    assert(multi == Set(1L, 3L))
  }

  test("a rescale falls back to the exact full scan until the next " +
      "sync rebuilds the index under the new modulus") {
    val sink = Files.createTempDirectory("graft-bi-").resolve("s").toString
    val cur = Files.createTempDirectory("graft-bi-cur-").toString
    append(sink, (1L to 40L).map(i => (i, s"u$i@x", "CREATE", 1000L + i)))
    CurrentTable.sync(spark, sink, cur, Seq("id"), buckets = 4)
    BucketIndex.attach(spark, cur, "email")
    CurrentTable.rescale(spark, cur, Seq("id"), newBuckets = 9)
    // stale modulus: a pruned probe could silently MISS rows (bucket
    // 3-of-4 != 3-of-9) — the fallback must read every bucket instead
    assert(idsByIndex(cur, "u13@x") == Set(13L))
    val readAll = byIndex(cur, "u13@x").inputFiles
      .flatMap(_.split('/').find(_.startsWith("kb="))).toSet
    val nBuckets = new java.io.File(cur).listFiles()
      .count(_.getName.startsWith("kb="))
    assert(readAll.size == nBuckets,
      s"stale index must full-scan: read $readAll of $nBuckets")
    // the next sync rebuilds; pruned lookups resume
    append(sink, Seq((41L, "u41@x", "CREATE", 5000L)), dt = "2024-01-02")
    CurrentTable.sync(spark, sink, cur, Seq("id"))
    assert(idsByIndex(cur, "u13@x") == Set(13L))
    val readPruned = byIndex(cur, "u13@x").inputFiles
      .flatMap(_.split('/').find(_.startsWith("kb="))).toSet
    assert(readPruned.size < nBuckets,
      s"rebuilt index must prune again: read $readPruned")
  }

  test("auto-sizing holds ~10 bits/row at ANY scale by adding shards; " +
      "groups split the manifest past the target group size") {
    import graft.ops.BucketIndex.{autoSize, autoGroups, MaxShardBits,
      MaxGroups}
    // small tables: one shard, floored filter
    assert(autoSize(10L) == ((1024, 1)))
    // the pre-shard cap boundary: 1.6M rows still fits one shard
    val (b1, s1) = autoSize(1600000L)
    assert(s1 == 1 && b1 == MaxShardBits)
    // the module-header example the r13 design silently degraded at:
    // 100 TB / 4096 buckets ~ 250M rows/bucket. Budget must stay
    // ~10 bits/row instead of saturating one capped filter.
    val (b2, s2) = autoSize(250000000L)
    assert(s2 >= 149, s"shards $s2")
    assert(b2.toLong * s2 >= 250000000L * 10L, s"bits $b2 x $s2")
    assert(b2 <= MaxShardBits)
    // forced shard count: budget spread across what the caller asked
    val (b3, s3) = autoSize(1000000L, forcedShards = 4)
    assert(s3 == 4 && b3.toLong * 4 >= 10000000L && b3 <= MaxShardBits)
    // manifest grouping: tiny sidecars stay one group; the 60k-bucket /
    // 2MB-filter shape the r13 review measured at ~120 GB spreads over
    // the max group count (each group a maintenance + write unit)
    assert(autoGroups(16, 1 << 16, 1) == 1)
    assert(autoGroups(60000, MaxShardBits, 1) > 100)
    assert(autoGroups(4096, MaxShardBits, 150) == MaxGroups)
  }

  test("incremental maintenance rewrites ONLY the touched bucket-" +
      "groups: untouched groups carry forward by pointer, zero IO") {
    val sink = Files.createTempDirectory("graft-bi-").resolve("s").toString
    val cur = Files.createTempDirectory("graft-bi-cur-").toString
    append(sink, (1L to 128L).map(i => (i, s"u$i@x.com", "CREATE", 1000L + i)))
    CurrentTable.sync(spark, sink, cur, Seq("id"), buckets = 16)
    BucketIndex.attach(spark, cur, "email", numGroups = 8)
    def pointers(): Map[String, String] = pointersOf(cur)
    val before = pointers()
    assert(before.keySet.size == 8, before.keySet.toString)
    // one key's delta: exactly one bucket, so exactly ONE group (its
    // kb mod 8) re-points; the other seven pointers are UNCHANGED —
    // their bytes were neither read nor written
    append(sink, Seq((7L, "moved@x.com", "UPDATE", 9000L)))
    CurrentTable.sync(spark, sink, cur, Seq("id"))
    val after = pointers()
    val changed = after.filter { case (g, d) => before.get(g) != Some(d) }
    assert(changed.size == 1,
      s"one group expected to re-point, got $changed")
    assert((before -- changed.keySet) == (after -- changed.keySet))
    // probes stay exact across the grouped layout
    assert(idsByIndex(cur, "moved@x.com") == Set(7L))
    assert(idsByIndex(cur, "u7@x.com").isEmpty)
    assert(idsByIndex(cur, "u100@x.com") == Set(100L))
  }

  test("sharded filters: probes stay exact and pruned when a bucket's " +
      "values split across shards, and syncs maintain the sharded layout") {
    val sink = Files.createTempDirectory("graft-bi-").resolve("s").toString
    val cur = Files.createTempDirectory("graft-bi-cur-").toString
    append(sink, (1L to 256L).map(i => (i, s"u$i@x.com", "CREATE", 1000L + i)))
    CurrentTable.sync(spark, sink, cur, Seq("id"), buckets = 8)
    BucketIndex.attach(spark, cur, "email", numBits = 1024, numShards = 4)
    assert(idsByIndex(cur, "u97@x.com") == Set(97L))
    assert(idsByIndex(cur, "u97@x.com") == fullScan(cur, "u97@x.com"))
    val readBuckets = byIndex(cur, "u97@x.com").inputFiles
      .flatMap(_.split('/').find(_.startsWith("kb="))).toSet
    assert(readBuckets.size < 8, s"no prune: $readBuckets")
    // maintenance keeps the sharded layout: update + delete, re-probe
    append(sink, Seq((97L, "moved@x.com", "UPDATE", 9000L),
      (98L, "u98@x.com", "DELETE", 9100L)))
    CurrentTable.sync(spark, sink, cur, Seq("id"))
    assert(idsByIndex(cur, "moved@x.com") == Set(97L))
    assert(idsByIndex(cur, "u97@x.com").isEmpty)
    assert(idsByIndex(cur, "u98@x.com").isEmpty)
    // multi-value probe spanning shards behaves like IN
    val multi = BucketIndex.lookupBy(spark, cur, "email",
      Seq("u5@x.com", "moved@x.com", "u200@x.com").toDF("email"))
      .select("id").collect().map(_.getLong(0)).toSet
    assert(multi == Set(5L, 97L, 200L))
  }

  test("a legacy pre-shard sidecar (no shards= in meta, no shard " +
      "column in data) stays probeable and is rebuilt by the next sync") {
    val sink = Files.createTempDirectory("graft-bi-").resolve("s").toString
    val cur = Files.createTempDirectory("graft-bi-cur-").toString
    append(sink, (1L to 64L).map(i => (i, s"u$i@x.com", "CREATE", 1000L + i)))
    CurrentTable.sync(spark, sink, cur, Seq("id"), buckets = 8)
    BucketIndex.attach(spark, cur, "email")
    // rewrite the sidecar in the r13 on-disk format: a single flat
    // data dir of (kb, bloom) rows — no shard column, no grouped
    // manifest — and a meta of only nb/bits/data lines
    val ixDir = s"$cur/_index/email"
    val metaPath = java.nio.file.Paths.get(s"$ixDir/_meta.txt")
    val lines = java.nio.file.Files.readAllLines(metaPath)
      .toArray.map(_.toString)
    val legacyData = s"d_legacy_${java.util.UUID.randomUUID()}"
    // the attach above used shards=1, so dropping the shard (and grp
    // partition) columns reproduces a faithful r13 sidecar
    spark.read.parquet(ixDir + "/" +
        lines.find(_.startsWith("g0=")).get.stripPrefix("g0="))
      .select("kb", "bloom").coalesce(1)
      .write.parquet(s"$ixDir/$legacyData")
    val edited = new java.util.ArrayList[String]()
    lines.foreach { l =>
      if (l.startsWith("nb=") || l.startsWith("bits=")) edited.add(l)
    }
    edited.add(s"data=$legacyData")
    java.nio.file.Files.write(metaPath, edited)
    // drop the local-FS checksum sidecar the out-of-band edit stales
    java.nio.file.Files.deleteIfExists(
      metaPath.getParent.resolve("._meta.txt.crc"))
    // probeable as one implicit shard
    assert(idsByIndex(cur, "u7@x.com") == Set(7L))
    // the next sync REBUILDS (incremental union would mix layouts)
    append(sink, Seq((65L, "u65@x.com", "CREATE", 9000L)), dt = "2024-01-02")
    CurrentTable.sync(spark, sink, cur, Seq("id"))
    val after = java.nio.file.Files.readAllLines(metaPath)
      .toArray.map(_.toString)
    assert(after.exists(_.startsWith("shards=")) &&
      after.exists(_.startsWith("groups=")),
      s"sync must republish in the grouped sharded layout: ${after.toSeq}")
    assert(idsByIndex(cur, "u65@x.com") == Set(65L))
    assert(idsByIndex(cur, "u7@x.com") == Set(7L))
  }

  test("IndexReader: matches lookupBy, sees syncs through the " +
      "signatures, serves exact scans while rescale-stale, and probes " +
      "from the pinned frame") {
    val sink = Files.createTempDirectory("graft-bi-").resolve("s").toString
    val cur = Files.createTempDirectory("graft-bi-cur-").toString
    append(sink, (1L to 64L).map(i => (i, s"u$i@x.com", "CREATE", 1000L + i)))
    CurrentTable.sync(spark, sink, cur, Seq("id"), buckets = 16)
    BucketIndex.attach(spark, cur, "email")
    val rd = BucketIndex.reader(spark, cur, "email")
    def byReader(email: String): Set[Long] =
      rd.lookup(Seq(email).toDF("email"))
        .select("id").collect().map(_.getLong(0)).toSet
    assert(byReader("u7@x.com") == Set(7L))
    assert(byReader("nobody@x.com").isEmpty)
    // pruned like lookupBy
    val readBuckets = rd.lookup(Seq("u7@x.com").toDF("email")).inputFiles
      .flatMap(_.split('/').find(_.startsWith("kb="))).toSet
    assert(readBuckets.size < 16, s"no prune: $readBuckets")
    // a sync lands: the handle must see the new value without help
    append(sink, Seq((7L, "moved@x.com", "UPDATE", 9000L)))
    CurrentTable.sync(spark, sink, cur, Seq("id"))
    assert(byReader("moved@x.com") == Set(7L))
    assert(byReader("u7@x.com").isEmpty)
    // rescale: the handle serves the exact full scan (stale blooms
    // would MISS rows), then picks up the rebuilt index on the next
    // sync's signature change
    CurrentTable.rescale(spark, cur, Seq("id"), newBuckets = 9)
    assert(byReader("u13@x.com") == Set(13L))
    val readAll = rd.lookup(Seq("u13@x.com").toDF("email")).inputFiles
      .flatMap(_.split('/').find(_.startsWith("kb="))).toSet
    assert(readAll.size == 9, s"stale index must full-scan: $readAll")
    append(sink, Seq((65L, "u65@x.com", "CREATE", 9500L)), dt = "2024-01-02")
    CurrentTable.sync(spark, sink, cur, Seq("id"))
    assert(byReader("u65@x.com") == Set(65L))
    val pruned = rd.lookup(Seq("u13@x.com").toDF("email")).inputFiles
      .flatMap(_.split('/').find(_.startsWith("kb="))).toSet
    assert(pruned.size < 9, s"rebuilt index must prune again: $pruned")
    // oversized probe: full-scan fallback, driver out of the data path
    val big = (1 to 50).map(i => s"u$i@x.com").toDF("email")
    val fb = rd.lookup(big, maxDriverKeys = 10)
    assert(fb.select("id").collect().map(_.getLong(0)).toSet
      == fullScanMany(cur, (1 to 50).map(i => s"u$i@x.com")))
    // the fallback is built from the prep's CACHED listing and schema
    // (a CurrentTable.read here would re-pay the full bucket listing
    // and a footer-open schema inference per oversized probe): its
    // scan reads exactly the live bucket dirs, nothing else
    val fbDirs = fb.inputFiles
      .flatMap(_.split('/').find(_.startsWith("kb="))).toSet
    assert(fbDirs.size == new java.io.File(cur).listFiles()
      .count(_.getName.startsWith("kb=")), s"full scan expected: $fbDirs")
    assert(fb.inputFiles.forall(_.contains("/kb=")), "bucket files only")
    rd.close()
    // usable after close — re-prepares by itself
    assert(byReader("u65@x.com") == Set(65L))
    rd.close()
  }

  private def fullScanMany(cur: String, emails: Seq[String]): Set[Long] =
    CurrentTable.read(spark, cur)
      .filter(col("email").isin(emails: _*))
      .select("id").collect().map(_.getLong(0)).toSet

  test("a rescale rebuild RE-MEASURES auto-sized filters (rows/bucket " +
      "changed with the modulus) but keeps explicitly-sized ones") {
    val sink = Files.createTempDirectory("graft-bi-").resolve("s").toString
    val cur = Files.createTempDirectory("graft-bi-cur-").toString
    append(sink, (1L to 20000L).map(i => (i, s"u$i@x", "CREATE", 1000L + i)))
    CurrentTable.sync(spark, sink, cur, Seq("id"), buckets = 64)
    BucketIndex.attach(spark, cur, "email")            // auto
    BucketIndex.attach(spark, cur, "id", numBits = 2048) // fixed
    BucketIndex.attach(spark, cur, "_ts", numShards = 2) // auto-bits
    def metaOf(col: String, k: String): Int =
      java.nio.file.Files.readAllLines(java.nio.file.Paths.get(
          s"$cur/_index/$col/_meta.txt")).toArray.map(_.toString)
        .find(_.startsWith(k + "=")).get.stripPrefix(k + "=").toInt
    def bitsOf(col: String): Int = metaOf(col, "bits")
    // 20k rows / 64 buckets = 312/bucket -> ~3.1k bits -> 4096
    assert(bitsOf("email") == 4096, bitsOf("email").toString)
    // forced 2 shards, measured bits: 3120/2 -> 2048 per shard
    assert(bitsOf("_ts") == 2048 && metaOf("_ts", "shards") == 2)
    // shrink-rescale to 4 buckets: 5000 rows/bucket. Keeping 4096
    // bits would be ~0.8 bits/row — the silent near-full-scan the
    // attach doc promises rescale fixes. The rebuild must re-measure:
    // 50k bits -> 65536. The fixed-size index keeps its 2048.
    CurrentTable.rescale(spark, cur, Seq("id"), newBuckets = 4)
    append(sink, Seq((20001L, "late@x", "CREATE", 99000L)),
      dt = "2024-01-02")
    CurrentTable.sync(spark, sink, cur, Seq("id"))
    assert(bitsOf("email") == 65536, bitsOf("email").toString)
    assert(bitsOf("id") == 2048, bitsOf("id").toString)
    // auto-bits keeps the operator's 2 shards, re-measures per-shard
    // bits: 5000 rows/bucket -> 50k bits / 2 shards -> 32768
    assert(bitsOf("_ts") == 32768 && metaOf("_ts", "shards") == 2)
    assert(idsByIndex(cur, "u1234@x") == Set(1234L))
    assert(idsByIndex(cur, "late@x") == Set(20001L))
    BucketIndex.detach(spark, cur, "id")
    BucketIndex.detach(spark, cur, "_ts")
    // an UNRECOGNIZED sizing value (a future version's mode, a hand
    // edit) must read as fixed — the rebuild keeps the stored numbers
    // rather than silently re-measuring an intent this binary can't
    // parse (auto would give 32768 at 8 buckets; 65536 proves fixed)
    val metaPath = java.nio.file.Paths.get(s"$cur/_index/email/_meta.txt")
    val edited = new java.util.ArrayList[String]()
    java.nio.file.Files.readAllLines(metaPath).forEach(l => edited.add(
      if (l.startsWith("sizing=")) "sizing=mystery-mode" else l))
    java.nio.file.Files.write(metaPath, edited)
    java.nio.file.Files.deleteIfExists(
      metaPath.getParent.resolve("._meta.txt.crc"))
    CurrentTable.rescale(spark, cur, Seq("id"), newBuckets = 8)
    append(sink, Seq((20002L, "later@x", "CREATE", 99500L)),
      dt = "2024-01-03")
    CurrentTable.sync(spark, sink, cur, Seq("id"))
    assert(bitsOf("email") == 65536,
      s"unknown sizing must not re-measure: ${bitsOf("email")}")
    assert(idsByIndex(cur, "later@x") == Set(20002L))
    // the saturation warn branch: a forced shard count that can't
    // hold ~10 bits/row caps at MaxShardBits (and logs)
    assert(graft.ops.BucketIndex.autoSize(10000000L, forcedShards = 1)
      == ((graft.ops.BucketIndex.MaxShardBits, 1)))
  }

  test("validation: duplicate attach, unknown column, probe shape and " +
      "type, oversized probe falls back") {
    val sink = Files.createTempDirectory("graft-bi-").resolve("s").toString
    val cur = Files.createTempDirectory("graft-bi-cur-").toString
    append(sink, Seq((1L, "a@x", "CREATE", 1000L)))
    CurrentTable.sync(spark, sink, cur, Seq("id"), buckets = 4)
    intercept[IllegalArgumentException] {
      BucketIndex.attach(spark, cur, "nope")
    }
    BucketIndex.attach(spark, cur, "email")
    intercept[IllegalArgumentException] {
      BucketIndex.attach(spark, cur, "email")
    }
    intercept[IllegalArgumentException] { // wrong probe shape
      BucketIndex.lookupBy(spark, cur, "email",
        Seq(("a@x", 1)).toDF("email", "extra"))
    }
    // indexing a LONG column, probing with a double: renderings
    // diverge ("1" vs "1.0") — must fail loudly, not silently miss
    BucketIndex.attach(spark, cur, "id")
    intercept[IllegalArgumentException] {
      BucketIndex.lookupBy(spark, cur, "id", Seq(1.0).toDF("id"))
    }
    // an int probe of the long column renders identically — works
    assert(BucketIndex.lookupBy(spark, cur, "id", Seq(1).toDF("id"))
      .count() == 1)
    // oversized probe: correct via the full-scan fallback
    val big = (1 to 50).map(i => s"u$i@x").toDF("email")
    val got = BucketIndex.lookupBy(spark, cur, "email", big,
      maxDriverKeys = 10)
    assert(got.select("id").collect().map(_.getLong(0)).toSet.isEmpty ||
      got.count() >= 0) // shape-correct; only a@x exists and isn't probed
    assert(BucketIndex.lookupBy(spark, cur, "email",
      Seq("a@x").toDF("email"), maxDriverKeys = 10)
      .count() == 1)
    BucketIndex.detach(spark, cur, "id")
    assert(BucketIndex.list(spark, cur) == Seq("email"))
    // 'kb' is the bucket-layout column every build and probe keys by
    intercept[IllegalArgumentException] {
      BucketIndex.attach(spark, cur, "kb")
    }
    intercept[IllegalArgumentException] {
      BucketIndex.attach(spark, cur, "KB")
    }
  }

  test("grp=-granular GC reclaims a re-pointed group's bytes inside a " +
      "still-referenced dir; the immediately-previous pointer " +
      "survives exactly one publish (reader retention)") {
    val sink = Files.createTempDirectory("graft-bi-").resolve("s").toString
    val cur = Files.createTempDirectory("graft-bi-cur-").toString
    append(sink, (1L to 128L).map(i => (i, s"u$i@x.com", "CREATE", 1000L + i)))
    CurrentTable.sync(spark, sink, cur, Seq("id"), buckets = 16)
    BucketIndex.attach(spark, cur, "email", numGroups = 8)
    val ix = s"$cur/_index/email"
    def pointers(): Map[String, String] = pointersOf(cur)
    def exists(rel: String): Boolean =
      java.nio.file.Files.exists(java.nio.file.Paths.get(s"$ix/$rel"))
    val p0 = pointers()
    val dA = p0.values.head // the attach wrote ONE dir for all groups
    assert(p0.values.forall(_ == dA))
    // publish 1: one key's bucket re-points its group g to a new dir
    append(sink, Seq((7L, "m1@x.com", "UPDATE", 9000L)))
    CurrentTable.sync(spark, sink, cur, Seq("id"))
    val p1 = pointers()
    val gk = p1.collectFirst { case (k, v) if p0(k) != v => k }.get
    val g = gk.stripPrefix("g") // meta lines are "g<N>=dir"
    val d1 = p1(gk)
    // one-publish retention: the re-pointed group's OLD bytes survive
    // the publish that orphaned them (a reader that resolved pointers
    // just before the flip keeps reading intact files)
    assert(exists(s"$dA/grp=$g"), "one-publish retention for (dA, g)")
    // publish 2, same bucket: (dA, g) is now referenced by neither
    // the new manifest nor the immediately-previous one — its bytes
    // are reclaimed WHILE dA stays alive for the 7 groups still
    // pointing at it (the r14 whole-dir GC stranded them forever)
    append(sink, Seq((7L, "m2@x.com", "UPDATE", 9100L)))
    CurrentTable.sync(spark, sink, cur, Seq("id"))
    val p2 = pointers()
    assert(p2(gk) != d1 && (p2 - gk).values.forall(_ == dA))
    assert(!exists(s"$dA/grp=$g"),
      "dead group bytes inside a live dir must be reclaimed")
    val other = p2.keys.find(_ != gk).get.stripPrefix("g")
    assert(exists(s"$dA/grp=$other"), "live groups' bytes untouched")
    assert(exists(s"$d1/grp=$g"), "one-publish retention for (d1, g)")
    // publish 3: d1 (which only ever held group g) dies WHOLE
    append(sink, Seq((7L, "m3@x.com", "UPDATE", 9200L)))
    CurrentTable.sync(spark, sink, cur, Seq("id"))
    assert(!exists(d1), "a dir with no referenced pair dies whole")
    // probes stay exact through the reclamation
    assert(idsByIndex(cur, "m3@x.com") == Set(7L))
    assert(idsByIndex(cur, "m1@x.com").isEmpty)
    assert(idsByIndex(cur, "u100@x.com") == Set(100L))
  }

  test("a rescale-stale index rebuilds even on a sync that folds " +
      "NOTHING — the prune must not stay lost behind empty batches") {
    val sink = Files.createTempDirectory("graft-bi-").resolve("s").toString
    val cur = Files.createTempDirectory("graft-bi-cur-").toString
    append(sink, (1L to 40L).map(i => (i, s"u$i@x", "CREATE", 1000L + i)))
    CurrentTable.sync(spark, sink, cur, Seq("id"), buckets = 4)
    BucketIndex.attach(spark, cur, "email")
    CurrentTable.rescale(spark, cur, Seq("id"), newBuckets = 9)
    // zero-delta sync: every sink file is already folded, so the
    // sync takes the fresh.isEmpty early return — which must still
    // pay the rebuild debt (the same hook covers a legacy sidecar)
    val (nf, _) = CurrentTable.sync(spark, sink, cur, Seq("id"))
    assert(nf == 0, s"expected a zero-delta sync, folded $nf")
    assert(idsByIndex(cur, "u13@x") == Set(13L))
    val readPruned = byIndex(cur, "u13@x").inputFiles
      .flatMap(_.split('/').find(_.startsWith("kb="))).toSet
    assert(readPruned.size < 9,
      s"zero-delta sync must rebuild the index: read $readPruned")
  }

  test("a legacy meta with no data pointer fails loudly at reader " +
      "prepare — matching lookupBy, never 'zero live indexed values'") {
    val sink = Files.createTempDirectory("graft-bi-").resolve("s").toString
    val cur = Files.createTempDirectory("graft-bi-cur-").toString
    append(sink, Seq((1L, "a@x", "CREATE", 1000L)))
    CurrentTable.sync(spark, sink, cur, Seq("id"), buckets = 4)
    BucketIndex.attach(spark, cur, "email")
    val metaPath = java.nio.file.Paths.get(s"$cur/_index/email/_meta.txt")
    val kept = new java.util.ArrayList[String]()
    java.nio.file.Files.readAllLines(metaPath).forEach(l =>
      if (l.startsWith("nb=") || l.startsWith("bits=")) kept.add(l))
    java.nio.file.Files.write(metaPath, kept)
    java.nio.file.Files.deleteIfExists(
      metaPath.getParent.resolve("._meta.txt.crc"))
    val e1 = intercept[IllegalStateException] {
      BucketIndex.reader(spark, cur, "email")
    }
    assert(e1.getMessage.contains("no published data"), e1.getMessage)
    val e2 = intercept[IllegalStateException] { byIndex(cur, "a@x") }
    assert(e2.getMessage.contains("no published data"), e2.getMessage)
  }

  test("auto-sizing measures the p99 per-bucket live count, not the " +
      "global average: a hot bucket ~10x the rest keeps ~1% fpp") {
    val sink = Files.createTempDirectory("graft-bi-").resolve("s").toString
    val cur = Files.createTempDirectory("graft-bi-cur-").toString
    // 4000 uniform keys into 8 buckets, then thin every bucket but
    // the hottest to a tenth with DELETEs: live ≈ hot 500, rest 50
    append(sink, (1L to 4000L).map(i => (i, s"u$i@x", "CREATE", 1000L + i)))
    CurrentTable.sync(spark, sink, cur, Seq("id"), buckets = 8)
    val byBucket = CurrentTable.read(spark, cur).select("id", "kb")
      .collect().map(r => r.getLong(0) -> r.getInt(1))
    val hot = byBucket.groupBy(_._2).view.mapValues(_.size).maxBy(_._2)._1
    val doomed = byBucket.collect {
      case (id, b) if b != hot && id % 10 != 0L =>
        (id, s"u$id@x", "DELETE", 5000L + id)
    }
    append(sink, doomed.toSeq, dt = "2024-01-02")
    CurrentTable.sync(spark, sink, cur, Seq("id"))
    BucketIndex.attach(spark, cur, "email")
    // p99 (= max at 8 buckets) ≈ 500 rows → 8192 bits. The global
    // average saw ~106 rows/bucket → 2048 bits → ~18% fpp on the hot
    // bucket: roughly every 6th probe reading the BIGGEST bucket for
    // nothing, exactly where probes concentrate
    val bits = java.nio.file.Files.readAllLines(java.nio.file.Paths.get(
        s"$cur/_index/email/_meta.txt")).toArray.map(_.toString)
      .find(_.startsWith("bits=")).get.stripPrefix("bits=").toInt
    assert(bits == 8192, s"p99 sizing expected 8192 bits, got $bits")
    // measured: absent-value probes include the hot bucket among the
    // candidates at ≈ its fpp (~0.3% at 10 bits/row; ~18% under
    // average sizing would put ~7 of 40 here)
    import graft.ops.BucketIndex.candidateFrameFor
    val hotHits = (1 to 40).count { i =>
      candidateFrameFor(spark, cur, "email", Seq(s"ghost$i@x").toDF("email"))
        .collect().map(_.getInt(0)).contains(hot)
    }
    assert(hotHits <= 3, s"hot-bucket candidacy $hotHits/40 — fpp degraded")
    // probes stay exact on the skewed layout
    assert(idsByIndex(cur, "u10@x") == Set(10L))
    // capacityAdvice shares the statistic: a healthy-but-skewed table
    // is silent (a stable outlier can never advise a re-attach that
    // re-attaching would not fix)
    assert(BucketIndex.capacityAdvice(spark, cur, "email").isEmpty)
  }

  test("capacityAdvice fires when the table outgrows the attach " +
      "sizing, names the exact re-attach, and is silent while healthy " +
      "or awaiting the rescale rebuild that re-measures anyway") {
    val sink = Files.createTempDirectory("graft-bi-").resolve("s").toString
    val cur = Files.createTempDirectory("graft-bi-cur-").toString
    append(sink, (1L to 32L).map(i => (i, s"u$i@x", "CREATE", 1000L + i)))
    CurrentTable.sync(spark, sink, cur, Seq("id"), buckets = 4)
    BucketIndex.attach(spark, cur, "email") // ~8 rows/bucket → 1024 bits
    assert(BucketIndex.capacityAdvice(spark, cur, "email").isEmpty,
      "healthy at attach time")
    // grow ~60x: ~510 rows/bucket against 1024 bits ≈ 2 bits/row —
    // the sidecar's own nrows counts (refreshed by the sync's bloom
    // recompute) feed the measurement, zero table reads
    append(sink, (33L to 2032L).map(i => (i, s"u$i@x", "CREATE", 2000L + i)),
      dt = "2024-01-02")
    CurrentTable.sync(spark, sink, cur, Seq("id"))
    val st = BucketIndex.capacityAdvice(spark, cur, "email")
      .getOrElse(fail("advice must fire at ~2 bits/row"))
    assert(st.bits == 1024 && st.shards == 1 && st.bitsPerRow < 5.0, st)
    assert(st.knownBuckets == 4, st.toString)
    assert(st.call.contains(s"""BucketIndex.attach(spark, "$cur", "email")"""),
      st.call)
    assert(st.call.contains("detach"), st.call)
    // rescale-stale: silent (the next sync's rebuild re-measures)
    CurrentTable.rescale(spark, cur, Seq("id"), newBuckets = 8)
    assert(BucketIndex.capacityAdvice(spark, cur, "email").isEmpty,
      "rescale-stale must not advise a manual fix the sync applies")
    // the zero-delta sync rebuilds AND re-measures: healthy again
    CurrentTable.sync(spark, sink, cur, Seq("id"))
    assert(idsByIndex(cur, "u1234@x") == Set(1234L))
    assert(BucketIndex.capacityAdvice(spark, cur, "email").isEmpty,
      "re-measured sizing must read healthy")
  }

  /** The shared pre-measurement doctor (see [[SidecarTestOps]]),
    * pinned to this suite's "email" column.
    */
  private def dropCounts(cur: String, keepKb: Set[Int]): Unit =
    SidecarTestOps.dropCounts(spark, cur, "email", keepKb)

  test("capacityAdvice on a count-less (pre-measurement) sidecar " +
      "advises the measuring re-attach instead of a hot-biased " +
      "verdict or silence; counts regained by a sync restore the " +
      "measured path") {
    val sink = Files.createTempDirectory("graft-bi-").resolve("s").toString
    val cur = Files.createTempDirectory("graft-bi-cur-").toString
    // a HEALTHY table whose sidecar predates the counts on 3 of 4
    // buckets — the blind shape: grown-then-static would look exactly
    // like this, and the known (recently-touched = hottest) minority
    // must not produce a measured verdict either way
    append(sink, (1L to 32L).map(i => (i, s"u$i@x", "CREATE", 1000L + i)))
    CurrentTable.sync(spark, sink, cur, Seq("id"), buckets = 4)
    BucketIndex.attach(spark, cur, "email")
    assert(BucketIndex.capacityAdvice(spark, cur, "email").isEmpty)
    dropCounts(cur, keepKb = Set(0))
    val st = BucketIndex.capacityAdvice(spark, cur, "email")
      .getOrElse(fail("a count-less majority must surface, not hide"))
    assert(st.reason == "counts-unknown", st.toString)
    assert(st.unknownBuckets == 3 && st.knownBuckets == 1, st.toString)
    assert(st.call.contains("detach") && st.call.contains("attach"),
      st.call)
    // the cron-ordering size signal: one known bucket of four, so
    // the estimate is 4x its count (= the p99 of a single count)
    assert(st.approxLiveRows == 4 * st.sizingRowsPerBucket,
      st.toString)
    // probes still serve exactly through the doctored sidecar
    assert(idsByIndex(cur, "u7@x") == Set(7L))
    // counts exactly half-known is still unmeasurable (the doc's
    // "more than half" bound)
    dropCounts(cur, keepKb = Set(0, 1))
    assert(BucketIndex.capacityAdvice(spark, cur, "email")
      .exists(_.reason == "counts-unknown"))
    // NO bucket counted: size unknowable — the signal is -1 (order
    // these separately), never a fabricated zero that reads "empty"
    dropCounts(cur, keepKb = Set.empty)
    val blind = BucketIndex.capacityAdvice(spark, cur, "email")
      .getOrElse(fail("fully count-less sidecar must surface"))
    assert(blind.reason == "counts-unknown" &&
      blind.approxLiveRows == -1L, blind.toString)
    // a sync refreshes exactly the TOUCHED buckets' counts — a
    // 32-key delta lands in all four, so every bucket re-publishes
    // with a fresh count: measured again, and a healthy table goes
    // back to silent
    append(sink, (33L to 64L).map(i => (i, s"u$i@x", "CREATE", 2000L + i)),
      dt = "2024-01-02")
    CurrentTable.sync(spark, sink, cur, Seq("id"))
    assert(BucketIndex.capacityAdvice(spark, cur, "email").isEmpty,
      "fully-counted healthy table must be silent again")
    // known-majority with one stale bucket: the measured verdict
    // stands (here: grown past the sizing -> outgrown, with the
    // unknown bucket reported, not silently folded in)
    append(sink, (65L to 2064L).map(i => (i, s"u$i@x", "CREATE", 3000L + i)),
      dt = "2024-01-03")
    CurrentTable.sync(spark, sink, cur, Seq("id"))
    dropCounts(cur, keepKb = Set(0, 1, 2))
    val grown = BucketIndex.capacityAdvice(spark, cur, "email")
      .getOrElse(fail("grown table with known majority must advise"))
    assert(grown.reason == "outgrown", grown.toString)
    assert(grown.unknownBuckets == 1 && grown.knownBuckets == 3,
      grown.toString)
    assert(grown.bitsPerRow < 5.0, grown.toString)
    // the estimate (known sum scaled to all 4 buckets) lands near the
    // true 2064 live rows — close enough to order a re-attach queue
    assert(grown.approxLiveRows > 1500L && grown.approxLiveRows < 2700L,
      grown.toString)
  }
}
