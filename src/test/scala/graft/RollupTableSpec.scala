package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.RollupTable
import graft.ops.RollupTable.{Agg, Spec}
import graft.streaming.CurrentTable

/** Maintained rollups: after every completed sync the rollup must
  * equal the grouped aggregate over CurrentTable.read exactly —
  * including the cases signed-delta maintenance gets wrong (a delete
  * removing a group's min/max holder) — and converge under the same
  * crash replay the table itself converges under.
  */
class RollupTableSpec extends AnyFunSuite {
  lazy val spark = TestSpark.session
  import spark.implicits._

  private def append(dir: String,
      rows: Seq[(Long, String, Double, String, Long)],
      dt: String = "2024-01-01"): Unit =
    rows.toDF("id", "cat", "amount", "_op", "_ts")
      .withColumn("_binlog_file_internal", lit("f1"))
      .withColumn("_binlog_pos_internal", col("_ts"))
      .withColumn("dt", lit(dt))
      .coalesce(1)
      .write.mode("append").partitionBy("dt").parquet(dir)

  private val spec = Spec(Seq("cat"), Seq(
    Agg("count", "*", "n"),
    Agg("sum", "amount", "total"),
    Agg("min", "amount", "lo"),
    Agg("max", "amount", "hi")))

  private def direct(cur: String): Set[(String, Long, Double, Double, Double)] =
    CurrentTable.read(spark, cur)
      .groupBy("cat")
      .agg(count(lit(1)).as("n"), sum("amount").as("total"),
        min("amount").as("lo"), max("amount").as("hi"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4))).toSet

  private def rolled(cur: String,
      name: String = "by_cat"): Set[(String, Long, Double, Double, Double)] =
    RollupTable.read(spark, cur, name)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4))).toSet

  private def metaNb(cur: String, name: String = "by_cat"): Int = {
    val src = scala.io.Source.fromFile(
      s"$cur/_rollup/$name/_meta.txt", "UTF-8")
    try src.getLines().find(_.startsWith("nb="))
      .map(_.stripPrefix("nb=").toInt).get
    finally src.close()
  }

  test("attach full-builds; each sync maintains incrementally; a " +
      "delete that removes a group's max holder is recomputed right") {
    val sink = Files.createTempDirectory("graft-ru-").resolve("s").toString
    val cur = Files.createTempDirectory("graft-ru-cur-").toString
    append(sink, Seq(
      (1L, "a", 10.0, "CREATE", 1000L),
      (2L, "a", 99.0, "CREATE", 1100L), // a's max holder
      (3L, "b", 5.0, "CREATE", 1200L),
      (4L, "b", 7.0, "CREATE", 1300L)))
    CurrentTable.sync(spark, sink, cur, Seq("id"), buckets = 8)
    RollupTable.attach(spark, cur, "by_cat", spec)
    assert(rolled(cur) == direct(cur))
    assert(rolled(cur) == Set(
      ("a", 2L, 109.0, 10.0, 99.0), ("b", 2L, 12.0, 5.0, 7.0)))

    // the anti-delta case: DELETE the max holder of 'a' — a signed
    // delta could subtract a sum but cannot "un-max"; per-bucket
    // recompute just re-derives it
    append(sink, Seq(
      (2L, "a", 99.0, "DELETE", 2000L),
      (5L, "b", 3.0, "CREATE", 2100L)))
    CurrentTable.sync(spark, sink, cur, Seq("id"))
    assert(rolled(cur) == direct(cur))
    assert(rolled(cur) == Set(
      ("a", 1L, 10.0, 10.0, 10.0), ("b", 3L, 15.0, 3.0, 7.0)))

    // a group emptied entirely drops from the rollup
    append(sink, Seq((1L, "a", 10.0, "DELETE", 3000L)))
    CurrentTable.sync(spark, sink, cur, Seq("id"))
    assert(rolled(cur) == direct(cur))
    assert(rolled(cur).map(_._1) == Set("b"))
  }

  test("partials are per-bucket and only the touched buckets' rows " +
      "change across a small delta") {
    val sink = Files.createTempDirectory("graft-ru-").resolve("s").toString
    val cur = Files.createTempDirectory("graft-ru-cur-").toString
    append(sink, (1L to 64L).map(i =>
      (i, if (i % 2 == 0) "even" else "odd", i.toDouble, "CREATE", 1000L + i)))
    CurrentTable.sync(spark, sink, cur, Seq("id"), buckets = 16)
    RollupTable.attach(spark, cur, "by_cat", spec)
    def partials(): DataFrame = {
      val src = scala.io.Source.fromFile(
        s"$cur/_rollup/by_cat/_meta.txt", "UTF-8")
      val data =
        try src.getLines().find(_.startsWith("data="))
          .map(_.stripPrefix("data=")).get
        finally src.close()
      spark.read.parquet(s"$cur/_rollup/by_cat/$data")
    }
    val before = partials().collect()
      .map(r => (r.getAs[Int]("kb"), r.getAs[String]("cat")) -> r.toSeq)
      .toMap
    // one-key delta: exactly one bucket's partials may differ
    append(sink, Seq((1L, "odd", 500.0, "UPDATE", 9000L)))
    CurrentTable.sync(spark, sink, cur, Seq("id"))
    val after = partials().collect()
      .map(r => (r.getAs[Int]("kb"), r.getAs[String]("cat")) -> r.toSeq)
      .toMap
    val changedBuckets = (before.keySet ++ after.keySet)
      .filter(k => before.get(k) != after.get(k)).map(_._1)
    assert(changedBuckets.size == 1,
      s"one touched bucket expected, got $changedBuckets")
    assert(rolled(cur) == direct(cur))
  }

  test("crash replay converges: re-folding the same files republishes " +
      "identical partials") {
    val sink = Files.createTempDirectory("graft-ru-").resolve("s").toString
    val cur = Files.createTempDirectory("graft-ru-cur-").toString
    append(sink, Seq(
      (1L, "a", 1.0, "CREATE", 1000L), (2L, "b", 2.0, "CREATE", 1100L)))
    CurrentTable.sync(spark, sink, cur, Seq("id"), buckets = 4)
    RollupTable.attach(spark, cur, "by_cat", spec)
    append(sink, Seq((1L, "a", 5.0, "UPDATE", 2000L)), dt = "2024-01-02")
    CurrentTable.sync(spark, sink, cur, Seq("id"))
    val settled = rolled(cur)
    // simulate a crash BEFORE the cursor advanced: drop the second
    // partition's sidecar so the replay re-lists its file as fresh
    // and re-folds it — the rollup must republish the same values
    val side = new java.io.File(s"$cur/_cursor")
      .listFiles().find(_.getName.contains("2024-01-02")).get
    assert(side.delete())
    CurrentTable.sync(spark, sink, cur, Seq("id"))
    assert(rolled(cur) == settled)
    assert(rolled(cur) == direct(cur))
  }

  test("a rescale is survived: reads stay correct on stale-modulus " +
      "partials, and the next sync rebuilds them under the new one") {
    val sink = Files.createTempDirectory("graft-ru-").resolve("s").toString
    val cur = Files.createTempDirectory("graft-ru-cur-").toString
    append(sink, (1L to 40L).map(i =>
      (i, s"c${i % 3}", i.toDouble, "CREATE", 1000L + i)))
    CurrentTable.sync(spark, sink, cur, Seq("id"), buckets = 4)
    RollupTable.attach(spark, cur, "by_cat", spec)
    CurrentTable.rescale(spark, cur, Seq("id"), newBuckets = 9)
    // partials still keyed under modulus 4 — summing across buckets
    // is modulus-independent, so the read is CORRECT, just stale-keyed
    assert(metaNb(cur) == 4)
    assert(rolled(cur) == direct(cur))
    append(sink, Seq((41L, "c0", 41.0, "CREATE", 5000L)),
      dt = "2024-01-02")
    CurrentTable.sync(spark, sink, cur, Seq("id"))
    assert(metaNb(cur) == 9, "sync after a rescale must rebuild the " +
      "partials under the new modulus")
    assert(rolled(cur) == direct(cur))
  }

  test("countd: merged bucket sketches equal the whole-table KMV " +
      "exactly, stay exact below k, and deletes shrink the count") {
    val sink = Files.createTempDirectory("graft-ru-").resolve("s").toString
    val cur = Files.createTempDirectory("graft-ru-cur-").toString
    append(sink, (1L to 64L).map(i =>
      (i, if (i <= 40) "a" else "b", i.toDouble, "CREATE", 1000L + i)))
    CurrentTable.sync(spark, sink, cur, Seq("id"), buckets = 8)
    RollupTable.attach(spark, cur, "d", Spec(Nil, Seq(
      Agg("countd", "cat", "d_cats"),         // 2 distinct < k: exact
      Agg("countd", "id", "d_ids", k = 16)))) // 64 > k: estimator path
    def readD(): (Double, Double) = {
      val r = RollupTable.read(spark, cur, "d").collect()(0)
      (r.getDouble(0), r.getDouble(1))
    }
    // the merged-sketch estimate must equal a DIRECT single-pass KMV
    // over the same live rows — k-min of unioned k-min sets is the
    // global k-min set, so this is exact equality, not approximate
    def directKmv(c: String, k: Int): Double =
      CurrentTable.read(spark, cur)
        .agg(graft.functions.KmvSketch.kmvDistinct(spark,
          graft.functions.KmvSketch.md5Hash60(col(c)), k))
        .collect()(0).getDouble(0)
    assert(readD() == ((2.0, directKmv("id", 16))))
    // delete every 'b' row: the recomputed bucket sketches drop the
    // values — the thing a delta-maintained sketch cannot do
    append(sink, (41L to 64L).map(i => (i, "b", i.toDouble, "DELETE", 5000L + i)))
    CurrentTable.sync(spark, sink, cur, Seq("id"))
    assert(readD() == ((1.0, directKmv("id", 16))))
  }

  test("countd k-mismatch at read fails loudly: a meta whose k shrank " +
      "under the stored sketches must not silently under-merge") {
    val sink = Files.createTempDirectory("graft-ru-").resolve("s").toString
    val cur = Files.createTempDirectory("graft-ru-cur-").toString
    append(sink, (1L to 64L).map(i =>
      (i, "a", i.toDouble, "CREATE", 1000L + i)))
    CurrentTable.sync(spark, sink, cur, Seq("id"), buckets = 4)
    RollupTable.attach(spark, cur, "d", Spec(Nil, Seq(
      Agg("countd", "id", "d_ids", k = 16))))
    // corrupt the meta: claim the sketches were built with k=4 (a
    // hand-edit or a future version changing defaults). Stored
    // arrays hold up to 16 values — merging them under k=4 would
    // treat a capped sketch's 4th value as the true 4th minimum.
    val metaPath = java.nio.file.Paths.get(s"$cur/_rollup/d/_meta.txt")
    val lines = java.nio.file.Files.readAllLines(metaPath)
    val edited = new java.util.ArrayList[String]()
    lines.forEach(l => edited.add(
      if (l.startsWith("agg=")) l.replace(":16", ":4") else l))
    java.nio.file.Files.write(metaPath, edited)
    // drop the local-FS checksum sidecar the out-of-band edit stales
    java.nio.file.Files.deleteIfExists(
      metaPath.getParent.resolve("._meta.txt.crc"))
    val e = intercept[Exception] {
      RollupTable.read(spark, cur, "d").collect()
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil
      else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(e).exists(_.contains("built with a larger k")),
      messages(e).mkString(" | "))
  }

  test("'kb' is reserved: a dim, measure output or measure column " +
      "named kb is rejected at Spec construction, not at the next sync") {
    intercept[IllegalArgumentException] {
      Spec(Seq("kb"), Seq(Agg("count", "*", "n")))
    }
    intercept[IllegalArgumentException] {
      Spec(Seq("cat"), Seq(Agg("count", "*", "KB")))
    }
    intercept[IllegalArgumentException] {
      Spec(Seq("cat"), Seq(Agg("sum", "kb", "s")))
    }
    // count(*) stays legal — the '*' placeholder is not a column
    Spec(Seq("cat"), Seq(Agg("count", "*", "n")))
  }

  test("global rollup (no dims), multiple rollups per table, list and " +
      "detach") {
    val sink = Files.createTempDirectory("graft-ru-").resolve("s").toString
    val cur = Files.createTempDirectory("graft-ru-cur-").toString
    append(sink, Seq(
      (1L, "a", 1.5, "CREATE", 1000L), (2L, "b", 2.5, "CREATE", 1100L)))
    CurrentTable.sync(spark, sink, cur, Seq("id"), buckets = 4)
    RollupTable.attach(spark, cur, "by_cat", spec)
    RollupTable.attach(spark, cur, "global",
      Spec(Nil, Seq(Agg("count", "*", "n"), Agg("sum", "amount", "total"))))
    assert(RollupTable.list(spark, cur) == Seq("by_cat", "global"))
    val g = RollupTable.read(spark, cur, "global").collect()
    assert(g.length == 1 && g(0).getLong(0) == 2L &&
      g(0).getDouble(1) == 4.0)
    // both maintained by one sync
    append(sink, Seq((3L, "a", 10.0, "CREATE", 2000L)))
    CurrentTable.sync(spark, sink, cur, Seq("id"))
    val g2 = RollupTable.read(spark, cur, "global").collect()
    assert(g2(0).getLong(0) == 3L && g2(0).getDouble(1) == 14.0)
    assert(rolled(cur) == direct(cur))
    RollupTable.detach(spark, cur, "global")
    assert(RollupTable.list(spark, cur) == Seq("by_cat"))
    intercept[IllegalStateException] {
      RollupTable.read(spark, cur, "global").collect()
    }
  }

  test("a fully-deleted table serves count 0 (not NULL) from a global " +
      "rollup, and publishes retain one previous generation") {
    val sink = Files.createTempDirectory("graft-ru-").resolve("s").toString
    val cur = Files.createTempDirectory("graft-ru-cur-").toString
    append(sink, Seq(
      (1L, "a", 1.0, "CREATE", 1000L), (2L, "b", 2.0, "CREATE", 1100L)))
    CurrentTable.sync(spark, sink, cur, Seq("id"), buckets = 4)
    RollupTable.attach(spark, cur, "g",
      Spec(Nil, Seq(Agg("count", "*", "n"), Agg("sum", "amount", "t"))))
    def dataDirs(): Int = new java.io.File(s"$cur/_rollup/g")
      .listFiles().count(f => f.isDirectory && f.getName.startsWith("d_"))
    assert(dataDirs() == 1)
    append(sink, Seq((1L, "a", 1.0, "DELETE", 2000L)))
    CurrentTable.sync(spark, sink, cur, Seq("id"))
    // one previous generation retained: a reader that resolved the
    // pointer just before this publish still has intact files
    assert(dataDirs() == 2)
    append(sink, Seq((2L, "b", 2.0, "DELETE", 3000L)))
    CurrentTable.sync(spark, sink, cur, Seq("id"))
    assert(dataDirs() == 2, "only ONE previous generation is retained")
    // every key dead: the exact-equality contract holds at zero —
    // count coalesces to 0 where a bare sum-of-partials would be NULL
    val r = RollupTable.read(spark, cur, "g").collect()
    assert(r.length == 1 && r(0).getLong(0) == 0L && r(0).isNullAt(1),
      s"got ${r.toSeq}")
  }

  test("attach-then-populate: a ZERO-BUCKET table (q134's emptied " +
      "state) attaches against its recorded schema, serves the empty " +
      "rollup, and the next sync populates it") {
    val sink = Files.createTempDirectory("graft-ru-").resolve("s").toString
    val cur = Files.createTempDirectory("graft-ru-cur-").toString
    // reach the zero-bucket state the q134 way: populate, delete
    // everything, prune the tombstones past the horizon (empty
    // buckets drop at swap — only the #schema root line remains)
    append(sink, Seq(
      (1L, "a", 1.0, "CREATE", 1000L), (2L, "b", 2.0, "CREATE", 1100L)))
    CurrentTable.sync(spark, sink, cur, Seq("id"), buckets = 4)
    append(sink, Seq(
      (1L, "a", 1.0, "DELETE", 2000L), (2L, "b", 2.0, "DELETE", 2100L)))
    CurrentTable.sync(spark, sink, cur, Seq("id"))
    CurrentTable.pruneTombstones(spark, cur, Long.MaxValue)
    assert(!new java.io.File(cur).listFiles()
      .exists(_.getName.startsWith("kb=")), "fixture must be zero-bucket")
    // attach on the emptied table: the spec validates against the
    // recorded schema, the partials are trivially empty, reads serve
    RollupTable.attach(spark, cur, "by_cat", spec)
    assert(RollupTable.read(spark, cur, "by_cat").isEmpty)
    assert(rolled(cur) == direct(cur))
    // ...and a spec naming a column the schema DOESN'T have still
    // fails the attach loudly (the validation really ran)
    val bad = intercept[IllegalArgumentException] {
      RollupTable.attach(spark, cur, "bad",
        Spec(Seq("ghost"), Seq(Agg("count", "*", "n"))))
    }
    assert(bad.getMessage.contains("ghost"))
    // repopulate through the ordinary sync: the attached rollup is
    // maintained from its empty partials like any other
    append(sink, Seq(
      (3L, "a", 7.0, "CREATE", 3000L), (4L, "b", 9.0, "CREATE", 3100L)))
    CurrentTable.sync(spark, sink, cur, Seq("id"))
    assert(rolled(cur) == direct(cur))
    assert(rolled(cur) == Set(
      ("a", 1L, 7.0, 7.0, 7.0), ("b", 1L, 9.0, 9.0, 9.0)))
  }

  test("a crashed attach (data written, meta never landed) is " +
      "invisible and re-attachable, never wedged") {
    val sink = Files.createTempDirectory("graft-ru-").resolve("s").toString
    val cur = Files.createTempDirectory("graft-ru-cur-").toString
    append(sink, Seq((1L, "a", 1.0, "CREATE", 1000L)))
    CurrentTable.sync(spark, sink, cur, Seq("id"), buckets = 4)
    RollupTable.attach(spark, cur, "g",
      Spec(Nil, Seq(Agg("count", "*", "n"))))
    // fabricate the crash: the published meta vanishes, data remains
    assert(new java.io.File(s"$cur/_rollup/g/_meta.txt").delete())
    assert(RollupTable.list(spark, cur).isEmpty)
    // syncs ignore the residue rather than failing
    append(sink, Seq((2L, "b", 2.0, "CREATE", 2000L)))
    CurrentTable.sync(spark, sink, cur, Seq("id"))
    // re-attach heals: publish points at fresh data and GCs orphans
    RollupTable.attach(spark, cur, "g",
      Spec(Nil, Seq(Agg("count", "*", "n"))))
    assert(RollupTable.read(spark, cur, "g")
      .collect()(0).getLong(0) == 2L)
  }

  test("validation: bad ops, missing columns, duplicate attach, " +
      "attach before data, name hygiene") {
    intercept[IllegalArgumentException] {
      Spec(Seq("cat"), Seq(Agg("avg", "amount", "a")))
    }
    intercept[IllegalArgumentException] {
      Spec(Seq("cat"), Seq(Agg("sum", "*", "s")))
    }
    intercept[IllegalArgumentException] {
      Spec(Seq("cat"), Seq(
        Agg("sum", "amount", "x"), Agg("min", "amount", "x")))
    }
    intercept[IllegalArgumentException] {
      Spec(Seq("cat"), Seq(Agg("sum", "amount", "CAT")))
    }
    intercept[IllegalArgumentException] { // meta-format separators
      Spec(Seq("a,b"), Seq(Agg("count", "*", "n")))
    }
    intercept[IllegalArgumentException] {
      Spec(Seq("cat"), Seq(Agg("sum", "x:y", "n")))
    }
    val sink = Files.createTempDirectory("graft-ru-").resolve("s").toString
    val cur = Files.createTempDirectory("graft-ru-cur-").toString
    intercept[IllegalStateException] { // no table at all
      RollupTable.attach(spark, cur, "r", spec)
    }
    append(sink, Seq((1L, "a", 1.0, "CREATE", 1000L)))
    CurrentTable.sync(spark, sink, cur, Seq("id"), buckets = 4)
    intercept[IllegalArgumentException] { // column not in schema
      RollupTable.attach(spark, cur, "r",
        Spec(Seq("nope"), Seq(Agg("count", "*", "n"))))
    }
    RollupTable.attach(spark, cur, "r", spec)
    intercept[IllegalArgumentException] { // duplicate attach
      RollupTable.attach(spark, cur, "r", spec)
    }
    intercept[IllegalArgumentException] { // unsafe name
      RollupTable.attach(spark, cur, "../oops", spec)
    }
  }
}
