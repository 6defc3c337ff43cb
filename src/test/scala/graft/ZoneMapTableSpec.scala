package graft

import java.nio.file.Files

import org.apache.spark.sql.catalyst.expressions.{AttributeReference, EqualTo, Expression, GreaterThanOrEqual, In, IsNotNull, LessThanOrEqual, Literal, Or}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{ZoneMapFileIndex, ZoneMapTable, ZoneMaps}

/** Planner-integrated zone maps: `ZoneMapTable` must answer exactly
  * like a plain parquet read for EVERY filter shape (supported
  * shapes prune files, unsupported shapes prune nothing — both are
  * invisible in the answer), and the `ZoneMapFileIndex` verdicts are
  * asserted directly at `listFiles` granularity where the pruning
  * arithmetic is deterministic.
  */
class ZoneMapTableSpec extends AnyFunSuite {
  lazy val spark = TestSpark.session
  import spark.implicits._

  private def tmp(prefix: String) =
    Files.createTempDirectory(prefix).toString

  /** Range-clustered fixture: 10 files, k contiguous per file, a
    * string column riding along. Returns (dataDir, manifestDir).
    */
  private def clustered(bloom: Boolean = false): (String, String) = {
    val dir = tmp("graft-zmt-")
    val man = tmp("graft-zmt-man-")
    spark.range(1000).select(col("id").as("k"),
        (col("id") % 7).as("m"),
        concat(lit("v"), lpad(col("id").cast("string"), 4, "0")).as("s"))
      .repartitionByRange(10, col("k"))
      .write.mode("overwrite").parquet(dir)
    ZoneMaps.build(spark, dir, man, Seq("k", "s"),
      bloomColumns = if (bloom) Seq("k") else Nil)
    (dir, man)
  }

  private def attr(n: String): AttributeReference =
    AttributeReference(n, LongType)()

  private def filesOf(idx: ZoneMapFileIndex, filters: Expression*): Int =
    idx.listFiles(Nil, filters).map(_.files.size).sum

  test("listFiles prunes by range, equality, IsNotNull, In, and Or; " +
      "keeps everything for shapes it cannot prove") {
    val (dir, man) = clustered()
    val idx = new ZoneMapFileIndex(spark, dir, man)
    val all = filesOf(idx)
    assert(all >= 8, s"fixture wrote too few files: $all")
    val k = attr("k")

    // k BETWEEN 100 AND 199 → 1-2 contiguous files
    assert(filesOf(idx, GreaterThanOrEqual(k, Literal(100L)),
      LessThanOrEqual(k, Literal(199L))) <= 2)
    // k = 500 → 1 file
    assert(filesOf(idx, EqualTo(k, Literal(500L))) == 1)
    // literal-first spelling is normalized the same way
    assert(filesOf(idx, EqualTo(Literal(500L), k)) == 1)
    // out-of-domain point → 0 files
    assert(filesOf(idx, EqualTo(k, Literal(5000L))) == 0)
    // In list spanning two distant stripes → ≤ 2 files
    assert(filesOf(idx, In(k, Seq(Literal(10L), Literal(990L)))) <= 2)
    // Or of two ranges → union of their stripes
    assert(filesOf(idx, Or(
      org.apache.spark.sql.catalyst.expressions.And(
        GreaterThanOrEqual(k, Literal(0L)), LessThanOrEqual(k, Literal(49L))),
      org.apache.spark.sql.catalyst.expressions.And(
        GreaterThanOrEqual(k, Literal(950L)),
        LessThanOrEqual(k, Literal(999L))))) <= 2)
    // IsNotNull on a fully-populated fixture keeps everything
    assert(filesOf(idx, IsNotNull(k)) == all)
    // a conjunct on an UNINDEXED column proves nothing — all kept
    assert(filesOf(idx, EqualTo(attr("m"), Literal(3L))) == all)
    // ...but an indexed conjunct beside it still prunes
    assert(filesOf(idx, EqualTo(attr("m"), Literal(3L)),
      EqualTo(k, Literal(500L))) == 1)
    // cross-type literal (int vs long stats) proves nothing — kept
    assert(filesOf(idx,
      EqualTo(AttributeReference("k",
        org.apache.spark.sql.types.IntegerType)(), Literal(500))) == all)
  }

  test("table() answers every filter shape exactly like the plain " +
      "parquet read") {
    val (dir, man) = clustered()
    val plain = spark.read.parquet(dir)
    val zm = ZoneMapTable(spark, dir, man)
    assert(zm.schema == plain.schema)

    def check(f: org.apache.spark.sql.DataFrame
        => org.apache.spark.sql.DataFrame): Unit = {
      val a = f(zm).collect().map(_.toSeq).toSet
      val b = f(plain).collect().map(_.toSeq).toSet
      assert(a == b, s"zone-map table diverged: ${a.size} vs ${b.size} rows")
    }
    check(_.filter(col("k").between(100, 299)))
    check(_.filter(col("k") === 500))
    check(_.filter(col("k").isin(10, 990, 5000)))
    check(_.filter(col("k") > 900 || col("k") < 50))
    check(_.filter(col("s") >= "v0100" && col("s") <= "v0199"))
    // unsupported shape (endsWith) — no pruning, still exact
    check(_.filter(col("s").endsWith("42")))
    // filter on the unindexed column composes with an indexed one
    check(_.filter(col("m") === 3 && col("k") <= 99))
    // aggregate through the pruned scan
    check(_.filter(col("k").between(0, 499)).groupBy("m")
      .agg(count(lit(1)).as("n"), sum("k").as("sk")).orderBy("m"))
    // and SQL over a temp view sees the same pruning path
    zm.createOrReplaceTempView("zm_events")
    val sqlGot = spark.sql(
      "SELECT count(*) FROM zm_events WHERE k BETWEEN 100 AND 199")
      .as[Long].head()
    assert(sqlGot == 100L)
  }

  test("equality probes the Bloom grid when the manifest carries one " +
      "(scattered layout: ranges prune nothing, the grid still skips)") {
    val dir = tmp("graft-zmt-")
    val man = tmp("graft-zmt-man-")
    // hash-scattered: every file's [min, max] spans ~the whole domain
    spark.range(2000).select(col("id").as("k"))
      .repartition(8, col("k"))
      .write.mode("overwrite").parquet(dir)
    ZoneMaps.build(spark, dir, man, Seq("k"), bloomColumns = Seq("k"))
    val idx = new ZoneMapFileIndex(spark, dir, man)
    val all = filesOf(idx)
    val k = attr("k")
    // range test alone cannot skip a scattered layout...
    assert(filesOf(idx, GreaterThanOrEqual(k, Literal(100L)),
      LessThanOrEqual(k, Literal(101L))) == all)
    // ...the bloom-sharpened equality reads ~1 file (fp ≤ a couple)
    val hit = filesOf(idx, EqualTo(k, Literal(1024L)))
    assert(hit <= 3, s"bloom did not skip: $hit of $all files")
    // answers stay exact through the probe
    val zm = ZoneMapTable(spark, dir, man)
    assert(zm.filter(col("k") === 1024).as[Long].collect().toSeq
      == Seq(1024L))
    assert(idx.prunedFileCount.get() > 0)
  }

  test("dt-partitioned sink: partition pruning and manifest pruning " +
      "compose; unindexed (stale) files are always kept") {
    val dir = tmp("graft-zmt-")
    val man = tmp("graft-zmt-man-")
    spark.range(400).select(col("id").as("k"),
        when(col("id") < 200, "2024-01-01").otherwise("2024-01-02").as("dt"))
      .repartitionByRange(8, col("dt"), col("k"))
      .write.mode("overwrite").partitionBy("dt").parquet(dir)
    ZoneMaps.build(spark, dir, man, Seq("k"))
    // stale append: new keys, not refreshed into the manifest
    spark.range(9000, 9100).select(col("id").as("k"),
        lit("2024-01-03").as("dt")).coalesce(1)
      .write.mode("append").partitionBy("dt").parquet(dir)

    val zm = ZoneMapTable(spark, dir, man)
    val plain = spark.read.parquet(dir)
    // partition column survives as a real column
    assert(zm.columns.contains("dt"))
    // data-filter answers match (stale file over-read, never missed)
    assert(zm.filter(col("k") >= 9000).count()
      == plain.filter(col("k") >= 9000).count())
    // partition + data filters together
    val a = zm.filter(col("dt") === "2024-01-01" && col("k") < 50).count()
    val b = plain.filter(col("dt") === "2024-01-01" && col("k") < 50).count()
    assert(a == b && a == 50)
    // at listFiles granularity: the unindexed file survives a verdict
    // that excludes every indexed file
    val idx = new ZoneMapFileIndex(spark, dir, man)
    val k = attr("k")
    assert(filesOf(idx, EqualTo(k, Literal(9050L))) == 1)
  }

  test("all-NULL stripes: IsNotNull skips them at file granularity") {
    val dir = tmp("graft-zmt-")
    val man = tmp("graft-zmt-man-")
    spark.range(100).select(col("id").as("k")).coalesce(1)
      .write.mode("overwrite").parquet(dir)
    Seq.fill(7)(Option.empty[Long]).toDF("k").coalesce(1)
      .write.mode("append").parquet(dir)
    ZoneMaps.build(spark, dir, man, Seq("k"))
    val idx = new ZoneMapFileIndex(spark, dir, man)
    assert(filesOf(idx) == 2)
    assert(filesOf(idx, IsNotNull(attr("k"))) == 1)
    // and a comparison alone also skips the NULL stripe (NULL stats
    // collapse to skip at the leaf)
    assert(filesOf(idx, GreaterThanOrEqual(attr("k"), Literal(0L))) == 1)
    val zm = ZoneMapTable(spark, dir, man)
    assert(zm.filter(col("k").isNotNull).count() == 100)
    assert(zm.filter(col("k").isNull).count() == 7) // unprunable, exact
  }
}
