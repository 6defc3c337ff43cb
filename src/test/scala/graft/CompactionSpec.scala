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
}
