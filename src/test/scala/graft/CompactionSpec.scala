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
}
