package graft

import java.nio.file.{Files, Path}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.model.{TableRegistry, TableSpec}
import graft.streaming.{CdcConfig, CdcPipeline}

/** J1 checkpoint semantics: a second run over the same checkpoint
  * processes only new files (exactly-once at the file-source level);
  * plus the PG DDL routing fix and dt-partition pruning on the lake
  * the pipeline writes.
  */
class CdcResumeSpec extends AnyFunSuite {
  lazy val spark: SparkSession = TestSpark.session

  val schema = StructType(Seq(StructField("id", IntegerType)))

  def row(op: String, ts: Long, id: Int, pos: Long): String =
    s"""{"_op":"$op","_ts":$ts,"_db":"d1","_tbl":"t1","id":{"int":$id},""" +
      s""""_binlog_file":"f1","_binlog_pos_end":"$pos"}"""

  test("restart with same checkpoint resumes where it left off") {
    val in = Files.createTempDirectory("graft-rs-in-")
    val out = Files.createTempDirectory("graft-rs-out-")
    val off = Files.createTempDirectory("graft-rs-off-")
    val ck = Files.createTempDirectory("graft-rs-ck-").toString
    val reg = TableRegistry(Seq(TableSpec("d1", "t1", schema)))
    def cfg = CdcConfig("rsrc", reg, out.toString,
      offsetStorePath = Some(off.toString))

    Files.write(in.resolve("00.jsonl"),
      Seq(row("CREATE", 1000L, 1, 10), row("CREATE", 2000L, 2, 20))
        .mkString("\n").getBytes)
    new CdcPipeline(spark, cfg).runAvailableNow(in.toString, ck)
    assert(spark.read.parquet(s"$out/rsrc_d1__t1").count() == 2)

    // second run, same checkpoint: only the new file is processed
    Files.write(in.resolve("01.jsonl"),
      Seq(row("UPDATE", 3000L, 1, 30)).mkString("\n").getBytes)
    val p2 = new CdcPipeline(spark, cfg)
    p2.runAvailableNow(in.toString, ck)
    val rows = spark.read.parquet(s"$out/rsrc_d1__t1")
    assert(rows.count() == 3) // no re-ingest of file 00
    // offset reflects the resumed batch only
    assert(p2.readStoredOffset(off.toString).contains("f1,30"))
    // and the restart counted only the new records
    assert(p2.recordCount == 1)
  }

  test("postgres DDL routes to {schema}_ddl side table") {
    val in = Files.createTempDirectory("graft-pgd-in-")
    val out = Files.createTempDirectory("graft-pgd-out-")
    Files.write(in.resolve("00.jsonl"), Seq(
      """{"_op":"CREATE","_ts":1,"_schema":"public","_tbl":"t1","id":{"int":1},"_lsn":"5"}""",
      """{"_ddl":"CREATE INDEX i1 ON t1 (id)","_ddl_tbl":"t1","_ts":2,"_schema":"public","_lsn":"6"}""")
      .mkString("\n").getBytes)
    val reg = TableRegistry(Seq(TableSpec("", "t1", schema)))
    val p = new CdcPipeline(spark, CdcConfig("pgs", reg, out.toString,
      sourceType = "postgres"))
    p.runAvailableNow(in.toString,
      Files.createTempDirectory("graft-pgd-ck-").toString)
    assert(!p.gate.stopped) // non-structural
    val ddl = spark.read.parquet(s"$out/pgs_public_ddl")
    assert(ddl.count() == 1)
    assert(ddl.select("_ddl").head.getString(0).startsWith("CREATE INDEX"))
  }

  test("dt partitions prune on the written lake") {
    val in = Files.createTempDirectory("graft-pp-in-")
    val out = Files.createTempDirectory("graft-pp-out-")
    // two distinct days
    Files.write(in.resolve("00.jsonl"),
      Seq(row("CREATE", 1700000000000L, 1, 1),   // 2023-11-14
        row("CREATE", 1700100000000L, 2, 2))     // 2023-11-16
        .mkString("\n").getBytes)
    val reg = TableRegistry(Seq(TableSpec("d1", "t1", schema)))
    new CdcPipeline(spark, CdcConfig("pps", reg, out.toString))
      .runAvailableNow(in.toString,
        Files.createTempDirectory("graft-pp-ck-").toString)
    val lake = spark.read.parquet(s"$out/pps_d1__t1")
    val pruned = lake.filter(col("dt") === "2023-11-14")
    val scan = pruned.queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters") &&
      scan.contains("dt#") , s"expected partition filters in:\n$scan")
    assert(pruned.count() == 1)
  }
}
