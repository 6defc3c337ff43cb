package graft

import java.nio.file.{Files, Path}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.model.{TableRegistry, TableSpec}
import graft.streaming.{CdcConfig, CdcPipeline}

/** P4-P6 offset-store flavors end-to-end: Postgres LSN, Mongo
  * timestamp, Oracle SCN — each with its source's routing shape
  * (bare table key + `_schema` / `_coll`) and offset format.
  */
class OffsetFlavorsSpec extends AnyFunSuite {
  lazy val spark: SparkSession = TestSpark.session

  def tmp(): Path = Files.createTempDirectory("graft-off-")

  def runFlavor(sourceType: String, lines: Seq[String],
      schema: StructType): (CdcPipeline, Path, Path) = {
    val in = tmp(); val out = tmp(); val off = tmp()
    Files.write(in.resolve("00.jsonl"),
      String.join("\n", lines: _*).getBytes)
    val reg = TableRegistry(Seq(TableSpec("", "t1", schema)))
    val p = new CdcPipeline(spark, CdcConfig(s"src_$sourceType", reg,
      out.toString, sourceType = sourceType,
      offsetStorePath = Some(off.toString)))
    p.runAvailableNow(in.toString, tmp().resolve("ck").toString)
    (p, out, off)
  }

  val schema = StructType(Seq(StructField("id", IntegerType)))

  test("postgres flavor: bare-table routing, LSN offset") {
    val (p, out, off) = runFlavor("postgres", Seq(
      """{"_op":"READ","_ts":1,"_schema":"public","_tbl":"t1","id":{"int":1},"_lsn":"900"}""",
      """{"_op":"CREATE","_ts":2,"_schema":"public","_tbl":"t1","id":{"int":2},"_lsn":"1001"}""",
      """{"_op":"UPDATE","_ts":3,"_schema":"public","_tbl":"t1","id":{"int":3},"_lsn":"950"}"""),
      schema)
    // max numeric LSN among non-READ records (900 is a READ, skipped)
    assert(p.readStoredOffset(off.toString).contains("1001"))
    assert(spark.read.parquet(s"$out/src_postgres_t1").count() == 3)
  }

  test("mongo flavor: collection routing, timestamp offset") {
    val (p, out, off) = runFlavor("mongodb", Seq(
      """{"_op":"READ","_ts":1700000005000,"_coll":"t1","id":{"int":1},"_txn_op_index":"1"}""",
      """{"_op":"CREATE","_ts":1700000001000,"_coll":"t1","id":{"int":2},"_txn_op_index":"2"}"""),
      schema)
    // READ skipped even though its _ts is larger
    assert(p.readStoredOffset(off.toString).contains("1700000001000"))
    val sink = spark.read.parquet(s"$out/src_mongodb_t1")
    assert(sink.count() == 2)
    // reference mongo sink schema keeps the intra-transaction
    // tiebreaker (`MongoDBStreamer.java:308-310`), not binlog fields
    assert(sink.columns.contains("_txn_op_index"))
    assert(!sink.columns.contains("_binlog_pos_internal"))
  }

  test("oracle flavor: raw r/c ops, SCN offset") {
    val (p, out, off) = runFlavor("oracle", Seq(
      """{"_op":"r","_ts":1,"_schema":"HR","_tbl":"t1","id":{"string":"1"},"_scn":"7000"}""",
      """{"_op":"c","_ts":2,"_schema":"HR","_tbl":"t1","id":{"string":"2"},"_scn":"5007"}"""),
      StructType(Seq(StructField("id", StringType))))
    // op "r" (snapshot) skipped; SCN compared numerically
    assert(p.readStoredOffset(off.toString).contains("5007"))
    val rows = spark.read.parquet(s"$out/src_oracle_t1")
    assert(rows.count() == 2)
    // Oracle all-string policy: id survives as string
    assert(rows.schema("id").dataType == StringType)
  }
}
