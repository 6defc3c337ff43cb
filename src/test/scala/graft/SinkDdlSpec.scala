package graft

import java.nio.file.{Files, Path}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.model.{TableRegistry, TableSpec}
import graft.streaming.{CdcConfig, CdcPipeline, SinkDdl}

/** The reference's planned CREATE TABLE auto-generation
  * (`README.md:67`): the generated Spark SQL must actually register
  * the written sink — `spark.sql(ddl)` + repair, then `spark.table`
  * reads the parquet the pipeline wrote, partitions included.
  */
class SinkDdlSpec extends AnyFunSuite {
  lazy val spark: SparkSession = TestSpark.session

  private val usersSchema = StructType(Seq(
    StructField("id", IntegerType), StructField("name", StringType),
    StructField("balance", StringType)))

  def tmp(): Path = Files.createTempDirectory("graft-ddlgen-")

  test("generated CREATE TABLE round-trips the written sink") {
    val in = tmp(); val out = tmp()
    Files.write(in.resolve("00.jsonl"), Seq(
      """{"_op":"CREATE","_ts":1700000000000,"_db":"testdb","_tbl":"users","id":{"int":1},"name":{"string":"a"},"balance":{"string":"5.00"},"_binlog_file":"f1","_binlog_pos_end":"10","_binlog_file_internal":"f1","_binlog_pos_internal":"16"}""",
      """{"_op":"CREATE","_ts":1700100000000,"_db":"testdb","_tbl":"users","id":{"int":2},"name":{"string":"b"},"balance":null,"_binlog_file":"f1","_binlog_pos_end":"20","_binlog_file_internal":"f1","_binlog_pos_internal":"26"}""",
      """{"_ddl":"CREATE INDEX i1 ON users (id)","_ddl_tbl":"users","_ts":1700000001000,"_db":"testdb","_binlog_file":"f1","_binlog_pos_end":"30"}""")
      .mkString("\n").getBytes)
    val cfg = CdcConfig("ddlgen",
      TableRegistry(Seq(TableSpec("testdb", "users", usersSchema))),
      out.toString)
    new CdcPipeline(spark, cfg)
      .runAvailableNow(in.toString, tmp().resolve("ck").toString)

    val ddl = SinkDdl.createTableSql(cfg)
    // every routed table + the per-db DDL side table
    assert(ddl.keySet == Set("ddlgen_testdb__users", "ddlgen_testdb_ddl"))
    val create = ddl("ddlgen_testdb__users").head
    assert(create.contains("`id` INT") && create.contains("`_ts` BIGINT") &&
      create.contains("PARTITIONED BY (`dt`)"), create)

    for (name <- ddl.keys; stmt <- ddl(name)) spark.sql(stmt)
    try {
      // the catalog table reads what the pipeline wrote — two data
      // rows over two dt partitions, one recorded DDL event
      val users = spark.table("ddlgen_testdb__users")
      assert(users.count() == 2)
      assert(users.select("dt").distinct().count() == 2)
      assert(users.schema("balance").dataType == StringType)
      val ddlT = spark.table("ddlgen_testdb_ddl")
      assert(ddlT.count() == 1)
      assert(ddlT.select("_ddl").head.getString(0).startsWith("CREATE INDEX"))
    } finally for (name <- ddl.keys)
      spark.sql(s"DROP TABLE IF EXISTS `$name`")
  }
}
