package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.model.{TableRegistry, TableSpec}
import graft.ops.TimeTravel
import graft.streaming.{CdcConfig, CdcPipeline}

/** Time-travel reads over a sink the REAL pipeline wrote: state as of
  * each cutoff matches the hand-derived truth, same-millisecond
  * transaction rows resolve by binlog position, snapshot READ rows
  * sort before any change, and the dt cutoff prunes partitions.
  */
class TimeTravelSpec extends AnyFunSuite {
  lazy val spark = TestSpark.session

  private val usersSchema = org.apache.spark.sql.types.StructType(Seq(
    org.apache.spark.sql.types.StructField("id",
      org.apache.spark.sql.types.IntegerType),
    org.apache.spark.sql.types.StructField("name",
      org.apache.spark.sql.types.StringType)))

  private def row(op: String, ts: Long, pos: Long, id: Int,
      name: String): String =
    s"""{"_op":"$op","_ts":$ts,"_db":"tt","_database":"tt","_tbl":"users",""" +
      s""""id":{"int":$id},"name":{"string":"$name"},""" +
      s""""_binlog_file":"b.000001","_binlog_pos_end":"$pos",""" +
      s""""_binlog_file_internal":"b.000001","_binlog_pos_internal":"$pos"}"""

  test("asOf reconstructs state at every cutoff from the pipeline's sink") {
    val in = Files.createTempDirectory("graft-tt-in-")
    val out = Files.createTempDirectory("graft-tt-out-")
    val t0 = 1700000000000L // 2023-11-14
    val t1 = t0 + 100000
    val t2 = t0 + 200000
    val t3 = t0 + 86600000L // next day
    Files.write(in.resolve("00.jsonl"), java.util.List.of(
      // snapshot rows: null internal offsets on the feed path too —
      // the pipeline's READ rows must sort before any real position
      row("READ", t0, 0, 1, "alice").replaceAll(
        """"_binlog_file_internal":"b\.000001","_binlog_pos_internal":"0"""",
        """"_binlog_file_internal":null,"_binlog_pos_internal":null"""),
      row("READ", t0, 0, 2, "bob").replaceAll(
        """"_binlog_file_internal":"b\.000001","_binlog_pos_internal":"0"""",
        """"_binlog_file_internal":null,"_binlog_pos_internal":null"""),
      row("CREATE", t1, 100, 3, "carol"),
      // same-millisecond transaction: update then delete of id 1 —
      // position, not _ts, must decide which is latest
      row("UPDATE", t2, 200, 1, "alice2"),
      row("DELETE", t2, 201, 1, "alice2"),
      row("UPDATE", t3, 300, 2, "bob2")))
    val p = new CdcPipeline(spark, CdcConfig("tt",
      TableRegistry(Seq(TableSpec("tt", "users", usersSchema))),
      out.toString))
    p.runAvailableNow(in.toString,
      Files.createTempDirectory("graft-tt-ck-").toString)
    val dir = s"$out/tt_tt__users"

    def state(ts: Long): Map[Int, String] =
      TimeTravel.asOfDir(spark, dir, Seq("id"), ts)
        .select("id", "name").collect()
        .map(r => r.getInt(0) -> r.getString(1)).toMap

    assert(state(t0) == Map(1 -> "alice", 2 -> "bob"))
    assert(state(t1) == Map(1 -> "alice", 2 -> "bob", 3 -> "carol"))
    // at t2 the same-ms delete (pos 201) beats the update (pos 200)
    assert(state(t2) == Map(2 -> "bob", 3 -> "carol"))
    assert(state(t3) == Map(2 -> "bob2", 3 -> "carol"))
    assert(TimeTravel.currentState(spark, dir, Seq("id"))
      .select("id", "name").collect()
      .map(r => r.getInt(0) -> r.getString(1)).toMap ==
      Map(2 -> "bob2", 3 -> "carol"))

    // the day-1 cutoff prunes the day-2 partition out of the scan
    val plan = TimeTravel.asOfDir(spark, dir, Seq("id"), t2)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") &&
      plan.contains("2023-11-14"), s"no dt prune in plan:\n$plan")
  }
}
