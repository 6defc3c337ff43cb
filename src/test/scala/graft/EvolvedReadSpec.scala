package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.EvolvedRead

/** Reading a logical table across its evolution fork: version
  * discovery (exact-name, dated-suffix only), name-aligned union with
  * backward null-fill and primitive widening, zone-map-backed version
  * scans, and the cross-version as-of state.
  */
class EvolvedReadSpec extends AnyFunSuite {
  lazy val spark = TestSpark.session
  import spark.implicits._

  /** A sink root holding users (base: id INT, name) and its evolved
    * fork users_v20240401 (id BIGINT — widened — plus email), with
    * name-collision decoys that must never be absorbed.
    */
  private def fixture(): String = {
    val root = Files.createTempDirectory("graft-evo-").toString
    def write(dir: String, rows: org.apache.spark.sql.DataFrame): Unit =
      rows.write.mode("overwrite").partitionBy("dt").parquet(s"$root/$dir")
    // base era: alice created, bob created then updated
    write("s1_testdb__users", Seq(
      (1, "alice", "CREATE", 1000L, "f1", 10L, "2024-03-01"),
      (2, "bob", "CREATE", 2000L, "f1", 20L, "2024-03-01"),
      (2, "bob2", "UPDATE", 3000L, "f1", 30L, "2024-03-02"))
      .toDF("id", "name", "_op", "_ts", "_binlog_file_internal",
        "_binlog_pos_internal", "dt"))
    // evolved era: id widened to BIGINT, email added; alice updated
    // with an email, carol created, bob deleted
    write("s1_testdb__users_v20240401", Seq(
      (1L, "alice", Some("a@x.io"), "UPDATE", 5000L, "f2", 50L,
        "2024-04-02"),
      (3L, "carol", Some("c@x.io"), "CREATE", 6000L, "f2", 60L,
        "2024-04-02"),
      (2L, "bob2", None, "DELETE", 7000L, "f2", 70L, "2024-04-03"))
      .toDF("id", "name", "email", "_op", "_ts", "_binlog_file_internal",
        "_binlog_pos_internal", "dt"))
    // decoys: similar names that are NOT versions of users
    write("s1_testdb__users2", Seq((9, "x", "CREATE", 1L, "f", 1L, "2024-01-01"))
      .toDF("id", "name", "_op", "_ts", "_binlog_file_internal",
        "_binlog_pos_internal", "dt"))
    write("s1_testdb__users_extra", Seq((8, "y", "CREATE", 1L, "f", 1L,
        "2024-01-01"))
      .toDF("id", "name", "_op", "_ts", "_binlog_file_internal",
        "_binlog_pos_internal", "dt"))
    write("s1_testdb__users_vNEXT", Seq((7, "z", "CREATE", 1L, "f", 1L,
        "2024-01-01"))
      .toDF("id", "name", "_op", "_ts", "_binlog_file_internal",
        "_binlog_pos_internal", "dt"))
    root
  }

  test("version discovery matches the base and dated forks only, " +
      "oldest first") {
    val root = fixture()
    val dirs = EvolvedRead.versionDirs(spark, root, "s1", "testdb", "users")
    assert(dirs.map(_._1) == Seq("base", "v20240401"))
    assert(dirs.map(_._2.split('/').last) ==
      Seq("s1_testdb__users", "s1_testdb__users_v20240401"))
    // a second fork date sorts after the first
    assert(EvolvedRead.versionDirs(spark, root, "s1", "testdb", "users2")
      .map(_._1) == Seq("base"))
    assert(EvolvedRead.versionDirs(spark, root, "s1", "testdb", "ghost")
      .isEmpty)
  }

  test("readAll aligns schemas: widened key, null-filled new column, " +
      "version lineage") {
    val root = fixture()
    val all = EvolvedRead.readAll(spark, root, "s1", "testdb", "users")
    assert(all.count() == 6)
    assert(all.schema("id").dataType == LongType) // int ∪ bigint = bigint
    assert(all.columns.contains("_table_version"))
    // base-era rows: email null-filled backward
    assert(all.filter(col("_table_version") === "base")
      .filter(col("email").isNotNull).count() == 0)
    assert(all.filter(col("_table_version") === "v20240401" &&
      col("email").isNotNull).count() == 2)
    // a filter composes across versions
    assert(all.filter(col("id") === 2).count() == 3)
    // decoy rows never leak in
    assert(all.filter(col("id") >= 7).count() == 0)
  }

  test("a zone-mapped version is read through the planner-integrated " +
      "table with identical answers") {
    val root = fixture()
    val dir = s"$root/s1_testdb__users_v20240401"
    graft.ops.ZoneMaps.build(spark, dir, s"$dir._zonemaps", Seq("id"))
    val all = EvolvedRead.readAll(spark, root, "s1", "testdb", "users")
    assert(all.count() == 6)
    assert(all.filter(col("id") === 3).select("name")
      .as[String].collect().toSeq == Seq("carol"))
  }

  test("stateAll reconstructs the logical table's state across the " +
      "schema fork") {
    val root = fixture()
    // current state: alice with her evolved-era email, carol; bob
    // deleted in the evolved era
    val now = EvolvedRead.stateAll(spark, root, "s1", "testdb", "users",
      pk = Seq("id"), tsMs = Long.MaxValue)
    val rows = now.select(col("id"), col("name"), col("email"))
      .collect().map(r => (r.getLong(0), r.getString(1),
        Option(r.getString(2)))).toSet
    assert(rows == Set((1L, "alice", Some("a@x.io")),
      (3L, "carol", Some("c@x.io"))))
    // as of the base era's end: bob2 alive, no emails anywhere
    val then_ = EvolvedRead.stateAll(spark, root, "s1", "testdb", "users",
      pk = Seq("id"), tsMs = 4000L)
    val thenRows = then_.select(col("id"), col("name"), col("email"))
      .collect().map(r => (r.getLong(0), r.getString(1),
        Option(r.getString(2)))).toSet
    assert(thenRows == Set((1L, "alice", None), (2L, "bob2", None)))
  }

  test("a fork whose current table emptied to ZERO BUCKETS serves " +
      "typed-empty through every evolved reader instead of refusing") {
    // the q134 zero-bucket discipline audited on the cross-fork
    // surface: readRaw's error-class-gated fallback is the per-fork
    // frame of readEvolved/lookupEvolved/evolvedReader, so a fork
    // whose every key legitimately died (tombstones pruned, empty
    // buckets dropped at swap) contributes typed emptiness to the
    // union — pinned here so a rework of the merge rule cannot
    // silently reintroduce the refusal
    import graft.streaming.CurrentTable
    val root = Files.createTempDirectory("graft-evz-").toString
    def append(dir: String,
        rows: Seq[(Long, String, String, Long)], dt: String): Unit =
      rows.toDF("id", "name", "_op", "_ts")
        .withColumn("_binlog_file_internal", lit("f1"))
        .withColumn("_binlog_pos_internal", col("_ts"))
        .withColumn("dt", lit(dt))
        .coalesce(1).write.mode("append").partitionBy("dt")
        .parquet(s"$root/$dir")
    val base = s"$root/ez_db__ev"
    val fork = s"$root/ez_db__ev_v20240701"
    append("ez_db__ev", Seq(
      (1L, "alice", "CREATE", 1000L), (2L, "bob", "CREATE", 2000L)),
      "2024-06-01")
    CurrentTable.sync(spark, base, s"${base}__current", Seq("id"),
      buckets = 4)
    // the fork introduces NEW keys only, then deletes them all — a
    // fork deleting BASE keys must keep its tombstones (pruning is
    // retention's job and retention drops the base rows with them)
    append("ez_db__ev_v20240701", Seq(
      (10L, "carol", "CREATE", 5000L), (11L, "dave", "CREATE", 6000L)),
      "2024-07-02")
    CurrentTable.sync(spark, fork, s"${fork}__current", Seq("id"),
      buckets = 4)
    append("ez_db__ev_v20240701", Seq(
      (10L, "carol", "DELETE", 7000L), (11L, "dave", "DELETE", 8000L)),
      "2024-07-03")
    CurrentTable.sync(spark, fork, s"${fork}__current", Seq("id"))
    CurrentTable.pruneTombstones(spark, s"${fork}__current",
      Long.MaxValue)
    assert(!new java.io.File(s"${fork}__current").listFiles()
      .exists(_.getName.startsWith("kb=")), "fixture must be zero-bucket")
    // the merged view is the base era exactly
    val merged = CurrentTable.readEvolved(spark, root, "ez", "db", "ev",
        Seq("id"))
      .select("id", "name").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(merged == Set((1L, "alice"), (2L, "bob")))
    // point lookups: a base key serves, a dead fork key misses
    assert(CurrentTable.lookupEvolved(spark, root, "ez", "db", "ev",
      Seq("id"), Seq(1L).toDF("id")).count() == 1)
    assert(CurrentTable.lookupEvolved(spark, root, "ez", "db", "ev",
      Seq("id"), Seq(10L).toDF("id")).isEmpty)
    // the prepared cross-fork handle agrees
    val r = CurrentTable.evolvedReader(spark, root, "ez", "db", "ev",
      Seq("id"))
    assert(r.lookup(Seq(1L, 10L).toDF("id")).count() == 1)
    // ...and the BASE emptying to zero buckets serves the same way
    // (the merge rule treats every fork's frame identically)
    append("ez_db__ev", Seq(
      (1L, "alice", "DELETE", 9000L), (2L, "bob", "DELETE", 9100L)),
      "2024-06-02")
    CurrentTable.sync(spark, base, s"${base}__current", Seq("id"))
    CurrentTable.pruneTombstones(spark, s"${base}__current",
      Long.MaxValue)
    assert(CurrentTable.readEvolved(spark, root, "ez", "db", "ev",
      Seq("id")).isEmpty)
    assert(r.lookup(Seq(1L).toDF("id")).isEmpty)
  }
}
