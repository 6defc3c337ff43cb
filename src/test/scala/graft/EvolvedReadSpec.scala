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
}
