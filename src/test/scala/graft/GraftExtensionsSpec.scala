package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.scalatest.funsuite.AnyFunSuite

/** The SQL-surface function catalog: every graft native function is
  * callable from plain SQL after install(), and the
  * SparkSessionExtensions injection path consumes the same builder
  * list without error (a second JVM-wide SparkSession can't be built
  * in-suite, so the injection is exercised against a fresh
  * extensions container — the builders are shared objects either
  * way).
  */
class GraftExtensionsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.session

  test("install exposes every native function to plain SQL") {
    GraftExtensions.install(spark)
    val dot = spark.sql(
      "SELECT graft_dot(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d")
      .collect()(0).getDouble(0)
    assert(dot == 11.0)
    // rolling k-gram hashes then window minima over them
    val nWins = spark.sql(
      """SELECT size(graft_winmin(graft_rollhash('abcdefghij', 4), 3)) AS n""")
      .collect()(0).getInt(0)
    assert(nWins > 0)
    val sig = spark.sql(
      "SELECT graft_minhash(array('a b c', 'd e f')) AS s")
      .collect()(0).getSeq[Long](0)
    assert(sig.length == graft.functions.TextHashes.MinHashK)
    // aggregates: KMV distinct estimate and a CMS grid in GROUP BY SQL
    val kmv = spark.sql(
      """SELECT graft_kmv(CAST(conv(substring(md5(CAST(id AS STRING)), 1, 15),
        |  16, 10) AS BIGINT), 256) AS d
        |FROM range(100)""".stripMargin)
      .collect()(0).getDouble(0)
    assert(kmv == 100.0) // below k=256 the sketch is exact
    val grid = spark.sql(
      """SELECT graft_cms(CAST(conv(substring(md5(CAST(id AS STRING)), 1, 8),
        |  16, 10) AS BIGINT) % 64, 64) AS g
        |FROM range(50)""".stripMargin)
      .collect()(0).getSeq[Long](0)
    assert(grid.length == 64 && grid.sum == 50L)
  }

  test("the extensions injection path accepts the full builder list") {
    // builds the injection container the way SparkSession.builder
    // does before session construction; a throwing builder or a bad
    // identifier fails here
    new GraftExtensions().apply(new SparkSessionExtensions)
  }
}
