package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Executes every declared query on sf0.001 and sanity-checks the
  * results. Exact-value checking against DuckDB is the driver's gate
  * (tools/check.py locally); this spec guards compile-and-run health
  * plus the determinism contract (re-run produces identical rows).
  */
class QuerySurfaceSpec extends AnyFunSuite {
  lazy val spark: SparkSession = TestSpark.session
  val dir = "/root/testdata/sf0.001"

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracle key has a matching query key") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracleSql without queries: $missing")
  }

  test("query names are unique — a duplicate would vanish in the toMap") {
    val names = SparkEntry.allDefs.map(_.name)
    val dups = names.groupBy(identity).collect { case (n, g) if g.size > 1 => n }
    assert(dups.isEmpty, s"duplicate query names: $dups")
    assert(names.size == SparkEntry.queries.size)
  }

  test("every query is oracle-checked (no silent rows-only downgrades)") {
    // the weaker rows-only path exists for genuinely non-SQL ops; today
    // every declared op has an independent DuckDB formulation — a new
    // query silently missing its oracle should be a deliberate choice,
    // not an oversight
    val noOracle = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(noOracle.isEmpty, s"queries without oracle SQL: $noOracle")
  }

  for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1)) {
    test(s"$name runs and is deterministic") {
      val a = fn(spark, dir).collect()
      assert(a.nonEmpty, s"$name returned 0 rows on sf0.001")
      val b = fn(spark, dir).collect()
      assert(a.toSeq == b.toSeq, s"$name is nondeterministic across runs")
    }
  }
}

object TestSpark {
  lazy val session: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
