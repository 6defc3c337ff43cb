package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

/** The oracle strings are ~40% of the query modules and only execute
  * on the DRIVER's DuckDB at round end — a syntax or column-reference
  * drift introduced while refactoring a Spark side would otherwise
  * surface as an opaque `err` in the round's correctness artifact.
  * This spec round-trips every `SparkEntry.oracleSql` statement
  * through DuckDB `EXPLAIN` (parse + bind + plan, no execution) over
  * sf0.001 views via tools/oracle_lint.py. Cancels (does not fail)
  * where python3+duckdb aren't installed — they are driver-side
  * tooling, present in this container.
  */
class OracleLintSpec extends AnyFunSuite {

  test("every oracleSql statement parses and plans in DuckDB") {
    import scala.sys.process._
    val duckdbAvailable =
      try Process(Seq("python3", "-c", "import duckdb")).! == 0
      catch { case _: java.io.IOException => false }
    assume(duckdbAvailable, "python3+duckdb not available; lint skipped")
    assume(new java.io.File("/root/testdata/sf0.001").isDirectory,
      "sf0.001 fixture not present; lint skipped")

    val tmp = Files.createTempFile("graft-oracle-", ".json")
    Files.writeString(tmp, Verify.oracleJson)
    val out = new StringBuilder
    val logger = ProcessLogger(l => { out.append(l).append('\n'); () })
    val code = Process(Seq("python3", "tools/oracle_lint.py",
      "/root/testdata/sf0.001", tmp.toString)).!(logger)
    assert(code == 0, s"oracle lint failures:\n$out")
    // the lint saw the full surface, not a truncated JSON
    assert(out.toString.contains(s"== ${SparkEntry.oracleSql.size} ok"),
      out.toString)
  }
}
