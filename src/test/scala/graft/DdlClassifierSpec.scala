package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ops.DdlClassifier
import graft.ops.DdlClassifier.{Ignore, Stop, StopTruncateWarn}

/** Decision-table tests for the stop-signal gate's DDL classifier,
  * mirroring the positive/negative statements the reference handles
  * (mysql/DelayedStopSignalProcessFunction.java:166-201, oracle
  * variant :186-209).
  */
class DdlClassifierSpec extends AnyFunSuite {

  val ignored = Seq(
    "CREATE INDEX i ON t (c)",
    "create index i on t (c)",
    "DROP INDEX i ON t",
    "ALTER TABLE t ADD INDEX i (c)",
    "ALTER TABLE t DROP INDEX i",
    "ALTER TABLE t ADD KEY k (c)",
    "ALTER TABLE t DROP KEY k",
    "ALTER TABLE t ADD CONSTRAINT fk FOREIGN KEY (c) REFERENCES u(id)",
    "ALTER TABLE t DROP CONSTRAINT fk",
    "ANALYZE TABLE t",
    "OPTIMIZE TABLE t",
    "REPAIR TABLE t")

  val stops = Seq(
    "ALTER TABLE t ADD COLUMN c INT",
    "ALTER TABLE t DROP COLUMN c",
    "ALTER TABLE t MODIFY COLUMN c BIGINT",
    "CREATE TABLE t (id INT)",
    "DROP TABLE t",
    "RENAME TABLE t TO t2",
    "ALTER TABLE t CHANGE COLUMN a b INT",
    "ALTER TABLE t\nADD COLUMN multi_line INT")

  for (s <- ignored)
    test(s"ignores: $s") { assert(DdlClassifier.classify(s) == Ignore) }

  for (s <- stops)
    test(s"stops: $s") { assert(DdlClassifier.classify(s) == Stop) }

  test("truncate warns and stops") {
    assert(DdlClassifier.classify("TRUNCATE TABLE t") == StopTruncateWarn)
  }

  test("oracle flavor ignores grants/sequences/views/comments") {
    for (s <- Seq(
      "GRANT SELECT ON t TO u",
      "REVOKE SELECT ON t FROM u",
      "CREATE SEQUENCE seq1",
      "CREATE SYNONYM s FOR t",
      "CREATE OR REPLACE VIEW v AS SELECT 1",
      "COMMENT ON TABLE t IS 'x'"))
      assert(DdlClassifier.classify(s, oracle = true) == Ignore, s)
  }

  test("oracle flavor still stops on structural DDL") {
    assert(DdlClassifier.classify("ALTER TABLE t ADD (c NUMBER)",
      oracle = true) == Stop)
  }
}
