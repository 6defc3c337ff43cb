package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One declared engine capability: a Spark implementation plus (when
  * SQL-expressible) an equivalent DuckDB oracle over the same parquet
  * tables. The driver hash-compares the two at sf0.01 (SURVEY.md §5.3).
  *
  * Determinism contract (FIXTURES.md): every query ends in a total
  * ORDER BY, doubles are rounded at a declared precision, timestamps
  * are rendered as strings, and column names match the oracle exactly.
  */
final case class QueryDef(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object QueryDef {
  def apply(name: String, sql: String)(
      fn: (SparkSession, String) => DataFrame): QueryDef =
    QueryDef(name, fn, Some(sql))

  /** Non-SQL-expressible op: driver records a weaker rows-only check. */
  def rowsOnly(name: String)(
      fn: (SparkSession, String) => DataFrame): QueryDef =
    QueryDef(name, fn, None)
}
