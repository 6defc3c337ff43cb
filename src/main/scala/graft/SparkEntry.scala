package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator from SURVEY.md §2 registers a QueryDef in
  * one of the graft.queries modules; this object is just the registry.
  */
object SparkEntry {

  private[graft] def allDefs: Seq[QueryDef] =
    RelationalQueries.defs ++ ScalarQueries.defs ++ CdcQueries.defs ++
      TextQueries.defs ++ VectorQueries.defs ++ MultimodalQueries.defs ++
      WindowQueries.defs

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    RelationalQueries.pricingSummary(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    allDefs.map(d => d.name -> d.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    allDefs.collect { case QueryDef(n, _, Some(sql), _) => n -> sql }.toMap
}
