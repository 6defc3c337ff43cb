package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The reference's "snapshot conditions" feature (README "Snapshot
  * conditions"): per-table custom snapshot SELECT statements, config
  * grammar `snapshot.select.statement.overrides` = comma-separated
  * `db.table` list plus one statement per listed table under
  * `snapshot.select.statement.overrides.<db.table>`
  * (`MySQLStreamer.java:130-152` parse+validate; `:269-291` forwards
  * them to Debezium and disables incremental snapshot).
  *
  * Semantics: the override restricts the SNAPSHOT phase only — the
  * statement's WHERE decides which existing rows are snapshotted, the
  * binlog tail is untouched. On a live JDBC snapshot the statement
  * goes server-side verbatim (`dbtable = (SELECT ...)` pushdown —
  * SURVEY §4); in the feed harness there is no server to run it, so
  * the SAME statement is applied to the table's decoded snapshot
  * (READ-op) rows before the first sink write: the WHERE becomes a
  * Spark predicate over the payload columns, and a non-`*` select
  * list NULLs the unselected payload columns on snapshot rows (the
  * sink schema never forks — exactly what a server-side subset SELECT
  * yields through Debezium, which emits the full table schema with
  * nulls for unselected columns). Change rows pass through untouched.
  */
final case class SnapshotOverride(
    table: String,
    /** Lower-cased select-list columns; None = `SELECT *`. */
    selectCols: Option[Set[String]],
    /** The WHERE clause body, verbatim; None = no predicate. */
    where: Option[String],
    /** The validated statement verbatim (trailing `;` stripped) — the
      * form a live JDBC snapshot pushes server-side via
      * [[SnapshotOverrides.asJdbcSubquery]].
      */
    statement: String)

object SnapshotOverrides {

  private val ConfigKey = "snapshot.select.statement.overrides"

  /** `SELECT <list|*> FROM <table> [WHERE <predicate>]` — the shape
    * the reference's docs show; anything else is a config error, not
    * a silent pass-through.
    */
  private val Stmt =
    """(?is)\s*SELECT\s+(.+?)\s+FROM\s+(\S+)(?:\s+WHERE\s+(.+?))?\s*;?\s*""".r

  /** Parse + validate from the flat config map: every listed table
    * must have a non-empty statement (the reference's
    * `Validator.ensureNotEmpty` on the per-table key), and the
    * statement must parse. Returns overrides keyed by the registry's
    * `db.table` key.
    */
  def fromConfig(cfg: Map[String, String]): Map[String, SnapshotOverride] =
    cfg.get(ConfigKey).filter(_.trim.nonEmpty) match {
      case None => Map.empty
      case Some(list) => list.split(",").map(_.trim).filter(_.nonEmpty)
        .map { table =>
          val stmt = cfg.getOrElse(s"$ConfigKey.$table",
            throw new IllegalArgumentException(
              s"MISSING OVERRIDE STATEMENT FOR: $table " +
                s"(expected config key '$ConfigKey.$table')"))
          if (stmt.trim.isEmpty) throw new IllegalArgumentException(
            s"EMPTY OVERRIDE STATEMENT FOR: $table")
          table -> parseStatement(table, stmt)
        }.toMap
    }

  private[streaming] def parseStatement(table: String,
      sql: String): SnapshotOverride = sql match {
    case Stmt(selectList, fromTable, where) =>
      // the statement must read ITS OWN table — a copy-pasted
      // statement keyed under the wrong table would otherwise apply
      // another table's predicate/columns silently (or blow up at
      // first batch instead of the assembly-time gate)
      val ft = fromTable.trim.stripSuffix(";").toLowerCase
      val key = table.trim.toLowerCase
      // accepted shapes: exact match; bare FROM under a qualified key;
      // and a schema-qualified FROM under a BARE key (pg/oracle route
      // by bare table name while the live read is schema-qualified).
      // A qualified key with a DIFFERENTLY-qualified FROM stays an
      // error — that's the copy-paste hazard this gate exists for.
      val ok = ft == key || ft == key.split("\\.", 2).last ||
        (!key.contains(".") && ft.split("\\.", 2).last == key)
      if (!ok)
        throw new IllegalArgumentException(
          s"SNAPSHOT OVERRIDE FOR $table SELECTS FROM '$ft' — " +
            "the statement must read the table it overrides")
      val cols = selectList.trim match {
        case "*" => None
        case list => Some(list.split(",").map(_.trim.toLowerCase)
          .filter(_.nonEmpty).toSet)
      }
      SnapshotOverride(table, cols, Option(where).map(_.trim),
        sql.trim.stripSuffix(";"))
    case other => throw new IllegalArgumentException(
      s"UNPARSEABLE SNAPSHOT OVERRIDE FOR $table (want " +
        s"'SELECT <cols|*> FROM <table> [WHERE <cond>]'): $other")
  }

  /** The live-JDBC form of the same feature: the validated override
    * statement rendered as a `dbtable` subquery, so a JDBC snapshot
    * (`spark.read.format("jdbc").option("dbtable", ...)`) runs the
    * custom SELECT server-side VERBATIM — predicate and projection
    * both pushed to the database, which is exactly what the
    * reference achieves by handing the statement to Debezium.
    */
  def asJdbcSubquery(table: String, statement: String): String = {
    parseStatement(table, statement) // same grammar gate as the feed path
    s"(${statement.trim.stripSuffix(";")}) graft_snapshot_override"
  }

  /** Apply one override to a table's PROJECTED batch frame (payload
    * columns + `_op`/`_ts`/... metadata): snapshot rows (`READ`/`r`)
    * failing the WHERE are dropped, unselected payload columns are
    * nulled on snapshot rows only; change rows are returned
    * bit-identical. Filtering preserves within-partition order, so
    * the demux's offset sort survives.
    */
  def applyTo(projected: DataFrame, ov: SnapshotOverride): DataFrame = {
    val isRead = col("_op").isin("READ", "r")
    val filtered = ov.where match {
      case Some(w) => projected.filter(!isRead || expr(w))
      case None => projected
    }
    ov.selectCols match {
      case Some(keep) => filtered.select(filtered.columns.toSeq.map { c =>
        // metadata columns (`_`-prefixed) are the pipeline's, not the
        // statement's — a select list can neither add nor drop them
        if (c.startsWith("_") || keep.contains(c.toLowerCase)) col(c)
        else when(isRead, lit(null).cast(projected.schema(c).dataType))
          .otherwise(col(c)).as(c)
      }: _*)
      case None => filtered
    }
  }
}
