package graft.ops

/** DDL statement classifier — decides whether a captured DDL event
  * must stop the ingestion job (structural change ⇒ new table version,
  * SURVEY.md §1.2) or can be ignored.
  *
  * Semantics ported from the reference's stop-signal gate
  * (`mysql/DelayedStopSignalProcessFunction.java:166-201`):
  *   - a statement that FULL-matches the non-structural list
  *     (index/key/constraint/maintenance DDL) is ignored, unless it
  *     also full-matches the structural list;
  *   - `TRUNCATE TABLE` logs a "use snapshot-only mode" warning and
  *     still stops (it matches neither list, so it falls through);
  *   - everything else — including `ALTER TABLE … ADD COLUMN` — stops.
  *
  * Note the reference's structural regex (`ADD\s+COLUMN.*` full-match)
  * can only fire on statements *starting* with ADD/DROP/MODIFY COLUMN;
  * ordinary `ALTER TABLE … ADD COLUMN` stops via fall-through, not via
  * that regex. We keep the exact decision table.
  *
  * Oracle flavor (`oracle/DelayedStopSignalProcessFunction.java:186-209`)
  * additionally ignores GRANT/REVOKE/SEQUENCE/SYNONYM/VIEW/COMMENT
  * statements.
  */
object DdlClassifier {

  /** Anchored, case-insensitive, dot-matches-newline patterns — valid
    * both for java.util.regex (Spark rlike) and RE2 (DuckDB
    * regexp_matches), so the batch query surface can share them.
    */
  val NonStructural: String = "(?is)^(?:" +
    "CREATE\\s+INDEX.*|" +
    "DROP\\s+INDEX.*|" +
    "ALTER\\s+TABLE.*ADD\\s+INDEX.*|" +
    "ALTER\\s+TABLE.*DROP\\s+INDEX.*|" +
    "ALTER\\s+TABLE.*ADD\\s+KEY.*|" +
    "ALTER\\s+TABLE.*DROP\\s+KEY.*|" +
    "ALTER\\s+TABLE.*ADD\\s+CONSTRAINT.*|" +
    "ALTER\\s+TABLE.*DROP\\s+CONSTRAINT.*|" +
    "ANALYZE\\s+TABLE.*|" +
    "OPTIMIZE\\s+TABLE.*|" +
    "REPAIR\\s+TABLE.*" +
    ")$"

  val Structural: String = "(?is)^(?:" +
    "ADD\\s+COLUMN.*|DROP\\s+COLUMN.*|MODIFY\\s+COLUMN.*)$"

  val TruncateWarn: String = "(?is)^.*TRUNCATE\\s+TABLE.*$"

  /** Oracle-only extra ignores (GRANT/REVOKE/object DDL that never
    * changes a captured table's shape).
    */
  val OracleNonStructural: String = "(?is)^(?:" +
    "GRANT\\s+.*|REVOKE\\s+.*|" +
    "CREATE\\s+SEQUENCE.*|ALTER\\s+SEQUENCE.*|DROP\\s+SEQUENCE.*|" +
    "CREATE\\s+SYNONYM.*|DROP\\s+SYNONYM.*|" +
    "CREATE\\s+(?:OR\\s+REPLACE\\s+)?VIEW.*|DROP\\s+VIEW.*|" +
    "COMMENT\\s+ON.*|" +
    "CREATE\\s+INDEX.*|DROP\\s+INDEX.*|" +
    "ANALYZE\\s+.*" +
    ")$"

  sealed trait Action
  case object Ignore extends Action
  case object Stop extends Action
  /** Stop, plus the reference's "should use snapshot-only mode" warn. */
  case object StopTruncateWarn extends Action

  def classify(ddl: String, oracle: Boolean = false): Action = {
    val nonStructural = ddl.matches(NonStructural) ||
      (oracle && ddl.matches(OracleNonStructural))
    val structural = ddl.matches(Structural)
    if (nonStructural && !structural) Ignore
    else if (ddl.matches(TruncateWarn)) StopTruncateWarn
    else Stop
  }
}
