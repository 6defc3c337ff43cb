package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One declared engine capability: a Spark implementation plus (when
  * SQL-expressible) an equivalent DuckDB oracle over the same parquet
  * tables. The driver hash-compares the two at sf0.01 (SURVEY.md §5.3).
  *
  * Determinism contract (FIXTURES.md): every query ends in a total
  * ORDER BY, doubles are rounded at a declared precision, timestamps
  * are rendered as strings, and column names match the oracle exactly.
  *
  * `stateful` marks lifecycle queries that BUILD durable state per
  * execution (sink copies, current tables, indexes) rather than just
  * scanning the test tables — the bench gives those an untimed
  * warm-up so their first timed pass doesn't absorb the lifecycle
  * path's one-time codegen/JIT costs.
  */
final case class QueryDef(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String],
    stateful: Boolean = false) {
  /** Mark this query as building per-execution temp state. */
  def tempState: QueryDef = copy(stateful = true)
}

object QueryDef {
  def apply(name: String, sql: String)(
      fn: (SparkSession, String) => DataFrame): QueryDef =
    QueryDef(name, fn, Some(sql))

  /** Non-SQL-expressible op: driver records a weaker rows-only check. */
  def rowsOnly(name: String)(
      fn: (SparkSession, String) => DataFrame): QueryDef =
    QueryDef(name, fn, None)

  /** [[apply]] marked [[QueryDef.tempState]]: a lifecycle query that
    * stages per-execution state (typically via [[tempWorkDir]]).
    */
  def statefulQ(name: String, sql: String)(
      fn: (SparkSession, String) => DataFrame): QueryDef =
    apply(name, sql)(fn).tempState

  /** Work dir for lifecycle queries: created fresh per execution,
    * recursively deleted at JVM exit — repeated verify/bench runs in
    * separate JVMs must not accrete dataset copies under /tmp (each
    * stateful query stages its own sink + derived tables there).
    * Exit-time, not eager: the returned frame READS from this dir
    * lazily, so the dir must outlive every action on it. ONE shared
    * hook drains the queue (a hook per call would pile up a live
    * Thread per execution in a long-lived sbt JVM, all run unordered
    * at exit).
    */
  def tempWorkDir(prefix: String): String = {
    val dir = java.nio.file.Files.createTempDirectory(prefix)
    if (hookInstalled.compareAndSet(false, true))
      Runtime.getRuntime.addShutdownHook(new Thread(() => {
        var p = pendingDeletes.poll()
        while (p != null) { deleteTree(p); p = pendingDeletes.poll() }
      }))
    pendingDeletes.add(dir)
    dir.toString
  }

  private val pendingDeletes =
    new java.util.concurrent.ConcurrentLinkedQueue[java.nio.file.Path]()
  private val hookInstalled =
    new java.util.concurrent.atomic.AtomicBoolean(false)

  private def deleteTree(p: java.nio.file.Path): Unit = {
    if (java.nio.file.Files.isDirectory(p,
        java.nio.file.LinkOption.NOFOLLOW_LINKS)) {
      val s = java.nio.file.Files.list(p)
      try s.forEach(deleteTree(_)) finally s.close()
    }
    java.nio.file.Files.deleteIfExists(p)
  }
}
