package graft.streaming

import java.sql.{Connection, DriverManager}

import org.apache.spark.sql.streaming.StreamingQuery

import graft.model.TableSpec
import graft.schema.{JdbcRegistry, TypeMapping}
import graft.source.JdbcChangelogTailer

/** Config wiring for the LIVE query-based tail
  * ([[graft.source.JdbcChangelogTailer]]): turns `tail.jdbc.*` keys
  * into an installed + driven tailer inside `CdcJob.run`'s tailing
  * loop, so the fully live snapshot-then-stream loop is reachable
  * from a config file alone — the same standard the chunked snapshot
  * was held to (wired, not just API-callable).
  *
  * Keys (all under the `snapshot.jdbc.url` connection):
  *   - `tail.jdbc.changelog=true`    turn the live tail on
  *   - `tail.jdbc.install=true`      create missing changelog tables +
  *     triggers (from `table.schemas`' raw source column types) BEFORE
  *     the snapshot — changes committed between install and the
  *     snapshot read appear both as READ rows and as c/u/d events
  *     (the standard query-based-CDC at-least-once overlap window;
  *     the reference's log-based tail has no such window because the
  *     server log predates the connector)
  *   - `tail.jdbc.poll.interval.ms`  poll cadence (default 1000)
  *   - `tail.jdbc.rows.per.segment`  segment size cap (default 100000)
  *   - `tail.jdbc.suffix`            changelog table suffix
  *     (default `_GRAFT_LOG`)
  *   - `tail.jdbc.prune=true`        after each non-empty poll, delete
  *     changelog rows at/below the published watermark (safe: the
  *     feed is the watermark — published segments are durable)
  *   - `tail.jdbc.stop.after.empty.polls=N` drain-then-stop: after N
  *     consecutive empty polls, process every published segment and
  *     stop the query — the live-tail analog of AvailableNow (absent
  *     ⇒ run until the stop gate fires)
  *
  * Fail-fast contradictions: a mongodb source (no JDBC surface),
  * `snapshot.only=true` (snapshot-only means NO tail by definition),
  * or a missing `snapshot.jdbc.url`.
  */
object ChangelogTail {

  final case class Settings(
      install: Boolean,
      pollIntervalMs: Long,
      rowsPerSegment: Int,
      suffix: String,
      prune: Boolean,
      stopAfterEmptyPolls: Option[Int])

  /** Parse + validate; None when the tail is not enabled. */
  def fromConfig(cfg: Map[String, String], config: CdcConfig): Option[Settings] = {
    if (!cfg.get("tail.jdbc.changelog").contains("true")) None
    else {
      if (config.sourceType == "mongodb")
        throw new IllegalArgumentException(
          "tail.jdbc.changelog NEEDS A JDBC SOURCE (source.type=mongodb " +
            "has no JDBC surface)")
      if (config.snapshotOnly)
        throw new IllegalArgumentException(
          "tail.jdbc.changelog CONTRADICTS snapshot.only=true: " +
            "snapshot-only means no tail — drop one of the two")
      if (!cfg.contains("snapshot.jdbc.url"))
        throw new IllegalArgumentException(
          "tail.jdbc.changelog NEEDS snapshot.jdbc.url (the live " +
            "connection the snapshot half already uses)")
      Some(Settings(
        install = cfg.get("tail.jdbc.install").contains("true"),
        pollIntervalMs =
          cfg.getOrElse("tail.jdbc.poll.interval.ms", "1000").toLong,
        rowsPerSegment =
          cfg.getOrElse("tail.jdbc.rows.per.segment", "100000").toInt,
        suffix = cfg.getOrElse("tail.jdbc.suffix", "_GRAFT_LOG"),
        prune = cfg.get("tail.jdbc.prune").contains("true"),
        stopAfterEmptyPolls =
          cfg.get("tail.jdbc.stop.after.empty.polls").map(_.toInt)))
    }
  }

  /** Create each source table's changelog table + triggers if absent
    * (existence judged by the same metadata walk the live registry
    * uses — install is idempotent across restarts). `rawTypes` is the
    * parsed `table.schemas` map: raw `db.table` key → (column, source
    * DDL type) pairs — the changelog payload clones the SOURCE
    * column types, not the collapsed registry types. Returns the keys
    * actually installed.
    */
  def installMissing(conn: Connection, specs: Seq[TableSpec],
      rawTypes: Map[String, Seq[(String, String)]],
      suffix: String, dbIsSchema: Boolean): Seq[String] = {
    // existence is probed under BOTH namespace conventions (like the
    // PK walk's fallback): a mysql-shaped config against a
    // schema-namespaced engine must not re-CREATE an existing
    // changelog because the catalog-scoped listing came back empty —
    // the walk's exact-name post-filter keeps the opposite convention
    // from matching a sibling schema's table
    val md = conn.getMetaData
    val metas = Seq(JdbcRegistry.fromDatabaseMetaData(md, dbIsSchema),
      JdbcRegistry.fromDatabaseMetaData(md, !dbIsSchema))
    val st = conn.createStatement()
    try specs.flatMap { spec =>
      val logName = s"${spec.table}$suffix"
      val exists = metas.exists(
        _.tables(spec.db).exists(_.equalsIgnoreCase(logName)))
      if (exists) None
      else {
        val types = rawTypes.getOrElse(spec.key,
          throw new IllegalArgumentException(
            s"NO table.schemas ENTRY FOR ${spec.key} — tail.jdbc.install " +
              "clones the SOURCE column types and needs them declared"))
        JdbcChangelogTailer.changelogDdl(spec, types.toMap, suffix)
          .foreach(st.executeUpdate)
        Some(spec.key)
      }
    }
    finally st.close()
  }

  /** Drive the tailer inside the tailing-mode monitor loop: poll at
    * the configured cadence while the query runs, prune behind each
    * non-empty poll if asked, and on `stopAfterEmptyPolls` consecutive
    * dry polls drain every published segment (`processAllAvailable`)
    * and stop — the exact live-tail analog of AvailableNow. A poll
    * failure stops the query before propagating: a dead tail loop
    * must not leave a stream silently running with no producer.
    */
  def drive(q: StreamingQuery, gate: StopGate,
      tailer: JdbcChangelogTailer, ts: Settings): Unit = {
    var emptyPolls = 0
    var lastPoll = 0L
    var draining = false
    try {
      while (q.isActive && !gate.stopped && !draining) {
        q.awaitTermination(200)
        val now = System.currentTimeMillis()
        if (q.isActive && !gate.stopped && now - lastPoll >= ts.pollIntervalMs) {
          lastPoll = now
          val n = tailer.pollOnce()
          if (n > 0 && ts.prune) tailer.pruneOnce()
          emptyPolls = if (n == 0L) emptyPolls + 1 else 0
          if (ts.stopAfterEmptyPolls.exists(emptyPolls >= _)) draining = true
        }
      }
      if (draining && q.isActive) q.processAllAvailable()
    } catch {
      case e: Throwable =>
        if (q.isActive) q.stop()
        throw e
    }
  }

  private[streaming] def connect(url: String,
      connProps: Map[String, String]): Connection = {
    connProps.get("driver").foreach(Class.forName)
    val props = new java.util.Properties()
    for ((k, v) <- connProps if k != "driver") props.setProperty(k, v)
    DriverManager.getConnection(url, props)
  }

  /** The raw `table.schemas` column/type pairs, keyed by the raw
    * `db.table` spelling — what [[installMissing]] clones into the
    * changelog payload columns.
    */
  def rawColumnTypes(cfg: Map[String, String])
      : Map[String, Seq[(String, String)]] =
    JobConfig.nameMap(cfg, "table.schemas").map { case (key, colSpec) =>
      key -> TypeMapping.splitTopLevel(colSpec).map { c =>
        c.trim.split(":", 2) match {
          case Array(n, t) => (n.trim, t.trim)
          case _ => throw new IllegalArgumentException(
            s"MALFORMED COLUMN SPEC (want name:TYPE): '$c' in '$colSpec'")
        }
      }
    }
}
