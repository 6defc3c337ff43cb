package graft.source

import java.sql.{Connection, DriverManager, ResultSet}

import org.apache.spark.sql.types._

import graft.model.TableSpec

/** Query-based LIVE tail for engines whose replication log is out of
  * reach. The reference's tail half consumes the server's own log
  * (binlog/LSN/SCN/change streams — `MySQLStreamer.java:214-311`);
  * where no log daemon exists (this sandbox, log-less engines,
  * locked-down RDS instances), the standard CDC fallback is
  * trigger-maintained changelog tables — which is what this tailer
  * consumes, turning the repo's feed seam into a fully LIVE loop:
  * real database → real AFTER INSERT/UPDATE/DELETE triggers → polled
  * changelog → Debezium-shaped envelope segments → the same DSv2
  * source and pipeline the binlog feed uses. Composed with
  * [[graft.streaming.JdbcSnapshot]] this is snapshot-then-stream with
  * no fixture anywhere.
  *
  * Each source table gets `<table><suffix>` (see [[changelogDdl]]): a
  * `SEQ` identity column (the per-table change position), a 1-char
  * `OP` (c/u/d), a default-`CURRENT_TIMESTAMP` change time, and the
  * payload columns (DELETE rows carry the OLD image — the
  * delete-carries-before-image contract the sink preserves).
  *
  * Durability model — the FEED is the watermark: a poll drains each
  * changelog past the in-memory watermark, renders ONE segment file
  * and publishes it with a tmp-then-rename (the DSv2 lister never
  * sees a partial segment, and segments never grow after
  * publication). There is no separate watermark file to get out of
  * sync: on construction the tailer recovers per-table watermarks by
  * scanning the already-published tail segments (each line carries
  * its table and SEQ), so publication and watermark advance are ONE
  * atomic rename — a crash before the rename republishes nothing
  * visible, a crash after it replays nothing. Exactly-once, by
  * construction rather than by coordination.
  *
  * Scale: tail volume is the CHANGE RATE, not table size — the poll
  * streams with a JDBC fetch size and caps each segment at
  * `rowsPerSegment` (looping until drained), so memory is O(1) rows
  * and a burst becomes several bounded segments; the Spark side
  * ingests them in parallel via the source's byte splits. The
  * recovery scan reads the tail segments once per process start —
  * O(retained feed), bounded by [[pruneSql]]-style changelog/segment
  * housekeeping, and zero cost on the hot path.
  */
final class JdbcChangelogTailer(
    url: String, connProps: Map[String, String],
    tables: Seq[TableSpec], feedDir: String,
    rowsPerSegment: Int = 100000,
    suffix: String = "_GRAFT_LOG") {
  require(tables.nonEmpty, "no tables to tail")

  private val hconf = new org.apache.hadoop.conf.Configuration()
  private val feedPath = new org.apache.hadoop.fs.Path(feedDir)
  private def fs = feedPath.getFileSystem(hconf)

  private val SegRe = """tail-bin\.(\d+)""".r
  private val LineRe =
    """"_db":"((?:[^"\\]|\\.)*)","_tbl":"((?:[^"\\]|\\.)*)".*"_binlog_pos_end":"(\d+)"""".r

  /** Per-table high-water mark (max published changelog SEQ),
    * recovered from the published segments themselves.
    */
  private val watermark = scala.collection.mutable.Map.empty[String, Long]

  private def segments(): Seq[String] = {
    val st = fs.globStatus(new org.apache.hadoop.fs.Path(feedPath, "tail-bin.*"))
    if (st == null) Seq.empty
    else st.map(_.getPath.getName).filter(SegRe.matches(_)).sorted
  }

  // Published lines carry SANITIZED `_db`/`_tbl` (the feed contract,
  // FIXTURES §A.1 — the demux routes by sanitized names), so recovery
  // maps them back to the raw spec key the watermark is kept under.
  private val bySanitized: Map[String, String] = tables.map { spec =>
    s"${graft.schema.Sanitizer(spec.db)}.${graft.schema.Sanitizer(spec.table)}" ->
      spec.key
  }.toMap

  private def recoverWatermarks(): Unit = {
    for (spec <- tables) watermark(spec.key) = 0L
    for (s <- segments()) {
      val in = fs.open(new org.apache.hadoop.fs.Path(feedPath, s))
      try for (line <- scala.io.Source.fromInputStream(in, "UTF-8").getLines())
        LineRe.findFirstMatchIn(line).foreach { m =>
          for (key <- bySanitized.get(s"${m.group(1)}.${m.group(2)}")) {
            val seq = m.group(3).toLong
            if (watermark.get(key).exists(_ < seq)) watermark(key) = seq
          }
        }
      finally in.close()
    }
  }
  recoverWatermarks() // after bySanitized: recovery maps through it

  private def connect(): Connection = {
    connProps.get("driver").foreach(Class.forName)
    val props = new java.util.Properties()
    for ((k, v) <- connProps if k != "driver") props.setProperty(k, v)
    DriverManager.getConnection(url, props)
  }

  /** Per-table published high-water marks (max changelog SEQ made
    * durable in the feed) — the changelog-prune safety line.
    */
  def watermarks: Map[String, Long] = watermark.toMap

  /** Changelog housekeeping: delete each table's changelog rows at or
    * below its PUBLISHED watermark. Safe by the durability model —
    * the feed already carries those rows in immutable segments, so
    * pruning loses nothing a restart would need (the watermark itself
    * is recovered from the feed, not the changelog). Returns rows
    * pruned per table.
    */
  def pruneOnce(): Map[String, Long] = {
    val conn = connect()
    try tables.map { spec =>
      val wm = watermark(spec.key)
      val n = if (wm <= 0L) 0L
      else {
        val ps = conn.prepareStatement(
          JdbcChangelogTailer.pruneSql(spec, wm, suffix))
        try ps.executeUpdate().toLong finally ps.close()
      }
      spec.key -> n
    }.toMap
    finally conn.close()
  }

  /** Drain every table's changelog past its watermark and publish the
    * changes as immutable `tail-bin.NNNNNNNNN` segments (one per
    * `rowsPerSegment` cap, looping until dry). Returns lines
    * published. Call from a scheduler loop at the wanted tail
    * latency; each call is one atomic publication step.
    */
  def pollOnce(): Long = {
    val conn = connect()
    try {
      var published = 0L
      var more = true
      while (more) {
        more = false
        val lines = scala.collection.mutable.ArrayBuffer.empty[String]
        val pending = scala.collection.mutable.Map.empty[String, Long]
        for (spec <- tables) {
          if (lines.length >= rowsPerSegment) {
            // segment full before this table's turn: it was not even
            // probed, so it MAY have rows — another loop must run, or
            // a table behind an exactly-cap-filling sibling would
            // silently wait a whole poll interval ("until dry" means
            // every table, not every table that fit)
            more = true
          } else {
            val room = rowsPerSegment - lines.length
            val (drained, sawCap) = drainTable(conn, spec, room, lines)
            if (drained > watermark(spec.key)) pending(spec.key) = drained
            if (sawCap) more = true // that table may have more past the cap
          }
        }
        if (lines.nonEmpty) {
          publishSegment(lines.toSeq)
          // advance watermarks only AFTER the atomic publish: a failed
          // publish must leave them untouched, or the next poll would
          // silently skip (lose) the unpublished rows
          pending.foreach { case (k, s) => watermark(k) = s }
          published += lines.length
        }
      }
      published
    } finally conn.close()
  }

  /** Append rendered envelope lines for one table's new changes; cap
    * at `limit`. Returns (max SEQ seen, hit-the-cap?).
    */
  private def drainTable(conn: Connection, spec: TableSpec, limit: Int,
      out: scala.collection.mutable.ArrayBuffer[String]): (Long, Boolean) = {
    val cols = spec.schema.fields.map(_.name)
    val sql =
      s"""SELECT SEQ, OP, TS, ${cols.mkString(", ")}
         |FROM ${spec.key}$suffix WHERE SEQ > ? ORDER BY SEQ
         |FETCH FIRST ${limit + 1} ROWS ONLY""".stripMargin
    val ps = conn.prepareStatement(sql)
    try {
      ps.setLong(1, watermark(spec.key))
      ps.setFetchSize(math.min(limit, 10000))
      val rs = ps.executeQuery()
      try {
        var maxSeq = watermark(spec.key)
        var n = 0
        var capped = false
        while (rs.next() && !capped) {
          if (n >= limit) capped = true // the +1 row proves there's more
          else {
            out += renderLine(spec, rs)
            maxSeq = rs.getLong("SEQ")
            n += 1
          }
        }
        (maxSeq, capped)
      } finally rs.close()
    } finally ps.close()
  }

  private def esc(s: String): String = {
    val sb = new StringBuilder
    s.foreach {
      case '"' => sb.append("\\\"")
      case '\\' => sb.append("\\\\")
      case '\n' => sb.append("\\n")
      case '\r' => sb.append("\\r")
      case '\t' => sb.append("\\t")
      case c if c < ' ' => sb.append(f"\\u${c.toInt}%04x")
      case c => sb.append(c)
    }
    sb.toString
  }

  /** One changelog row → the Debezium-shaped envelope line the feed
    * carries: op word, change-time millis, routing db/table, payload
    * as Avro-union objects (the §1.3 collapse decides the tag), and
    * the per-table SEQ as the source position. Value conversion
    * mirrors [[graft.streaming.JdbcSnapshot.alignColumn]]: DATE → an
    * epoch-days int, TIMESTAMP → epoch millis when the registry says
    * long (DATETIME policy) or its JDBC string when it says string.
    */
  private def renderLine(spec: TableSpec, rs: ResultSet): String = {
    val op = rs.getString("OP") match {
      case "c" => "CREATE"
      case "u" => "UPDATE"
      case "d" => "DELETE"
      case other => throw new IllegalStateException(
        s"UNKNOWN CHANGELOG OP '$other' in ${spec.key}$suffix")
    }
    val tsMs = rs.getTimestamp("TS").getTime
    val seq = rs.getLong("SEQ")
    val sb = new StringBuilder
    // sanitized routing identity — what the demux matches (the feed
    // contract; recovery maps it back to the raw key via bySanitized)
    sb.append(s"""{"_op":"$op","_ts":$tsMs""")
      .append(s""","_db":"${esc(graft.schema.Sanitizer(spec.db))}"""")
      .append(s""","_tbl":"${esc(graft.schema.Sanitizer(spec.table))}"""")
    for (f <- spec.schema.fields) {
      val tag = graft.schema.TypeMapping.unionTag(f.dataType)
      val v = rs.getObject(f.name)
      sb.append(s""","${esc(f.name)}":""")
      if (v == null) sb.append("null")
      else {
        val rendered: String = (f.dataType, v) match {
          case (IntegerType, d: java.sql.Date) =>
            d.toLocalDate.toEpochDay.toString // epoch days (§1.3 DATE)
          case (LongType, t: java.sql.Timestamp) =>
            t.getTime.toString // epoch millis (DATETIME policy)
          case (IntegerType | LongType, n: java.lang.Number) =>
            n.longValue().toString
          case (DoubleType | FloatType, n: java.lang.Number) =>
            n.doubleValue().toString
          case (BooleanType, b: java.lang.Boolean) => b.toString
          case (_, other) => "\"" + esc(other.toString) + "\""
        }
        sb.append(s"""{"$tag":$rendered}""")
      }
    }
    sb.append(s""","_binlog_file":"${nextSegmentName}"""")
      .append(s""","_binlog_pos_end":"$seq"}""")
    sb.toString
  }

  // the name the CURRENT poll will publish under — rendered into the
  // lines so offset write-back records a real (file, pos)
  private var nextSegmentName: String = computeNextName()

  private def computeNextName(): String = {
    val last = segments().lastOption.collect {
      case SegRe(n) => n.toLong }.getOrElse(0L)
    f"tail-bin.${last + 1}%09d"
  }

  private def publishSegment(lines: Seq[String]): Unit = {
    fs.mkdirs(feedPath)
    val name = nextSegmentName
    // tmp lives BESIDE the feed dir (dot-prefixed inside it) so the
    // rename is same-filesystem; the DSv2 lister never lists dot files
    val tmp = new org.apache.hadoop.fs.Path(feedPath, s".$name.tmp")
    val out = fs.create(tmp, true)
    try {
      val w = new java.io.BufferedWriter(
        new java.io.OutputStreamWriter(out, "UTF-8"))
      lines.foreach { l => w.write(l); w.write("\n") }
      w.flush()
    } finally out.close()
    val fin = new org.apache.hadoop.fs.Path(feedPath, name)
    if (fs.exists(fin) || !fs.rename(tmp, fin))
      throw new IllegalStateException(
        s"SEGMENT ALREADY PUBLISHED: $fin (concurrent tailer on the " +
          "same feed dir?)")
    nextSegmentName = computeNextName()
  }
}

object JdbcChangelogTailer {

  /** The changelog DDL for one source table: the `<table><suffix>`
    * table (SEQ identity + OP + TS + payload columns cloned with the
    * given column DDL types) and the three AFTER triggers. Written in
    * the ANSI/Derby dialect; `columnDdl` supplies each payload
    * column's source-side type (the tailer itself only needs the
    * registry's collapsed types, but the changelog table must match
    * the source columns exactly).
    */
  def changelogDdl(spec: TableSpec, columnDdl: Map[String, String],
      suffix: String = "_GRAFT_LOG"): Seq[String] = {
    val cols = spec.schema.fields.map(_.name)
    val reserved = Set("SEQ", "OP", "TS")
    val clash = cols.filter(c => reserved.contains(c.toUpperCase))
    require(clash.isEmpty,
      s"${spec.key}: column(s) ${clash.mkString(", ")} collide with " +
        s"changelog bookkeeping columns ${reserved.mkString("/")} — " +
        "rename at the source or use a custom changelog")
    val missing = cols.filterNot(columnDdl.contains)
    require(missing.isEmpty,
      s"${spec.key}: no source DDL type given for ${missing.mkString(", ")}")
    val log = s"${spec.key}$suffix"
    val payloadDdl = cols.map(c => s"$c ${columnDdl(c)}").mkString(", ")
    val colList = cols.mkString(", ")
    def rowImage(alias: String) = cols.map(c => s"$alias.$c").mkString(", ")
    Seq(
      s"""CREATE TABLE $log (
         |  SEQ BIGINT GENERATED ALWAYS AS IDENTITY (START WITH 1, INCREMENT BY 1),
         |  OP CHAR(1) NOT NULL,
         |  TS TIMESTAMP NOT NULL DEFAULT CURRENT_TIMESTAMP,
         |  $payloadDdl)""".stripMargin,
      s"CREATE TRIGGER ${spec.key}_GI AFTER INSERT ON ${spec.key} " +
        s"REFERENCING NEW AS N FOR EACH ROW " +
        s"INSERT INTO $log (OP, $colList) VALUES ('c', ${rowImage("N")})",
      s"CREATE TRIGGER ${spec.key}_GU AFTER UPDATE ON ${spec.key} " +
        s"REFERENCING NEW AS N FOR EACH ROW " +
        s"INSERT INTO $log (OP, $colList) VALUES ('u', ${rowImage("N")})",
      // DELETE carries the BEFORE image (OLD row) — the reference's
      // delete-carries-before-image sink contract
      s"CREATE TRIGGER ${spec.key}_GD AFTER DELETE ON ${spec.key} " +
        s"REFERENCING OLD AS O FOR EACH ROW " +
        s"INSERT INTO $log (OP, $colList) VALUES ('d', ${rowImage("O")})")
  }

  /** Changelog housekeeping: rows at or below the published watermark
    * are safe to prune once downstream retention allows.
    */
  def pruneSql(spec: TableSpec, upToSeq: Long,
      suffix: String = "_GRAFT_LOG"): String =
    s"DELETE FROM ${spec.key}$suffix WHERE SEQ <= $upToSeq"
}
