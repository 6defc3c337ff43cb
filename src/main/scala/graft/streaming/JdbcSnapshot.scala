package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.model.TableSpec
import graft.ops.EnvelopeDecoder

/** Live JDBC initial snapshot (SURVEY §4): the snapshot half of the
  * reference's snapshot-then-stream startup (`MySQLStreamer.java:
  * 269-291` hands snapshot SELECTs to Debezium; `:313-457` walks
  * metadata first). Each registry table is read server-side through
  * `spark.read.format("jdbc")` — with any snapshot override statement
  * pushed down VERBATIM as a `dbtable` subquery, so predicate and
  * projection never leave the database — then shaped to the exact
  * per-table sink schema the binlog tail writes
  * ([[graft.ops.EnvelopeDecoder.payload]]), so snapshot and tail
  * compose into one coherent `dt=`-partitioned dataset.
  *
  * Scale: one JDBC scan per table; `partitionOptions`
  * (partitionColumn/lowerBound/upperBound/numPartitions) shard a big
  * table's snapshot across executors — Spark's JDBC source turns them
  * into per-partition range WHEREs server-side. The Spark-side shape
  * work is a map-only projection; the only shuffle is the sink's
  * own dt-range write path, same as the feed.
  */
object JdbcSnapshot {

  /** One table's snapshot frame, shaped like the feed path's payload
    * projection for `sourceType`: payload columns in registry order
    * and registry types (§1.3 policy — see [[alignColumn]]),
    * `_op="READ"`, `_ts=snapshotTsMs`, and null source-position
    * metadata (snapshot rows carry no binlog position on the feed
    * path either — the kept set is
    * [[graft.ops.EnvelopeDecoder.keptMetadata]], the single source of
    * truth the tail writes from).
    *
    * `sourceTable` is the ORIGINAL source identity (`db.table` as the
    * database knows it) — NOT `spec.key`: the spec carries the
    * renamed/sanitized SINK identity, which with a `table.name.map`
    * (`users` → `users_v20231114`) or a dash-named db does not exist
    * at the source at all.
    *
    * Column matching against the database is case-insensitive and
    * sanitizer-aware: Derby/Oracle report `USER_EVENTS`/`ID` where a
    * MySQL-shaped registry says `user_events`/`id`; the OUTPUT always
    * uses the registry's names (the registry is the sink contract).
    * A select-list override naturally returns fewer columns — the
    * missing payload columns are null-filled, never dropped, so the
    * sink schema cannot fork (same rule as the feed-path override).
    */
  def snapshotFrame(spark: SparkSession, url: String,
      connProps: Map[String, String], sourceTable: String, spec: TableSpec,
      overrideStmt: Option[String], snapshotTsMs: Long,
      sourceType: String = "mysql",
      partitionOptions: Map[String, String] = Map.empty,
      chunk: Option[(String, Long, Long)] = None,
      chunkIncludesNulls: Boolean = false): DataFrame = {
    val base = overrideStmt match {
      case Some(stmt) => SnapshotOverrides.asJdbcSubquery(sourceTable, stmt)
      case None => sourceTable
    }
    // chunk = (column, lo, hi) BOTH INCLUSIVE: one slice of a
    // resumable snapshot — composed AROUND the override subquery so
    // both the operator's predicate and the chunk range run
    // server-side. Inclusive bounds, not half-open: a half-open upper
    // of Long.MaxValue+1 is unrepresentable, which would silently
    // exclude a key AT Long.MaxValue from the last chunk.
    // `chunkIncludesNulls` (chunk 0 only): MIN/MAX bounds ignore NULL
    // keys and a range WHERE evaluates UNKNOWN for them — without the
    // IS NULL arm, NULL-keyed rows would appear in NO chunk and the
    // "complete" marker would hide their permanent loss. (Spark's own
    // JDBC range partitions put the IS NULL predicate on the first
    // partition the same way, so per-chunk sharding composes: the
    // NULL rows land exactly once.)
    val dbtable = chunk match {
      case Some((c, lo, hi)) =>
        val inner = overrideStmt match {
          case Some(_) => base // already a parenthesized aliased subquery
          case None => sourceTable
        }
        val range = s"$c >= $lo AND $c <= $hi"
        val pred = if (chunkIncludesNulls) s"$c IS NULL OR ($range)" else range
        s"(SELECT * FROM $inner WHERE $pred) graft_chunk"
      case None => base
    }
    val raw = spark.read.format("jdbc")
      .option("url", url)
      .option("dbtable", dbtable)
      .options(connProps)
      .options(partitionOptions)
      .load()
    val byName: Map[String, StructField] = raw.schema.fields.map(f =>
      graft.schema.Sanitizer(f.name).toLowerCase -> f).toMap
    val cols = spec.schema.fields.toSeq.map { f =>
      byName.get(f.name.toLowerCase) match {
        case Some(src) =>
          alignColumn(raw(src.name), src.dataType, f.dataType).as(f.name)
        case None => lit(null).cast(f.dataType).as(f.name)
      }
    }
    val kept: Seq[org.apache.spark.sql.Column] =
      EnvelopeDecoder.keptMetadata(sourceType).map { f =>
        f.name match {
          case "_op" => lit("READ").as("_op")
          case "_ts" => lit(snapshotTsMs).as("_ts")
          case n => lit(null).cast(f.dataType).as(n)
        }
      }
    raw.select(cols ++ kept: _*)
  }

  /** JDBC-read type → registry (§1.3 policy) type, with Debezium's
    * envelope semantics where a plain cast would differ
    * (`AVROUtils.java:54-103` collapses DATE→int epoch-days and
    * DATETIME/TIME→long, which is what the feed path's union payloads
    * carry — the snapshot must encode identically or the composed
    * dataset is bimodal):
    *  - Date → Int: epoch days
    *  - Timestamp → Long: epoch millis (covers DATETIME and TIME,
    *    which JDBC surfaces as 1970-01-01-anchored timestamps →
    *    millis-of-day)
    *  - anything → String: plain cast (decimal/timestamp-as-string
    *    policy)
    *  - otherwise: plain cast
    */
  private[graft] def alignColumn(c: org.apache.spark.sql.Column,
      src: DataType, target: DataType): org.apache.spark.sql.Column =
    (src, target) match {
      case (DateType, IntegerType) => datediff(c, to_date(lit("1970-01-01")))
      case (TimestampType, LongType) => unix_millis(c)
      case (_, t) => c.cast(t)
    }

  /** Run one action per table on a bounded pool — the table-level
    * parallelism knob (`snapshot.jdbc.table.parallelism`): a 300-table
    * registry's snapshot wall clock is otherwise the SUM of per-table
    * scans even though each table's scan shards across executors.
    * Each table's work is independent (own sink dir, own progress
    * files), and Spark schedules concurrent actions from multiple
    * driver threads natively. Fails fast on the first table failure
    * (in-flight tables finish their current write; unfinished tables
    * are not marked done, so a restart re-runs them — same
    * at-least-once contract as a crash).
    */
  private def mapTables[A](items: Seq[A], parallelism: Int)(
      f: A => (String, Long)): Map[String, Long] =
    if (parallelism <= 1 || items.size <= 1) items.map(f).toMap
    else {
      import scala.concurrent.{Await, ExecutionContext, Future}
      val pool = java.util.concurrent.Executors.newFixedThreadPool(
        math.min(parallelism, items.size))
      try {
        implicit val ec: ExecutionContext =
          ExecutionContext.fromExecutorService(pool)
        Await.result(Future.sequence(items.map(i => Future(f(i)))),
          scala.concurrent.duration.Duration.Inf).toMap
      } finally pool.shutdown()
    }

  /** Snapshot registry tables of `config` into their sink dirs — the
    * same layout, dt bucketing (incl. K4 fixed bucket), and per-table
    * schema the binlog tail appends to. Reads the ORIGINAL source
    * identity (`registry.sourceTables`), writes the routed SINK
    * identity. Override statements come from `config.snapshotOverrides`
    * (their validated verbatim form) and are pushed server-side.
    * `only` restricts to a route-key subset (the restart path
    * snapshotting just the tables a prior run didn't finish).
    *
    * Returns the rows WRITTEN per table this run: parquet counts
    * before/after the append — footer-metadata reads, so the
    * accounting never re-scans data (a `frame.count()` would run the
    * whole server-side query a second time).
    */
  def writeSnapshot(spark: SparkSession, config: CdcConfig, url: String,
      connProps: Map[String, String], snapshotTsMs: Long,
      partitionOptions: Map[String, String] = Map.empty,
      only: Option[Set[String]] = None,
      tableParallelism: Int = 1): Map[String, Long] = {
    val dtCol = config.fixedBucket.map(lit(_).as("dt"))
      .getOrElse(EnvelopeDecoder.dtColumn)
    def sinkCount(dir: String): Long =
      try spark.read.parquet(dir).count() catch {
        case _: org.apache.spark.sql.AnalysisException => 0L // no dir yet
      }
    mapTables(config.registry.routed.toSeq
        .filter { case (key, _) => only.forall(_.contains(key)) },
      tableParallelism) { case (key, spec) =>
      val source = config.registry.sourceTables.getOrElse(key, spec)
      val frame = snapshotFrame(spark, url, connProps, source.key, spec,
        config.snapshotOverrides.get(key).map(_.statement), snapshotTsMs,
        config.sourceType, partitionOptions)
      val dir = spec.sinkDir(config.sinkPath, config.sourceId)
      val before = sinkCount(dir)
      frame.withColumn("dt", dtCol)
        .write.mode("append").partitionBy("dt").parquet(dir)
      key -> (sinkCount(dir) - before)
    }
  }

  /** The chunk plan of one table's resumable snapshot: `n` even
    * slices of `[lo, hi]` (inclusive bounds as probed) on a numeric
    * `column`. Computed ONCE and persisted by the caller — a restart
    * must resume the SAME plan, because re-probing live bounds after
    * new inserts would shift every range and drop or duplicate rows.
    * Rows inserted after the plan was cut arrive via the binlog tail,
    * exactly as they do for the single-shot snapshot.
    *
    * `tsMs` is the snapshot timestamp stamped into every chunk's
    * `_ts` — persisted WITH the plan so a crash-resumed table's later
    * chunks reuse run 1's value instead of run 2's clock: one table's
    * READ rows must carry ONE `_ts` and land in ONE `dt=` partition,
    * not straddle two. Optional only for plan files written before the
    * field existed (4-field parse) — those resume with the resuming
    * run's timestamp, the pre-existing behavior.
    */
  final case class ChunkPlan(key: String, column: String, chunks: Int,
      lo: Long, hi: Long, tsMs: Option[Long] = None) {
    require(chunks > 0, s"chunks must be positive, got $chunks")
    require(lo <= hi, s"bounds out of order: [$lo, $hi]")
    /** Chunk i as (lo, hi) BOTH INCLUSIVE; BigInt internally so
      * full-Long-range bounds can't overflow the step math, and
      * inclusive so `hi = Long.MaxValue` is representable (a half-open
      * upper would need MaxValue+1 and silently drop that key). A
      * trailing chunk past the span is empty: its lo > hi.
      */
    def range(i: Int): (Long, Long) = {
      val span = BigInt(hi) - BigInt(lo) + 1
      val step = (span + chunks - 1) / chunks
      val a = BigInt(lo) + step * i
      if (a > BigInt(hi)) (Long.MaxValue, Long.MinValue) // empty: lo > hi
      else (a.toLong, (a + step - 1).min(BigInt(hi)).toLong)
    }
  }

  /** Server-side MIN/MAX of the chunk column — one aggregate row over
    * the index, no data scan on a keyed column. None when the table
    * is empty (a NULL min means nothing to chunk).
    *
    * When a snapshot override narrows the table, bounds are probed
    * THROUGH the override subquery — the same base the chunk WHERE
    * composes around. Probing the raw table instead would size
    * span-based `rowsPerChunk` plans from the full-table span: a
    * narrowing override over a wide key range would trip the
    * [[MaxChunks]] sparse-key guard (or cut mostly-empty chunks)
    * even though the overridden read is dense.
    */
  def chunkBounds(spark: SparkSession, url: String,
      connProps: Map[String, String], sourceTable: String,
      column: String, overrideStmt: Option[String] = None)
      : Option[(Long, Long)] = {
    val base = overrideStmt match {
      case Some(stmt) => SnapshotOverrides.asJdbcSubquery(sourceTable, stmt)
      case None => sourceTable
    }
    val row = spark.read.format("jdbc")
      .option("url", url)
      .option("dbtable",
        s"(SELECT MIN($column) graft_lo, MAX($column) graft_hi " +
          s"FROM $base) graft_bounds")
      .options(connProps)
      .load().collect().head
    if (row.isNullAt(0)) None
    else Some((asLong(row.get(0)), asLong(row.get(1))))
  }

  private def asLong(v: Any): Long = v match {
    case n: java.lang.Number => n.longValue()
    case other => other.toString.trim.toLong
  }

  /** Server-side COUNT(*) through the same base the chunk WHERE
    * composes around — the one extra aggregate `chunk.rows.exact`
    * pays to size chunks by TRUE row count instead of key span.
    */
  def chunkRowCount(spark: SparkSession, url: String,
      connProps: Map[String, String], sourceTable: String,
      overrideStmt: Option[String] = None): Long = {
    val base = overrideStmt match {
      case Some(stmt) => SnapshotOverrides.asJdbcSubquery(sourceTable, stmt)
      case None => sourceTable
    }
    asLong(spark.read.format("jdbc")
      .option("url", url)
      .option("dbtable", s"(SELECT COUNT(*) graft_n FROM $base) graft_count")
      .options(connProps)
      .load().collect().head.get(0))
  }

  /** Chunk-progress persistence seam: the caller records the cut plan
    * and each landed chunk so a restart resumes instead of starting
    * the table over — at 100 TB a multi-terabyte table's snapshot
    * must be resumable at chunk granularity, not table granularity.
    */
  trait ChunkProgress {
    def plan(key: String): Option[ChunkPlan]
    def savePlan(p: ChunkPlan): Unit
    def doneChunks(key: String): Set[Int]
    def chunkDone(key: String, i: Int): Unit
    /** The staged-commit manifest of chunk `i`: the sink-relative
      * file names the chunk is about to publish, persisted BEFORE the
      * first rename into the sink. A manifest WITHOUT a done marker
      * marks a crash mid-publish — the re-run deletes exactly those
      * names before re-staging, which is what makes the chunk replay
      * EXACTLY-once instead of at-least-once. Defaults are no-ops
      * (in-memory progress in tests doesn't crash); the durable
      * implementation overrides all three.
      */
    def saveManifest(key: String, i: Int, files: Seq[String]): Unit = ()
    def manifest(key: String, i: Int): Option[Seq[String]] = None
    def clearManifest(key: String, i: Int): Unit = ()
  }

  /** Upper bound on a span-derived chunk count (`rowsPerChunk`
    * sizing): beyond this, the chunk column is too sparse and the
    * plan would be a persisted death march, not a snapshot.
    */
  val MaxChunks: Int = 100000

  /** Durable [[ChunkProgress]]: one small file per fact under `dir`
    * (beside the `_snapshot.done` marker) — `<key>.plan` holds the cut
    * plan (`column chunks lo hi tsMs`), `<key>.chunk<i>.done` is an
    * empty create-only marker per landed chunk, `<key>.chunk<i>
    * .manifest` is the staged-commit file list (written atomically —
    * a torn manifest would under-delete on heal and reintroduce the
    * duplicate window). Create-only/atomic files instead of a
    * rewritten state file: a crash mid-update can never corrupt
    * already-recorded progress. The replay window is one chunk — and
    * with the staged commit it is EXACTLY-once: a crash anywhere
    * between staging and the done marker re-runs the chunk AFTER
    * deleting whatever the manifest shows was already published, so
    * the append-mode sink never carries a duplicate row. (The
    * single-shot paths — [[writeSnapshot]] and non-chunkable tables —
    * keep the at-least-once table-granularity contract: a crash
    * mid-snapshot re-runs unfinished tables whole.)
    */
  final class FileChunkProgress(spark: SparkSession, dir: String)
      extends ChunkProgress {
    import org.apache.hadoop.fs.{Path => HPath}
    private val root = new HPath(dir)
    private def fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // route keys are db.table after sanitization — dots are fine in
    // file names; anything else unexpected is collapsed defensively
    private def safe(key: String): String =
      key.replaceAll("[^A-Za-z0-9._-]", "_")

    def plan(key: String): Option[ChunkPlan] = {
      val p = new HPath(root, s"${safe(key)}.plan")
      if (!fs.exists(p)) None
      else {
        val in = fs.open(p)
        val line =
          try scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim
          finally in.close()
        // an EMPTY file is the crash window between savePlan's
        // create-claim and its write — no plan was ever recorded, so
        // nothing can have landed under it. Self-heal: delete and
        // re-cut (the create-once guard would otherwise wedge the
        // table forever). A reader can only race a LIVE writer here
        // if two snapshots of the same source run concurrently —
        // already the error the create-claim exists to surface.
        // NON-empty malformed content is real corruption — fail loud.
        if (line.isEmpty) { fs.delete(p, false); None }
        else line.split("\\s+") match {
          // 4-field form: plans written before the snapshot timestamp
          // was persisted — backward-compatible, ts falls back to the
          // resuming run's clock
          case Array(col, n, lo, hi) =>
            Some(ChunkPlan(key, col, n.toInt, lo.toLong, hi.toLong))
          case Array(col, n, lo, hi, ts) =>
            Some(ChunkPlan(key, col, n.toInt, lo.toLong, hi.toLong,
              Some(ts.toLong)))
          case _ => throw new IllegalStateException(
            s"CORRUPT CHUNK PLAN at $p: '$line' " +
              "(want 'column chunks lo hi [tsMs]')")
        }
      }
    }

    def savePlan(p: ChunkPlan): Unit = {
      fs.mkdirs(root)
      val fin = new HPath(root, s"${safe(p.key)}.plan")
      // create-once via create-no-overwrite ON THE FINAL PATH: the
      // create itself is the atomic claim (HDFS namenode-atomic;
      // local FS O_EXCL-shaped). The earlier write-tmp-then-rename
      // scheme was NOT a claim on local filesystems — POSIX rename
      // silently overwrites an existing destination, so two
      // concurrent snapshots could both "win" and proceed with
      // different plans. The cost is a visible create→write window:
      // plan()'s empty-file arm covers it (an empty plan file means
      // no plan content was ever durable, and nothing can have
      // landed under a plan that was never readable).
      val out =
        try fs.create(fin, false)
        catch {
          case e: java.io.IOException => throw new IllegalStateException(
            s"CHUNK PLAN ALREADY CUT for ${p.key} at $fin (lost the " +
              "create race) — concurrent snapshot of the same source?", e)
        }
      try out.write((s"${p.column} ${p.chunks} ${p.lo} ${p.hi}" +
        p.tsMs.map(t => s" $t").getOrElse("") + "\n").getBytes("UTF-8"))
      finally out.close()
    }

    def doneChunks(key: String): Set[Int] = {
      val glob = new HPath(root, s"${safe(key)}.chunk*.done")
      val hits = fs.globStatus(glob)
      if (hits == null) Set.empty
      else hits.map { s =>
        val n = s.getPath.getName
        n.stripSuffix(".done").split("\\.chunk").last.toInt
      }.toSet
    }

    def chunkDone(key: String, i: Int): Unit = {
      fs.mkdirs(root)
      fs.create(new HPath(root, s"${safe(key)}.chunk$i.done"), true).close()
    }

    private def manifestPath(key: String, i: Int) =
      new HPath(root, s"${safe(key)}.chunk$i.manifest")

    override def saveManifest(key: String, i: Int,
        files: Seq[String]): Unit = {
      fs.mkdirs(root)
      // atomic (tmp-then-rename): the heal path deletes EXACTLY the
      // listed names — a torn list would under-delete and quietly
      // reintroduce the duplicate-row window this file exists to close
      AtomicFiles.write(manifestPath(key, i).toString,
        files.mkString("", "\n", "\n"),
        spark.sparkContext.hadoopConfiguration)
    }

    override def manifest(key: String, i: Int): Option[Seq[String]] = {
      val p = manifestPath(key, i)
      if (!fs.exists(p)) None
      else {
        val in = fs.open(p)
        val lines =
          try scala.io.Source.fromInputStream(in, "UTF-8")
            .getLines().map(_.trim).filter(_.nonEmpty).toVector
          finally in.close()
        Some(lines)
      }
    }

    override def clearManifest(key: String, i: Int): Unit =
      fs.delete(manifestPath(key, i), false)
  }

  /** Resumable chunked snapshot: per pending table, reuse (or cut and
    * persist) the chunk plan, then land every not-yet-done chunk as
    * its own server-side range read + sink append, marking each chunk
    * after its append commits. The crash-replay window shrinks from
    * one whole table (the [[writeSnapshot]] path) to one chunk.
    * Override statements compose: the chunk range wraps the override
    * subquery, both pushed down. An empty table (no bounds) degrades
    * to the single-shot path — zero rows either way.
    *
    * Returns rows written per table THIS run (footer-count deltas,
    * like [[writeSnapshot]]).
    */
  /** `rowsPerChunk` (the reference's `mysql.split.size` = 4096 shape,
    * `MySQLStreamer.java:200`) overrides `chunks` with a per-table
    * count derived from the probed bounds: ceil(span / rowsPerChunk).
    * Span is the chunk column's VALUE range — for dense sequential
    * keys that is the row count; for sparse keys chunks run smaller,
    * never bigger (same assumption the reference's range splitter
    * makes, with its distribution-factor guard for pathological skew).
    * The derived count is persisted in the plan, so a restart is
    * consistent even if the config knob changes between runs.
    *
    * `exactRows` sizes by TRUE row count instead: one extra
    * server-side COUNT(*) (through the override when present) buys
    * the reference's real rows-per-split semantics for moderately
    * sparse keys — ceil(count / rowsPerChunk) chunks over the same
    * even value slices, so each chunk averages `rowsPerChunk` rows
    * regardless of key density. (Per-chunk row counts still follow
    * the key DISTRIBUTION — a heavily skewed key concentrates rows
    * in few chunks either way; the reference's distribution-factor
    * guard makes the same trade.)
    */
  /** `numPartitions` > 1 additionally shards EACH chunk's range scan
    * across executors via Spark's JDBC partition options (bounds set
    * to the chunk's own range) — the chunk stays the unit of RESUME,
    * the partitions the unit of PARALLELISM, so resumability no
    * longer costs the sharded-scan throughput the single-shot path
    * has. The JDBC range predicates compose with the chunk WHERE
    * (their intersection is the chunk).
    */
  /** `chunkColumnFor` resolves each table's chunk column — per-table,
    * because a heterogeneous registry has different PK names per
    * table (the reference's incremental snapshot chunks every table
    * on its own key automatically, `MySQLStreamer.java:214-311`).
    * None = this table has nothing to chunk on (no numeric
    * single-column key): it degrades to the single-shot scan IN the
    * same run, resumable at table granularity like [[writeSnapshot]],
    * with a log line saying so.
    */
  def writeSnapshotChunked(spark: SparkSession, config: CdcConfig,
      url: String, connProps: Map[String, String], snapshotTsMs: Long,
      chunkColumnFor: String => Option[String], chunks: Int,
      progress: ChunkProgress,
      only: Option[Set[String]] = None,
      rowsPerChunk: Option[Long] = None,
      numPartitions: Int = 1,
      exactRows: Boolean = false,
      tableParallelism: Int = 1): Map[String, Long] = {
    val dtCol = config.fixedBucket.map(lit(_).as("dt"))
      .getOrElse(EnvelopeDecoder.dtColumn)
    def sinkCount(dir: String): Long =
      try spark.read.parquet(dir).count() catch {
        case _: org.apache.spark.sql.AnalysisException => 0L
      }
    mapTables(config.registry.routed.toSeq
        .filter { case (key, _) => only.forall(_.contains(key)) },
      tableParallelism) { case (key, spec) =>
      val source = config.registry.sourceTables.getOrElse(key, spec)
      val dir = spec.sinkDir(config.sinkPath, config.sourceId)
      val before = sinkCount(dir)
      // a resumed plan's OWN column wins over the resolver (same
      // reason its bounds do: the persisted plan is the contract —
      // config, or the table's discovered key, may have changed
      // between runs); read once, passed down
      val priorPlan = progress.plan(key)
      priorPlan.map(_.column).orElse(chunkColumnFor(key)) match {
        case None =>
          org.slf4j.LoggerFactory.getLogger(getClass).info(
            s"[${config.name}] $key: no chunk column (no numeric " +
              "single-column key and no override) — single-shot " +
              "snapshot for this table")
          snapshotFrame(spark, url, connProps, source.key, spec,
            config.snapshotOverrides.get(key).map(_.statement),
            snapshotTsMs, config.sourceType)
            .withColumn("dt", dtCol)
            .write.mode("append").partitionBy("dt").parquet(dir)
        case Some(chunkColumn) =>
          writeTableChunked(spark, config, url, connProps, snapshotTsMs,
            key, spec, source.key, chunkColumn, chunks, progress,
            priorPlan, rowsPerChunk, numPartitions, exactRows, dtCol, dir)
      }
      key -> (sinkCount(dir) - before)
    }
  }

  /** One table's chunked snapshot: reuse (or cut and persist) the
    * plan, land every not-yet-done chunk. Extracted from
    * [[writeSnapshotChunked]]'s loop so the per-table column
    * resolution above stays readable.
    */
  private def writeTableChunked(spark: SparkSession, config: CdcConfig,
      url: String, connProps: Map[String, String], snapshotTsMs: Long,
      key: String, spec: TableSpec, sourceKey: String,
      chunkColumn: String, chunks: Int, progress: ChunkProgress,
      priorPlan: Option[ChunkPlan],
      rowsPerChunk: Option[Long], numPartitions: Int,
      exactRows: Boolean, dtCol: org.apache.spark.sql.Column,
      dir: String): Unit = {
      val plan = priorPlan.getOrElse {
        // bounds probed THROUGH the override (when present) — the
        // same base the per-chunk WHERE wraps, so span-derived chunk
        // counts size the data actually read, not the raw table
        val p = chunkBounds(spark, url, connProps, sourceKey, chunkColumn,
            config.snapshotOverrides.get(key).map(_.statement))
          match {
          case Some((lo, hi)) =>
            val n = rowsPerChunk match {
              case Some(rows) =>
                require(rows > 0, s"rowsPerChunk must be positive, got $rows")
                val basis =
                  if (exactRows) BigInt(chunkRowCount(spark, url, connProps,
                    sourceKey,
                    config.snapshotOverrides.get(key).map(_.statement)))
                  else BigInt(hi) - BigInt(lo) + 1
                val derived = (basis + rows - 1) / rows max 1
                // span-based sizing explodes on SPARSE keys (a
                // snowflake/epoch-millis ID spans ~1e15 regardless of
                // row count → billions of chunks, each a JDBC query +
                // a progress file, persisted in the plan). Fail fast
                // with the fix rather than start a death march — the
                // reference guards the same hazard with its
                // distribution-factor bound.
                require(derived <= MaxChunks,
                  if (exactRows)
                    s"$key: $derived chunks at $rows rows each (cap " +
                      s"$MaxChunks) — raise snapshot.jdbc.chunk.rows or " +
                      "use snapshot.jdbc.chunks with a fixed count"
                  else
                    s"$key: chunk column spans [$lo, $hi] — " +
                      s"$derived chunks at $rows rows each (cap $MaxChunks). " +
                      "The column is too sparse for span-based sizing: " +
                      "use snapshot.jdbc.chunk.rows.exact=true (COUNT(*)-" +
                      "probed sizing), snapshot.jdbc.chunks with a fixed " +
                      "count, or a denser chunk column")
                derived.toInt
              case None => chunks
            }
            ChunkPlan(key, chunkColumn, n, lo, hi, Some(snapshotTsMs))
          case None =>
            // no non-NULL keys: truly empty, or every key is NULL. A
            // synthetic one-chunk plan keeps BOTH cases correct: chunk
            // 0's IS NULL arm sweeps the all-NULL table (silently
            // skipping it would hide permanent row loss behind a
            // "complete" marker), the [0, 0] range matches nothing
            // (there are no non-null keys), and the chunk marker
            // keeps the restart idempotent either way.
            ChunkPlan(key, chunkColumn, 1, 0L, 0L, Some(snapshotTsMs))
        }
        progress.savePlan(p)
        p
      }
      val p = plan
      // a resumed table's remaining chunks reuse the PERSISTED
      // timestamp: one `_ts` (and one `dt=` partition) per table's
      // snapshot, even across a crash spanning midnight
      val tableTs = p.tsMs.getOrElse(snapshotTsMs)
      val done = progress.doneChunks(key)
      import org.apache.hadoop.fs.{Path => HPath}
      val sinkRoot = new HPath(dir)
      val fs = sinkRoot.getFileSystem(spark.sparkContext.hadoopConfiguration)
      for (i <- 0 until p.chunks if !done.contains(i)) {
        // STAGED COMMIT — the chunk replay is exactly-once, not
        // at-least-once: the chunk writes into a dot-prefixed staging
        // dir inside the sink (invisible to parquet readers), its
        // file list is persisted as a manifest, the files rename into
        // their dt= dirs (names are task-UUID-unique, no collisions),
        // and only then does the done marker land. A crash anywhere
        // in between leaves a manifest without a marker — this heal
        // deletes exactly the listed names from the sink before the
        // re-run, so no published row can ever appear twice.
        for (files <- progress.manifest(key, i); f <- files) {
          // names were written by saveManifest below — but never let a
          // corrupt manifest walk outside the sink dir
          require(!f.contains("..") && !f.startsWith("/"),
            s"SUSPICIOUS MANIFEST ENTRY for $key chunk $i: '$f'")
          fs.delete(new HPath(sinkRoot, f), false)
        }
        val (a, b) = p.range(i)
        if (a <= b) { // inclusive bounds; a > b = empty trailing chunk
          val shardOpts =
            if (numPartitions <= 1) Map.empty[String, String]
            else Map(
              "partitionColumn" -> p.column,
              "lowerBound" -> a.toString,
              "upperBound" -> b.toString,
              "numPartitions" -> numPartitions.toString)
          val staging = new HPath(sinkRoot, s".graft_stage_chunk$i")
          // overwrite also clears any half-written staging remnant
          // from a prior crash
          snapshotFrame(spark, url, connProps, sourceKey, spec,
            config.snapshotOverrides.get(key).map(_.statement),
            tableTs, config.sourceType,
            partitionOptions = shardOpts,
            chunk = Some((p.column, a, b)),
            // chunk 0 sweeps NULL-keyed rows (outside every range)
            chunkIncludesNulls = i == 0)
            .withColumn("dt", dtCol)
            .write.mode("overwrite").partitionBy("dt")
            .parquet(staging.toString)
          val staged: Seq[String] = for {
            dtDir <- fs.listStatus(staging).toSeq if dtDir.isDirectory
            f <- fs.listStatus(dtDir.getPath).toSeq
            if !f.getPath.getName.startsWith("_") &&
              !f.getPath.getName.startsWith(".")
          } yield s"${dtDir.getPath.getName}/${f.getPath.getName}"
          progress.saveManifest(key, i, staged)
          for (rel <- staged) {
            val dst = new HPath(sinkRoot, rel)
            fs.mkdirs(dst.getParent)
            if (!fs.rename(new HPath(staging, rel), dst))
              throw new java.io.IOException(
                s"failed to publish $rel into $dir for $key chunk $i")
          }
          fs.delete(staging, true)
        }
        progress.chunkDone(key, i) // an empty range is still done
        // AFTER the marker — clearing first would turn a crash here
        // into an unhealed re-run (duplicate rows); an orphan manifest
        // beside a done marker is merely tidy-up debt
        progress.clearManifest(key, i)
      }
  }
}
