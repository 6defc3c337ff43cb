package graft.streaming

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths, StandardOpenOption}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.model.{TableRegistry, TableSpec}
import graft.ops.{DdlClassifier, EnvelopeDecoder}

/** Job configuration — the engine's equivalent of the reference's
  * `--config` JSON (`FlinkCDCMulti.java:474-522`): `source.id`,
  * `sink.path`, offset/status store paths, snapshot-only mode,
  * `fail.on.unknown.tables` (`README.md:160`).
  */
final case class CdcConfig(
    sourceId: String,
    registry: TableRegistry,
    sinkPath: String,
    sourceType: String = "mysql", // mysql | postgres | oracle | mongodb
    offsetStorePath: Option[String] = None,
    statusStorePath: Option[String] = None,
    snapshotOnly: Boolean = false,
    failOnUnknownTables: Boolean = true,
    jobName: Option[String] = None,
    /** Strict per-table file order (the reference's parallelism-1
      * guarantee, J3): coalesce each table's batch to one partition
      * and sort it globally by source offset. Off by default — the
      * partition-parallel path still sorts within partitions, which
      * is what downstream keep-latest consumers need, without the
      * single-partition write bottleneck at scale.
      */
    strictOrder: Boolean = false,
    /** Mongo deserializer output mode (T4). When set (mongodb
      * sources), the per-table projection goes through
      * MongoModes.project — `_doc` extended JSON → doc-string /
      * top-level-string / top-level-type — instead of the union-tag
      * payload decode; top-level-string also runs the reference's
      * schema-drift abort.
      */
    mongoMode: Option[graft.ops.MongoModes.Mode] = None,
    /** Per-table snapshot SELECT overrides keyed by the registry's
      * `db.table` key ([[SnapshotOverrides]] — the reference's
      * "snapshot conditions", `MySQLStreamer.java:130-152,269-291`):
      * applied to each overridden table's snapshot (READ) rows before
      * the first sink write; the binlog tail is untouched.
      */
    snapshotOverrides: Map[String, SnapshotOverride] = Map.empty,
    /** K3 debug print sink (`FlinkCDCMulti.java:148-154`, the
      * `--debug` flag): echo the RAW source stream to the console
      * alongside the pipeline — a second streaming query on the same
      * feed, started/stopped with the main one (AvailableNow drains
      * and exits; a ProcessingTime debug echo lives until the main
      * query's stop).
      */
    debugPrint: Boolean = false,
    /** K4 fixed-name bucket assigner
      * (`FixedNameBucketAssigner.java:14-16`): when set, every sink
      * write lands in `dt=<fixedBucket>` instead of the event-time
      * date bucket — the reference's constant-directory alternative
      * to date bucketing.
      */
    fixedBucket: Option[String] = None,
    /** Dry-run mode (the reference's planned `README.md:66` feature):
      * the demux runs fully — decode, gate, routing, snapshot-override
      * gating — but prints per-table routed row counts to the console
      * instead of writing parquet, and publishes NO offsets, status,
      * or commit markers (a dry run that advanced the offset store
      * would silently skip data on the next real run). K3 prints the
      * raw feed; this prints the routed result.
      */
    dryRun: Boolean = false,
    /** Zone-map manifest columns (`sink.zonemap.columns`): when
      * non-empty, every per-table sink write is followed by a
      * [[graft.ops.ZoneMaps.ensure]] on a `<tableDir>._zonemaps`
      * sibling manifest, indexing the listed columns that exist in
      * that table's schema (cost ∝ the batch's new files). The sink
      * stays plain parquet; queries opt into file skipping via
      * `ZoneMaps.prunedRead`. Compaction rebuilds the manifest it
      * finds beside a table.
      */
    zonemapColumns: Seq[String] = Nil,
    /** Bloom-indexed manifest columns (`sink.zonemap.bloom.columns`,
      * subset semantics of [[zonemapColumns]]): each listed column a
      * table has gets a per-file Bloom grid in the manifest, serving
      * point lookups (`ZoneMaps.prunedLookup`) — the "find this key's
      * change rows" path a CDC lake answers constantly.
      */
    zonemapBloomColumns: Seq[String] = Nil,
    /** Auto-compaction threshold (`sink.compact.after.files`): when
      * > 0, after each batch commits, any `dt=` partition THIS batch
      * appended to whose parquet-file count exceeds the threshold is
      * compacted in place ([[Compaction.compactPartitions]] — atomic
      * per-partition swap, offset order preserved, zone-map manifest
      * patched incrementally). Partition-scoped on purpose: a
      * streaming sink fragments its HOT partitions; rewriting the
      * cold history per trigger would be O(table). The writer is
      * idle between micro-batches, so the single-writer contract the
      * compactor requires holds by construction. 0 = off.
      */
    compactAfterFiles: Int = 0,
    /** Target rows per compacted file (`sink.compact.rows.per.file`,
      * the 128 MB-proxy knob callers size from their row width).
      */
    compactRowsPerFile: Long = 1000000L,
    /** Retention horizon in days (`sink.retention.days`): when > 0,
      * after each batch commits, date-shaped `dt=` partitions older
      * than `today(UTC) - days` are dropped from the tables the batch
      * wrote ([[Compaction.expirePartitions]] — manifest patched,
      * fixed-bucket values untouched). Enforced lazily at write time
      * on purpose: a table nothing writes to retains its history
      * until a maintenance pass handles it, so retention can never
      * race a backfill into a cold table. 0 = keep forever.
      */
    retentionDays: Int = 0,
    /** Current-state tables (`sink.current.keys`, JSON map of raw
      * `db.table` → comma-separated key columns): after each batch
      * commits, every listed table the batch wrote gets its
      * `<tableDir>__current` sibling synced
      * ([[CurrentTable.sync]] — incremental by the sink files
      * appended since the table's own durable cursor, so replayed or
      * skipped batches cost nothing extra). The pipeline ships a
      * QUERYABLE latest-row table beside the changelog, no log scan
      * per read. With [[retentionDays]] also set, a batch that
      * expires sink partitions prunes the current tables' tombstones
      * past the same horizon — no sink file that old survives to
      * re-fold past them, so the deleted-key ledger stays bounded.
      */
    currentKeys: Map[String, Seq[String]] = Map.empty,
    /** Full-listing cadence for current-table syncs
      * (`sink.current.fullsync.batches`): scoped syncs only list the
      * partitions the batch itself wrote, so a BACKFILL writer
      * appending to an old partition OUTSIDE the pipeline stays
      * invisible until the next restart's first-pass full walk. When
      * > 0, every Nth sync per table does an unscoped full listing
      * instead, bounding that window to N batches. Default 0 (off):
      * the full walk is O(live sink files) of listing, and sinks
      * without out-of-band writers never need it.
      */
    currentFullsyncBatches: Int = 0,
    /** Key-bucket count for NEW current tables
      * (`sink.current.buckets`): sizes the unit of copy-on-write —
      * a sync rewrites only the buckets its delta's keys hash into,
      * so more buckets = smaller rewrites but more files. Fixed at a
      * table's first sync (persisted in its cursor); changing it
      * later only affects tables not yet cut — a CUT table re-buckets
      * only through the explicit [[CurrentTable.rescale]] lever.
      */
    currentBuckets: Int = 16,
    /** Target live bytes per current-table bucket
      * (`sink.current.target.bucket.mb`): when > 0, each FULL sync
      * (first pass + the fullsync cadence — never the per-batch
      * scoped syncs, so the O(buckets) stat listing amortizes)
      * measures the table's layout and logs a rescale ADVISORY when
      * it has drifted ≥2× from this target. Advisory only: a rescale
      * is a full-table rewrite, and kicking one off implicitly inside
      * a streaming batch would trade a log line for an unbounded
      * batch — the operator runs [[CurrentTable.rescale]] (or any
      * out-of-band maintenance job) at a moment of their choosing.
      * 0 = off.
      */
    currentTargetBucketMb: Int = 0,
    /** Driver-side probe bound for [[CurrentTable.lookup]]
      * (`sink.current.lookup.max.driver.keys`): probes above it fall
      * back to a full-scan semi-join. When > 0 the pipeline publishes
      * it as the session conf [[CurrentTable.LookupMaxKeysConf]] at
      * start, so readers sharing the session inherit the job's bound
      * without passing it per call. 0 = leave the session default.
      */
    currentLookupMaxDriverKeys: Int = 0,
    /** Within-bucket sort columns per current table
      * (`sink.current.order.by`, JSON map of raw `db.table` →
      * comma-separated columns): every bucket rewrite sorts the
      * bucket's rows by these columns, so parquet row-group/page
      * min/max stats are tight on them and filtered reads of the
      * current state skip IO — the lakehouse clustered-rewrite trick.
      * Fixed at each table's first sync (persisted in its layout
      * root, like the bucket count).
      */
    currentOrderBy: Map[String, Seq[String]] = Map.empty,
    /** Secondary bloom-index columns per current table
      * (`sink.current.index.columns`, JSON map of raw `db.table` →
      * comma-separated NON-key columns): after each listed table's
      * sync, any configured column not yet indexed is attached
      * ([[graft.ops.BucketIndex]] — auto-sized blooms, the one
      * full-build pass) and every later sync maintains it at delta
      * cost, giving `lookupBy` point lookups on those columns that
      * read only candidate buckets. Attach-once semantics: an index
      * already on disk (this config in an earlier run, or a manual
      * attach) is left alone.
      */
    currentIndexColumns: Map[String, Seq[String]] = Map.empty,
    /** Maintained rollups per current table (`sink.current.rollup`,
      * JSON map of raw `db.table` → `"name: dims=c1,c2; op:col:as
      * [op:col:as ...]"` — dims= optional for a global rollup, countd
      * takes an optional `:k` fourth field): after each listed
      * table's sync, a rollup not yet attached is full-built once
      * ([[graft.ops.RollupTable.attach]]) and every later sync
      * maintains it at delta cost — a configured dashboard aggregate
      * with no Scala in the loop. Attach-once semantics like
      * [[currentIndexColumns]]: a rollup already on disk is left
      * alone (detach to change a spec).
      */
    currentRollups: Map[String, Seq[(String, graft.ops.RollupTable.Spec)]] =
      Map.empty,
    /** Maintained inverted text indexes per table (`sink.index.text`,
      * JSON map of raw `db.table` → text column): after each listed
      * table's batch commits — BEFORE the commit marker, so a crash
      * between data and index replays the batch and the delta protocol
      * converges (at-least-once, the maintained-index family
      * discipline) — the batch's keep-latest-per-key change set is
      * applied to a `<tableDir>__textindex` sibling via
      * [[graft.ops.TextIndex.applyDelta]]: latest non-delete per key →
      * upsert, latest delete → tombstone. The table's single
      * `sink.current.keys` column is the posting id (REQUIRED, exactly
      * one, integral — the index families key on one long id), so the
      * pipeline ships a BM25-searchable index beside the current
      * table, no external glue job. The index attaches on first
      * delta (built empty, then fed); an index already on disk is fed
      * deltas as-is. Every FULL current-table sync then runs the
      * one-call [[graft.api.Graft.textIndexMaintenance]] and publishes
      * any verdict into the P7 status store as an
      * `advice:index-maintenance` record beside `advice:rescale` —
      * same consumer contract (records repeat while the condition
      * persists; dedupe by (table, advice, kind/column)).
      */
    indexText: Map[String, String] = Map.empty,
    /** Postings fanout for text indexes ATTACHED by this job
      * (`sink.index.text.buckets`): fixed per index lifetime at its
      * attach (persisted in the index meta — indexes already on disk
      * keep theirs); size for the corpus you expect, and let the
      * resize advisory name the number once the corpus is measurable.
      */
    indexTextBuckets: Int = graft.ops.TextIndex.TermBuckets,
    /** Maintained MinHash near-dup band indexes per table
      * (`sink.index.neardup`, JSON map of raw `db.table` → text
      * column) — [[indexText]]'s protocol verbatim against a
      * `<tableDir>__neardup` sibling ([[graft.ops.NeardupIndex]]);
      * its maintenance one-call has no sizing axis (band count is a
      * scheme constant), so only compact verdicts ever publish.
      */
    indexNeardup: Map[String, String] = Map.empty,
    /** Maintained IVF vector indexes per table (`sink.index.ann`,
      * JSON map of raw `db.table` → embedding column). The embedding
      * rides the CDC payload as a JSON array STRING (the envelope's
      * union decode tags non-scalar types as string) — or as a typed
      * `array<double>` column from a non-envelope feed — and is parsed
      * at delta time. The index attaches on the first batch that
      * carries upserts: the codebook is trained from THAT batch's
      * vectors ([[indexAnnK]] centroids, the documented 10-Lloyd-round
      * maintenance default) and frozen — the first batch of a CDC feed
      * is the snapshot, exactly the corpus a codebook should be cut
      * from; retrains are the resize advisory's job, never implicit.
      */
    indexAnn: Map[String, String] = Map.empty,
    /** Codebook size for first-batch ANN index attach
      * (`sink.index.ann.k`): effective k is min of this and the
      * batch's vector count (seed selection caps itself).
      */
    indexAnnK: Int = 16,
    /** Sizing target for the index maintenance one-calls
      * (`sink.index.target.rows`): rows per postings bucket (text) /
      * per centroid (ann) the resize advisories size against.
      */
    indexTargetRows: Long = 1000000L,
    /** Fleet floor for the index maintenance one-calls
      * (`sink.index.min.reclaimable`): owed compacts reclaiming fewer
      * rows surface as `compact-deferred` records instead of
      * compact calls — [[graft.api.Graft.CompactDeferred]]'s contract.
      */
    indexMinReclaimable: Long = 0L) {
  def name: String = jobName.getOrElse(s"JOB-$sourceId")

  /** Route keys carrying at least one maintained-index config. */
  private[graft] def indexedTables: Set[String] =
    indexText.keySet ++ indexNeardup.keySet ++ indexAnn.keySet

  /** The ONE (kind, config map, sink-dir suffix) table every
    * index-kind iteration shares — a fourth kind added here reaches
    * the delta router, the maintenance one-calls and the drift
    * advisories together instead of silently missing one copy-pasted
    * site.
    */
  private[graft] def indexKindDirs
      : Seq[(String, Map[String, String], String)] = Seq(
    ("text", indexText, "__textindex"),
    ("neardup", indexNeardup, "__neardup"),
    ("ann", indexAnn, "__annindex"))
}

/** Stop-signal gate state machine (P1, SURVEY §2.3) at micro-batch
  * granularity. The reference drains 10 s after the trigger then
  * swallows records; micro-batch atomicity gives us a cleaner
  * contract: the triggering batch commits fully, every later batch is
  * swallowed, and the driver stops the query
  * (`mysql/DelayedStopSignalProcessFunction.java:20-219`).
  */
final class StopGate(
    targetTables: Set[String],
    snapshotOnly: Boolean,
    oracleDdl: Boolean = false) {

  private val completed = scala.collection.mutable.Set[String]()
  @volatile var stopped: Boolean = false
  @volatile var reason: Option[String] = None

  /** Feed one batch's observations — `(db, table, statement)` per DDL
    * event; returns true if this batch triggered the stop.
    */
  def observe(ddlStatements: Seq[(String, String, String)],
      nonReadTables: Seq[String]): Boolean = {
    if (stopped) return false
    // Snapshot-only: first non-READ op per table = snapshot complete
    // for that table; all targets complete ⇒ stop (`:62-135`).
    if (snapshotOnly) {
      completed ++= nonReadTables.filter(targetTables.contains)
      if (targetTables.nonEmpty && targetTables.subsetOf(completed)) {
        stopped = true
        reason = Some("SNAPSHOT-COMPLETE")
        return true
      }
    }
    // Structural DDL for a TARGET table ⇒ stop (`:137-201`). The db
    // qualifier is honored when both sides have one — a same-named
    // table in an untracked database must not halt ingestion; the
    // bare-name fallbacks cover schema-keyed (PG) registries.
    ddlStatements.foreach { case (db, tbl, ddl) =>
      val hit = targetTables.isEmpty ||
        (if (db.nonEmpty)
          targetTables.contains(s"$db.$tbl") || targetTables.contains(tbl)
        else targetTables.exists(k => k == tbl || k.endsWith(s".$tbl")))
      if (!stopped && hit) {
        DdlClassifier.classify(ddl, oracle = oracleDdl) match {
          case DdlClassifier.Ignore => ()
          case DdlClassifier.StopTruncateWarn =>
            // the reference's distinct TRUNCATE advice
            // (`mysql/SideInputProcessFunction.java` truncate branch)
            org.slf4j.LoggerFactory.getLogger(getClass).warn(
              s"TRUNCATE detected — use snapshot-only mode to re-sync: $ddl")
            stopped = true
            reason = Some(s"STRUCTURAL-DDL-TRUNCATE: $ddl")
          case _ =>
            stopped = true
            reason = Some(s"STRUCTURAL-DDL: $ddl")
        }
      }
    }
    stopped
  }

  def snapshotCompleted: Set[String] = completed.toSet
}

/** The CDC ingestion pipeline: JSON-lines CDC feed → envelope decode
  * → stop gate → per-table demux → dt-partitioned Parquet, with
  * offset/status write-back after each committed batch (P3-P7 via the
  * micro-batch boundary instead of Flink checkpoint callbacks —
  * SURVEY §2.3 mapping).
  *
  * Scale notes: the demux loop filters one persisted batch N times
  * (N = tables present in the batch, not registry size); each write
  * is partition-parallel. Per-table event order is preserved by
  * sorting on the source offset inside each write (the reference pins
  * parallelism 1 for the same guarantee — J3).
  */
final class CdcPipeline(spark: SparkSession, config: CdcConfig) {

  /** Publish the job's session-level confs (the lookup bound — see
    * the CdcConfig scaladoc). Called when the pipeline STARTS, not at
    * construction: building a pipeline for validation must not mutate
    * shared session state, and with several jobs on one session the
    * conf belongs to whichever job is actually running (last started
    * wins — the per-call `maxDriverKeys` parameter disambiguates when
    * jobs genuinely need different bounds concurrently).
    */
  private[graft] def publishSessionConfs(): Unit =
    if (config.currentLookupMaxDriverKeys > 0)
      spark.conf.set(CurrentTable.LookupMaxKeysConf,
        config.currentLookupMaxDriverKeys.toString)

  val gate = new StopGate(
    config.registry.keys,
    config.snapshotOnly,
    oracleDdl = config.sourceType == "oracle")

  @volatile var recordCount: Long = 0L
  @volatile var lastEventTs: Long = 0L
  @volatile var lastOffset: Option[String] = None

  /** Dry-run visibility for callers (the console print is for the
    * operator): route key → total rows that WOULD have been written.
    */
  val dryRunCounts: scala.collection.concurrent.Map[String, Long] =
    scala.collection.concurrent.TrieMap.empty[String, Long]

  /** After a structural-DDL stop: the auto-evolution proposals (dated
    * version name map + evolved schema where mechanical) for the
    * statements that triggered it — see [[graft.ops.DdlEvolution]].
    */
  @volatile var evolutionProposals: Seq[graft.ops.EvolutionProposal] = Nil

  private val routed: Map[String, TableSpec] = config.registry.routed

  /** Tables whose current-table sync has done its one full-listing
    * pass this run (later syncs scope to the batch's partitions —
    * see processBatch). Driver-side, single foreachBatch thread.
    */
  private val fullSynced = scala.collection.mutable.Set.empty[String]

  /** Scoped syncs per table since its last full-listing pass — drives
    * the `sink.current.fullsync.batches` cadence. Same threading
    * contract as [[fullSynced]].
    */
  private val scopedSyncs = scala.collection.mutable.Map.empty[String, Int]

  /** Tables whose current-table retention sweep (expired cursor
    * entries + horizon tombstone prune) ran this run — later passes
    * run it only when partitions actually drop. Same threading
    * contract as [[fullSynced]].
    */
  private val retentionSwept = scala.collection.mutable.Set.empty[String]

  /** The sink bucket column: event-date (K1), or the K4 constant. */
  private val dtColumn: org.apache.spark.sql.Column =
    config.fixedBucket.map(lit).getOrElse(EnvelopeDecoder.dtColumn)

  /** K4 read-back hazard scan: existing `dt=` partition dirs under any
    * table sink whose value differs from the fixed bucket. Both paths
    * WRITE dt as a string, but Spark's partition-value type inference
    * on read-back types `dt=2026-01-01` as Date and `dt=static` as
    * String — mixing them under one dataset breaks consumers. The
    * flag is meant for fresh sinks; flipping it on an existing
    * date-bucketed sink gets a loud startup warning, not silent
    * corruption. (Fail-fast is deliberately NOT done: an operator
    * mid-migration may own the mix.)
    */
  private[graft] def mixedBucketDirs: Seq[String] =
    config.fixedBucket.toSeq.flatMap { b =>
      val conf = spark.sparkContext.hadoopConfiguration
      for {
        spec <- routed.values.toSeq
        dir = new org.apache.hadoop.fs.Path(
          spec.sinkDir(config.sinkPath, config.sourceId))
        fs = dir.getFileSystem(conf)
        if fs.exists(dir)
        st <- fs.listStatus(dir).toSeq
        name = st.getPath.getName
        if name.startsWith("dt=") && name != s"dt=$b"
      } yield s"${spec.key}/$name"
    }

  // Maintained-index config validation at CONSTRUCTION (CdcJob
  // re-validates config files with friendlier messages; this guards
  // direct-CdcConfig users): an indexed table needs a known route, a
  // single-column integral `currentKeys` entry (the posting id the
  // index families key on — a composite or string key has no long id
  // to post under), and the indexed column in its schema. Failing at
  // the first batch instead would crash-loop the job mid-stream.
  locally {
    val kinds = Seq(("sink.index.text", config.indexText),
      ("sink.index.neardup", config.indexNeardup),
      ("sink.index.ann", config.indexAnn))
    for ((cfgKey, m) <- kinds; (key, column) <- m) {
      val spec = routed.getOrElse(key, throw new IllegalArgumentException(
        s"$cfgKey for $key: unknown table (known: " +
          s"${routed.keySet.toSeq.sorted.mkString(", ")})"))
      val pk = config.currentKeys.getOrElse(key,
        throw new IllegalArgumentException(
          s"$cfgKey for $key requires sink.current.keys for the same " +
            "table (its single key column is the posting id)"))
      if (pk.size != 1) throw new IllegalArgumentException(
        s"$cfgKey for $key needs a SINGLE-column sink.current.keys " +
          s"(got ${pk.mkString(", ")}) — the index posting id is one " +
          "long key")
      // resolve case-insensitively: Spark's analyzer resolves column
      // references that way, and CdcJob's friendly validator already
      // does (a case-only mismatch here would refuse a config the
      // file validator just blessed — or, worse, SKIP the integral
      // check below and let every posting id cast to null at runtime)
      val keyField = spec.schema.fields
        .find(_.name.equalsIgnoreCase(pk.head))
      // a key column ABSENT from the schema is refused too — the
      // first batch's col(pk) would fail resolution and crash-loop.
      // Deliberately NO mongo `_id` exemption: only DocString mode
      // even synthesizes `_id` (TopLevel modes would crash-loop), and
      // its idUdf emits a STRING — a hex ObjectId casts to a null
      // posting id, silently collapsing every doc onto one key. A
      // mongo collection indexed here must name-map an integral id
      // column into its declared schema.
      if (keyField.isEmpty)
        throw new IllegalArgumentException(
          s"$cfgKey for $key: key column ${pk.head} is not in the " +
            s"table schema (${spec.schema.fields.map(_.name)
              .mkString(", ")}) — maintained indexes need a declared " +
            "integral key (mongo _id is not one; map a numeric id)")
      val integral = keyField.exists(f =>
        f.dataType == org.apache.spark.sql.types.IntegerType ||
          f.dataType == org.apache.spark.sql.types.LongType)
      if (keyField.nonEmpty && !integral)
        throw new IllegalArgumentException(
          s"$cfgKey for $key: key column ${pk.head} is " +
            s"${keyField.get.dataType.simpleString}, not integral — " +
            "the index posting id must cast to long losslessly")
      val colField = spec.schema.fields
        .find(_.name.equalsIgnoreCase(column))
      if (colField.isEmpty)
        throw new IllegalArgumentException(
          s"$cfgKey for $key: no column '$column' in the table schema " +
            s"(${spec.schema.fields.map(_.name).mkString(", ")})")
      // the shared embedding-type rule — see
      // [[CdcPipeline.annEmbeddingTypeOk]]
      if (cfgKey == "sink.index.ann" &&
          !CdcPipeline.annEmbeddingTypeOk(colField.get.dataType))
        throw new IllegalArgumentException(
          s"$cfgKey for $key: column '$column' is " +
            s"${colField.get.dataType.simpleString} — the embedding " +
            "column must be a JSON-array string or an array castable " +
            "to array<double>")
    }
  }

  locally {
    val mixed = mixedBucketDirs
    if (mixed.nonEmpty)
      org.slf4j.LoggerFactory.getLogger(getClass).warn(
        s"[${config.name}] sink.fixed.bucket=" +
          s"${config.fixedBucket.get} over a sink holding other dt " +
          s"buckets (${mixed.take(5).mkString(", ")}) — partition " +
          "type inference may mix Date/String on read-back; use a " +
          "fresh sink path or keep the original bucketing mode")
  }
  /** DDL side-table route: `_{db}_ddl`. PG derives db from the event's
    * `_schema`, which the registry doesn't know up front — recognize
    * the shape rather than a precomputed set.
    */
  private def isDdlKey(k: String): Boolean =
    k != null && k.startsWith("_") && k.endsWith("_ddl")

  /** Per-source event-order columns (P3-P6's offset fields). Snapshot
    * READ rows carry no binlog position — fall back to the write-back
    * offset, then _ts.
    */
  private val offsetOrder: Seq[org.apache.spark.sql.Column] =
    config.sourceType match {
      case "mysql" => Seq(
        // file FIRST: positions reset on binlog rotation, so a batch
        // spanning mysql-bin.000001→000002 must not order by pos alone
        coalesce(col("_binlog_file_internal"), col("_binlog_file")),
        coalesce(col("_binlog_pos_internal"), col("_binlog_pos_end"))
          .cast("long"), col("_ts"))
      case "postgres" => Seq(col("_lsn").cast("long"), col("_ts"))
      case "oracle" => Seq(col("_scn").cast("long"), col("_ts"))
      case _ => Seq(col("_ts"), col("_txn_op_index").cast("long"))
    }

  /** One micro-batch = one checkpoint interval.
    *
    * Driver actions per batch are kept to: 1 summary aggregate (row
    * count, max ts, present/non-READ table keys, offset maximum, DDL
    * count), N per-table writes launched CONCURRENTLY (Spark schedules
    * jobs from multiple threads; per-table batches are small relative
    * to executor count), and a DDL pass only when DDL rows exist.
    */
  /** Commit marker for idempotent batch replay. foreachBatch re-runs
    * the last uncommitted batch after a crash; parquet append would
    * duplicate its rows. A marker written AFTER all table writes, and
    * holding the batch's content fingerprint (row count + ts range +
    * max offset), turns the replay into a no-op — exactly-once for
    * every batch whose marker landed. The fingerprint guards the
    * corner where a FRESH checkpoint reuses batch ids over the same
    * sink: different content → mismatch → the batch processes. (A
    * crash strictly between a table write and the marker still
    * replays that batch's appends: residual at-least-once there, same
    * as the reference between Flink checkpoints; the keep-latest-by-
    * offset read pattern absorbs it.)
    */
  // Hadoop FS for all small-file bookkeeping (markers, offsets,
  // status): java.nio would resolve an hdfs:// or s3a:// sink path as
  // a RELATIVE LOCAL path and "succeed" silently — on a non-local
  // sink the replay guard and offset store would be void.
  private def hfs(path: String): org.apache.hadoop.fs.FileSystem =
    new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sessionState.newHadoopConf())

  // atomic tmp-then-rename publication: offsets/status/markers are
  // observed either old-and-complete or new-and-complete, never
  // truncated (the reference's SingleFileSinkFunction truncates in
  // place — a crash mid-write tears the offset file there)
  private def hWrite(path: String, content: String): Unit =
    AtomicFiles.write(path, content, spark.sessionState.newHadoopConf())

  private def hRead(path: String): Option[String] = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = hfs(path)
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      try {
        val bytes = new java.io.ByteArrayOutputStream()
        val buf = new Array[Byte](8192)
        var n = in.read(buf)
        while (n >= 0) { bytes.write(buf, 0, n); n = in.read(buf) }
        Some(new String(bytes.toByteArray, StandardCharsets.UTF_8))
      } finally in.close()
    }
  }

  private def commitMarker(batchId: Long): String =
    // sourceId in the key: multiple jobs legitimately share a sink
    // root (sinkDir embeds sourceId), and their batch ids collide
    s"${config.sinkPath}/_graft_commits/${config.sourceId}_$batchId"

  private def committedFingerprint(batchId: Long): Option[String] =
    hRead(commitMarker(batchId))

  /** Markers a replay can still consult. Only the most recent
    * uncommitted batch legitimately replays, but keep a window for
    * slack; everything older is dead weight (a long-running job would
    * otherwise grow one small file per batch forever — slow lists on
    * object stores).
    */
  private val MarkerKeep = 16L

  private def markCommitted(batchId: Long, fingerprint: String): Unit = {
    hWrite(commitMarker(batchId), fingerprint)
    // micro-batch ids are consecutive, so deleting exactly one
    // trailing marker per commit keeps a sliding window without a
    // per-batch directory LIST (delete of a missing path is a no-op)
    if (batchId >= MarkerKeep) {
      val old = new org.apache.hadoop.fs.Path(commitMarker(batchId - MarkerKeep))
      hfs(old.toString).delete(old, false)
    }
  }

  def processBatch(batch: DataFrame, batchId: Long): Unit = {
    if (gate.stopped) return // swallow after stop signal (P1 `:138-142`)
    val frame = EnvelopeDecoder.decode(batch).persist()
    try {
      val isNonRead = col("_op").isNotNull && col("_op") =!= "READ" &&
        col("_op") =!= "r" && col("_ddl").isNull
      val offsetStruct = config.sourceType match {
        case "mysql" => struct(col("_binlog_file"),
          col("_binlog_pos_end").cast("long").as("pos"))
        case "postgres" => struct(col("_lsn").cast("long").as("l"))
        case "oracle" => struct(col("_scn").cast("long").as("s"))
        case _ => struct(col("_ts"))
      }
      val s = frame.agg(
        count(lit(1)).as("n"),
        max(col("_ts")).as("maxTs"),
        collect_set(col("_tbl_key")).as("present"),
        collect_set(when(isNonRead, col("_tbl_key"))).as("nonReadKeys"),
        max(when(isNonRead, offsetStruct)).as("off"),
        sum(when(col("_ddl").isNotNull, 1).otherwise(0)).as("nDdl"),
        min(col("_ts")).as("minTs"),
        // undecodable envelope (bad JSON / no routing key): counted
        // here, fatal below — silently dropping data is not an option
        sum(when(col("_tbl_key").isNull, 1).otherwise(0)).as("nBad"),
        // the exact (table, dt) pairs this batch writes — what the
        // maintenance passes below (auto-compaction, current-table
        // sync) scope to. EXACT, not inferred: directory mtimes are
        // synthetic on object stores and a heuristic everywhere else.
        // Bounded by tables × distinct days in the batch. A null dt
        // (null `_ts` in warn mode) lands in Spark's default
        // partition directory — name it explicitly, or the scoped
        // sync would never list the partition those rows went to.
        collect_set(when(col("_ddl").isNull && col("_tbl_key").isNotNull,
          struct(col("_tbl_key").as("k"),
            coalesce(dtColumn, lit("__HIVE_DEFAULT_PARTITION__"))
              .as("d")))).as("tblDts"))
        .collect()(0)
      val present = s.getSeq[String](2).toSet
      val nonReadTables = s.getSeq[String](3)
      val nDdl = Option(s.get(5)).map(_.asInstanceOf[Long]).getOrElse(0L)
      val tblDts: Map[String, Seq[String]] =
        s.getSeq[org.apache.spark.sql.Row](8)
          .filter(r => !r.isNullAt(0) && !r.isNullAt(1))
          .groupBy(_.getString(0))
          .map { case (k, rs) => k -> rs.map(_.getString(1)).distinct }

      val fingerprint = s"${s.getLong(0)}|${Option(s.get(1)).orNull}|" +
        s"${Option(s.get(6)).orNull}|${Option(s.get(4)).orNull}|$nDdl"
      // Durable replay: data + offsets already published. Skip the
      // writes but STILL run the gate below — the committed batch may
      // carry the stop signal, and missing it on replay would run the
      // job past a structural DDL.
      val replayed = committedFingerprint(batchId).contains(fingerprint)

      // per-batch progress (the reference's ">>> [JOB] ..." log lines)
      org.slf4j.LoggerFactory.getLogger(getClass).info(
        s"[${config.name}] batch=$batchId rows=${s.getLong(0)} " +
          s"tables=${present.size} ddl=$nDdl" +
          (if (replayed) " (replay: skipped writes)" else ""))
      // dt days the batch spans: picks the write path below — a
      // steady-state batch (1-2 days) writes directly; a wide span
      // (snapshot/backfill) takes a range shuffle first.
      val daySpan: Long = (Option(s.get(1)), Option(s.get(6))) match {
        case (Some(hi: java.lang.Long), Some(lo: java.lang.Long)) =>
          (hi - lo) / 86400000L + 1
        case _ => 1L
      }

      // Undecodable rows: fail like the reference's deserializer (J2
      // no-restart) unless the job opted into warn-and-continue.
      val nBad = Option(s.get(7)).map(_.asInstanceOf[Long]).getOrElse(0L)
      if (nBad > 0) {
        val msg = s"MALFORMED ENVELOPE: $nBad row(s) with no routing key"
        if (config.failOnUnknownTables) throw new IllegalStateException(msg)
        else org.slf4j.LoggerFactory.getLogger(getClass).warn(msg)
      }

      val unknown = present.diff(routed.keySet)
        .filterNot(k => k == null || isDdlKey(k))
      if (unknown.nonEmpty) {
        val msg = s"UNKNOWN TABLES: ${unknown.mkString(", ")} " +
          s"(known: ${routed.keySet.mkString(", ")})"
        // P2 `mysql/SideInputProcessFunction.java:117-131`
        if (config.failOnUnknownTables) throw new IllegalStateException(msg)
        else org.slf4j.LoggerFactory.getLogger(getClass).warn(msg)
      }

      // Per-table demux + write (K1), one concurrent job per table.
      // Order inside a table's write is the actual SOURCE OFFSET order
      // (binlog pos / lsn / scn), with _ts only as a tiebreaker —
      // multiple events in one transaction share a millisecond, so a
      // _ts sort alone can interleave them (unlike the reference's
      // parallelism-1 pipeline). Sorted before the payload projection
      // because that projection strips the offset columns.
      val writes = for ((key, spec) <- routed.toSeq
          if !replayed && present.contains(key))
        yield scala.concurrent.Future {
          val rows0 = frame.filter(col("_tbl_key") === key && col("_ddl").isNull)
          // Wide-span batches (snapshot/backfill) range-partition by
          // (dt, offset) before the dt-bucketed write: without it,
          // every task writes a file into every dt directory it
          // touches — tasks × days small files per batch (measured 479
          // files for one 100k-row 30-day batch; 74 after). Range
          // boundaries make each output partition a contiguous (dt,
          // offset) slice, so file count tracks data volume (≤
          // partitions + days). Steady-state batches (daySpan ≤ 3, the
          // common case) skip the shuffle + sampling pass — they write
          // ≤ tasks × span files, which is already bounded, and keep
          // full ingest throughput.
          val rows = (if (config.strictOrder) rows0.coalesce(1)
            else if (daySpan > 3) rows0.repartitionByRange(
              (EnvelopeDecoder.dtColumn +: offsetOrder): _*)
            else rows0)
            .sortWithinPartitions((EnvelopeDecoder.dtColumn +: offsetOrder): _*)
          val projected = config.mongoMode match {
            case Some(mode) =>
              if (mode == graft.ops.MongoModes.TopLevelString) {
                val drift = graft.ops.MongoModes.driftCheck(rows, spec)
                if (drift.nonEmpty) {
                  // the Mongo analog of the MySQL structural-DDL stop:
                  // before aborting, surface the same ready-made
                  // proposal (dated collection name map + evolved
                  // sampled schema) — dated by the batch's own event
                  // time, like the DDL path dates by the DDL's _ts
                  val ts = rows.agg(max(col("_ts"))).collect()
                    .headOption.filterNot(_.isNullAt(0)).map(_.getLong(0))
                    .getOrElse(0L)
                  val proposal = graft.ops.DdlEvolution
                    .proposeMongoDrift(spec, key, drift, ts,
                      rawKey = config.registry.sourceTables.get(key)
                        .map(_.key))
                  // synchronized: per-table futures may drift
                  // concurrently in one batch
                  CdcPipeline.this.synchronized {
                    evolutionProposals = evolutionProposals :+ proposal
                  }
                  org.slf4j.LoggerFactory.getLogger(getClass).info(
                    s"[${config.name}] EVOLUTION PROPOSAL: " +
                      s"${proposal.routeKey} -> ${proposal.newTableName} " +
                      s"(${proposal.note}) ${proposal.configJson}")
                  throw new IllegalStateException(
                    s"SCHEMA DRIFT in ${spec.key}: ${drift.mkString(", ")} " +
                      "— map collection to new name")
                }
              }
              graft.ops.MongoModes.project(rows, spec, mode)
            case None => EnvelopeDecoder.payload(rows, spec, config.sourceType)
          }
          // snapshot conditions: restrict this table's READ rows to
          // what its custom snapshot SELECT would have returned
          val gated = config.snapshotOverrides.get(key)
            .map(SnapshotOverrides.applyTo(projected, _))
            .getOrElse(projected)
          if (config.dryRun) {
            // the routed, override-gated result — what a real run
            // would write, counted instead of written
            val n = gated.count()
            dryRunCounts.updateWith(key)(p => Some(p.getOrElse(0L) + n))
            println(s">>> [DRY-RUN][${config.name}] batch=$batchId " +
              s"$key -> ${spec.sinkDir(config.sinkPath, config.sourceId)}: " +
              s"$n row(s)")
          } else {
            val dir = spec.sinkDir(config.sinkPath, config.sourceId)
            gated
              .withColumn("dt", dtColumn)
              .write.mode("append").partitionBy("dt")
              .parquet(dir)
            if (config.zonemapColumns.nonEmpty) {
              // index the configured columns this table actually has
              // (+ dt, always present in the written layout); a table
              // with none of them still gets n_rows-only stats so the
              // manifest's file census stays complete
              val have = (gated.columns.toSet + "dt")
              graft.ops.ZoneMaps.ensure(spark, dir, s"$dir._zonemaps",
                config.zonemapColumns.filter(have),
                config.zonemapBloomColumns.filter(have))
            }
          }
        }(scala.concurrent.ExecutionContext.global)
      import scala.concurrent.duration._
      writes.foreach(scala.concurrent.Await.result(_, 1.hour))

      // DDL events → _{db}_ddl side table (PG flavor keys on _schema).
      val ddlDb = coalesce(col("_db"), col("_schema"))
      val ddls: Array[(String, String, String, Long)] =
        if (nDdl == 0) Array.empty
      else {
        val ddlRows = frame.filter(col("_ddl").isNotNull).persist()
        val collected = ddlRows
          .select(col("_ddl_tbl"), col("_ddl"), ddlDb.as("_ddl_db"),
            col("_ts")).collect()
          .map(r => (Option(r.getString(0)).getOrElse(""), r.getString(1),
            Option(r.getString(2)).getOrElse(""),
            if (r.isNullAt(3)) 0L else r.getLong(3)))
        for (db <- collected.map(_._3).distinct if db.nonEmpty && !replayed) {
          val spec = config.registry.ddlSpec(db)
          val events = EnvelopeDecoder.ddlPayload(ddlRows.filter(ddlDb === db))
          if (config.dryRun)
            println(s">>> [DRY-RUN][${config.name}] batch=$batchId " +
              s"${spec.table} -> " +
              s"${spec.sinkDir(config.sinkPath, config.sourceId)}: " +
              s"${events.count()} DDL event(s)")
          else events
            .withColumn("dt", dtColumn)
            .write.mode("append").partitionBy("dt")
            .parquet(spec.sinkDir(config.sinkPath, config.sourceId))
        }
        ddlRows.unpersist()
        collected
      }

      // Offset/status bookkeeping (P3-P7): computed on the committed
      // batch, published after writes — never ahead of data. A
      // replayed batch published these in its original run. A DRY run
      // publishes nothing durable (no offsets, status, or commit
      // markers): advancing the offset store without writing data
      // would make the next real run skip those events.
      if (!replayed && !config.dryRun) {
        // Maintained-index deltas BEFORE the commit marker (data, not
        // bookkeeping): a crash between a delta and the marker replays
        // the whole batch IDENTICALLY (same offsets, same fingerprint)
        // and re-applying the same content converges — at-least-once,
        // the same residual the sink's own marker window has, never a
        // silently-lost delta (deltas AFTER the marker would be
        // at-MOST-once: a crash between them loses the batch's index
        // changes forever, since the replay skips committed batches).
        // What does NOT converge: a boundary-shifted redelivery of OLD
        // events (an operator rewind — explicit startup position over
        // an existing index) lands them at a NEWER generation, and the
        // index's gen-ordered kills serve the stale content while the
        // current table's (_ts, offset) fold correctly ignores it.
        // The operational contract (CdcJob warns at startup
        // resolution): a rewind over existing index dirs requires an
        // index rebuild from the current table — the same rule every
        // log-compacted downstream of an at-least-once stream has.
        for (key <- present.intersect(config.indexedTables);
            spec <- routed.get(key))
          applyIndexDeltas(key, spec, frame)
        recordCount += s.getLong(0)
        lastEventTs = math.max(lastEventTs, Option(s.get(1))
          .map(_.asInstanceOf[Long]).getOrElse(0L))
        if (!s.isNullAt(4)) {
          val row = s.getStruct(4)
          val offsetStr = config.sourceType match {
            case "mysql" =>
              if (row.isNullAt(0)) null
              else s"${row.getString(0)},${row.getLong(1)}"
            case _ => Option(row.get(0)).map(_.toString).orNull
          }
          if (offsetStr != null) {
            lastOffset = Some(offsetStr)
            config.offsetStorePath.foreach(writeOffsetFile(_, offsetStr))
          }
        }
        config.statusStorePath.foreach(writeStatusFile)
        markCommitted(batchId, fingerprint)
        // Maintenance AFTER the batch is durable, current-table sync
        // FIRST: once the batch's partitions are fully folded, the
        // compactor below may swap the cursor to the rewritten file
        // names instead of re-folding the whole partition — and a
        // rewrite the cursor misses is still safe, because the table
        // retains DELETE tombstones (re-folded older changes lose the
        // keep-latest rematch instead of resurrecting deleted keys).
        if (config.currentKeys.nonEmpty)
          for (key <- present.intersect(routed.keySet);
              pk <- config.currentKeys.get(key);
              spec <- routed.get(key)) {
            val dir = spec.sinkDir(config.sinkPath, config.sourceId)
            // scope the listing to the batch's own partitions — except
            // each table's first sync this run, which walks everything
            // (a crash between a committed batch and its sync leaves
            // unfolded files a scoped listing would never revisit),
            // and every Nth sync under the fullsync cadence (catches
            // out-of-band backfills between restarts)
            val cadenceDue = config.currentFullsyncBatches > 0 &&
              scopedSyncs.getOrElse(key, 0) + 1 >=
                config.currentFullsyncBatches
            val batchScope = tblDts.getOrElse(key, Nil).map(d => s"dt=$d")
            val scope = if (fullSynced(key) && !cadenceDue)
              Some(batchScope)
            else None
            def doSync(sc: Option[Seq[String]]): (Int, Int) =
              CurrentTable.sync(spark, dir,
                s"${dir}__current", pk, config.sourceType,
                buckets = config.currentBuckets, scope = sc,
                orderBy = config.currentOrderBy.getOrElse(key, Nil))
            // A CADENCE full sync on an INDEXED table runs SPLIT: the
            // scoped pass folds the batch's own files first, so
            // whatever the full listing then folds is OUT-OF-BAND
            // content (a backfill written straight into the sink dir)
            // — rows the current table just absorbed but the
            // maintained indexes, fed only from live batch frames,
            // never saw and will never see. Detection costs one extra
            // scoped listing per cadence; the advisory (same status
            // store, `advice:index-content-drift`) names the rebuild
            // because no delta can repair content the stream never
            // carried. First-run full syncs stay unsplit: leftover
            // files there are usually the crash window's own batch
            // files, not out-of-band content, and flagging those
            // would cry wolf on every recovery.
            val (nf, nbk) =
              if (scope.isEmpty && fullSynced(key) &&
                  config.indexedTables.contains(key)) {
                val (a1, b1) = doSync(Some(batchScope))
                val (a2, b2) = doSync(None)
                // b2 > 0 gates the advisory on ROWS, not files: a
                // zero-row stray part file folds as (1, 0) — cursor
                // advanced, no bucket rewritten, nothing for an index
                // to miss — and flagging it would command a full
                // rebuild as a no-op
                if (a2 > 0 && b2 > 0) {
                  org.slf4j.LoggerFactory.getLogger(getClass).warn(
                    s"[${config.name}] current-table $key: cadence " +
                      s"sync folded $a2 OUT-OF-BAND file(s) the " +
                      "maintained indexes never saw — rebuild them " +
                      "from the current table")
                  // existing indexes only: a deferred attach (no dir
                  // yet) has nothing to drift — its eventual
                  // attach-from-sink absorbs the backfill anyway, and
                  // advising a rebuild of a nonexistent index sends
                  // the cron on a pointless build
                  val hcnf = spark.sessionState.newHadoopConf()
                  for (store <- config.statusStorePath;
                      (kind, m, suffix) <- config.indexKindDirs
                      if m.contains(key) && {
                        val p = new org.apache.hadoop.fs.Path(
                          s"$dir$suffix")
                        p.getFileSystem(hcnf).exists(p)
                      })
                    writeIndexDriftFile(store, key, kind,
                      s"$dir$suffix", s"${dir}__current", a2)
                }
                (a1 + a2, b1 + b2)
              } else doSync(scope)
            fullSynced += key
            scopedSyncs(key) =
              if (scope.isEmpty) 0 else scopedSyncs.getOrElse(key, 0) + 1
            if (nf > 0)
              org.slf4j.LoggerFactory.getLogger(getClass).info(
                s"[${config.name}] current-table $key: folded $nf " +
                  s"file(s) into $nbk bucket(s)")
            // secondary indexes: attach-once per configured column
            // (the one full-build pass), AFTER the sync above so the
            // table exists and carries this batch's data; every later
            // sync maintains attached indexes as part of its fold
            if (config.currentIndexColumns.contains(key) ||
                config.currentRollups.contains(key)) {
              val curDir = s"${dir}__current"
              // a batch of only zero-row files leaves a cursor-only
              // table attach would refuse — wait for real data
              val hasData = new org.apache.hadoop.fs.Path(curDir)
                .getFileSystem(spark.sessionState.newHadoopConf())
                .listStatus(new org.apache.hadoop.fs.Path(curDir))
                .exists(_.getPath.getName.startsWith("kb="))
              if (hasData) {
                for (cols <- config.currentIndexColumns.get(key)) {
                  val have = graft.ops.BucketIndex.list(spark, curDir)
                    .map(_.toLowerCase).toSet
                  for (c <- cols if !have(c.toLowerCase))
                    graft.ops.BucketIndex.attach(spark, curDir, c)
                }
                for (rollups <- config.currentRollups.get(key)) {
                  val have = graft.ops.RollupTable.list(spark, curDir).toSet
                  for ((rn, spec) <- rollups if !have(rn))
                    graft.ops.RollupTable.attach(spark, curDir, rn, spec)
                }
              }
            }
            // rescale advisory, full syncs only: the O(buckets) stat
            // listing rides the walk that already listed everything
            if (config.currentTargetBucketMb > 0 && scope.isEmpty)
              for (st <- CurrentTable.layoutStats(spark, s"${dir}__current");
                  rec <- CurrentTable.rescaleAdvice(st,
                    config.currentTargetBucketMb * 1024L * 1024L)) {
                org.slf4j.LoggerFactory.getLogger(getClass).warn(
                  s"[${config.name}] current-table $key has drifted " +
                    s"from its bucket target: ${st.buckets} buckets, " +
                    s"${st.bytes / (1024 * 1024)} MB live " +
                    s"(target ${config.currentTargetBucketMb} MB/bucket) " +
                    s"— run CurrentTable.rescale(spark, \"${dir}__current\", " +
                    s"keys, $rec) at a maintenance window")
                // machine-readable twin of the warning, into the P7
                // status store: an operator's cron can act on the
                // advice (the exact rescale call is in the record)
                // without scraping executor logs
                config.statusStorePath.foreach(writeAdviceFile(_, key,
                  s"${dir}__current", st, rec))
              }
            // index capacity advisory, full syncs only — the rescale
            // advice's twin for secondary indexes: attached bloom
            // filters never resize as the table grows (only a rescale
            // rebuild re-measures), so when the sidecar's own
            // per-bucket counts show the sizing degraded past ~5
            // bits/row, warn AND write the machine-readable
            // reattach record beside the status records (the
            // BucketIndex runbook's "re-attach when rows/bucket has
            // grown well past the sizing", measured instead of manual)
            // every ATTACHED index is measured — the config's columns
            // plus any an operator attached by hand on this table
            // (BucketIndex.list is one small dir listing per full sync)
            if (scope.isEmpty)
              for (c <- graft.ops.BucketIndex.list(spark,
                    s"${dir}__current");
                  st <- graft.ops.BucketIndex.capacityAdvice(spark,
                    s"${dir}__current", c)) {
                val log = org.slf4j.LoggerFactory.getLogger(getClass)
                if (st.reason == "counts-unknown")
                  log.warn(
                    s"[${config.name}] index '$c' on current-table $key " +
                      s"cannot be capacity-measured: ${st.unknownBuckets} " +
                      s"of ${st.knownBuckets + st.unknownBuckets} " +
                      "sidecar buckets predate the per-publish counts " +
                      "(a p99 over the known minority would be " +
                      s"hot-biased); run ${st.call} at a maintenance " +
                      "window to re-size and stamp every bucket")
                else
                  log.warn(
                    s"[${config.name}] index '$c' on current-table $key " +
                      s"has outgrown its sizing: ${st.bits} bits x " +
                      s"${st.shards} shard(s) against ${st.sizingRowsPerBucket} " +
                      "rows/bucket (p99) is " +
                      // Locale.ROOT like the record's JSON twin — the
                      // two surfaces must render one number one way
                      String.format(java.util.Locale.ROOT, "%.1f",
                        Double.box(st.bitsPerRow)) + " " +
                      "bits/row — false positives are degrading the " +
                      s"prune; run ${st.call} at a maintenance window")
                config.statusStorePath.foreach(writeIndexAdviceFile(_,
                  key, s"${dir}__current", st))
              }
            // maintained-index maintenance, full syncs only — the
            // prioritized one-call per configured index, its verdict
            // published beside the rescale / reattach-index records
            // so a CDC-fed BM25/ANN/near-dup index reports to the
            // same advisory stream every other maintained structure
            // does (the two measurement passes are maintenance
            // cadence, riding the full-sync cadence like the rescale
            // stat listing)
            if (scope.isEmpty && config.indexedTables.contains(key)) {
              val hcnf = spark.sessionState.newHadoopConf()
              def idxExists(p: String): Boolean = {
                val hp = new org.apache.hadoop.fs.Path(p)
                hp.getFileSystem(hcnf).exists(hp)
              }
              def publish(kind: String, idxDir: String,
                  verdict: Option[graft.api.Graft.Maintenance[_, _]])
                  : Unit =
                for (v <- verdict) {
                  org.slf4j.LoggerFactory.getLogger(getClass).warn(
                    s"[${config.name}] $kind-index on $key needs " +
                      s"maintenance (${v.kind}): ${v.call}")
                  config.statusStorePath.foreach(
                    writeIndexMaintenanceFile(_, key, kind, idxDir, v))
                }
              // a deferred ANN attach (no vectors yet) has no index
              // to measure — the exists guard skips it, loudly
              // nothing: absence of an index is not a health state
              for ((kind, m, suffix) <- config.indexKindDirs
                  if m.contains(key) && idxExists(s"$dir$suffix"))
                publish(kind, s"$dir$suffix", kind match {
                  case "text" => graft.api.Graft.textIndexMaintenance(
                    spark, s"$dir$suffix", config.indexTargetRows,
                    config.indexMinReclaimable)
                  case "neardup" =>
                    graft.api.Graft.neardupIndexMaintenance(spark,
                      s"$dir$suffix", config.indexMinReclaimable)
                  case "ann" => graft.api.Graft.annIndexMaintenance(
                    spark, s"$dir$suffix", config.indexTargetRows,
                    config.indexMinReclaimable)
                  // explicit, not `case _`: a fourth kind added to
                  // indexKindDirs must fail HERE, not silently run
                  // the ANN measurement against a foreign layout
                  case other => throw new IllegalStateException(
                    s"no maintenance dispatch for index kind '$other'")
                })
            }
          }
        // Auto-compaction next: the stream is idle between
        // micro-batches (single writer), so the swap's no-active-writer
        // requirement holds; a crash mid-swap heals on the next
        // compactor pass (restoreIfInterrupted). Scoped to the exact
        // partitions this batch wrote (from the batch frame itself)
        // AND fragmented past the threshold — cold history is never
        // rewritten.
        if (config.compactAfterFiles > 0)
          autoCompact(tblDts.view.filterKeys(routed.keySet).toMap)
        if (config.retentionDays > 0) {
          val cutoff =
            CdcPipeline.retentionCutoff(spark, config.retentionDays)
          for (key <- present.intersect(routed.keySet);
              spec <- routed.get(key)) {
            val dir = spec.sinkDir(config.sinkPath, config.sourceId)
            val dropped = Compaction.expirePartitions(spark, dir, cutoff)
            // current-table retention hygiene runs when partitions
            // dropped AND on each table's first pass this run: a
            // crashed run may have deleted partitions without reaching
            // this block, and a re-run's expirePartitions returns
            // empty for already-deleted partitions — sweeping by the
            // horizon itself (not the dropped list) converges. NEVER
            // under a fixed bucket: retention cannot expire a constant
            // bucket, so arbitrarily old changes stay re-foldable and
            // their tombstones must stay to defend against them.
            if (config.currentKeys.contains(key) &&
                config.fixedBucket.isEmpty &&
                (dropped.nonEmpty || !retentionSwept(key))) {
              val curDir = s"${dir}__current"
              CurrentTable.pruneCursorExpired(spark, curDir, cutoff)
              // tombstones older than the horizon are safe to
              // reclaim: dt derives from _ts, so every change that
              // old lived in a partition retention has dropped —
              // nothing survives to re-fold past them. Gated like the
              // sweep (~daily + once per run), so the table-wide
              // tombstone scan amortizes instead of taxing every
              // batch.
              val horizonMs = java.time.LocalDate.parse(cutoff)
                .atStartOfDay(java.time.ZoneId.of(
                  spark.sessionState.conf.sessionLocalTimeZone))
                .toInstant.toEpochMilli
              val pruned =
                CurrentTable.pruneTombstones(spark, curDir, horizonMs)
              if (pruned > 0)
                org.slf4j.LoggerFactory.getLogger(getClass).info(
                  s"[${config.name}] retention $key: pruned $pruned " +
                    s"tombstone(s) older than $cutoff")
            }
            retentionSwept += key
            if (dropped.nonEmpty)
              org.slf4j.LoggerFactory.getLogger(getClass).info(
                s"[${config.name}] retention $key: dropped " +
                  s"dt=[${dropped.mkString(",")}] (< $cutoff)")
          }
        }
      }

      // Gate decision AFTER the batch is durable (drain-then-stop).
      val triggered =
        gate.observe(ddls.map(d => (d._3, d._1, d._2)).toSeq, nonReadTables)
      // the reference's in-dev auto table-name mapping (`README.md:54`):
      // a structural-DDL stop surfaces the ready-made v2 config —
      // dated version name map + (when mechanical) the evolved schema
      if (triggered && gate.reason.exists(_.startsWith("STRUCTURAL-DDL"))) {
        evolutionProposals = ddls.toSeq.flatMap { case (tbl, stmt, db, ts) =>
          graft.ops.DdlEvolution.propose(config.registry, db, tbl, stmt, ts,
            oracle = config.sourceType == "oracle")
        }
        val log = org.slf4j.LoggerFactory.getLogger(getClass)
        evolutionProposals.foreach(p => log.info(
          s"[${config.name}] EVOLUTION PROPOSAL: ${p.routeKey} -> " +
            s"${p.newTableName} (${p.note}) ${p.configJson}"))
      }
    } finally frame.unpersist()
  }

  /** Within-file order for COMPACTED sink files: the true source
    * offset among the columns the sink actually KEEPS
    * ([[graft.ops.EnvelopeDecoder.keptMetadata]] — the payload
    * projection strips the rest), so a compacted directory presents
    * the same (file-contiguous, offset-sorted) layout the write path
    * produced.
    */
  private val sinkCompactOrder: Seq[org.apache.spark.sql.Column] =
    config.sourceType match {
      case "mysql" => Seq(col("_binlog_file_internal"),
        col("_binlog_pos_internal"), col("_ts"))
      case "mongodb" => Seq(col("_ts"), col("_txn_op_index").cast("long"))
      case _ => Seq(col("_ts"))
    }

  /** The per-batch auto-compactor (`sink.compact.after.files`): for
    * each table this batch wrote, compact the `dt=` partitions the
    * BATCH FRAME says it wrote (exact — no directory-mtime guessing,
    * which breaks outright on object stores' synthetic mtimes) whose
    * file count crossed the threshold. Partition-scoped by design;
    * see [[Compaction.compactPartitions]]. When a current table rides
    * beside the sink, its cursor is swapped to the rewritten file
    * names (the sync above already folded them — see
    * [[CurrentTable.onSinkRewrite]]'s contract) so the rewrite never
    * triggers a re-fold of the whole partition.
    */
  private def autoCompact(tblDts: Map[String, Seq[String]]): Unit = {
    val hconf = spark.sessionState.newHadoopConf()
    for ((key, dts) <- tblDts; spec <- routed.get(key)) {
      val dir = spec.sinkDir(config.sinkPath, config.sourceId)
      val root = new org.apache.hadoop.fs.Path(dir)
      val fs = root.getFileSystem(hconf)
      def partFiles(dt: String): Seq[String] = {
        val p = new org.apache.hadoop.fs.Path(dir, s"dt=$dt")
        if (!fs.exists(p)) Nil
        else fs.listStatus(p).toSeq.map(_.getPath)
          .filter(_.getName.endsWith(".parquet")).map(_.toString)
      }
      val fragmented = dts.filter(
        partFiles(_).size > config.compactAfterFiles).sorted
      if (fragmented.nonEmpty) {
        // machine-readable twin of Compaction's grid-saturation warn
        // (the rescale / reattach-index advice pattern): a compacted
        // file can outgrow the manifest's original bloom grid size,
        // and past the shared saturation band the grids stop skipping
        // while still costing manifest bytes. The record names the
        // exact rebuild, bits sized ~10× the compactor's own
        // rows-per-file — which sticks, because a refresh always
        // appends grids at the stored size. The health pairs and the
        // manifest's stat columns (it self-describes — the global
        // config's list may cover other tables' columns) arrive from
        // compactPartitions' OWN single post-patch audit, so one
        // auto-compaction pays one manifest health scan total.
        val onHealth: (Seq[(String, Double)], Seq[String]) => Unit =
          (health, statCols) =>
            for (store <- config.statusStorePath) {
              val saturated = health.filter(
                _._2 > graft.ops.ZoneMaps.SaturationBand)
              for ((c, fill) <- saturated)
                writeZonemapAdviceFile(store, key, dir, c, fill,
                  statCols, health.map(_._1))
            }
        val (b, a) = Compaction.compactPartitions(spark, dir,
          fragmented, config.compactRowsPerFile, sinkCompactOrder,
          onManifestHealth = onHealth)
        // the current-table sync ran before this compaction in the
        // same batch, over these same partitions — every replaced
        // file was folded, so the rewritten files carry no new rows
        if (config.currentKeys.contains(key) && fullSynced.contains(key))
          CurrentTable.onSinkRewrite(spark, dir, s"${dir}__current",
            fragmented.map(v => s"$dir/dt=$v"),
            fragmented.flatMap(partFiles))
        org.slf4j.LoggerFactory.getLogger(getClass).info(
          s"[${config.name}] auto-compact $key " +
            s"dt=[${fragmented.mkString(",")}]: $b -> $a file(s)")
      }
    }
  }

  /** One batch's delta into the table's configured maintained indexes
    * (`sink.index.text` / `sink.index.neardup` / `sink.index.ann`):
    * the batch's rows projected exactly as the sink write projects
    * them (payload decode, mongo mode, snapshot-override gating),
    * reduced to the LATEST change per key by the same per-source
    * recency order every keep-latest consumer uses
    * ([[graft.ops.TimeTravel.defaultOrder]]), then applied as one
    * generation per index: latest non-delete → upsert, latest delete →
    * tombstone ([[graft.ops.TimeTravel.isTombstone]]). ATTACH (no
    * index dir yet) builds from the SINK's keep-latest live state —
    * not empty — because the sink may already hold content no batch
    * frame will ever carry again: the JDBC snapshot-then-stream path
    * writes its READ rows straight to the sink before the stream
    * starts, and an index configured onto an existing job must absorb
    * the table's history. The sink rows are the same override-gated
    * payload projection the delta path sees, the attach build
    * includes the current batch's rows (already written above), so no
    * delta follows it, and the ANN codebook trains from that full
    * corpus (retrains stay the resize advisory's explicit job). An
    * embedding that fails to parse (null / empty JSON array) is
    * treated as that vector's DELETE — the row no longer has a
    * searchable embedding, and leaving the previous posting live
    * would serve stale vectors silently.
    *
    * Scale shape: one windowed keep-latest over the batch's rows
    * (shuffle ∝ batch, keyed by the table's pk), then the index delta
    * protocol's appends — nothing rewrites, nothing scans the index
    * beyond its two currentGen footer reads.
    */
  private def applyIndexDeltas(key: String, spec: TableSpec,
      frame: DataFrame): Unit = {
    import graft.ops.TimeTravel
    // canonicalize configured names to the SCHEMA's casing: the
    // payload projection emits the schema's spelling, construction
    // validation resolves case-insensitively (Spark's convention),
    // and the exact-match StructType lookup below would throw on a
    // case-only difference validation just accepted
    def canon(n: String): String = spec.schema.fields.map(_.name)
      .find(_.equalsIgnoreCase(n)).getOrElse(n)
    val pk = canon(config.currentKeys(key).head) // 1-col, checked at init
    val dir = spec.sinkDir(config.sinkPath, config.sourceId)
    val rows = frame.filter(col("_tbl_key") === key && col("_ddl").isNull)
    val proj = config.mongoMode match {
      case Some(mode) => graft.ops.MongoModes.project(rows, spec, mode)
      case None => EnvelopeDecoder.payload(rows, spec, config.sourceType)
    }
    val gated0 = config.snapshotOverrides.get(key)
      .map(SnapshotOverrides.applyTo(proj, _)).getOrElse(proj)
    // null-_ts rows (warn-mode quarantine — an unparseable timestamp)
    // are DROPPED, exactly as CurrentTable.sync's fold drops them
    // (TimeTravel.latest's `_ts <= cutoff` is null-hostile by design):
    // the index is the current table's sidecar, and folding a
    // quarantined change here would make it serve a doc the table
    // never has (or tombstone one it keeps) with nothing ever
    // re-converging them
    val gated = gated0.filter(col("_ts").isNotNull)
    // keep-latest INCLUDING tombstones — TimeTravel.latest's kernel
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(pk))
      .orderBy(TimeTravel.defaultOrder(config.sourceType)
        .map(_.desc_nulls_last): _*)
    // persisted: every configured index kind derives upserts AND
    // deletes from this frame, and each applyDelta is two-three write
    // actions — without the pin, the payload from_json and the
    // keep-latest shuffle re-run per action (measured ~6 recomputes
    // for a text+ann pair)
    val latest = gated.withColumn("_ix_rn",
        org.apache.spark.sql.functions.row_number().over(w))
      .filter(col("_ix_rn") === 1)
      .persist()
    val ups = latest.filter(!TimeTravel.isTombstone)
    val dels = latest.filter(TimeTravel.isTombstone)
      .select(col(pk).cast("long").as("doc_id"))
    val hconf = spark.sessionState.newHadoopConf()
    def hpath(p: String) = new org.apache.hadoop.fs.Path(p)
    def dirExists(p: String): Boolean =
      hpath(p).getFileSystem(hconf).exists(hpath(p))
    val log = org.slf4j.LoggerFactory.getLogger(getClass)
    // the attach corpus: the sink's keep-latest LIVE rows — the same
    // fold semantics the current table uses (null-_ts dropped,
    // tombstones resolved), over rows the sink write already
    // override-gated and payload-projected. Computed ONCE and pinned
    // across however many kinds attach this batch: the fold is a full
    // sink scan and each build is multi-action.
    var sinkLiveCache: Option[DataFrame] = None
    def sinkLive(): DataFrame = sinkLiveCache.getOrElse {
      val df = graft.ops.TimeTravel.asOfDir(spark, dir, Seq(pk),
        Long.MaxValue, config.sourceType).persist()
      sinkLiveCache = Some(df); df
    }
    // a sink dir with no dt= partitions yet (a DDL-only batch, or one
    // whose rows the snapshot-override gate removed, writes only
    // _SUCCESS) has no parquet to infer a schema from — the attach
    // DEFERS, loudly, instead of crash-looping the batch on the read
    // lazy val, not def: the sink write for this batch completed
    // before this method runs, so readiness cannot change between
    // kinds — one exists + listStatus, not one per attaching kind
    lazy val sinkReady: Boolean = {
      val fs = hpath(dir).getFileSystem(hconf)
      fs.exists(hpath(dir)) && fs.listStatus(hpath(dir))
        .exists(_.getPath.getName.startsWith("dt="))
    }
    // atomic attach: build into a staging dir, rename into place. The
    // attach is now a full-corpus job (minutes over a JDBC-snapshot
    // sink), and a crash mid-build behind a bare dir-exists gate
    // would flip every later batch into the delta path over a PARTIAL
    // index, never retrying the attach. Stale staging from a torn
    // attempt is swept first; the rename is the commit point (the
    // index meta records no absolute paths, so the dir moves whole).
    def atomicAttach(idxDir: String)(buildTo: String => Unit): Unit = {
      val staging = s"$idxDir._attach_tmp"
      val fs = hpath(staging).getFileSystem(hconf)
      // delete returns false instead of throwing on some failures
      // (e.g. an unremovable entry on a local fs) — an unswept torn
      // attempt must fail HERE, not get healed into the fresh build
      // by the rename below
      if (fs.exists(hpath(staging)) && !fs.delete(hpath(staging), true))
        throw new IllegalStateException(
          s"could not sweep stale attach staging: $staging")
      buildTo(staging)
      if (!fs.rename(hpath(staging), hpath(idxDir)))
        throw new IllegalStateException(
          s"index attach commit failed: $staging -> $idxDir")
    }
    def deferAttach(kind: String): Unit =
      log.warn(s"[${config.name}] $kind-index $key: no sink data " +
        "yet — attach deferred")
    def textDocs(df: DataFrame, tcol: String): DataFrame =
      df.select(col(pk).cast("long").as("doc_id"),
        coalesce(col(tcol).cast("string"), lit("")).as("text"))
    // ONE skeleton for the two doc-shaped kinds, iterating the shared
    // indexKindDirs table (ann below differs genuinely: vector parse,
    // usable-filter deletes, codebook training). A kind in the table
    // that no loop routes must fail loudly, mirroring the maintenance
    // and drift dispatches.
    val textLikeBuild: Map[String, (DataFrame, String) => Unit] = Map(
      "text" -> ((docs, d) => graft.ops.TextIndex.build(spark, docs, d,
        termBuckets = config.indexTextBuckets)),
      "neardup" -> ((docs, d) =>
        graft.ops.NeardupIndex.build(spark, docs, d)))
    val textLikeDelta: Map[String, (String, DataFrame) => Long] = Map(
      "text" -> ((idx, docs) =>
        graft.ops.TextIndex.applyDelta(spark, idx, docs, dels)),
      "neardup" -> ((idx, docs) =>
        graft.ops.NeardupIndex.applyDelta(spark, idx, docs, dels)))
    for ((kind, _, _) <- config.indexKindDirs
        if kind != "ann" && !textLikeBuild.contains(kind))
      throw new IllegalStateException(
        s"no delta router for index kind '$kind'")
    try {
    for ((kind, m, suffix) <- config.indexKindDirs if kind != "ann";
        tcol0 <- m.get(key); tcol = canon(tcol0)) {
      val idxDir = s"$dir$suffix"
      if (!dirExists(idxDir)) {
        if (!sinkReady) deferAttach(kind)
        else {
          atomicAttach(idxDir)(d =>
            textLikeBuild(kind)(textDocs(sinkLive(), tcol), d))
          log.info(s"[${config.name}] $kind-index $key: attached " +
            "from sink state")
        }
      } else {
        val gen = textLikeDelta(kind)(idxDir, textDocs(ups, tcol))
        log.info(s"[${config.name}] $kind-index $key: delta gen=$gen")
      }
    }
    for (vcol0 <- config.indexAnn.get(key); vcol = canon(vcol0)) {
      val idxDir = s"${dir}__annindex"
      // the batch frame belongs to the stream's CLONED session, whose
      // function registry was copied at query start — the native dot
      // expression must be registered THERE, or the first in-stream
      // ANN delta fails resolution (AnnIndex registers on the session
      // it is handed, which is the outer one)
      graft.functions.VectorExpressions.ensureRegistered(
        frame.sparkSession)
      // the envelope's union decode tags non-scalar types as string,
      // so the embedding arrives as a JSON array string; a typed
      // array column from a non-envelope feed passes through the cast
      def parsedVec(df: DataFrame): org.apache.spark.sql.Column =
        df.schema(vcol).dataType match {
          case org.apache.spark.sql.types.StringType =>
            from_json(col(vcol), org.apache.spark.sql.types.ArrayType(
              org.apache.spark.sql.types.DoubleType))
          case _ => col(vcol).cast("array<double>")
        }
      def vecsOf(df: DataFrame): DataFrame =
        df.select(col(pk).cast("long").as("vec_id"),
          parsedVec(df).as("e"))
      // a usable vector is non-null, non-empty AND has no null
      // ELEMENTS: "[1.0,null]" parses to an array with a null slot,
      // and an array<string> cast nulls unparseable elements — either
      // would poison norms and centroid folds silently. Anything
      // less is that key's DELETE (same contract as an unparseable
      // embedding).
      def usable(e: org.apache.spark.sql.Column) =
        e.isNotNull && size(e) > 0 &&
          !org.apache.spark.sql.functions.exists(e, _.isNull)
      if (!dirExists(idxDir)) {
        if (!sinkReady) deferAttach("ann")
        else {
          // attach: train the frozen codebook from the SINK's full
          // live corpus (deletes need no delta — a key whose latest
          // change is a DELETE never survives the keep-latest fold)
          val valid = vecsOf(sinkLive()).filter(usable(col("e")))
          valid.persist()
          try if (!valid.isEmpty) {
            val cb = graft.ops.AnnIndex.trainCodebook(spark, valid,
              k = config.indexAnnK, iters = 10)
            atomicAttach(idxDir)(d =>
              graft.ops.AnnIndex.build(spark, valid, cb, d))
            log.info(s"[${config.name}] ann-index $key: attached " +
              s"from sink state (k=${config.indexAnnK})")
          } else log.warn(s"[${config.name}] ann-index $key: no " +
            "parseable vectors in the sink yet — attach deferred")
          finally valid.unpersist()
        }
      } else {
        val vecs = vecsOf(ups)
        val valid = vecs.filter(usable(col("e")))
        val annDels = dels.select(col("doc_id").as("vec_id"))
          .union(vecs.filter(!usable(col("e"))).select("vec_id"))
        val gen = graft.ops.AnnIndex.applyDelta(spark, idxDir, valid,
          annDels)
        log.info(s"[${config.name}] ann-index $key: delta gen=$gen")
      }
    }
    } finally {
      sinkLiveCache.foreach(_.unpersist())
      latest.unpersist()
    }
  }

  /** Index-maintenance advisory record — the maintained-index analog
    * of [[writeAdviceFile]], written on FULL current-table syncs when
    * the one-call maintenance
    * ([[graft.api.Graft.textIndexMaintenance]] and siblings) returns a
    * verdict: `"advice":"index-maintenance"`, the index `kind`
    * (text/ann/neardup), the verdict discriminator
    * (compact-first/compact-deferred/resize), the exact call (inert —
    * comment-prefixed — for deferred verdicts, by
    * [[graft.api.Graft.CompactDeferred]]'s contract), and
    * `approx_live_rows` so a fleet cron can order a wave
    * largest-first without parsing the call string (−1 on resize
    * verdicts: live rows are a compact-side measurement; compact
    * verdicts carry the measured backlog numbers too). Same CONSUMER
    * CONTRACT as the other advice flavors: records repeat while the
    * condition persists — dedupe by (`table`, `advice`, `kind`).
    */
  private def writeIndexMaintenanceFile(root: String, tableKey: String,
      indexKind: String, indexDir: String,
      verdict: graft.api.Graft.Maintenance[_, _]): Unit = {
    val today = java.time.LocalDate.now(java.time.ZoneOffset.UTC)
    // ONE fragment renderer for both compact verdicts — fired and
    // deferred records must never fork shape, or consumers deduping
    // across the two verdict kinds break on the next field added
    def compactNumbers(h: graft.api.Graft.IndexHealth[
        graft.ops.IndexCompaction.CompactStats, Long]): String =
      s""""approx_live_rows":${h.stats.liveRows},""" +
        s""""raw_rows":${h.stats.rawRows},""" +
        s""""tombstone_rows":${h.stats.tombstoneRows},""" +
        s""""reclaimable":${h.recommended},""" +
        s""""dead_fraction":""" + String.format(java.util.Locale.ROOT,
          "%.3f", Double.box(h.stats.deadFraction)) + ","
    val numbers = verdict match {
      case graft.api.Graft.CompactFirst(h) => compactNumbers(h)
      case graft.api.Graft.CompactDeferred(h) => compactNumbers(h)
      case _: graft.api.Graft.Resize[_, _] =>
        s""""approx_live_rows":-1,"""
    }
    val json = s"""{"job_id":"${config.sourceId}",""" +
      s""""job_name":"${config.name}","advice":"index-maintenance",""" +
      s""""table":"$tableKey","kind":"$indexKind",""" +
      s""""index_dir":"$indexDir",""" +
      s""""verdict":"${verdict.kind}",""" + numbers +
      s""""call":"${verdict.call.replace("\\", "\\\\")
        .replace("\"", "\\\"")}",""" +
      s""""timestamp":${System.currentTimeMillis()}}"""
    hWrite(s"$root/dt=$today/${java.util.UUID.randomUUID()}.json", json)
  }

  /** Content-drift advisory for a maintained index: a cadence full
    * sync folded sink files that arrived OUT-OF-BAND (a backfill
    * written straight to the sink dir), so the current table has rows
    * the batch-fed index never saw. No delta can repair content the
    * stream never carried — the record names the rebuild-from-table,
    * the only converging action. Same store, dt-layout and CONSUMER
    * CONTRACT as the other advice flavors (repeats once per cadence
    * sync that folds out-of-band files; dedupe by (`table`, `advice`,
    * `kind`)).
    */
  private def writeIndexDriftFile(root: String, tableKey: String,
      indexKind: String, indexDir: String, currentDir: String,
      outOfBandFiles: Long): Unit = {
    val today = java.time.LocalDate.now(java.time.ZoneOffset.UTC)
    val call = indexKind match {
      case "text" => s"TextIndex.build(spark, docs, \\\"$indexDir\\\", " +
        s"termBuckets = ${config.indexTextBuckets}) // docs = " +
        s"CurrentTable.read(spark, \\\"$currentDir\\\") as (doc_id, text)"
      case "neardup" => s"NeardupIndex.build(spark, docs, " +
        s"\\\"$indexDir\\\") // docs = CurrentTable.read(spark, " +
        s"\\\"$currentDir\\\") as (doc_id, text)"
      case "ann" => s"AnnIndex.build(spark, vecs, " +
        s"AnnIndex.trainCodebook(" +
        s"spark, vecs, k = ${config.indexAnnK}, iters = 10), " +
        s"\\\"$indexDir\\\") // vecs = CurrentTable.read(spark, " +
        s"\\\"$currentDir\\\") as (vec_id, e)"
      // explicit, matching the maintenance dispatch: a fourth kind
      // added to indexKindDirs must fail HERE, not ship records
      // commanding an ANN build against a foreign layout
      case other => throw new IllegalStateException(
        s"no drift rebuild call for index kind '$other'")
    }
    val json = s"""{"job_id":"${config.sourceId}",""" +
      s""""job_name":"${config.name}","advice":"index-content-drift",""" +
      s""""table":"$tableKey","kind":"$indexKind",""" +
      s""""index_dir":"$indexDir","current_dir":"$currentDir",""" +
      s""""out_of_band_files":$outOfBandFiles,""" +
      s""""call":"$call",""" +
      s""""timestamp":${System.currentTimeMillis()}}"""
    hWrite(s"$root/dt=$today/${java.util.UUID.randomUUID()}.json", json)
  }

  /** Rebuild-advisory record for a zone-map bloom grid saturated by
    * compaction — same store, dt-layout and CONSUMER CONTRACT (see
    * [[writeAdviceFile]]: repeats once per auto-compaction while the
    * grid stays saturated; dedupe by (table, advice, column)) as the
    * rescale / reattach-index advice but `"advice":"rebuild-zonemaps"`.
    * Written when a just-compacted manifest's grid runs > 50% full
    * (point lookups stop skipping); carries the measured fill and the
    * exact `ZoneMaps.build` call with `bloomBits` ≈ 10 bits per row
    * of the compactor's rows-per-file target.
    */
  private def writeZonemapAdviceFile(root: String, tableKey: String,
      tableDir: String, column: String, fill: Double,
      statColumns: Seq[String], bloomColumns: Seq[String]): Unit = {
    val today = java.time.LocalDate.now(java.time.ZoneOffset.UTC)
    val bits = {
      val want = math.min(1L << 26,
        math.max(4096L, 10L * config.compactRowsPerFile))
      val p = Integer.highestOneBit(want.toInt)
      if (p >= want) p else p << 1
    }
    val cols = statColumns.map(c => s"\\\"$c\\\"").mkString(", ")
    val bloomCols = bloomColumns.map(c => s"\\\"$c\\\"").mkString(", ")
    val call = s"ZoneMaps.build(spark, \\\"$tableDir\\\", " +
      s"\\\"$tableDir._zonemaps\\\", Seq($cols), Seq($bloomCols), " +
      s"bloomBits = $bits)"
    val fillStr = String.format(java.util.Locale.ROOT, "%.2f",
      Double.box(fill))
    val json = s"""{"job_id":"${config.sourceId}",""" +
      s""""job_name":"${config.name}","advice":"rebuild-zonemaps",""" +
      s""""table":"$tableKey","manifest":"$tableDir._zonemaps",""" +
      s""""column":"$column","fill":$fillStr,""" +
      s""""rows_per_file":${config.compactRowsPerFile},""" +
      s""""call":"$call",""" +
      s""""timestamp":${System.currentTimeMillis()}}"""
    hWrite(s"$root/dt=$today/${java.util.UUID.randomUUID()}.json", json)
  }

  /** K2 single-file overwrite sink
    * (`SingleFileSinkFunction.java:31-39`): last write wins.
    */
  private def writeOffsetFile(dir: String, offset: String): Unit =
    hWrite(s"$dir/${config.sourceId}_offset.txt", offset)

  /** Status JSON: `{status}/dt={today}/{uuid}.json`
    * (`FlinkCDCMulti.java:329-333`, `StatusStoreProcessFunction.java:18-91`).
    */
  private def writeStatusFile(root: String): Unit = {
    val today = java.time.LocalDate.now(java.time.ZoneOffset.UTC)
    val json = s"""{"job_id":"${config.sourceId}","job_name":"${config.name}",""" +
      s""""record_count":$recordCount,"last_event_timestamp":$lastEventTs,""" +
      s""""last_checkpoint_timestamp":${System.currentTimeMillis()}}"""
    hWrite(s"$root/dt=$today/${java.util.UUID.randomUUID()}.json", json)
  }

  /** Rescale-advisory record, same store and dt-layout as
    * [[writeStatusFile]] but `"advice":"rescale"`-typed so a consumer
    * filters them apart. Written only when [[CurrentTable.rescaleAdvice]]
    * fires (layout drift ≥ 2× from `sink.current.target.bucket.mb`);
    * carries the numbers behind the advice and the exact maintenance
    * call, so an operator's cron can act without scraping logs.
    *
    * CONSUMER CONTRACT (all three advice flavors — `rescale` here,
    * `reattach-index` in [[writeIndexAdviceFile]], `rebuild-zonemaps`
    * in [[writeZonemapAdviceFile]]): records REPEAT while the
    * condition persists — one per full sync (every batch at
    * `sink.current.fullsync.batches=1`) or per auto-compaction —
    * because each is an independent measurement, and suppressing
    * repeats would make a consumer that missed one record (store
    * retention, a skipped day) permanently blind. A cron therefore
    * MUST dedupe by (`table`, `advice`, and the flavor's subject
    * column — `column` for the index and zone-map records, absent for
    * rescale) before launching maintenance, treating the latest
    * record's measured numbers as current; firing one job per record
    * would run N identical rebuilds. Records stop on their own once
    * the maintenance (or organic shrink) moves the measurement back
    * inside its band.
    */
  private def writeAdviceFile(root: String, tableKey: String,
      currentDir: String, st: CurrentTable.LayoutStats,
      recommended: Int): Unit = {
    val today = java.time.LocalDate.now(java.time.ZoneOffset.UTC)
    val json = s"""{"job_id":"${config.sourceId}",""" +
      s""""job_name":"${config.name}","advice":"rescale",""" +
      s""""table":"$tableKey","current_dir":"$currentDir",""" +
      s""""buckets":${st.buckets},"live_bytes":${st.bytes},""" +
      s""""max_bucket_bytes":${st.maxBucketBytes},""" +
      s""""target_bucket_mb":${config.currentTargetBucketMb},""" +
      s""""recommended_buckets":$recommended,""" +
      s""""call":"CurrentTable.rescale(spark, \\"$currentDir\\", keys, $recommended)",""" +
      s""""timestamp":${System.currentTimeMillis()}}"""
    hWrite(s"$root/dt=$today/${java.util.UUID.randomUUID()}.json", json)
  }

  /** Reattach-advisory record for a secondary index that outgrew its
    * attach-time bloom sizing — same store, dt-layout and CONSUMER
    * CONTRACT (see [[writeAdviceFile]]: repeats while the condition
    * persists; dedupe by (table, advice, column)) as the rescale
    * record but `"advice":"reattach-index"`.
    * Written only when [[graft.ops.BucketIndex.capacityAdvice]] fires
    * — `"reason":"outgrown"` (implied bits/row under ~5 at the p99
    * per-bucket live count the sidecar itself maintains) or
    * `"reason":"counts-unknown"` (most sidecar buckets predate the
    * per-publish counts, so the table can't be measured until a
    * re-attach stamps them); carries the measured numbers and the
    * exact detach-then-attach call.
    */
  private def writeIndexAdviceFile(root: String, tableKey: String,
      currentDir: String,
      st: graft.ops.BucketIndex.CapacityStats): Unit = {
    val today = java.time.LocalDate.now(java.time.ZoneOffset.UTC)
    // Locale.ROOT: a comma-decimal default locale must not emit
    // "2,05" into a JSON number
    val bpr = String.format(java.util.Locale.ROOT, "%.2f",
      Double.box(st.bitsPerRow))
    val json = s"""{"job_id":"${config.sourceId}",""" +
      s""""job_name":"${config.name}","advice":"reattach-index",""" +
      s""""reason":"${st.reason}",""" +
      s""""table":"$tableKey","current_dir":"$currentDir",""" +
      s""""column":"${st.column}","bits":${st.bits},""" +
      s""""shards":${st.shards},""" +
      s""""rows_per_bucket_p99":${st.sizingRowsPerBucket},""" +
      s""""bits_per_row":$bpr,""" +
      s""""unknown_buckets":${st.unknownBuckets},""" +
      // the cron-ordering size signal: −1 = no count information at
      // all (unknown size, NOT an empty table)
      s""""approx_live_rows":${st.approxLiveRows},""" +
      s""""call":"${st.call.replace("\"", "\\\"")}",""" +
      s""""timestamp":${System.currentTimeMillis()}}"""
    hWrite(s"$root/dt=$today/${java.util.UUID.randomUUID()}.json", json)
  }

  /** S6 offset bootstrap: read the stored offset before building the
    * source (`FlinkCDCMulti.java:187-257`).
    */
  def readStoredOffset(dir: String): Option[String] =
    hRead(s"$dir/${config.sourceId}_offset.txt").map(_.trim)

  /** Start the streaming query over a CDC feed. The default feed is
    * the JSON-lines directory (S1(c)); any [[graft.source.CdcFeed]]
    * (Kafka, a DSv2 Debezium source) slots in unchanged.
    * `maxFilesPerTrigger=1` keeps one fixture file per micro-batch so
    * multi-batch semantics are exercised.
    */
  def start(inputDir: String, checkpointDir: String,
      trigger: Trigger = Trigger.AvailableNow(),
      maxFilesPerTrigger: Option[Int] = None): StreamingQuery =
    startFeed(graft.source.JsonLinesFeed(inputDir, maxFilesPerTrigger),
      checkpointDir, trigger)

  /** The K3 console-echo query, when running — tracked so its
    * lifecycle follows the main query's instead of leaking: CdcJob
    * stops it when the gate stops the main query (tailing mode), and
    * drain paths await it so `spark.stop()` can't kill it mid-batch.
    */
  @volatile private var debugQuery: Option[StreamingQuery] = None

  /** Await the echo's own termination (AvailableNow drains itself).
    * An echo failure is logged, not rethrown: the debug sink is
    * observability, and a console hiccup must not fail a job whose
    * main query drained cleanly.
    */
  def awaitDebugEcho(): Unit = debugQuery.foreach { dq =>
    try dq.awaitTermination()
    catch { case e: org.apache.spark.sql.streaming.StreamingQueryException =>
      org.slf4j.LoggerFactory.getLogger(getClass)
        .warn(s"[${config.name}] debug echo failed: ${e.getMessage}")
    }
  }

  /** Stop the echo (tailing mode, where it would never self-stop).
    * Same contract as [[awaitDebugEcho]]: echo failures log, never
    * propagate past an otherwise-clean run.
    */
  def stopDebugEcho(): Unit = debugQuery.foreach { dq =>
    if (dq.isActive) dq.stop()
    try dq.awaitTermination()
    catch { case e: org.apache.spark.sql.streaming.StreamingQueryException =>
      org.slf4j.LoggerFactory.getLogger(getClass)
        .warn(s"[${config.name}] debug echo failed: ${e.getMessage}")
    }
  }

  def startFeed(feed: graft.source.CdcFeed, checkpointDir: String,
      trigger: Trigger): StreamingQuery = {
    publishSessionConfs()
    val lines = feed.lines(spark)
    // K3 (`FlinkCDCMulti.java:148-154`): raw source echo to the
    // console as a SECOND query on the same feed — parallelism is the
    // sink's, the pipeline query is untouched. A prior echo from an
    // earlier startFeed on this pipeline is stopped first so a
    // restart can't leak a still-running console query.
    if (config.debugPrint) {
      stopDebugEcho()
      debugQuery = Some(lines.writeStream
        .queryName(s"${config.name}-debug")
        .option("checkpointLocation", s"$checkpointDir/_debug")
        .option("truncate", "false")
        .trigger(trigger)
        .format("console")
        .start())
    }
    lines.writeStream
      .queryName(config.name)
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch((df: DataFrame, id: Long) => processBatch(df, id))
      .start()
  }

  /** Drain-all convenience: processes every available file then
    * returns (tests + snapshot-only jobs). J2: exceptions surface —
    * no restart wrapper.
    */
  def runAvailableNow(inputDir: String, checkpointDir: String,
      oneFilePerBatch: Boolean = true): Unit = {
    val q = start(inputDir, checkpointDir, Trigger.AvailableNow(),
      if (oneFilePerBatch) Some(1) else None)
    q.awaitTermination()
    awaitDebugEcho() // K3 echo drains on its own; don't return mid-print
  }
}

object CdcPipeline {
  /** The ONE accepted-embedding-type rule for `sink.index.ann`,
    * shared by the construction-time validation and CdcJob's
    * config-file validator so the two surfaces cannot drift: a
    * JSON-array string (the envelope's union decode tags non-scalar
    * types as string) or an array whose elements cast to double
    * (numeric, or numeric strings). Scalar columns fail the delta's
    * `cast("array<double>")` at analysis — the crash-loop both
    * validators exist to prevent.
    */
  private[graft] def annEmbeddingTypeOk(
      dt: org.apache.spark.sql.types.DataType): Boolean = dt match {
    case org.apache.spark.sql.types.StringType => true
    case org.apache.spark.sql.types.ArrayType(et, _) =>
      et.isInstanceOf[org.apache.spark.sql.types.NumericType] ||
        et == org.apache.spark.sql.types.StringType
    case _ => false
  }

  /** The retention cutoff date (`dt` values strictly below it
    * expire), derived in the SESSION timezone — the same clock
    * [[graft.ops.EnvelopeDecoder.dtColumn]]'s `date_format` used to
    * assign each row's `dt` bucket. A UTC-fixed cutoff under a
    * non-UTC session timezone shifts the day boundary and deletes a
    * partition up to a day outside the configured horizon.
    */
  def retentionCutoff(spark: SparkSession, days: Int): String =
    java.time.LocalDate.now(java.time.ZoneId.of(
        spark.sessionState.conf.sessionLocalTimeZone))
      .minusDays(days.toLong).toString
}
