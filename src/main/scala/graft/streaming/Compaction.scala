package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

import graft.ops.Probes

/** Sink maintenance: rewrite a CDC table directory into row-count-
  * targeted files per dt partition. Micro-batch appends necessarily
  * accumulate files (one-plus per batch per partition even with the
  * wide-span range shuffle); periodic compaction is how a 100 TB lake
  * keeps scan-side file counts sane. The reference has no equivalent
  * (its parallelism-1 sink just rolls files per checkpoint and lives
  * with the count).
  *
  * Order contract: rows are range-partitioned and sorted by (dt,
  * order columns) — the same (file-contiguous, offset-sorted) layout
  * the pipeline's wide-span write path produces, so keep-latest
  * consumers see an equivalent directory.
  *
  * Safety: the rewrite lands in a sibling `<dir>._compact_tmp`
  * directory first, then the old directory is swapped out via two
  * renames (old → `._compact_trash`, tmp → dir) and the trash deleted.
  * The table is never partially overwritten; a crash strictly between
  * the two renames leaves no live directory, and the NEXT compact()
  * run restores the original from trash before proceeding (readers in
  * that window see a missing table — run the compactor, not a manual
  * cleanup). Run it while no writer is active (between micro-batches
  * / from a maintenance job), like any file-level compactor.
  *
  * Filesystem assumption: the swap relies on `rename()` being a fast
  * O(1) metadata operation, which holds on HDFS and local filesystems
  * but NOT on S3A-style object stores, where each "rename" is an
  * O(data) copy — the crash window between the two renames stretches
  * from milliseconds to minutes and readers can observe a missing or
  * partial table for that whole span. compact() logs a warning on
  * such filesystems; for object stores prefer a manifest-committing
  * table format's own compaction.
  */
object Compaction {

  /** @param rowsPerFile target rows per output file (proxy for the
    *   128 MB size target — callers know their row width)
    * @param order within-partition sort COLUMNS after dt — pass typed
    *   expressions, e.g. `col("_binlog_pos_internal").cast("long")`:
    *   CDC sinks store some offsets as strings, and a bare string sort
    *   would order "100" before "99"
    * @return (filesBefore, filesAfter)
    */
  def compact(spark: SparkSession, tableDir: String, rowsPerFile: Long,
      order: Seq[org.apache.spark.sql.Column]): (Long, Long) = {
    restoreIfInterrupted(spark, tableDir)
    val df = spark.read.parquet(tableDir)
    val n = df.count()
    val parts = math.max(1, math.ceil(n.toDouble / rowsPerFile).toInt)
    val sortCols = col("dt") +: order
    rewriteSwap(spark, tableDir) { tmp =>
      df.repartitionByRange(parts, sortCols: _*)
        .sortWithinPartitions(sortCols: _*)
        .write.mode(SaveMode.Overwrite).partitionBy("dt")
        .parquet(tmp)
    }
  }

  /** Clustered rewrite: the same atomic swap, but the new layout is
    * Z-ORDERED on two columns ([[graft.ops.ZOrder.zcode]]) instead of
    * offset-sorted — for read-optimized/analytic tables where scan
    * locality matters more than the changelog's within-file offset
    * order. Combined with the maintained zone-map manifest (rebuilt
    * by the swap automatically), this is what turns the manifest from
    * "correct" into "tight": post-rewrite every file is contiguous in
    * BOTH clustered dimensions, so a range predicate on either one
    * prunes most files — including through the planner-integrated
    * [[graft.ops.ZoneMapTable]] path.
    *
    * A `dt` partition column (when present) stays the outer range
    * key, so files remain dt-contiguous and partition pruning is
    * unaffected; callers compacting a plain unpartitioned table get
    * pure z-order. NOT for sinks whose consumers rely on the offset
    * order contract — use [[compact]] there (keep-latest kernels like
    * TimeTravel sort by explicit offset columns and work over either
    * layout).
    */
  def compactClustered(spark: SparkSession, tableDir: String,
      rowsPerFile: Long, x: org.apache.spark.sql.Column,
      y: org.apache.spark.sql.Column, bits: Int = 8): (Long, Long) = {
    restoreIfInterrupted(spark, tableDir)
    val df = spark.read.parquet(tableDir)
    val n = df.count()
    val parts = math.max(1, math.ceil(n.toDouble / rowsPerFile).toInt)
    val codeCol = "_graft_zcode"
    require(!df.columns.exists(_.equalsIgnoreCase(codeCol)),
      s"column $codeCol is reserved by compactClustered")
    val hasDt = df.columns.exists(_.equalsIgnoreCase("dt"))
    val keyCols =
      if (hasDt) Seq(col("dt"), col(codeCol)) else Seq(col(codeCol))
    rewriteSwap(spark, tableDir) { tmp =>
      val laid = df.withColumn(codeCol, graft.ops.ZOrder.zcode(x, y, bits))
        .repartitionByRange(parts, keyCols: _*)
        .sortWithinPartitions(keyCols: _*)
        .drop(codeCol)
        .write.mode(SaveMode.Overwrite)
      (if (hasDt) laid.partitionBy("dt") else laid).parquet(tmp)
    }
  }

  /** Partition-scoped compaction: rewrite ONLY the named `dt=`
    * partitions, each through its own atomic swap — the shape an
    * auto-compactor needs at 100 TB, where "the table got fragmented"
    * really means "today's partition got fragmented" and rewriting
    * the cold 99% (as [[compact]] does) would be O(table) per
    * trigger. Any zone-map manifest beside the table is PATCHED, not
    * rebuilt: replaced partitions' rows drop out, the new files are
    * indexed incrementally ([[graft.ops.ZoneMaps.patch]]) — cost ∝
    * manifest + new files.
    *
    * Returns (filesBefore, filesAfter) summed over the touched
    * partitions. Unknown partition values are skipped with a log
    * line (a batch can name a dt the router never wrote).
    *
    * `onManifestHealth` receives the post-patch grid audit —
    * `((column, fill) pairs, the manifest's stat columns)` — from the
    * SAME single manifest read the saturation warn uses, and only
    * when a manifest exists and a partition was rewritten. The
    * pipeline's `rebuild-zonemaps` advice record consumes it here
    * instead of re-scanning the manifest (each separate
    * gridHealth/statColumns entry is another manifest read plus an
    * interrupted-patch restore).
    */
  def compactPartitions(spark: SparkSession, tableDir: String,
      dts: Seq[String], rowsPerFile: Long,
      order: Seq[org.apache.spark.sql.Column],
      onManifestHealth:
        (Seq[(String, Double)], Seq[String]) => Unit = (_, _) => ())
      : (Long, Long) = {
    val fs = new Path(tableDir).getFileSystem(
      spark.sessionState.newHadoopConf())
    val touched = scala.collection.mutable.Buffer[String]()
    var (before, after) = (0L, 0L)
    // staging names are DOT-PREFIXED and live beside the partitions
    // INSIDE the table dir — a `dt=<v>._compact_tmp` name would be
    // parsed by partition discovery as a real dt value, exposing
    // staged (or, after a crash, trash) rows to any table reader;
    // dot-prefixed dirs are invisible to partition discovery, the
    // zone-map file walker, and the auto-compactor's dt= listing
    val present = dts.distinct.flatMap { dt =>
      restoreIfInterrupted(spark, s"$tableDir/dt=$dt",
        s"$tableDir/._compact_trash_dt=$dt")
      if (fs.exists(new Path(s"$tableDir/dt=$dt"))) Some(dt)
      else {
        org.slf4j.LoggerFactory.getLogger(getClass).info(
          s"compactPartitions: no partition dt=$dt under $tableDir — skipped")
        None
      }
    }
    // ONE fused count job + ONE range-shuffled write job per SCHEMA
    // GROUP (normally one group for the whole call) instead of one
    // count + one write PER PARTITION: an auto-compaction wave over a
    // week of fragmented partitions paid ~3 Spark jobs × days where
    // ~3 total suffice (q122's lifecycle: 8 partitions × 2-3 waves ≈
    // 50 sequential driver-latency-bound jobs → ~8). Partitions whose
    // file schema drifted from the group's (an evolved sink) rewrite
    // in their own group — fusing across schemas would widen every
    // older partition's files to the union schema.
    //
    // Each dt's footer is read ONCE here and the loaded frame is
    // passed into compactGroup (it used to re-read per dt). An
    // UNREADABLE dt dir — data-less (a partition that emptied out) or
    // a corrupt footer — is skipped with a log line instead of
    // aborting the whole wave with zero progress: an empty dir has
    // nothing to compact, and a corrupt partition should not hold the
    // rest of the backlog hostage.
    val loaded = present.flatMap { dt =>
      scala.util.Try(spark.read.parquet(s"$tableDir/dt=$dt")) match {
        case scala.util.Success(df) => Some(dt -> df)
        case scala.util.Failure(e) =>
          org.slf4j.LoggerFactory.getLogger(getClass).warn(
            s"compactPartitions: dt=$dt under $tableDir is unreadable " +
              s"(${e.getMessage}) — skipped")
          None
      }
    }
    val bySchema = loaded.groupBy(_._2.schema)
    for ((_, group) <- bySchema.toSeq.sortBy(_._2.head._1)) {
      val (b, a, t) =
        compactGroup(spark, fs, tableDir, group, rowsPerFile, order)
      before += b; after += a; touched ++= t
    }
    val manifest = tableDir + "._zonemaps"
    if (touched.nonEmpty && fs.exists(new Path(manifest))) {
      graft.ops.ZoneMaps.patch(spark, tableDir, manifest, touched.toSeq)
      // a compacted file holds up to rowsPerFile keys, and the
      // re-index keeps the manifest's ORIGINAL grid size — the Bloom
      // sizing law (grids want ~10× keys-per-file bits) means a
      // default-size grid saturates far below a 1M-row file and then
      // prunes NOTHING while still costing manifest bytes. Surface it
      // with the documented gauge instead of failing a maintenance
      // step over an advisory index.
      val (health, statCols) =
        graft.ops.ZoneMaps.manifestHealth(spark, manifest)
      for ((c, fill) <- health
          if fill > graft.ops.ZoneMaps.SaturationBand)
        org.slf4j.LoggerFactory.getLogger(getClass).warn(
          "compactPartitions: bloom grid for '" + c + s"' in $manifest is " +
            String.format(java.util.Locale.ROOT, "%.2f", Double.box(fill)) +
            " full after the rewrite — point lookups will " +
            "stop skipping; rebuild with bigger grids " +
            "(ZoneMaps.build bloomBits ≈ 10× rows-per-file) or a " +
            "smaller sink.compact.rows.per.file")
      onManifestHealth(health, statCols)
    }
    (before, after)
  }

  /** Reserved staging partition column for the fused multi-partition
    * rewrite — lets every fragmented `dt=` dir of one table rewrite
    * in a single range-shuffled job without colliding with a physical
    * `dt` column some writer may have left INSIDE the files (the
    * per-dt path rewrote file columns untouched; this path must too).
    */
  private val FusedDtCol = "_graft_compact_dt"

  /** Fused rewrite of one schema group's partitions: one read (dt
    * re-attached as a literal — a basePath read would re-INFER the
    * partition value's type), one counting job for every partition's
    * row target, one range-partitioned write into a single staging
    * root, then the same per-partition two-rename atomic swaps the
    * per-dt path used. Crash windows are unchanged: before any swap
    * only dot-prefixed staging exists; between a partition's two
    * renames the next run's [[restoreIfInterrupted]] recovers it;
    * between partitions the table is the same
    * some-rewritten-some-not state the sequential loop could leave.
    */
  private def compactGroup(spark: SparkSession,
      fs: org.apache.hadoop.fs.FileSystem, tableDir: String,
      group: Seq[(String, org.apache.spark.sql.DataFrame)],
      rowsPerFile: Long,
      order: Seq[org.apache.spark.sql.Column])
      : (Long, Long, Seq[String]) = {
    val log = org.slf4j.LoggerFactory.getLogger(getClass)
    // a table carrying a PHYSICAL column named like the staging
    // partition column can't ride the fused path (the writer would
    // conflate the two) — rewrite it per-dt like the pre-fusion code
    // did, instead of refusing to compact it at all
    if (group.exists(_._2.columns.exists(_.equalsIgnoreCase(FusedDtCol)))) {
      log.warn(s"compactPartitions: a physical $FusedDtCol column under " +
        s"$tableDir — falling back to per-partition rewrites")
      return perDtRewrite(spark, tableDir, group, rowsPerFile, order,
        dt => None)
    }
    val frames = group.map { case (dt, raw) =>
      raw.withColumn(FusedDtCol, lit(dt))
    }
    val df = frames.reduce(_ unionByName _)
    val counts: Map[String, Long] = df.groupBy(FusedDtCol).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val parts = math.min(Int.MaxValue.toLong, math.max(1L,
      group.map { case (dt, _) => math.ceil(
        counts.getOrElse(dt, 0L).toDouble / rowsPerFile).toLong }.sum)).toInt
    val sortCols = col(FusedDtCol) +: order
    // staging name derived from the group's dts: two concurrent
    // compactPartitions calls over DISJOINT dt sets (safe under the
    // old per-dt tmp names) must not wipe each other's in-flight
    // staging through one shared fixed path
    val stage = new Path(s"$tableDir/._compact_tmp_multi_" +
      java.lang.Long.toHexString(
        scala.util.hashing.MurmurHash3.orderedHash(group.map(_._1))
          .toLong & 0xffffffffL))
    fs.delete(stage, true)
    df.repartitionByRange(parts, sortCols: _*)
      .sortWithinPartitions(sortCols: _*)
      .write.mode(SaveMode.Overwrite).partitionBy(FusedDtCol)
      .parquet(stage.toString)
    // locate each partition's staged child by its LITERAL name — the
    // writer URI-escapes exotic partition values, and a value whose
    // escaped directory name differs from the literal one would make
    // the rename target ambiguous. Every real dt here is a date
    // string / plain label (escape-free); if any non-empty partition
    // is missing its literal child, fall back to the per-dt rewrite
    // for the WHOLE group rather than guess at name decoding.
    val missing = group.map(_._1).filter(dt =>
      counts.getOrElse(dt, 0L) > 0 &&
        !fs.exists(new Path(stage, s"$FusedDtCol=$dt")))
    if (missing.nonEmpty) {
      log.warn(s"compactPartitions: staged names for dt=" +
        s"${missing.mkString(",")} under $tableDir are escaped — " +
        "falling back to per-partition rewrites")
      fs.delete(stage, true)
      return perDtRewrite(spark, tableDir, group, rowsPerFile, order,
        dt => counts.get(dt))
    }
    warnNonAtomicRename(fs, tableDir)
    var (before, after) = (0L, 0L)
    val touched = scala.collection.mutable.Buffer[String]()
    for ((dt, _) <- group) {
      val dtDir = s"$tableDir/dt=$dt"
      val live = new Path(dtDir)
      val trash = new Path(s"$tableDir/._compact_trash_dt=$dt")
      val staged = new Path(stage, s"$FusedDtCol=$dt")
      // a zero-row partition stages no child — stage a SCHEMA-BEARING
      // empty rewrite (one empty parquet file, the exact end state the
      // per-dt path's empty rewrite produced): a bare empty dir would
      // make the NEXT compaction wave's schema probe (and any plain
      // reader of the partition) fail on 'Unable to infer schema'
      val src = if (fs.exists(staged)) staged
      else {
        val e = new Path(stage, s"$FusedDtCol=$dt.__empty")
        Probes.emptyFrame(spark, StructType(
            df.schema.fields.filterNot(_.name == FusedDtCol)))
          .repartition(1)
          .write.mode(SaveMode.Overwrite).parquet(e.toString)
        e
      }
      before += countParquetFiles(fs, dtDir)
      after += countParquetFiles(fs, src.toString)
      fs.delete(trash, true)
      if (!fs.rename(live, trash))
        throw new IllegalStateException(s"compact swap failed: $dtDir")
      if (!fs.rename(src, live)) {
        fs.rename(trash, live) // roll back
        throw new IllegalStateException(s"compact swap failed: $dtDir")
      }
      fs.delete(trash, true)
      touched += dtDir
    }
    fs.delete(stage, true)
    (before, after, touched.toSeq)
  }

  /** The pre-fusion per-partition rewrite, kept as the fallback for
    * the two states the fused path can't handle (URI-escaped staged
    * names; a physical [[FusedDtCol]] column): each dt rewrites and
    * swaps independently. `countOf` supplies a row count when the
    * fused path already measured one (None → count here).
    */
  private def perDtRewrite(spark: SparkSession, tableDir: String,
      group: Seq[(String, org.apache.spark.sql.DataFrame)],
      rowsPerFile: Long, order: Seq[org.apache.spark.sql.Column],
      countOf: String => Option[Long]): (Long, Long, Seq[String]) = {
    var (b, a) = (0L, 0L)
    val touched = scala.collection.mutable.Buffer[String]()
    for ((dt, one) <- group) {
      val dtDir = s"$tableDir/dt=$dt"
      val n = countOf(dt).getOrElse(one.count())
      val p = math.max(1, math.ceil(n.toDouble / rowsPerFile).toInt)
      val (db, da) = rewriteSwap(spark, dtDir,
        s"$tableDir/._compact_tmp_dt=$dt",
        s"$tableDir/._compact_trash_dt=$dt") { t =>
        one.repartitionByRange(p, order: _*)
          .sortWithinPartitions(order: _*)
          .write.mode(SaveMode.Overwrite).parquet(t)
      }
      b += db; a += da; touched += dtDir
    }
    (b, a, touched.toSeq)
  }

  /** Sweep crash leftovers: `._compact_tmp*` staging dirs and
    * `.graft_stage_*` chunk staging older than `minAgeMs` are deleted
    * (a crashed rewrite leaves them behind; readers ignore
    * dot-prefixed dirs, but they cost listing time forever and can
    * hold a dead copy of a whole partition's data on disk).
    * `._compact_trash*` dirs are NOT swept: trash beside a MISSING
    * live dir is the interrupted-swap recovery source — the matching
    * compact run restores it; trash beside a live dir is a completed
    * swap's debris and IS swept. The age guard keeps a live rewrite's
    * staging safe; run with the same no-active-writer discipline as
    * compaction for a full sweep. Returns the deleted paths.
    */
  def vacuum(spark: SparkSession, tableDir: String,
      minAgeMs: Long = 3600000L): Seq[String] = {
    val fs = new Path(tableDir).getFileSystem(
      spark.sessionState.newHadoopConf())
    val root = new Path(tableDir)
    if (!fs.exists(root)) return Nil
    val now = System.currentTimeMillis()
    val doomed = fs.listStatus(root).toSeq.filter { st =>
      val n = st.getPath.getName
      val stale = now - st.getModificationTime >= minAgeMs
      val tmpLike = n.startsWith("._compact_tmp") ||
        n.startsWith(".graft_stage_") || n == "._ct_stage"
      // trash beside a LIVE twin is a completed swap's debris; trash
      // with its twin missing is the interrupted-swap recovery source
      // (partition compaction and the current table share the shape)
      def dead(prefix: String, livePrefix: String) =
        n.startsWith(prefix) &&
          fs.exists(new Path(root, livePrefix + n.stripPrefix(prefix)))
      stale && (tmpLike ||
        dead("._compact_trash_dt=", "dt=") ||
        dead("._ct_trash_kb=", "kb="))
    }
    doomed.foreach(st => fs.delete(st.getPath, true))
    // whole-table compact stages at SIBLING paths (`<dir>._compact_tmp`
    // / `._compact_trash`) — a crashed table rewrite otherwise parks a
    // full-size dead copy nothing reclaims
    val sibTmp = new Path(tableDir + "._compact_tmp")
    val sibTrash = new Path(tableDir + "._compact_trash")
    // zone-map manifest patch staging shares the discipline: tmp is
    // always debris once stale; trash is only debris while the live
    // manifest exists (trash beside a MISSING manifest is the
    // interrupted-swap recovery source — ZoneMaps restores from it)
    val manTmp = new Path(tableDir + "._zonemaps._patch_tmp")
    val manTrash = new Path(tableDir + "._zonemaps._patch_trash")
    val manInflight = new Path(tableDir + "._zonemaps._patch_inflight")
    val siblings = Seq(sibTmp -> true,
      sibTrash -> fs.exists(root), // trash only if the live table exists
      manTmp -> true,
      manInflight -> true, // a stale swap marker; restore ignores old ones
      manTrash -> fs.exists(new Path(tableDir + "._zonemaps")))
      .collect { case (p, ok) if ok && fs.exists(p) &&
          now - fs.getFileStatus(p).getModificationTime >= minAgeMs =>
        fs.delete(p, true); p.toString
      }
    doomed.map(_.getPath.toString) ++ siblings
  }

  /** Retention enforcement: drop every DATE-shaped `dt=` partition
    * strictly older than `beforeDt` (ISO dates compare
    * lexicographically), then patch any zone-map manifest beside the
    * table so it stops listing the vanished files. Non-date dt
    * values (a `sink.fixed.bucket` constant) are never touched — a
    * lexicographic compare against them would be meaningless, and
    * silently expiring a fixed bucket would empty the table. Returns
    * the dropped dt values.
    *
    * Deletion is per-partition directory; a crash mid-way leaves
    * some partitions dropped and some not — re-running converges
    * (retention is idempotent by definition), and the manifest patch
    * runs last so a crash can only leave it listing MISSING files,
    * which prunedRead surfaces loudly rather than silently
    * under-reading.
    */
  def expirePartitions(spark: SparkSession, tableDir: String,
      beforeDt: String): Seq[String] = {
    val datePat = "\\d{4}-\\d{2}-\\d{2}".r
    val fs = new Path(tableDir).getFileSystem(
      spark.sessionState.newHadoopConf())
    if (!fs.exists(new Path(tableDir))) return Nil
    val expired = fs.listStatus(new Path(tableDir)).toSeq
      .filter(st => st.isDirectory && st.getPath.getName.startsWith("dt="))
      .map(_.getPath.getName.stripPrefix("dt="))
      .filter(v => datePat.matches(v) && v < beforeDt)
      .sorted
    for (v <- expired) fs.delete(new Path(s"$tableDir/dt=$v"), true)
    val manifest = tableDir + "._zonemaps"
    if (expired.nonEmpty && fs.exists(new Path(manifest)))
      graft.ops.ZoneMaps.patch(spark, tableDir, manifest,
        expired.map(v => s"$tableDir/dt=$v"))
    expired
  }

  /** Finish an interrupted swap from a previous run BEFORE touching
    * the table: if the live dir is gone but trash survives, the
    * original table is intact there — restore it first (a crash
    * strictly between the two renames otherwise leaves NO live
    * directory, and even reading the table for the rewrite would
    * fail).
    */
  /** See the class doc: rename is a copy on these stores, so the
    * "atomic" swap window becomes O(data) long. getScheme THROWS on
    * FileSystem impls that keep the base-class default — this check
    * only gates a log line, never the compaction.
    */
  private def warnNonAtomicRename(fs: org.apache.hadoop.fs.FileSystem,
      tableDir: String): Unit = {
    val scheme = try Option(fs.getScheme).getOrElse("")
    catch { case _: UnsupportedOperationException => "" }
    if (Set("s3", "s3a", "s3n", "gs", "wasb", "wasbs", "abfs", "abfss",
        "oss", "cos").contains(scheme.toLowerCase))
      org.slf4j.LoggerFactory.getLogger(getClass).warn(
        s"compact: '$scheme' renames are O(data) copies, the directory " +
          "swap is NOT atomic here — readers may see a missing/partial " +
          "table while the swap copies")
  }

  /** Recursive `.parquet` data-file count under `p` (0 if missing). */
  private def countParquetFiles(fs: org.apache.hadoop.fs.FileSystem,
      p: String): Long = {
    if (!fs.exists(new Path(p))) return 0L
    val it = fs.listFiles(new Path(p), true)
    var c = 0L
    while (it.hasNext) {
      if (it.next().getPath.getName.endsWith(".parquet")) c += 1
    }
    c
  }

  private def restoreIfInterrupted(spark: SparkSession, tableDir: String,
      trashDir: String = null): Unit = {
    val fs = new Path(tableDir).getFileSystem(
      spark.sessionState.newHadoopConf())
    val trash = new Path(
      Option(trashDir).getOrElse(tableDir + "._compact_trash"))
    if (!fs.exists(new Path(tableDir)) && fs.exists(trash))
      fs.rename(trash, new Path(tableDir))
  }

  /** The shared swap machinery: stage the rewrite into
    * `<dir>._compact_tmp` via `write`, swap it live through
    * `._compact_trash` (two renames), rebuild any zone-map manifest
    * beside the table, and return (filesBefore, filesAfter).
    */
  private def rewriteSwap(spark: SparkSession, tableDir: String,
      tmpDir: String = null, trashDir: String = null)(
      write: String => Unit): (Long, Long) = {
    val fs = new Path(tableDir).getFileSystem(
      spark.sessionState.newHadoopConf())
    warnNonAtomicRename(fs, tableDir)
    def countFiles(p: String): Long = countParquetFiles(fs, p)
    val before = countFiles(tableDir)

    val tmp = new Path(Option(tmpDir).getOrElse(tableDir + "._compact_tmp"))
    val trash = new Path(
      Option(trashDir).getOrElse(tableDir + "._compact_trash"))
    fs.delete(tmp, true); fs.delete(trash, true)
    write(tmp.toString)

    // swap: old → trash, tmp → live, drop trash
    val live = new Path(tableDir)
    if (!fs.rename(live, trash))
      throw new IllegalStateException(s"compact swap failed: $tableDir")
    if (!fs.rename(tmp, live)) {
      fs.rename(trash, live) // roll back
      throw new IllegalStateException(s"compact swap failed: $tableDir")
    }
    fs.delete(trash, true)
    // a zone-map manifest beside the table lists the files the swap
    // just replaced — rebuild it (its own column set) so prunedRead
    // keeps working; without a manifest this is a no-op
    val manifest = tableDir + "._zonemaps"
    if (fs.exists(new Path(manifest)))
      graft.ops.ZoneMaps.rebuild(spark, tableDir, manifest)
    (before, countFiles(tableDir))
  }
}
