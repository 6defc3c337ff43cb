package graft.ops

import org.apache.hadoop.fs.{FileStatus, Path}
import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** File-level zone maps — a maintained min/max/count manifest over a
  * parquet dataset, for planning-time file skipping.
  *
  * Parquet already carries row-group min/max in its footers, and
  * Spark uses them — but at 100 TB "use the footers" means OPENING
  * millions of files per query just to discover that most are
  * irrelevant. The manifest inverts that: one small parquet dataset
  * (a row per data file, a min/max pair per indexed column) answers
  * "which files can match this range?" in a single scan of the
  * manifest, and the query then reads ONLY those files — the
  * lakehouse-format data-skipping idea (Delta's per-file stats,
  * Iceberg's manifests) expressed over plain parquet.
  *
  * Composes with [[ZOrder.layout]]: z-ordered files are tight in both
  * clustered dimensions, so their manifest ranges barely overlap and
  * a range predicate on EITHER dimension prunes most files. Over an
  * unclustered layout the manifest is still correct — every file's
  * range spans everything, so nothing prunes (the manifest makes
  * layout quality measurable: that is exactly q81's tightness audit).
  *
  * Maintenance contract: build once ([[build]] — one distributed scan
  * grouped by file), then [[refresh]] after appends — it lists the
  * directory, diffs against the manifest, and scans ONLY the new
  * files (cost ∝ delta, the same discipline as the maintained
  * indexes). Compaction/rewrite invalidates removed files' rows, so
  * rewriters call [[build]] (a fresh manifest) — it is a full-scan
  * artifact by definition there.
  *
  * Skipping rule ([[candidateFiles]]): a file survives for range
  * [lo, hi] iff `max >= lo AND min <= hi`. A file whose stats are
  * NULL (every value NULL in that file) is SKIPPED: a range
  * predicate can never match NULL. Files missing from the manifest
  * entirely (appended but not yet refreshed) are INCLUDED — stale
  * manifests must degrade to over-reading, never to wrong answers.
  */
object ZoneMaps {

  private val FileCol = "_zm_file"

  private def dataFiles(spark: SparkSession, dataDir: String): Seq[String] = {
    val root = new Path(dataDir)
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    // hidden DIRECTORIES are pruned during the walk, not just hidden
    // files at the end: a sink dir can contain live staging dirs
    // (`.graft_stage_*`, `_zonemaps`) whose inner files have plain
    // names — indexing those would "find" uncommitted data
    def hidden(n: String) = n.startsWith("_") || n.startsWith(".")
    def walk(s: FileStatus): Seq[FileStatus] =
      if (s.isDirectory)
        fs.listStatus(s.getPath).toSeq
          .filterNot(c => hidden(c.getPath.getName)).flatMap(walk)
      else Seq(s)
    walk(fs.getFileStatus(root)).map(_.getPath.toUri.getPath)
  }

  /** Per-file stats of `files`: `(file, n_rows, <c>_min, <c>_max ...)`
    * with each column's native type. One scan of exactly `files`,
    * one aggregate keyed by file — shuffle ∝ file count.
    */
  /** Default bloom grid size per file: 4096 bits = 512 bytes per
    * (file, column) — ~1% false positives at ~420 keys/file, and a
    * false positive only costs reading one extra file.
    */
  val DefaultBloomBits: Int = 4096

  private def statsOf(spark: SparkSession, baseDir: String,
      files: Seq[String], columns: Seq[String],
      bloomColumns: Seq[String] = Nil,
      bloomBits: Int = DefaultBloomBits): DataFrame = {
    val aggs = (count(lit(1)).as("n_rows") +:
      columns.flatMap(c => Seq(min(col(c)).as(s"${c}_min"),
        max(col(c)).as(s"${c}_max")))) ++
      bloomColumns.map(c => graft.functions.BloomSketch.bloom(spark,
        graft.functions.KmvSketch.md5Hash60(col(c)), bloomBits)
        .as(s"${c}_bloom"))
    // basePath keeps dt=-style partition columns resolvable when
    // reading an explicit file list out of a partitioned layout
    spark.read.option("basePath", baseDir).parquet(files: _*)
      .withColumn(FileCol, col("_metadata.file_path"))
      // normalize to a bare path: candidateFiles hands results back
      // to spark.read, and the manifest must match what dataFiles
      // lists regardless of scheme (file:/ vs /)
      .withColumn(FileCol, regexp_replace(col(FileCol), "^[a-z]+:/+", "/"))
      .groupBy(col(FileCol).as("file"))
      .agg(aggs.head, aggs.tail: _*)
  }

  /** Cut the manifest fresh: one distributed pass over every data
    * file in `dataDir`, stats for `columns`.
    */
  def build(spark: SparkSession, dataDir: String, manifestDir: String,
      columns: Seq[String], bloomColumns: Seq[String] = Nil,
      bloomBits: Int = DefaultBloomBits): Unit =
    statsOf(spark, dataDir, dataFiles(spark, dataDir), columns,
        bloomColumns, bloomBits)
      .repartition(1)
      .write.mode(SaveMode.Overwrite).parquet(manifestDir)

  /** Append stats for files present in `dataDir` but absent from the
    * manifest — scans ONLY those files (cost ∝ appended data). The
    * column set is the manifest's own (schema-stable by
    * construction). Returns how many new files were indexed.
    */
  def refresh(spark: SparkSession, dataDir: String,
      manifestDir: String): Int = {
    restorePatchIfInterrupted(spark, manifestDir)
    val m = spark.read.parquet(manifestDir)
    val known = m.select("file").collect().map(_.getString(0)).toSet
    val fresh = dataFiles(spark, dataDir).filterNot(known)
    if (fresh.nonEmpty) {
      val columns = statColumnsOf(m)
      statsOf(spark, dataDir, fresh, columns, bloomColumnsOf(m),
          bloomBitsOf(m))
        .select(m.columns.map(col).toSeq: _*) // manifest column order
        .write.mode(SaveMode.Append).parquet(manifestDir)
    }
    fresh.size
  }

  /** Build if the manifest does not exist yet, refresh otherwise —
    * the per-append hook shape (the CDC sink calls this after each
    * micro-batch write; cost ∝ the batch's new files after the first
    * call). Returns how many files were indexed this call.
    *
    * Rewrite contract: a file-REWRITING maintenance pass (compaction)
    * must rebuild the manifest afterwards — a manifest listing
    * replaced files makes [[prunedRead]] fail LOUDLY on the vanished
    * paths (never silently under-read); [[graft.streaming.Compaction]]
    * does exactly that when it finds a manifest beside the table.
    */
  def ensure(spark: SparkSession, dataDir: String, manifestDir: String,
      columns: Seq[String], bloomColumns: Seq[String] = Nil,
      bloomBits: Int = DefaultBloomBits): Int = {
    restorePatchIfInterrupted(spark, manifestDir)
    val fs = new Path(manifestDir)
      .getFileSystem(spark.sessionState.newHadoopConf())
    if (fs.exists(new Path(manifestDir))) refresh(spark, dataDir, manifestDir)
    else {
      val files = dataFiles(spark, dataDir)
      // a dir with no data files yet (all-empty appends) has nothing
      // to index AND no schema to shape a manifest from — the first
      // call that sees data builds it
      if (files.isEmpty) 0
      else {
        statsOf(spark, dataDir, files, columns, bloomColumns, bloomBits)
          .repartition(1)
          .write.mode(SaveMode.Overwrite).parquet(manifestDir)
        files.size
      }
    }
  }

  /** The manifest's bloom-indexed columns (by `_bloom` suffix). */
  private def bloomColumnsOf(m: DataFrame): Seq[String] =
    m.columns.filter(_.endsWith("_bloom")).map(_.stripSuffix("_bloom")).toSeq

  /** The manifest's min/max stat columns (by `_min` suffix) — the ONE
    * derivation [[refresh]], [[statColumns]] and [[manifestHealth]]
    * share, so a naming-rule change can never desynchronize them.
    */
  private def statColumnsOf(m: DataFrame): Seq[String] =
    m.columns.filter(_.endsWith("_min")).map(_.stripSuffix("_min")).toSeq

  /** Public form of [[bloomColumnsOf]] — maintenance passes use it to
    * audit grid health ([[bloomFillRatio]]) after a rewrite.
    */
  def bloomColumns(spark: SparkSession, manifestDir: String): Seq[String] = {
    restorePatchIfInterrupted(spark, manifestDir)
    bloomColumnsOf(spark.read.parquet(manifestDir))
  }

  /** Grid size of the manifest's bloom columns — read from a stored
    * grid (bits = longs × 64) so a refresh always appends grids the
    * existing probe expression can read; empty manifests fall back
    * to the default.
    */
  private def bloomBitsOf(m: DataFrame): Int = {
    val bcs = bloomColumnsOf(m)
    if (bcs.isEmpty) DefaultBloomBits
    else m.select(size(col(s"${bcs.head}_bloom"))).take(1) match {
      // a ZERO-ROW manifest (patch() can empty one when a rewrite
      // replaced every indexed file) has a grid SCHEMA but no grid to
      // read the size from — fall back to the default rather than
      // crash the maintenance step; a caller who sized grids larger
      // re-establishes that with an explicit rebuild
      case Array(r) if !r.isNullAt(0) => math.max(1, r.getInt(0)) * 64
      case _ => DefaultBloomBits
    }
  }

  /** Mean fraction of set bits across `column`'s per-file grids —
    * the saturation gauge for the Bloom sizing law: grids hold ~4
    * set bits per distinct key, so `bloomBits` must run ~10× the
    * keys-per-file or the grid saturates (fill → 1.0) and prunes
    * NOTHING while still costing manifest bytes. Check after a
    * build; past ~0.5, rebuild with bigger grids or fewer rows per
    * file. (False-positive rate ≈ fill⁴.)
    */
  /** The fill ratio past which a grid has effectively stopped
    * skipping — Compaction's warn and the pipeline's
    * `rebuild-zonemaps` advice record share this one constant so the
    * two surfaces can never drift apart.
    */
  val SaturationBand: Double = 0.5

  /** [[bloomFillRatio]] for EVERY bloom column in one manifest scan —
    * `(column, fill)` pairs. The per-column form scans the manifest
    * once per column; maintenance passes that audit all grids after
    * a rewrite use this instead.
    */
  def gridHealth(spark: SparkSession,
      manifestDir: String): Seq[(String, Double)] =
    manifestHealth(spark, manifestDir)._1

  /** [[gridHealth]] AND [[statColumns]] from ONE manifest read —
    * `((column, fill) pairs, stat columns)`. Compaction audits the
    * grids and the pipeline's advice record needs the stat columns
    * for the rebuild call; deriving both from the same frame keeps
    * an auto-compaction at one health scan instead of three (each
    * separate entry also re-runs the interrupted-patch restore).
    */
  def manifestHealth(spark: SparkSession,
      manifestDir: String): (Seq[(String, Double)], Seq[String]) = {
    restorePatchIfInterrupted(spark, manifestDir)
    val m = spark.read.parquet(manifestDir)
    val stats = statColumnsOf(m)
    val bcs = bloomColumnsOf(m)
    val health =
      if (bcs.isEmpty) Nil
      else {
        val aggs = bcs.map(c => avg(
          expr(s"aggregate(transform(${c}_bloom, x -> bit_count(x)), " +
            "0, (a, b) -> a + b)") /
            (size(col(s"${c}_bloom")) * lit(64.0))).as(c))
        val r = m.agg(aggs.head, aggs.tail: _*).head()
        bcs.zipWithIndex.map { case (c, i) =>
          c -> (if (r.isNullAt(i)) 0.0 else r.getDouble(i)) }
      }
    (health, stats)
  }

  /** The manifest's min/max stat columns (by `_min` suffix) — with
    * [[bloomColumns]], enough to reconstruct the exact [[build]]
    * call from the manifest alone (the manifest self-describes; a
    * caller's global config may cover other tables' columns).
    */
  def statColumns(spark: SparkSession, manifestDir: String): Seq[String] = {
    restorePatchIfInterrupted(spark, manifestDir)
    statColumnsOf(spark.read.parquet(manifestDir))
  }

  def bloomFillRatio(spark: SparkSession, manifestDir: String,
      column: String): Double = {
    restorePatchIfInterrupted(spark, manifestDir)
    spark.read.parquet(manifestDir)
      .select(avg(
        expr(s"aggregate(transform(${column}_bloom, x -> bit_count(x)), " +
          "0, (a, b) -> a + b)") /
          (size(col(s"${column}_bloom")) * lit(64.0))).as("fill"))
      .head() match {
        case r if r.isNullAt(0) => 0.0
        case r => r.getDouble(0)
      }
  }

  /** Rebuild the manifest with its OWN declared column set (min/max
    * and bloom columns, original grid size) — the rewrite hook for
    * compaction and other file-replacing maintenance. Derivations are
    * read out of the old manifest BEFORE the overwrite.
    */
  def rebuild(spark: SparkSession, dataDir: String,
      manifestDir: String): Unit = {
    restorePatchIfInterrupted(spark, manifestDir)
    val m = spark.read.parquet(manifestDir)
    val columns = m.columns.filter(_.endsWith("_min"))
      .map(_.stripSuffix("_min")).toSeq
    val blooms = bloomColumnsOf(m)
    val bits = bloomBitsOf(m) // materialized eagerly (head) pre-write
    build(spark, dataDir, manifestDir, columns, blooms, bits)
  }

  /** Finish an interrupted [[patch]] swap: a crash strictly between
    * its two renames leaves the live manifest missing and the
    * original parked in `._patch_trash` — restore it before reading.
    * Called by every manifest entry point, so a crashed patch never
    * strands prunedRead/refresh/maintenance until a manual rebuild.
    *
    * Concurrency: the planner integration reads manifests with zero
    * caller cooperation, so a reader CAN land exactly inside a live
    * patch's two-rename window — restoring there would fight the
    * writer's second rename (worst case re-installing the stale
    * manifest while the writer fails, or nesting dirs on stores whose
    * rename moves INTO an existing destination). The writer therefore
    * marks the swap with `._patch_inflight` (created before the first
    * rename, removed after the trash is dropped): trash + a YOUNG
    * marker means an active writer — poll briefly for its second
    * rename instead of restoring; trash with no marker, or a marker
    * past the grace window, is a crash — restore. A reader that
    * catches the rare crashed-seconds-ago case fails its one read and
    * heals on the next call.
    */
  private val PatchGraceMs = 30000L

  private[ops] def restorePatchIfInterrupted(spark: SparkSession,
      manifestDir: String): Unit = {
    val fs = new Path(manifestDir)
      .getFileSystem(spark.sessionState.newHadoopConf())
    val live = new Path(manifestDir)
    val trash = new Path(manifestDir + "._patch_trash")
    val marker = new Path(manifestDir + "._patch_inflight")
    if (fs.exists(live) || !fs.exists(trash)) return
    val activeWriter =
      try fs.exists(marker) && System.currentTimeMillis() -
        fs.getFileStatus(marker).getModificationTime < PatchGraceMs
      catch { case _: java.io.FileNotFoundException => false }
    if (activeWriter) {
      // the live window between the two renames is milliseconds
      var waited = 0L
      while (waited < 2000L && !fs.exists(live)) {
        Thread.sleep(100L); waited += 100L
      }
      return // live restored by the writer, or fail this one read
    }
    if (!fs.exists(live) && fs.exists(trash))
      fs.rename(trash, live)
  }

  /** Partition-scoped rewrite hook: drop the manifest rows whose file
    * lives under any of `removedPrefixes` (the replaced directories),
    * then [[refresh]] to index whatever replaced them. Cost ∝
    * manifest size + NEW files — unlike [[rebuild]], the untouched
    * 99% of a 100 TB table is never re-scanned, which is what makes a
    * per-`dt=`-partition compactor affordable to run behind every
    * threshold crossing. The manifest is collected driver-side before
    * the overwrite (it is a row per file — small by construction).
    *
    * The pruned manifest is staged to a dot-suffixed sibling and
    * swapped in by two renames (live → `._patch_trash`, staged →
    * live) — a delete-then-rewrite overwrite would leave concurrent
    * readers a whole Spark job's worth of missing-manifest window,
    * and a crash mid-write an unreadable manifest. A crash between
    * the renames heals at the next manifest read
    * ([[restorePatchIfInterrupted]]).
    *
    * SINGLE-MAINTAINER ASSUMPTION: at most one process patches a
    * given manifest at a time (the pipeline's in-batch maintenance
    * already guarantees this). Readers need no coordination — but a
    * reader on a DIFFERENT machine whose clock (or a writer pause)
    * stretches past the in-flight grace window can misjudge a live
    * patch as crashed and restore the stale manifest mid-swap. That
    * lost race cannot be prevented from the writer's side, so it is
    * DETECTED instead: the staged manifest carries a per-patch nonce
    * stamp, read back after the final rename — a mismatch means the
    * live manifest is not the one this patch staged, and the patch
    * fails loudly (the stale-but-internally-consistent manifest
    * stays live; over-reading, never wrong answers) instead of
    * silently shipping rows that reference replaced files.
    */
  def patch(spark: SparkSession, dataDir: String, manifestDir: String,
      removedPrefixes: Seq[String]): Int = {
    restorePatchIfInterrupted(spark, manifestDir)
    val m = spark.read.parquet(manifestDir)
    val schema = m.schema
    val fileAt = schema.fieldIndex("file")
    // manifest keys are NORMALIZED bare absolute paths (statsOf strips
    // the scheme, dataFiles uses toUri.getPath) — qualify each prefix
    // the same way, or a scheme-qualified (hdfs://...) or relative
    // tableDir would silently match nothing and leave the manifest
    // listing vanished files
    val fs = new Path(dataDir)
      .getFileSystem(spark.sessionState.newHadoopConf())
    val norm = removedPrefixes.map { p0 =>
      val q = fs.makeQualified(new Path(p0)).toUri.getPath
      if (q.endsWith("/")) q else q + "/"
    }
    val kept = m.collect().filterNot { r =>
      val f = r.getString(fileAt)
      norm.exists(f.startsWith)
    }
    val mfs = new Path(manifestDir)
      .getFileSystem(spark.sessionState.newHadoopConf())
    val tmp = new Path(manifestDir + "._patch_tmp")
    val trash = new Path(manifestDir + "._patch_trash")
    val marker = new Path(manifestDir + "._patch_inflight")
    mfs.delete(tmp, true); mfs.delete(trash, true)
    mfs.delete(marker, false)
    spark.createDataFrame(
        java.util.Arrays.asList(kept: _*), schema)
      .repartition(1)
      .write.mode(SaveMode.Overwrite).parquet(tmp.toString)
    // per-patch nonce stamped into the STAGED dir (underscore name —
    // invisible to parquet readers): read back post-swap to prove the
    // manifest now live is the one this patch staged (see scaladoc)
    val nonce = java.util.UUID.randomUUID().toString
    writeStamp(mfs, tmp, nonce)
    // the in-flight marker guards the two-rename window against a
    // concurrent reader's restore (see restorePatchIfInterrupted) —
    // created fresh here so its mtime dates THIS swap
    mfs.create(marker, true).close()
    val live = new Path(manifestDir)
    if (!mfs.rename(live, trash)) {
      mfs.delete(marker, false)
      throw new IllegalStateException(s"manifest patch swap failed: $live")
    }
    if (!mfs.rename(tmp, live)) {
      mfs.rename(trash, live) // roll back
      mfs.delete(marker, false)
      throw new IllegalStateException(s"manifest patch swap failed: $live")
    }
    if (!readStamp(mfs, live).contains(nonce))
      failLostRace(mfs, live, tmp, marker)
    mfs.delete(trash, true)
    mfs.delete(marker, false)
    refresh(spark, dataDir, manifestDir)
  }

  /** The lost-race exit: a reader's crash-restore re-created `live`
    * before our tmp→live rename ran — and on filesystems where
    * rename-into-an-existing-directory moves the source INSIDE it
    * (HDFS/local semantics), our staged dir now sits NESTED at
    * `<live>/<tmpName>`: a non-dot name whose parquet files a
    * recursive manifest read would pick up as phantom rows. Drop the
    * residue before failing — nothing else ever cleans that path
    * (the next patch deletes only the SIBLING `._patch_tmp`). The
    * restored stale-but-consistent manifest stays live: over-reading,
    * never wrong answers.
    */
  private[graft] def failLostRace(mfs: org.apache.hadoop.fs.FileSystem,
      live: Path, tmp: Path, marker: Path): Nothing = {
    mfs.delete(new Path(live, tmp.getName), true)
    mfs.delete(marker, false)
    throw new IllegalStateException(
      s"manifest patch lost a race at $live: the live manifest is " +
        "not the one this patch staged (a concurrent reader's " +
        "crash-restore fired during the swap window — see the " +
        "single-maintainer note on ZoneMaps.patch); the previous " +
        "manifest remains live, re-run the patch")
  }

  private val StampName = "_patch_stamp"

  private[graft] def writeStamp(fs: org.apache.hadoop.fs.FileSystem,
      dir: Path, nonce: String): Unit = {
    val out = fs.create(new Path(dir, StampName), true)
    try out.write(nonce.getBytes("UTF-8")) finally out.close()
  }

  private[graft] def readStamp(fs: org.apache.hadoop.fs.FileSystem,
      dir: Path): Option[String] =
    try {
      val in = fs.open(new Path(dir, StampName))
      try Some(scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim)
      finally in.close()
    } catch { case _: java.io.IOException => None }

  /** Point-lookup file skipping: the files that can contain
    * `column = value`, by per-file Bloom membership when the manifest
    * carries a `<column>_bloom` grid (no false negatives — a file
    * holding the value always survives), falling back to the min/max
    * range test otherwise. Unindexed files are always candidates.
    * A Bloom false positive costs one extra file read, never a wrong
    * answer — [[prunedLookup]] re-applies the equality exactly.
    */
  def candidateFilesPoint(spark: SparkSession, dataDir: String,
      manifestDir: String, column: String, value: Any): Seq[String] = {
    restorePatchIfInterrupted(spark, manifestDir)
    val m = spark.read.parquet(manifestDir)
    val pred =
      if (m.columns.contains(s"${column}_bloom"))
        graft.functions.BloomSketch.contains(spark,
          col(s"${column}_bloom"),
          graft.functions.KmvSketch.md5Hash60(lit(value)))
      else
        col(s"${column}_max") >= lit(value) &&
          col(s"${column}_min") <= lit(value)
    collectCandidates(spark, dataDir, m, pred)
  }

  /** Read only the files that can contain `column = value`, equality
    * re-applied exactly (same contract as [[prunedRead]]).
    */
  def prunedLookup(spark: SparkSession, dataDir: String,
      manifestDir: String, column: String, value: Any): DataFrame = {
    val files = candidateFilesPoint(spark, dataDir, manifestDir,
      column, value)
    if (files.isEmpty)
      spark.read.parquet(dataDir).filter(col(column) === lit(value)).limit(0)
    else spark.read.option("basePath", dataDir).parquet(files: _*)
      .filter(col(column) === lit(value))
  }

  /** The files that can contain rows with `column` in [lo, hi], both
    * bounds inclusive — manifest hits plus every unindexed file (a
    * stale manifest over-reads, never under-reads).
    */
  def candidateFiles(spark: SparkSession, dataDir: String,
      manifestDir: String, column: String, lo: Any, hi: Any): Seq[String] =
    candidateFilesAll(spark, dataDir, manifestDir, Seq((column, lo, hi)))

  /** Conjunction form: files that can hold a row matching EVERY
    * range at once — the z-order payoff, where a file tight in two
    * clustered dimensions is skipped unless BOTH ranges overlap it.
    * The per-file test stays necessary-condition sound (each range
    * checks its own min/max), so the intersection can only shrink
    * the candidate set, never lose a matching row.
    */
  def candidateFilesAll(spark: SparkSession, dataDir: String,
      manifestDir: String,
      ranges: Seq[(String, Any, Any)]): Seq[String] = {
    require(ranges.nonEmpty, "candidateFilesAll: no ranges")
    restorePatchIfInterrupted(spark, manifestDir)
    val m = spark.read.parquet(manifestDir)
    val pred = ranges.map { case (c, lo, hi) =>
      col(s"${c}_max") >= lit(lo) && col(s"${c}_min") <= lit(hi)
    }.reduce(_ && _)
    collectCandidates(spark, dataDir, m, pred)
  }

  /** One manifest pass: every file name + its predicate verdict
    * (NULL stats ⇒ false ⇒ skipped), plus the unindexed remainder.
    */
  private def collectCandidates(spark: SparkSession, dataDir: String,
      m: DataFrame, pred: Column): Seq[String] = {
    val rows = m.select(col("file"), coalesce(pred, lit(false)).as("hit"))
      .collect()
    val known = rows.map(_.getString(0)).toSet
    rows.filter(_.getBoolean(1)).map(_.getString(0)).toSeq ++
      dataFiles(spark, dataDir).filterNot(known)
  }

  /** Read only the files that can match `column BETWEEN lo AND hi`,
    * with the predicate re-applied exactly (the manifest prunes
    * FILES; rows inside a surviving file still need the filter).
    * An empty candidate set yields an empty frame with the data's
    * schema (read schema comes from the dataset root, not the
    * pruned file list).
    */
  def prunedRead(spark: SparkSession, dataDir: String, manifestDir: String,
      column: String, lo: Any, hi: Any): DataFrame =
    prunedReadAll(spark, dataDir, manifestDir, Seq((column, lo, hi)))

  /** Conjunction form of [[prunedRead]] — see [[candidateFilesAll]]. */
  def prunedReadAll(spark: SparkSession, dataDir: String,
      manifestDir: String, ranges: Seq[(String, Any, Any)]): DataFrame = {
    val files = candidateFilesAll(spark, dataDir, manifestDir, ranges)
    val pred: Column = ranges.map { case (c, lo, hi) =>
      col(c) >= lit(lo) && col(c) <= lit(hi)
    }.reduce(_ && _)
    if (files.isEmpty)
      spark.read.parquet(dataDir).filter(pred).limit(0)
    else spark.read.option("basePath", dataDir).parquet(files: _*).filter(pred)
  }
}
