package graft.streaming

import org.apache.hadoop.fs.{FileStatus, Path}
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Incrementally-synced CURRENT-STATE materialization of a CDC sink —
  * the copy-on-write upsert table a lakehouse format maintains,
  * expressed over plain parquet: one row per key holding its latest
  * change (DELETE tombstones RETAINED as rows; [[read]] filters them),
  * kept fresh by folding only the sink files appended since the last
  * sync into only the key-buckets they touch.
  *
  * [[graft.ops.TimeTravel.currentState]] answers the same question by
  * scanning the WHOLE changelog per query; [[Materialize]] answers it
  * in-stream with RocksDB state. This is the third shape — a
  * QUERYABLE TABLE on disk, maintained by a maintenance pass, for the
  * consumers that want `spark.read.parquet(current)` semantics with
  * neither a running stream nor a per-query log scan. At 100 TB the
  * incremental discipline is the whole point: a day's changes touch a
  * day's worth of keys, so the sync rewrites the buckets those keys
  * hash into — never the full table.
  *
  * Layout under `currentDir`:
  *   - `kb=<i>/` — the latest change per key whose key hashes to
  *     bucket `i` (`pmod(xxhash64(pk), buckets)`); bucket count is
  *     fixed at first sync (persisted in the state file) — a key's
  *     bucket must never move.
  *   - `_synced.txt` — the sink files already folded in (one per
  *     line), written atomically AFTER the bucket rewrites commit.
  *
  * Tombstone contract: a deleted key's row stays in its bucket with
  * `_op = DELETE` and the delete's own source offset. This is what
  * makes re-folding ALWAYS safe: a sink maintenance pass (compaction)
  * rewrites partitions under new file names, and a sync that treats
  * those as fresh re-folds rows it already folded — if the table had
  * dropped tombstones, re-folding a deleted key's older INSERT (its
  * DELETE living in a different, un-refolded file) would resurrect
  * the key permanently. With the tombstone stored, keep-latest by
  * source offset lets the delete win every rematch. [[read]] hides
  * tombstones; [[pruneTombstones]] reclaims ancient ones once no
  * older change can still be re-folded past them.
  *
  * Crash contract: bucket rewrites use the compaction swap (atomic
  * per bucket; an interrupted swap heals on the next sync). A crash
  * BEFORE `_synced.txt` lands re-folds the same sink files — keep-
  * latest by source offset is idempotent, so at-least-once replay
  * converges to the same table. A crash between two bucket swaps
  * leaves some buckets a sync ahead; each key lives in exactly one
  * bucket, so no key is ever half-updated, and the re-run completes
  * the rest.
  */
object CurrentTable {

  private def stateFile(dir: String) = s"$dir/_synced.txt"

  /** The bucket assignment — THE layout contract: every writer and
    * every pruning reader must hash identically or keys silently
    * land in (or get looked up from) the wrong bucket. Separator
    * byte 0x01 so composite keys cannot collide by concatenation
    * (("ab","c") vs ("a","bc")).
    */
  private def bucketExpr(pk: Seq[String],
      nb: Int): org.apache.spark.sql.Column =
    pmod(xxhash64(concat_ws("\u0001", pk.map(col): _*)),
      lit(nb.toLong)).cast("int")

  /** (bucketCount, processed sink files) from the state file. */
  private def readState(spark: SparkSession,
      dir: String): Option[(Int, Set[String])] = {
    val p = new Path(stateFile(dir))
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      val lines =
        try scala.io.Source.fromInputStream(in, "UTF-8")
          .getLines().map(_.trim).filter(_.nonEmpty).toVector
        finally in.close()
      Some((lines.head.toInt, lines.tail.toSet))
    }
  }

  /** The bucket count alone — first line of the state file, without
    * materializing the (unbounded) processed-file list behind it.
    */
  private def readBucketCount(spark: SparkSession,
      dir: String): Option[Int] = {
    val p = new Path(stateFile(dir))
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      try {
        val br = new java.io.BufferedReader(
          new java.io.InputStreamReader(in, "UTF-8"))
        Option(br.readLine()).map(_.trim.toInt)
      } finally in.close()
    }
  }

  private def writeState(spark: SparkSession, dir: String, nb: Int,
      done: Set[String]): Unit =
    AtomicFiles.write(stateFile(dir),
      (nb.toString +: done.toSeq.sorted).mkString("\n"),
      spark.sparkContext.hadoopConfiguration)

  /** Data files under `dir` — or, when `scope` names `dt=` partition
    * subdirectories, under only those (the per-batch cheap path: the
    * pipeline knows which partitions a batch wrote, so the sync never
    * pays an O(whole-sink) listing for a steady-state delta).
    */
  private def dataFiles(spark: SparkSession, dir: String,
      scope: Option[Seq[String]] = None): Seq[String] = {
    val root = new Path(dir)
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(root)) return Nil
    def hidden(n: String) = n.startsWith("_") || n.startsWith(".")
    def walk(s: FileStatus): Seq[FileStatus] =
      if (s.isDirectory)
        fs.listStatus(s.getPath).toSeq
          .filterNot(c => hidden(c.getPath.getName)).flatMap(walk)
      else Seq(s)
    val roots = scope match {
      case None => Seq(fs.getFileStatus(root))
      case Some(subs) => subs.map(s => new Path(dir, s))
        .filter(fs.exists).map(fs.getFileStatus)
    }
    // FULL qualified URIs, not bare paths: these strings go straight
    // back into spark.read.parquet — stripping the scheme would
    // resolve them against fs.defaultFS and break non-default
    // filesystems (s3a://, hdfs://)
    roots.flatMap(walk).map(_.getPath.toString)
      .filter(_.endsWith(".parquet"))
  }

  /** Fold the sink files appended since the last sync into the
    * current table. `order` is the per-key recency order
    * ([[graft.ops.TimeTravel.defaultOrder]] by default via
    * `sourceType`). Returns (newFiles folded, buckets rewritten).
    * First call cuts the table fresh with `buckets` key-buckets;
    * later calls reuse the persisted count.
    *
    * `scope`: `dt=` partition names the caller KNOWS contain every
    * unfolded file (the pipeline passes the batch's own partitions) —
    * the listing then touches only those directories. The FIRST sync
    * of a table ignores scope (history lives everywhere), and a
    * caller unsure of coverage passes None for a full walk.
    */
  def sync(spark: SparkSession, sinkDir: String, currentDir: String,
      pk: Seq[String], sourceType: String = "mysql",
      buckets: Int = 16,
      orderOverride: Option[Seq[org.apache.spark.sql.Column]] = None,
      scope: Option[Seq[String]] = None)
      : (Int, Int) = {
    require(pk.nonEmpty, "sync: no key columns")
    require(buckets > 0, s"buckets must be positive, got $buckets")
    val state = readState(spark, currentDir)
    val nb = state.map(_._1).getOrElse(buckets)
    val done = state.map(_._2).getOrElse(Set.empty)
    // the bucket count is a LAYOUT constant — persist it BEFORE the
    // first fold, or a crash before the cursor lands followed by a
    // retry with a different `buckets` argument would merge new rows
    // under one modulus into dirs cut under another (duplicate keys,
    // silently, forever). And if the cursor is GONE while bucket dirs
    // exist (external deletion), the modulus is unknowable — fail
    // loudly rather than guess.
    if (state.isEmpty) {
      val rootP = new Path(currentDir)
      val rfs = rootP.getFileSystem(spark.sessionState.newHadoopConf())
      if (rfs.exists(rootP)) {
        val orphaned = rfs.listStatus(rootP)
          .count(_.getPath.getName.startsWith("kb="))
        require(orphaned == 0,
          s"current table at $currentDir has $orphaned bucket dirs but " +
            "no _synced.txt — the bucket modulus is unknowable; restore " +
            "the cursor or rebuild the table")
      }
      writeState(spark, currentDir, nb, Set.empty)
    }
    val fs = new Path(currentDir)
      .getFileSystem(spark.sessionState.newHadoopConf())
    // heal EVERY interrupted swap BEFORE the no-fresh-files early
    // return: a crashed swap (a sync's, or a pruneTombstones run's —
    // which never touches the cursor, so it cannot count on a re-fold
    // to bring a later sync past this point) must not leave a
    // bucket's keys invisible until some future delta touches it
    healBuckets(fs, currentDir)
    val all = dataFiles(spark, sinkDir,
      if (state.isEmpty) None else scope)
    val fresh = all.filterNot(done)
    if (fresh.isEmpty) return (0, 0)

    val kb = bucketExpr(pk, nb)
    val sinkBase = {
      val sp = new Path(sinkDir)
      sp.getFileSystem(spark.sessionState.newHadoopConf())
        .makeQualified(sp).toString
    }
    val changes = spark.read
      .option("basePath", sinkBase).parquet(fresh: _*)
      .drop("dt") // the current table is keyed, not time-bucketed
      .withColumn("kb", kb)
    val touched = changes.select("kb").distinct()
      .collect().map(_.getInt(0)).sorted
    val order = orderOverride.getOrElse(
      graft.ops.TimeTravel.defaultOrder(sourceType))

    // ONE merge job over (touched buckets' current rows) ∪ (changes),
    // written kb-partitioned into a dot-prefixed staging root, then
    // per-bucket RENAME-only swaps — a per-bucket merge loop would
    // re-read the delta once per bucket and pay a full Spark job per
    // bucket (measured 64 sequential jobs ≈ 28 s for a fold one job
    // finishes in ~2 s)
    val liveTouched = touched.map(b => s"$currentDir/kb=$b")
      .filter(d => fs.exists(new Path(d)))
    val cur =
      if (liveTouched.isEmpty) changes.limit(0)
      else spark.read.option("basePath", currentDir)
        .parquet(liveTouched: _*)
        .withColumn("kb", col("kb").cast("int"))
    // tombstones stay IN the merge result (see the class doc): a
    // stored DELETE must be there to outrank any re-folded older
    // change for its key
    val merged = graft.ops.TimeTravel.latest(
      cur.unionByName(changes), pk, Long.MaxValue, order)
    val stage = s"$currentDir/._ct_stage"
    fs.delete(new Path(stage), true)
    // repartition by kb before the bucketed write: the merge comes
    // off a pk-hash shuffle, so WITHOUT this every write task holds
    // rows of every touched bucket and a full fold emits
    // tasks × buckets small files (measured 32 files per bucket);
    // hashed on kb, each bucket's rows land in exactly one task —
    // one file per bucket, and parquet row groups keep one big file
    // scan-parallel
    merged.repartition(col("kb"))
      .write.mode(SaveMode.Overwrite).partitionBy("kb")
      .parquet(stage)
    swapBuckets(fs, currentDir, stage, touched.toSeq)
    // the durable cursor lands LAST: a crash anywhere above re-folds
    // the same files, and keep-latest converges
    writeState(spark, currentDir, nb, done ++ fresh)
    (fresh.size, touched.length)
  }

  /** Finish interrupted bucket swaps: a bucket whose live dir is gone
    * while its `._ct_trash_kb=` twin survives is restored — globally,
    * not just for buckets the caller is about to touch.
    */
  private def healBuckets(fs: org.apache.hadoop.fs.FileSystem,
      currentDir: String): Unit =
    if (fs.exists(new Path(currentDir)))
      for (st <- fs.listStatus(new Path(currentDir))
          if st.getPath.getName.startsWith("._ct_trash_kb=")) {
        val live = new Path(currentDir,
          st.getPath.getName.stripPrefix("._ct_trash_"))
        if (!fs.exists(live)) fs.rename(st.getPath, live)
      }

  /** The shared per-bucket staged swap (sync and pruneTombstones):
    * live → trash, staged → live, drop trash — atomic per bucket; a
    * crash between the renames heals at the next [[healBuckets]].
    * A bucket with no staged dir ends absent; a pre-existing-absent
    * bucket (first fold) skips the first rename. Drops the staging
    * root last.
    */
  private def swapBuckets(fs: org.apache.hadoop.fs.FileSystem,
      currentDir: String, stage: String, buckets: Seq[Int]): Unit = {
    for (b <- buckets) {
      val bDir = s"$currentDir/kb=$b"
      val staged = s"$stage/kb=$b"
      val trash = s"$currentDir/._ct_trash_kb=$b"
      fs.delete(new Path(trash), true)
      if (fs.exists(new Path(bDir)) && !fs.rename(new Path(bDir),
          new Path(trash)))
        throw new IllegalStateException(s"current-table swap failed: $bDir")
      if (fs.exists(new Path(staged)) &&
          !fs.rename(new Path(staged), new Path(bDir))) {
        fs.rename(new Path(trash), new Path(bDir)) // roll back
        throw new IllegalStateException(s"current-table swap failed: $bDir")
      }
      fs.delete(new Path(trash), true)
    }
    fs.delete(new Path(stage), true)
  }

  /** Cursor maintenance hook for sink rewrites (compaction, retention):
    * drop cursor entries under `removedPrefixes` (the replaced or
    * expired directories) and record `addedFiles` as already-folded.
    *
    * CONTRACT: every file under `removedPrefixes` must have been
    * synced before the rewrite (the pipeline syncs the batch's
    * partitions, THEN compacts them) — `addedFiles` hold only rows
    * those synced files held, so marking them done skips a pointless
    * full re-fold of the rewritten partition. A caller that cannot
    * guarantee that passes `addedFiles = Nil`: the new files then
    * fold as fresh, which the retained tombstones make safe. No-op
    * when no cursor exists yet.
    */
  def onSinkRewrite(spark: SparkSession, sinkDir: String,
      currentDir: String, removedPrefixes: Seq[String],
      addedFiles: Seq[String]): Unit =
    readState(spark, currentDir).foreach { case (nb, done) =>
      val fs = new Path(sinkDir)
        .getFileSystem(spark.sessionState.newHadoopConf())
      // cursor entries are fully-qualified URIs (see dataFiles) —
      // qualify the prefixes the same way or nothing would match
      val norm = removedPrefixes.map { p =>
        val q = fs.makeQualified(new Path(p)).toString
        if (q.endsWith("/")) q else q + "/"
      }
      val kept = done.filterNot(f => norm.exists(f.startsWith))
      val added = addedFiles
        .map(f => fs.makeQualified(new Path(f)).toString)
      writeState(spark, currentDir, nb, kept ++ added)
    }

  /** Drop cursor entries whose file lives under a DATE-shaped `dt=`
    * partition strictly older than `beforeDt` (ISO dates compare
    * lexicographically — the same rule retention expires by). Unlike
    * [[onSinkRewrite]], which needs the just-dropped partition list,
    * this sweeps by the HORIZON itself, so a run that crashed between
    * deleting partitions and updating the cursor converges on the
    * next pass instead of leaking those entries forever. Returns
    * entries dropped. No-op without a cursor.
    */
  def pruneCursorExpired(spark: SparkSession, currentDir: String,
      beforeDt: String): Int = {
    val datePat = ".*/dt=(\\d{4}-\\d{2}-\\d{2})/.*".r
    readState(spark, currentDir).map { case (nb, done) =>
      val kept = done.filter {
        case datePat(d) => d >= beforeDt
        case _ => true // non-date buckets never expire
      }
      if (kept.size != done.size)
        writeState(spark, currentDir, nb, kept)
      done.size - kept.size
    }.getOrElse(0)
  }

  /** Reclaim tombstones older than `beforeTsMs`: rewrite (atomic
    * per-bucket swap) every bucket holding one, dropping those rows.
    * Safe once no sink rewrite can re-fold a change OLDER than the
    * horizon — e.g. the sink's own retention horizon: a change that
    * old no longer exists in any sink file. Returns tombstones
    * dropped.
    */
  def pruneTombstones(spark: SparkSession, currentDir: String,
      beforeTsMs: Long): Long = {
    val fs = new Path(currentDir)
      .getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(new Path(currentDir))) return 0L
    // a crashed swap (ours or a sync's) is healed BEFORE scanning —
    // prune never advances a cursor, so nothing else guarantees a
    // later entry point reaches the heal
    healBuckets(fs, currentDir)
    // a cursor-only table (state file written, nothing folded yet)
    // has no buckets to scan — and no parquet for read to infer from
    if (!fs.listStatus(new Path(currentDir))
        .exists(_.getPath.getName.startsWith("kb="))) return 0L
    val doomed = graft.ops.TimeTravel.isTombstone &&
      col("_ts") < beforeTsMs
    val all = spark.read.parquet(currentDir)
    val hit = all.filter(doomed).groupBy("kb").count().collect()
      .map(r => (r.getInt(0), r.getLong(1))).toMap
    if (hit.isEmpty) return 0L
    val stage = s"$currentDir/._ct_stage"
    fs.delete(new Path(stage), true)
    val hitDirs = hit.keySet.toSeq.sorted.map(b => s"$currentDir/kb=$b")
    spark.read.option("basePath", currentDir).parquet(hitDirs: _*)
      .withColumn("kb", col("kb").cast("int"))
      .filter(!doomed)
      .repartition(col("kb")) // one file per bucket, like sync's write
      .write.mode(SaveMode.Overwrite).partitionBy("kb").parquet(stage)
    swapBuckets(fs, currentDir, stage, hit.keySet.toSeq.sorted)
    hit.values.sum
  }

  /** The current table as a frame: live keys only — the stored
    * DELETE tombstones are filtered here, at read time. `kb=` rides
    * along as a partition column; callers who key-join can exploit
    * it.
    */
  def read(spark: SparkSession, currentDir: String): DataFrame =
    spark.read.parquet(currentDir)
      .filter(!graft.ops.TimeTravel.isTombstone)

  /** Point lookups over the bucket layout: the live rows matching
    * `keys` (a frame whose columns are exactly the table's key
    * columns), reading ONLY the buckets those keys hash into — the
    * same expression the sync bucketed by, so the prune can never
    * disagree with the layout. At scale this is the difference
    * between a point lookup scanning 1/nb of the table and scanning
    * all of it; the key set is assumed driver-small (it is collected
    * to plan the bucket list). Matching is a semi-join on the key
    * columns, so composite keys and duplicates in `keys` behave like
    * SQL `IN`. The key columns' TYPES must match the table's —
    * xxhash64 hashes an int and a long differently, so a mistyped
    * probe is rejected loudly rather than planning the wrong bucket.
    */
  def lookup(spark: SparkSession, currentDir: String,
      pk: Seq[String], keys: DataFrame): DataFrame = {
    require(pk.nonEmpty, "lookup: no key columns")
    require(keys.columns.toSeq == pk,
      s"lookup: keys frame must have exactly the key columns $pk, " +
        s"got ${keys.columns.toSeq}")
    // just the layout constant off the cursor's first line — reading
    // the full cursor (one line per folded sink file) would put
    // O(cursor) driver IO on the hot point-lookup path
    val nb = readBucketCount(spark, currentDir).getOrElse(
      throw new IllegalStateException(
        s"no current table at $currentDir (missing ${stateFile(currentDir)})"))
    // snapshot the probe set ONCE, driver-side: bucket planning and
    // the join below must see the SAME rows — a probe frame over a
    // changing or non-deterministic source could otherwise hash a key
    // into a bucket the plan never listed and silently miss it
    val local = spark.createDataFrame(
      java.util.Arrays.asList(keys.collect(): _*), keys.schema)
    val buckets = local.select(bucketExpr(pk, nb).as("kb")).distinct()
      .collect().map(_.getInt(0)).sorted
    val fs = new Path(currentDir)
      .getFileSystem(spark.sessionState.newHadoopConf())
    // one listing for existence AND a bucket-pruned schema source —
    // schema inference off the table root would list every bucket
    val existing = fs.listStatus(new Path(currentDir))
      .map(_.getPath.getName).filter(_.startsWith("kb=")).toSet
    if (existing.isEmpty)
      throw new IllegalStateException(
        s"current table at $currentDir holds no data yet")
    val schemaSrc = spark.read.option("basePath", currentDir)
      .parquet(s"$currentDir/${existing.head}")
    // the hash is TYPE-sensitive (xxhash64 of an int != the same
    // value as a long) — a mistyped probe would silently plan the
    // wrong bucket, so mistypes must fail loudly instead
    for (c <- pk) {
      def typeOf(s: org.apache.spark.sql.types.StructType, n: String) =
        s.fields.find(_.name.equalsIgnoreCase(n)).map(_.dataType)
      (typeOf(keys.schema, c), typeOf(schemaSrc.schema, c)) match {
        case (Some(kt), Some(tt)) => require(kt == tt,
          s"lookup: key column '$c' is $kt but the table stores $tt — " +
            "xxhash64 is type-sensitive; cast the probe frame")
        case _ => throw new IllegalArgumentException(
          s"lookup: key column '$c' missing from probe or table schema")
      }
    }
    val live = buckets.map(b => s"kb=$b").filter(existing)
      .map(n => s"$currentDir/$n")
    if (live.isEmpty) return schemaSrc.limit(0)
      .filter(!graft.ops.TimeTravel.isTombstone)
    spark.read.option("basePath", currentDir).parquet(live.toSeq: _*)
      .filter(!graft.ops.TimeTravel.isTombstone)
      .join(local, pk, "left_semi")
  }
}
