package graft.ops

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Secondary (non-key) point-lookup indexes over a
  * [[graft.streaming.CurrentTable]]: Bloom filters PER KEY BUCKET
  * over a declared column's live values, maintained by every sync
  * from the staged files its fold just produced — the same
  * recompute-from-state discipline as the tombstone census and
  * [[RollupTable]] partials, so crash replay converges with no
  * transactional pairing.
  *
  * Why: the current table's layout prunes by PRIMARY key only — a
  * lookup on any other column scans every bucket. With per-bucket
  * blooms, "which rows have email = X" tests X against the bucket
  * filters and scans only the buckets that MIGHT hold it — for a
  * selective value that is one or two buckets plus false positives
  * (~fpp × buckets). Blooms never produce false negatives, and the
  * exact `IN` filter runs on the scanned rows anyway, so false
  * positives cost reads, never wrong rows — the Hudi/Iceberg
  * bloom-index shape, applied to the bucket grain this table
  * maintains.
  *
  * Scale shape, end to end:
  *   - Filters are SHARDED within a bucket by hash range
  *     (`shard = hash mod shards`), each shard a bounded-size filter
  *     (≤ 2^24 bits = 2 MB), with the shard count auto-sized from the
  *     live row count — so fpp stays ~1% at ANY rows/bucket instead
  *     of silently degrading when one capped filter saturates
  *     (100 TB / 4096 buckets ≈ 250M rows/bucket auto-sizes to ~150
  *     shards/bucket, not 0.07 bits/row).
  *   - Candidate selection runs CLUSTER-SIDE: the ≤`maxDriverKeys`
  *     probe hashes broadcast onto a distributed scan of the bloom
  *     sidecar, and only the matching bucket IDs (ints) return to the
  *     driver — the sidecar's bits never transit the driver, however
  *     large the table ([[candidateFrame]]; plan-asserted).
  *   - The sidecar publishes across multiple parquet files once it
  *     outgrows one ([[PointerDir.stage]]'s `numFiles`), so index
  *     maintenance never funnels through a single write task.
  *   - Repeated probes (the serving pattern) use a prepared
  *     [[reader]] that pins the bloom frame in executor storage and
  *     revalidates per call with two small meta reads, instead of
  *     re-reading the sidecar per probe.
  *
  * Layout under `<currentDir>/_index/<column>/`: `_meta.txt` (bucket
  * modulus, per-shard bloom bits, shard count, data pointer — atomic
  * flip via [[PointerDir]]) and `d_<nonce>/` parquet rows
  * `(kb, shard, bloom)`. Maintenance rides
  * [[graft.streaming.CurrentTable.sync]]: touched buckets' blooms
  * recompute from the staged fold (a bloom cannot "remove" a value,
  * so recompute — not delta-update — is also the only way a DELETE
  * or UPDATE-away ever tightens the filter). A sidecar written by a
  * pre-shard version (no `shards=` in its meta) stays readable
  * (one implicit shard) and is rebuilt in the new layout by the next
  * sync — one table-sized read, once, the rescale-rebuild cost class.
  *
  * A [[graft.streaming.CurrentTable.rescale]] re-keys every bucket,
  * and unlike rollup partials a bloom keyed under a dead modulus
  * CANNOT serve (bucket 3-of-4 and 3-of-9 hold different keys — a
  * stale index would produce false NEGATIVES, i.e. missing rows).
  * [[lookupBy]] reads the live modulus INSIDE the same healed build
  * that scans the buckets — a rescale completing during the heal
  * wait is re-checked, never served stale — and falls back to the
  * exact full scan until the next sync rebuilds the index under the
  * new modulus.
  *
  * Visibility window, honestly scoped: the index pointer flips AFTER
  * the sync's bucket swap (the artifact must never describe buckets
  * that don't exist yet), so between the swap and the flip — ms-scale
  * normally, but lasting until the replaying sync after a crash in
  * that window — a [[lookupBy]] can miss rows that sync just
  * inserted: the new row is live in its bucket, but the still-pointed
  * old bloom was built without its value. Unlike a rollup (where
  * staleness is merely old-but-consistent data), a stale bloom is
  * incorrect-by-omission for exactly the just-written keys. The
  * single-maintainer discipline plus the flip running in the same
  * job makes the healthy window negligible; the crash variant closes
  * only when the un-advanced cursor replays the fold.
  */
object BucketIndex {

  private def indexRoot(currentDir: String) = s"$currentDir/_index"

  private[graft] def validColumn(c: String): Unit = {
    PointerDir.validSegment("index column", c)
    // `kb` is the bucket-layout column every build and probe keys by;
    // an index "on kb" would collide with it in the very groupBy that
    // builds the blooms (and is layout, not data — rescale changes it)
    require(!c.equalsIgnoreCase("kb"),
      "index column 'kb' is reserved (it names the bucket layout)")
  }

  /** Hard per-shard filter size (2^24 bits = 2 MB). Auto-sizing adds
    * shards rather than ever exceeding it, so fpp holds at any scale.
    */
  private[graft] val MaxShardBits: Int = 1 << 24

  /** Target parquet file size for the published sidecar — filters
    * beyond one file's worth publish across multiple write tasks.
    */
  private[graft] val TargetFileBytes: Long = 128L * 1024 * 1024

  /** `legacy` = written by a pre-shard version (no `shards=` line):
    * readable as one implicit shard, rebuilt by the next sync.
    */
  private case class Meta(nb: Int, bits: Int, shards: Int,
      data: Option[String], legacy: Boolean)

  private def renderMeta(nb: Int, bits: Int, shards: Int)(
      data: String): Seq[String] =
    Seq(s"nb=$nb", s"bits=$bits", s"shards=$shards", s"data=$data")

  private def readMeta(spark: SparkSession, dir: String): Option[Meta] =
    PointerDir.readMetaLines(spark, dir).map { lines =>
      val shards = lines.find(_.startsWith("shards="))
        .map(_.stripPrefix("shards=").toInt)
      Meta(PointerDir.metaField(lines, "nb").toInt,
        PointerDir.metaField(lines, "bits").toInt,
        shards.getOrElse(1),
        Some(PointerDir.metaField(lines, "data")).filter(_.nonEmpty),
        legacy = shards.isEmpty)
    }

  /** Sharded blooms over LIVE rows' values — the one aggregate every
    * build path shares: `(kb, shard, bloom)` where
    * `shard = hash mod shards` splits each bucket's values across
    * bounded-size filters. Null values don't insert (SQL `IN` never
    * matches null, so skipping them loses nothing and keeps the
    * filters tight).
    */
  private def bloomsOf(spark: SparkSession, df: DataFrame,
      column: String, bits: Int, shards: Int): DataFrame =
    df.filter(!TimeTravel.isTombstone)
      .filter(col(column).isNotNull)
      .withColumn("kb", col("kb").cast("int"))
      .withColumn("_ix_h",
        graft.functions.KmvSketch.md5Hash60(col(column)))
      .withColumn("shard", pmod(col("_ix_h"), lit(shards)).cast("int"))
      .groupBy("kb", "shard")
      .agg(graft.functions.BloomSketch.bloom(spark, col("_ix_h"), bits)
        .as("bloom"))

  /** Bloom sizing: ~10 bits per element at K=4 hashes ≈ 1% false
    * positives. Returns (bitsPerShard, shards): the total bit budget
    * is rows × 10; shards grow so no single filter exceeds
    * [[MaxShardBits]] — fpp holds at any rows/bucket, where a single
    * capped filter would silently saturate past ~1.6M rows/bucket.
    * Per-shard bits round up to a power of two, floored at 1 Ki.
    */
  private[graft] def autoSize(rowsPerBucket: Long,
      forcedShards: Int = 0): (Int, Int) = {
    val want = math.max(1024L, rowsPerBucket * 10L)
    val shards =
      if (forcedShards > 0) forcedShards
      else ((want + MaxShardBits - 1) / MaxShardBits).toInt
    val perShard = (want + shards - 1) / shards
    val capped = math.max(1024L, math.min(MaxShardBits.toLong, perShard))
    val bits = Integer.highestOneBit(capped.toInt) match {
      case p if p >= capped => p
      case p => p << 1
    }
    (bits, shards)
  }

  /** Parquet file count for a published sidecar of the given
    * dimensions — one file while small (the common case), sharded
    * across write tasks past [[TargetFileBytes]].
    */
  private[graft] def publishFiles(nb: Int, bits: Int, shards: Int): Int = {
    val est = nb.toLong * shards * (bits / 8L)
    math.min(1024L, math.max(1L,
      (est + TargetFileBytes - 1) / TargetFileBytes)).toInt
  }

  /** Attach a bloom index on `column`: full-build from the live
    * table; every later sync maintains it at delta cost. `numBits`
    * sizes EACH SHARD's filter and `numShards` the shards per bucket;
    * the default (0 = auto) measures the table and allocates ~10 bits
    * per live row (≈1% false positives at K=4 — an UNDERSIZED filter
    * silently degrades to a near-full scan: at 2M rows / 64 buckets a
    * fixed 2^16-bit filter measured 52% fpp, 32 of 64 buckets read
    * per probe), adding shards rather than letting any filter exceed
    * [[MaxShardBits]]. FPP only costs extra bucket reads, never wrong
    * rows, and the filters do not resize as the table grows —
    * re-attach (or rescale, which rebuilds) when rows/bucket has
    * grown well past the sizing.
    */
  def attach(spark: SparkSession, currentDir: String, column: String,
      numBits: Int = 0, numShards: Int = 0): Unit = {
    validColumn(column)
    require(numBits == 0 || (numBits >= 64 && numBits % 64 == 0),
      s"numBits must be 0 (auto) or a positive multiple of 64, " +
        s"got $numBits")
    require(numShards >= 0,
      s"numShards must be 0 (auto) or positive, got $numShards")
    val nb = graft.streaming.CurrentTable.bucketCount(spark, currentDir)
      .getOrElse(throw new IllegalStateException(
        s"no current table at $currentDir — sync it before indexing"))
    val dir = s"${indexRoot(currentDir)}/$column"
    val fs = new Path(dir)
      .getFileSystem(spark.sessionState.newHadoopConf())
    require(!fs.exists(PointerDir.metaFile(dir)),
      s"index on '$column' already attached at $dir — detach it first")
    val cfs = new Path(currentDir)
      .getFileSystem(spark.sessionState.newHadoopConf())
    require(cfs.listStatus(new Path(currentDir))
        .exists(_.getPath.getName.startsWith("kb=")),
      s"current table at $currentDir holds no data yet — sync data " +
        "before indexing")
    val live = graft.streaming.CurrentTable.read(spark, currentDir)
    require(live.columns.exists(_.equalsIgnoreCase(column)),
      s"index: column '$column' is not in the table schema " +
        s"(${live.columns.mkString(", ")})")
    val (bits, shards) =
      if (numBits > 0) (numBits, math.max(1, numShards))
      // auto: one count over the live table — attach is the one
      // full-build pass anyway, and a blind default measured 52% fpp
      else autoSize(live.count() / math.max(1, nb), numShards)
    PointerDir.publish(spark, dir,
      bloomsOf(spark, live, column, bits, shards),
      renderMeta(nb, bits, shards), publishFiles(nb, bits, shards))
  }

  def detach(spark: SparkSession, currentDir: String,
      column: String): Unit = {
    validColumn(column)
    val p = new Path(s"${indexRoot(currentDir)}/$column")
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    fs.delete(p, true)
  }

  /** Indexed column names — dirs with a PUBLISHED meta only, so a
    * crashed attach is invisible (and re-attachable) rather than a
    * permanently wedged entry the pipeline's attach-once check would
    * skip forever.
    */
  def list(spark: SparkSession, currentDir: String): Seq[String] =
    PointerDir.attached(spark, indexRoot(currentDir))

  /** The published bloom rows, shard column normalized (a legacy
    * sidecar's rows carry no `shard` — it has exactly one).
    */
  private def bloomFrame(spark: SparkSession, dir: String,
      data: String): DataFrame = {
    val df = spark.read.parquet(new Path(dir, data).toString)
    if (df.columns.contains("shard")) df
    else df.withColumn("shard", lit(0))
  }

  /** The snapshotted probe values as `(h, pshard)` — the same hash
    * and shard recipe the blooms were built with. `local` is a
    * driver-local relation, so this collapses driver-side.
    */
  private def probeHashes(local: DataFrame, column: String,
      shards: Int): DataFrame =
    // no distinct: duplicate probe values only cost redundant bloom
    // tests under the semi-join, and deduplicating here would buy a
    // shuffle stage per probe to save driver-bounded work
    local.select(graft.functions.KmvSketch
        .md5Hash60(col(column)).as("h"))
      .filter(col("h").isNotNull)
      .withColumn("pshard", pmod(col("h"), lit(shards)).cast("int"))

  /** Candidate bucket IDs as a frame — the CLUSTER-SIDE half of a
    * probe: the tiny probe-hash set broadcasts onto a distributed
    * scan of the bloom rows (shard-aligned, bloom-tested as the join
    * residual), and the output is `kb` ints ONLY. This is the frame
    * [[lookupBy]] collects: however large the sidecar grows, the
    * driver receives candidate bucket IDs, never bloom words
    * (plan-asserted in PlanAssertionsSpec).
    */
  private[graft] def candidateFrame(spark: SparkSession,
      blooms: DataFrame, hashes: DataFrame): DataFrame =
    blooms.join(broadcast(hashes),
        col("shard") === col("pshard") &&
          graft.functions.BloomSketch.contains(spark,
            col("bloom"), col("h")),
        "left_semi")
      // one output row per MATCHING (kb, shard) bloom row — at most
      // `shards` per bucket, deduped driver-side: a distinct here
      // would buy an exchange stage per probe to dedupe ints
      .select("kb")

  private def candidateBuckets(spark: SparkSession, blooms: DataFrame,
      local: DataFrame, column: String, shards: Int): Array[Int] =
    candidateFrame(spark, blooms,
      probeHashes(local, column, shards))
      .collect().map(_.getInt(0)).distinct.sorted

  /** Test seam: the EXACT candidate frame a [[lookupBy]] of `keys`
    * would collect — PlanAssertionsSpec pins that its output schema
    * is bucket ids only (no bloom words ever transit the driver) and
    * that the probe side broadcasts.
    */
  private[graft] def candidateFrameFor(spark: SparkSession,
      currentDir: String, column: String, keys: DataFrame): DataFrame = {
    val dir = s"${indexRoot(currentDir)}/$column"
    val meta = readMeta(spark, dir).getOrElse(
      throw new IllegalStateException(s"no index on '$column' at $dir"))
    val data = meta.data.getOrElse(throw new IllegalStateException(
      s"index on '$column' has no published data"))
    candidateFrame(spark, bloomFrame(spark, dir, data),
      probeHashes(keys, column, meta.shards))
  }

  /** The pruned read every probe path shares: candidate buckets
    * filtered to the healed listing (a candidate ABSENT from a
    * healthy listing is legitimate — a prune emptied the bucket and
    * the bloom is one publish stale), scanned with the given schema,
    * exact-filtered by semi-join. Returns live rows only.
    */
  private def readCandidates(spark: SparkSession, currentDir: String,
      existing: Set[String], candidates: Array[Int], local: DataFrame,
      column: String,
      schema: org.apache.spark.sql.types.StructType): DataFrame = {
    val dirs = candidates.map(b => s"kb=$b").filter(existing)
      .map(n => s"$currentDir/$n")
    if (dirs.isEmpty)
      spark.createDataFrame(
        java.util.Collections.emptyList[org.apache.spark.sql.Row](),
        schema).join(local, Seq(column), "left_semi")
    else spark.read.schema(schema).option("basePath", currentDir)
      .parquet(dirs.toIndexedSeq: _*)
      .filter(!TimeTravel.isTombstone)
      .join(local, Seq(column), "left_semi")
  }

  /** Live rows whose `column` equals any of `keys` (a frame with
    * exactly that one column — same probe contract as
    * `CurrentTable.lookup`), reading ONLY the buckets whose bloom
    * might contain one of the probed values. Exactness: the bloom
    * admits a superset of buckets (no false negatives by
    * construction) and the `IN` filter below is exact, so the result
    * equals the full-scan filter — the index only changes how many
    * buckets are read. Falls back to that full scan when the probe
    * exceeds the driver bound (`maxDriverKeys`, same resolution rule
    * as lookup) or when a rescale left the index keyed under a dead
    * modulus (served stale it would MISS rows; the next sync rebuilds
    * it) — the modulus is compared INSIDE the healed build, so a
    * rescale completing during the heal-grace wait re-plans rather
    * than probing buckets of a dead layout. See the class doc for
    * the swap-to-flip visibility window.
    */
  def lookupBy(spark: SparkSession, currentDir: String, column: String,
      keys: DataFrame, maxDriverKeys: Int = 0): DataFrame = {
    validColumn(column)
    require(keys.columns.toSeq.map(_.toLowerCase) == Seq(column.toLowerCase),
      s"lookupBy: keys frame must have exactly the indexed column " +
        s"'$column', got ${keys.columns.toSeq}")
    val dir = s"${indexRoot(currentDir)}/$column"
    val meta = readMeta(spark, dir).getOrElse(
      throw new IllegalStateException(
        s"no index on '$column' at $dir — attach it first"))
    val data = meta.data.getOrElse(throw new IllegalStateException(
      s"index on '$column' has no published data — detach and re-attach"))
    val maxKeys = graft.streaming.CurrentTable.resolveMaxKeys(
      spark, maxDriverKeys)
    val collected = keys.limit(maxKeys + 1).collect()
    // oversized probe: a full-table semi-join keeps the driver out of
    // the data path entirely (built on this branch only — the indexed
    // happy path must not pay read()'s full bucket listing per probe)
    if (collected.length > maxKeys)
      return graft.streaming.CurrentTable.read(spark, currentDir)
        .join(keys, Seq(keys.columns.head), "left_semi")
    val local = spark.createDataFrame(
      java.util.Arrays.asList(collected: _*), keys.schema)
    val cfs = new Path(currentDir)
      .getFileSystem(spark.sessionState.newHadoopConf())
    // healed-guarded like read/lookup: a candidate bucket mid-swap is
    // ABSENT from the listing — silently skipping it would return
    // incomplete rows, the exact failure requireHealed exists to
    // refuse. The MODULUS is read inside the same build: the heal
    // grace explicitly outwaits a running rescale, and comparing
    // meta.nb against a count read BEFORE that wait would satisfy the
    // check under the dead layout while the healed listing serves the
    // new one — candidate buckets planned under the old modulus would
    // silently miss rows (the in-healed read rawLookup documents).
    graft.streaming.CurrentTable.buildHealed(spark, cfs, currentDir) {
      val nb = graft.streaming.CurrentTable.bucketCount(spark, currentDir)
        .getOrElse(throw new IllegalStateException(
          s"no current table at $currentDir"))
      val existing = cfs.listStatus(new Path(currentDir))
        .map(_.getPath.getName).filter(_.startsWith("kb=")).toSet
      if (existing.isEmpty)
        throw new IllegalStateException(
          s"current table at $currentDir holds no data yet")
      // schema from ONE bucket footer, not a table-wide inference
      val schemaSrc = spark.read.option("basePath", currentDir)
        .parquet(s"$currentDir/${existing.head}")
      graft.streaming.CurrentTable.checkProbeTypes(keys.schema,
        schemaSrc.schema, Seq(column))
      if (meta.nb != nb) // rescaled; index awaits rebuild — exact scan
        spark.read.option("basePath", currentDir).parquet(currentDir)
          .filter(!TimeTravel.isTombstone)
          .join(local, Seq(keys.columns.head), "left_semi")
      else {
        val candidates = candidateBuckets(spark,
          bloomFrame(spark, dir, data), local, column, meta.shards)
        readCandidates(spark, currentDir, existing, candidates, local,
          keys.columns.head, schemaSrc.schema)
      }
    }
  }

  /** A PREPARED handle for repeated probes of one index — the serving
    * pattern ([[graft.streaming.CurrentTable.reader]]'s analog for
    * secondary lookups): each [[lookupBy]] re-pays per-call costs
    * that don't change between calls — the orphan check, the root
    * and index-meta reads, the bucket listing, a footer open, and
    * above all a fresh scan of the bloom sidecar. The handle pins the
    * bloom frame in executor storage (memory-and-disk — the sidecar
    * can reach GBs at its largest sizing) and revalidates per call
    * with TWO small reads: the table root (every data mutation
    * rewrites it with a fresh `#seq`) and the index meta (every sync
    * flips its data pointer). Either changing re-prepares in full.
    * Call [[IndexReader.close]] when done to release the pinned frame.
    */
  def reader(spark: SparkSession, currentDir: String,
      column: String): IndexReader =
    new IndexReader(spark, currentDir, column)

  /** See [[BucketIndex.reader]]. Rescale-staleness per call: a
    * modulus mismatch at prepare time serves the exact full scan
    * (like [[lookupBy]]) until a sync rebuilds the index and flips
    * its meta — which the per-call signature check picks up. Same
    * census requirement as `CurrentTable.Reader`: the root-content
    * staleness signature only works on tables whose folds rewrite
    * the root. One handle per serving thread: concurrent lookups
    * racing a re-prepare could each pin a bloom frame and strand one
    * until [[close]] (results stay correct — only storage leaks).
    */
  final class IndexReader private[BucketIndex](spark: SparkSession,
      currentDir: String, column: String) {
    validColumn(column)
    private val dir = s"${indexRoot(currentDir)}/$column"
    private val fs = new Path(currentDir)
      .getFileSystem(spark.sessionState.newHadoopConf())

    private case class Prep(sig: Vector[String], metaSig: Vector[String],
        nb: Int, meta: Meta, blooms: Option[DataFrame],
        existing: Set[String],
        schema: org.apache.spark.sql.types.StructType)
    @volatile private var prep: Prep = prepare(None)

    private def sigs(): (Vector[String], Vector[String]) = {
      val root = graft.streaming.CurrentTable.rootSignature(spark,
        currentDir)
      val meta = PointerDir.readMetaLines(spark, dir).getOrElse(
        throw new IllegalStateException(
          s"no index on '$column' at $dir — attach it first"))
      (root, meta)
    }

    private def prepare(old: Option[Prep]): Prep = {
      old.foreach(_.blooms.foreach(_.unpersist()))
      graft.streaming.CurrentTable.requireHealedFor(spark, fs, currentDir)
      // signatures FIRST: a mutation landing during the reads below
      // changes one of them, so the next call re-prepares rather than
      // trusting a torn snapshot
      val (sig, metaSig) = sigs()
      val nb = graft.streaming.CurrentTable.readerBucketCount(spark,
        currentDir, "index reader")
      val meta = readMeta(spark, dir).getOrElse(
        throw new IllegalStateException(
          s"no index on '$column' at $dir — attach it first"))
      val existing = fs.listStatus(new Path(currentDir))
        .map(_.getPath.getName).filter(_.startsWith("kb=")).toSet
      if (existing.isEmpty)
        throw new IllegalStateException(
          s"current table at $currentDir holds no data yet")
      val schema = spark.read.option("basePath", currentDir)
        .parquet(s"$currentDir/${existing.head}").schema
      require(schema.fields.exists(_.name.equalsIgnoreCase(column)),
        s"index reader: column '$column' is not in the table schema")
      // a rescale-stale index serves full scans until rebuilt — don't
      // pin a bloom frame that can't be probed
      val blooms =
        if (meta.nb != nb) None
        else meta.data.map { d =>
          val f = bloomFrame(spark, dir, d)
            .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
          f.count() // materialize now, not on the first probe's clock
          f
        }
      Prep(sig, metaSig, nb, meta, blooms, existing, schema)
    }

    /** Same rows as `BucketIndex.lookupBy(spark, dir, column, keys)`
      * — spec-pinned — at a fraction of the per-call cost.
      */
    def lookup(keys: DataFrame, maxDriverKeys: Int = 0): DataFrame = {
      require(keys.columns.toSeq.map(_.toLowerCase)
          == Seq(column.toLowerCase),
        s"lookup: keys frame must have exactly the indexed column " +
          s"'$column', got ${keys.columns.toSeq}")
      // a rescale's swap window is the one mutation the signatures
      // cannot see (root and meta rewrite only at roll-forward /
      // rebuild): refuse-or-outwait via the marker, like lookupBy's
      // healed build
      graft.streaming.CurrentTable.outwaitRescale(spark, fs, currentDir)
      val cached = prep
      val p = {
        val (s, m) = sigs()
        if (s == cached.sig && m == cached.metaSig) cached
        else { val n = prepare(Some(cached)); prep = n; n }
      }
      graft.streaming.CurrentTable.checkProbeTypes(keys.schema,
        p.schema, Seq(column))
      val maxKeys = graft.streaming.CurrentTable.resolveMaxKeys(
        spark, maxDriverKeys)
      val collected = keys.limit(maxKeys + 1).collect()
      if (collected.length > maxKeys)
        return graft.streaming.CurrentTable.read(spark, currentDir)
          .join(keys, Seq(keys.columns.head), "left_semi")
      val local = spark.createDataFrame(
        java.util.Arrays.asList(collected: _*), keys.schema)
      p.blooms match {
        case None => // rescale-stale (or crashed attach): exact scan
          spark.read.schema(p.schema).option("basePath", currentDir)
            .parquet(currentDir)
            .filter(!TimeTravel.isTombstone)
            .join(local, Seq(keys.columns.head), "left_semi")
        case Some(blooms) =>
          val candidates = candidateBuckets(spark, blooms, local,
            column, p.meta.shards)
          readCandidates(spark, currentDir, p.existing, candidates,
            local, keys.columns.head, p.schema)
      }
    }

    /** Release the pinned bloom frame. The handle stays usable — the
      * next call re-prepares.
      */
    def close(): Unit = prep.blooms.foreach(_.unpersist())
  }

  /** Sync-side maintenance, two-phase around the bucket swap exactly
    * like [[RollupTable.prepareSync]]: touched buckets' blooms
    * recompute from the staged fold NOW (the swap deletes the stage);
    * the pointer flip runs after the swap. Modulus mismatch (a
    * rescale landed since the last sync) — or a legacy pre-shard
    * sidecar — rebuilds the whole index from untouched live buckets +
    * the stage: one table-sized read, once per rescale (or upgrade),
    * the cost the rescale itself already paid.
    */
  private[graft] def prepareSync(spark: SparkSession, currentDir: String,
      nb: Int, touched: Seq[Int], stageDf: DataFrame): () => Unit = {
    val cols = list(spark, currentDir)
    if (cols.isEmpty) return () => ()
    val touchedSet = touched.toSet
    val publishes = cols.flatMap { column =>
      val dir = s"${indexRoot(currentDir)}/$column"
      readMeta(spark, dir).map { meta =>
        require(stageDf.columns.exists(_.equalsIgnoreCase(column)),
          s"index: column '$column' is not in the sink schema " +
            s"(${stageDf.columns.mkString(", ")}) — detach the index " +
            "or fix the sink")
        // legacy sidecars rebuild (their rows carry no shard column,
        // so the incremental union would mix two layouts)
        val oldData = if (meta.legacy) None else meta.data
        val blooms = PointerDir.mergeBucketed(spark, currentDir, dir,
          nb, meta.nb, oldData, touchedSet,
          bloomsOf(spark, stageDf, column, meta.bits, meta.shards),
          bloomsOf(spark, _, column, meta.bits, meta.shards))
        PointerDir.stage(spark, dir, blooms,
          renderMeta(nb, meta.bits, meta.shards),
          publishFiles(nb, meta.bits, meta.shards))
      }
    }
    () => publishes.foreach(_.apply())
  }
}
