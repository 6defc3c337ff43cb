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
  *   - The sidecar is a GROUPED manifest: buckets hash into
  *     ~[[TargetGroupBytes]]-sized groups (`grp = kb mod groups`),
  *     each group's bloom rows in their own parquet dir, the meta
  *     listing one pointer per group. A sync rewrites ONLY the
  *     touched buckets' groups and carries the rest forward by
  *     pointer — per-sync maintenance IO is O(touched groups), not
  *     O(sidecar) (a 120 GB sidecar at the 100 TB sizing would
  *     otherwise be re-read and re-written by every sync), and the
  *     write parallelism is one task per touched group, never one
  *     funnel task.
  *   - Repeated probes (the serving pattern) use a prepared
  *     [[reader]] that pins the bloom frame in executor storage and
  *     revalidates per call with two small meta reads, instead of
  *     re-reading the sidecar per probe.
  *
  * Layout under `<currentDir>/_index/<column>/`:
  * {{{
  *   _meta.txt          nb=…, bits=…, shards=…, groups=G,
  *                      g<g>=d_<nonce>   (one per NON-EMPTY group;
  *                      written atomically LAST — the flip)
  *   d_<nonce>/grp=<g>/ the bloom rows (kb, shard, bloom) of the
  *                      groups that publish wrote; untouched groups
  *                      keep pointing at the dirs of earlier
  *                      publishes
  * }}}
  * GC after each flip deletes `d_` dirs referenced by neither the
  * new manifest nor the immediately-previous one (a reader that
  * resolved pointers just before the flip keeps reading intact files
  * through one concurrent publish — the PointerDir contract).
  * Maintenance rides [[graft.streaming.CurrentTable.sync]]: touched
  * buckets' blooms recompute from the staged fold (a bloom cannot
  * "remove" a value, so recompute — not delta-update — is also the
  * only way a DELETE or UPDATE-away ever tightens the filter). A
  * sidecar written by a pre-group version (single `data=` pointer,
  * and possibly no `shards=`) stays readable and is rebuilt into the
  * current layout by the next sync — one table-sized read, once, the
  * rescale-rebuild cost class.
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

  /** Target bytes per bucket-group — the unit of incremental
    * maintenance IO and of write parallelism. Groups are capped at
    * [[MaxGroups]], so extremely large sidecars get proportionally
    * larger groups rather than an unbounded manifest.
    */
  private[graft] val TargetGroupBytes: Long = 128L * 1024 * 1024
  private[graft] val MaxGroups: Int = 1024

  /** `legacy` = written by a pre-group version (single `data=`
    * pointer; the r13 format additionally lacks `shards=` — its rows
    * carry no shard column, normalized at read): readable as-is,
    * rebuilt into the grouped layout by the next sync. `sizing` records the attach
    * intent — "auto" (bits and shards both measured), "auto-bits"
    * (shards forced, bits measured) or "fixed" (bits forced) — so a
    * rescale rebuild re-measures exactly what the attach measured; a
    * missing `sizing=` line reads as fixed — never silently resize an
    * index whose intent is unknown.
    */
  private case class Meta(nb: Int, bits: Int, shards: Int, groups: Int,
      pointers: Map[Int, String], legacyData: Option[String],
      legacy: Boolean, sizing: String) {
    /** The parquet paths holding the bloom rows — empty only for a
      * grouped manifest over a table with zero live indexed values.
      */
    def dataPaths(dir: String): Seq[String] =
      if (legacy)
        legacyData.map(d => s"$dir/$d").toSeq
      else pointers.toSeq.sortBy(_._1)
        .map { case (g, d) => s"$dir/$d/grp=$g" }
  }

  private def renderMeta(nb: Int, bits: Int, shards: Int, groups: Int,
      sizing: String, pointers: Map[Int, String]): Seq[String] =
    Seq(s"nb=$nb", s"bits=$bits", s"shards=$shards", s"groups=$groups",
      s"sizing=$sizing") ++
      pointers.toSeq.sortBy(_._1).map { case (g, d) => s"g$g=$d" }

  private def readMeta(spark: SparkSession, dir: String): Option[Meta] =
    PointerDir.readMetaLines(spark, dir).map { lines =>
      def opt(k: String): Option[String] =
        lines.find(_.startsWith(k + "=")).map(_.drop(k.length + 1))
      val shards = opt("shards")
      val groups = opt("groups")
      val pointers = lines.collect {
        case l if l.startsWith("g") && l.takeWhile(_ != '=').drop(1)
            .forall(_.isDigit) && l.contains('=') && l(1).isDigit =>
          val Array(g, d) = l.split("=", 2)
          g.drop(1).toInt -> d
      }.toMap
      Meta(PointerDir.metaField(lines, "nb").toInt,
        PointerDir.metaField(lines, "bits").toInt,
        shards.map(_.toInt).getOrElse(1),
        groups.map(_.toInt).getOrElse(1),
        pointers,
        opt("data").filter(_.nonEmpty),
        legacy = groups.isEmpty,
        sizing = opt("sizing").getOrElse("fixed"))
    }

  /** Sharded blooms over LIVE rows' values — the one aggregate every
    * build path shares: `(kb, shard, bloom, nrows)` where
    * `shard = hash mod shards` splits each bucket's values across
    * bounded-size filters and `nrows` counts the rows the filter was
    * built from — the sidecar carries its own load measurement, so
    * [[capacityAdvice]] reads per-bucket live counts from two pruned
    * sidecar columns instead of re-scanning the table. Null values
    * don't insert (SQL `IN` never matches null, so skipping them
    * loses nothing and keeps the filters tight).
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
        .as("bloom"),
        count(lit(1)).as("nrows"))

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
    // a FORCED shard count that cannot hold ~10 bits/row under the
    // per-shard cap degrades fpp silently — the one sizing failure
    // auto mode exists to prevent, so it at least gets a log line
    // naming the fix (more shards, or full-auto)
    if (perShard > MaxShardBits)
      org.slf4j.LoggerFactory.getLogger(getClass).warn(
        s"bloom sizing: $rowsPerBucket rows/bucket over $shards " +
          s"shard(s) wants $perShard bits/shard but the cap is " +
          s"$MaxShardBits — false positives will exceed the ~1% " +
          "target; raise numShards (or use full-auto sizing)")
    val capped = math.max(1024L, math.min(MaxShardBits.toLong, perShard))
    val bits = Integer.highestOneBit(capped.toInt) match {
      case p if p >= capped => p
      case p => p << 1
    }
    (bits, shards)
  }

  /** The rows/bucket statistic auto-sizing designs for: the
    * p99-by-rank of the per-bucket counts, NOT the global average — a
    * key-skewed table's hot bucket would get under-sized filters under
    * the average and degrade toward every-probe candidacy exactly on
    * the bucket most probes light up (one bucket at 10× the average
    * measured ~25% fpp under average sizing vs ~1% under p99). The
    * p99 bound is the other half of the trade: ≤1% of buckets may
    * exceed the sizing and degrade GRACEFULLY (extra candidate reads,
    * never wrong rows), which keeps one pathological mega-bucket from
    * inflating every bucket's filters by the skew ratio. Below 100
    * buckets the p99 rank IS the max (at exactly 100 it is the
    * second-largest — one bucket may exceed, consistent with the
    * ≤1% bound). [[capacityAdvice]] measures
    * with the same statistic, so a stable outlier above the p99 can
    * never advise a re-attach that re-attaching would not fix.
    */
  private[graft] def sizingRows(perBucket: Seq[Long]): Long =
    if (perBucket.isEmpty) 0L
    else {
      val sorted = perBucket.sorted
      sorted(math.max(0, math.ceil(sorted.size * 0.99).toInt - 1))
    }

  /** Per-bucket counts of the rows that actually insert into the
    * filters (live, non-null indexed value) — ≤ nb rows to the
    * driver, the input to [[sizingRows]].
    */
  private def perBucketCounts(df: DataFrame, column: String): Seq[Long] =
    df.filter(!TimeTravel.isTombstone)
      .filter(col(column).isNotNull)
      .groupBy(col("kb").cast("int"))
      .count()
      .collect().map(_.getLong(1)).toIndexedSeq

  /** Bucket-group count for the manifest: enough ~128 MB groups to
    * hold the sidecar (1 while small — the common case), capped at
    * [[MaxGroups]].
    */
  private[graft] def autoGroups(nb: Int, bits: Int, shards: Int): Int = {
    val est = nb.toLong * shards * (bits / 8L)
    math.min(MaxGroups.toLong, math.max(1L,
      (est + TargetGroupBytes - 1) / TargetGroupBytes)).toInt
  }

  /** Write `rows` (the TOUCHED groups' new bloom rows) as one
    * `d_<nonce>` partitioned by `grp = kb mod groups` NOW; return the
    * FLIP: meta rewrite pointing touched groups at the new dir —
    * groups the write produced no rows for are dropped (their buckets
    * hold no live values) — carrying `carry`'s untouched pointers
    * forward, then GC at `(d_ dir, grp=)` granularity of every pair
    * referenced by neither the new nor the immediately-previous
    * manifest.
    */
  private def stageGrouped(spark: SparkSession, dir: String, nb: Int,
      bits: Int, shards: Int, groups: Int, sizing: String,
      rows: DataFrame, writeTasks: Int,
      carry: Map[Int, String]): () => Unit = {
    val dataName = s"d_${java.util.UUID.randomUUID()}"
    rows.withColumn("grp", pmod(col("kb"), lit(groups)).cast("int"))
      .repartition(math.max(1, math.min(MaxGroups, writeTasks)),
        col("grp"))
      .write.partitionBy("grp")
      .mode(org.apache.spark.sql.SaveMode.Overwrite)
      .parquet(new Path(dir, dataName).toString)
    () => {
      val fs = new Path(dir)
        .getFileSystem(spark.sessionState.newHadoopConf())
      val written = fs.listStatus(new Path(dir, dataName))
        .filter(_.isDirectory).map(_.getPath.getName)
        .filter(_.startsWith("grp="))
        .map(n => n.stripPrefix("grp=").toInt -> dataName).toMap
      val pointers = carry ++ written
      // previous generation read NOW (pre-flip) for the one-publish
      // reader-retention contract — at (dir, grp=) grain: one dir can
      // serve some groups for the new manifest, others for only the
      // previous one, and hold dead bytes for groups re-pointed two
      // publishes ago
      val prevMeta = readMeta(spark, dir)
      val prevPairs: Set[(String, Int)] = prevMeta
        .map(_.pointers.iterator.map { case (g, d) => (d, g) }.toSet)
        .getOrElse(Set.empty)
      // legacy single-pointer dirs have no grp= structure: keep whole
      val legacyKeep: Set[String] = prevMeta.flatMap(_.legacyData).toSet
      PointerDir.writeMetaLines(spark, dir,
        renderMeta(nb, bits, shards, groups, sizing, pointers))
      // GC at pair granularity: whole-dir GC alone would strand a
      // re-pointed group's bytes inside a dir another group still
      // references — forever, if that other group is never touched
      // again (worst case ~2× live sidecar bytes of dead data, ~120 GB
      // at the 100 TB sizing). The immediately-previous manifest's
      // pairs survive this publish (a reader that resolved pointers
      // just before the flip keeps reading intact files — the
      // PointerDir contract); everything older is dead.
      val keepPairs: Set[(String, Int)] = prevPairs ++
        pointers.iterator.map { case (g, d) => (d, g) }
      val keepDirs: Set[String] = keepPairs.map(_._1)
      for (st <- fs.listStatus(new Path(dir))
          if st.isDirectory && st.getPath.getName.startsWith("d_")) {
        val name = st.getPath.getName
        if (!legacyKeep(name)) {
          if (!keepDirs(name))
            // no group references any of the dir's bytes (includes a
            // just-written dir whose every group produced zero rows)
            fs.delete(st.getPath, true)
          else for (c <- fs.listStatus(st.getPath)
              if c.isDirectory && c.getPath.getName.startsWith("grp=")) {
            val g = c.getPath.getName.stripPrefix("grp=").toInt
            if (!keepPairs((name, g))) fs.delete(c.getPath, true)
          }
        }
      }
    }
  }

  /** Attach a bloom index on `column`: full-build from the live
    * table; every later sync maintains it at delta cost. `numBits`
    * sizes EACH SHARD's filter and `numShards` the shards per bucket;
    * the default (0 = auto) measures the table and allocates ~10 bits
    * per row of the p99 per-bucket live count (≈1% false positives at
    * K=4 even on the hot bucket of a key-skewed table — an UNDERSIZED
    * filter silently degrades to a near-full scan: at 2M rows / 64
    * buckets a fixed 2^16-bit filter measured 52% fpp, 32 of 64
    * buckets read per probe), adding shards rather than letting any
    * filter exceed [[MaxShardBits]]. `numGroups` (0 = auto) sets the
    * manifest's bucket-group count — the unit of per-sync maintenance
    * IO; auto targets ~128 MB per group. FPP only costs extra bucket
    * reads, never wrong rows, and the filters do not resize as the
    * table grows — re-attach (or rescale, which rebuilds) when
    * rows/bucket has grown well past the sizing; [[capacityAdvice]]
    * measures exactly that from the sidecar's own counts, and the
    * pipeline writes its machine-readable `reattach-index` record on
    * full syncs.
    */
  def attach(spark: SparkSession, currentDir: String, column: String,
      numBits: Int = 0, numShards: Int = 0, numGroups: Int = 0): Unit = {
    validColumn(column)
    require(numBits == 0 || (numBits >= 64 && numBits % 64 == 0),
      s"numBits must be 0 (auto) or a positive multiple of 64, " +
        s"got $numBits")
    require(numShards >= 0,
      s"numShards must be 0 (auto) or positive, got $numShards")
    require(numGroups >= 0 && numGroups <= MaxGroups,
      s"numGroups must be 0 (auto) or in [1, $MaxGroups], got $numGroups")
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
      // auto: one per-bucket count over the live table (≤ nb rows to
      // the driver) — attach is the one full-build pass anyway, and a
      // blind default measured 52% fpp. Sized from the p99 per-bucket
      // count, not the average: a key-skewed table's hot bucket under
      // average sizing degrades to near-every-probe candidacy exactly
      // where probes concentrate ([[sizingRows]]).
      else autoSize(sizingRows(perBucketCounts(live, column)), numShards)
    val groups =
      if (numGroups > 0) numGroups else autoGroups(nb, bits, shards)
    stageGrouped(spark, dir, nb, bits, shards, groups,
      // intent for later rescale rebuilds: what was measured here
      // gets re-measured there (forced numbers are kept verbatim)
      sizing = if (numBits > 0) "fixed"
        else if (numShards > 0) "auto-bits" else "auto",
      bloomsOf(spark, live, column, bits, shards),
      writeTasks = groups, carry = Map.empty)()
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

  /** The published bloom rows, shard column normalized (an r13
    * pre-shard sidecar's rows carry no `shard` — it has exactly one).
    * None ⇔ the manifest points at nothing: zero live indexed values,
    * zero candidates everywhere.
    */
  private def bloomFrame(spark: SparkSession, dir: String,
      meta: Meta): Option[DataFrame] = {
    val paths = meta.dataPaths(dir)
    if (paths.isEmpty) None
    else {
      val df = spark.read.parquet(paths: _*)
      Some(if (df.columns.contains("shard")) df
        else df.withColumn("shard", lit(0)))
    }
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
    * (plan-asserted in PlanAssertionsSpec). Driver bound: ≤ one int
    * per MATCHING (bucket, shard) row — worst case (a wide probe
    * lighting up every shard) buckets × shards ints, i.e. tens of MB
    * at the 100 TB sizing, against the ~120 GB the r13 driver-side
    * design pulled for the same probe.
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

  private def candidateBuckets(spark: SparkSession,
      blooms: Option[DataFrame], local: DataFrame, column: String,
      shards: Int): Array[Int] = blooms match {
    case None => Array.empty
    case Some(b) =>
      candidateFrame(spark, b, probeHashes(local, column, shards))
        .collect().map(_.getInt(0)).distinct.sorted
  }

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
    val blooms = bloomFrame(spark, dir, meta).getOrElse(
      throw new IllegalStateException(
        s"index on '$column' holds no data"))
    candidateFrame(spark, blooms, probeHashes(keys, column, meta.shards))
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
      graft.streaming.CurrentTable.emptyTable(spark, schema)
        .join(local, Seq(column), "left_semi")
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
    if (meta.legacy && meta.legacyData.isEmpty)
      throw new IllegalStateException(
        s"index on '$column' has no published data — detach and re-attach")
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
      val existing = graft.streaming.CurrentTable.listBuckets(
        cfs, currentDir)
      if (existing.isEmpty) {
        // zero buckets: the fully-deleted-then-pruned table (a
        // designed layout state — CurrentTable.readRaw's rationale);
        // an indexed lookup on it is an ordinary miss, served typed
        // from the recorded root schema. EXPRESSION-shaped, never an
        // early `return`: a non-local return would unwind straight
        // out of buildHealed and skip its post-build re-check — the
        // guard that keeps a live swap's all-in-trash window loud.
        // Like rawLookup's zero-bucket branch this trusts the BARE
        // listing plus that post-check (one pre/post pair per call),
        // not confirmedBuckets' re-list loop — the prepared readers'
        // stronger guard is bought once per handle, too expensive to
        // re-buy on every per-lookup call
        val sch = graft.streaming.CurrentTable
          .rootSchema(spark, currentDir)
          .getOrElse(graft.streaming.CurrentTable
            .refuseNoData(spark, cfs, currentDir))
        graft.streaming.CurrentTable.checkProbeTypes(keys.schema,
          sch, Seq(column))
        graft.streaming.CurrentTable.emptyTable(spark, sch)
      } else {
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
            bloomFrame(spark, dir, meta), local, column, meta.shards)
          readCandidates(spark, currentDir, existing, candidates, local,
            keys.columns.head, schemaSrc.schema)
        }
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
    * flips its group pointers). Either changing re-prepares in full.
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

    /** `degraded` = rescale-stale (serve exact scans until rebuilt);
      * `blooms` None while healthy = zero live indexed values.
      */
    private case class Prep(sig: Vector[String], metaSig: Vector[String],
        nb: Int, meta: Meta, blooms: Option[DataFrame],
        degraded: Boolean, existing: Set[String],
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
      // same broken-index guard as lookupBy: a legacy meta with an
      // empty data pointer must fail loudly, not read as "zero live
      // indexed values" and silently serve empty results forever
      if (meta.legacy && meta.legacyData.isEmpty)
        throw new IllegalStateException(s"index on '$column' has no " +
          "published data — detach and re-attach")
      // zero buckets: prepare against the recorded root schema (the
      // fully-deleted-then-pruned state); the root signature
      // re-prepares the moment a repopulating fold lands, and
      // confirmedBuckets keeps a live swap's all-in-trash window
      // LOUD instead of silently preparing an empty handle
      val existing = graft.streaming.CurrentTable.confirmedBuckets(
        spark, fs, currentDir)
      val schema =
        if (existing.isEmpty)
          graft.streaming.CurrentTable.rootSchema(spark, currentDir)
            .getOrElse(graft.streaming.CurrentTable
              .refuseNoData(spark, fs, currentDir))
        else spark.read.option("basePath", currentDir)
          .parquet(s"$currentDir/${existing.head}").schema
      require(schema.fields.exists(_.name.equalsIgnoreCase(column)),
        s"index reader: column '$column' is not in the table schema")
      val degraded = meta.nb != nb
      // a rescale-stale index serves full scans until rebuilt — don't
      // pin a bloom frame that can't be probed
      val blooms =
        if (degraded) None
        else bloomFrame(spark, dir, meta).map { f =>
          val p = f.persist(
            org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
          p.count() // materialize now, not on the first probe's clock
          p
        }
      Prep(sig, metaSig, nb, meta, blooms, degraded, existing, schema)
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
        // cached == null after close(): the pinned frame was released,
        // so matching signatures must NOT shortcut to a prep whose
        // bloom frame would silently re-scan parquet on every probe
        if (cached != null && s == cached.sig && m == cached.metaSig)
          cached
        else { val n = prepare(Option(cached)); prep = n; n }
      }
      graft.streaming.CurrentTable.checkProbeTypes(keys.schema,
        p.schema, Seq(column))
      val maxKeys = graft.streaming.CurrentTable.resolveMaxKeys(
        spark, maxDriverKeys)
      val collected = keys.limit(maxKeys + 1).collect()
      // oversized probe: full-table semi-join — built from the
      // prep's cached listing and schema (CurrentTable.read here
      // would re-pay the full bucket listing and a footer-open
      // schema inference per probe, the exact per-call costs the
      // handle exists to avoid)
      if (collected.length > maxKeys) return exactScan(p, keys)
      val local = spark.createDataFrame(
        java.util.Arrays.asList(collected: _*), keys.schema)
      if (p.degraded) // rescale-stale: exact scan until rebuilt
        exactScan(p, local)
      else {
        val candidates = candidateBuckets(spark, p.blooms, local,
          column, p.meta.shards)
        readCandidates(spark, currentDir, p.existing, candidates,
          local, keys.columns.head, p.schema)
      }
    }

    /** The exact full-table semi-join BOTH non-indexed paths share
      * (rescale-degraded and oversized-probe): built from the prep's
      * cached listing and schema — never a fresh listing or a footer
      * open per call. The bloom-free scan admits every bucket, the
      * semi-join is exact, so rows equal the indexed path's.
      */
    private def exactScan(p: Prep, probe: DataFrame): DataFrame =
      if (p.existing.isEmpty)
        graft.streaming.CurrentTable.emptyTable(spark, p.schema)
      else spark.read.schema(p.schema).option("basePath", currentDir)
        .parquet(p.existing.toSeq.sorted
          .map(n => s"$currentDir/$n"): _*)
        .filter(!TimeTravel.isTombstone)
        .join(probe, Seq(probe.columns.head), "left_semi")

    /** Release the pinned bloom frame. The handle stays usable — the
      * next call re-prepares (the cached prep is invalidated too, or
      * unchanged signatures would keep serving through the released
      * frame, re-scanning the sidecar per probe).
      */
    def close(): Unit = {
      val c = prep
      prep = null
      if (c != null) c.blooms.foreach(_.unpersist())
    }
  }

  /** Sync-side maintenance, two-phase around the bucket swap exactly
    * like [[RollupTable.prepareSync]]: touched buckets' GROUPS
    * recompute from the old group dirs minus the touched buckets plus
    * the staged fold's fresh blooms, written NOW (the swap deletes the
    * stage); untouched groups carry forward BY POINTER — zero IO; the
    * meta flip runs after the swap. Per-sync cost is O(touched
    * groups' bytes + delta), never O(sidecar). Modulus mismatch (a
    * rescale landed since the last sync) — or a legacy pre-group
    * sidecar — rebuilds the whole index from untouched live buckets +
    * the stage: one table-sized read, once per rescale (or upgrade),
    * the cost the rescale itself already paid; the rebuild re-sizes
    * the group count for the new modulus (never below the attach-time
    * choice).
    */
  private[graft] def prepareSync(spark: SparkSession, currentDir: String,
      nb: Int, touched: Seq[Int], stageDf: DataFrame): () => Unit = {
    val cols = list(spark, currentDir)
    if (cols.isEmpty) return () => ()
    val touchedSet = touched.toSet
    val publishes = cols.flatMap { column =>
      val dir = s"${indexRoot(currentDir)}/$column"
      readMeta(spark, dir).flatMap { meta =>
        require(stageDf.columns.exists(_.equalsIgnoreCase(column)),
          s"index: column '$column' is not in the sink schema " +
            s"(${stageDf.columns.mkString(", ")}) — detach the index " +
            "or fix the sink")
        if (meta.legacy || meta.nb != nb)
          // rebuild — reachable even on a zero-touched sync: a dead
          // modulus (or a legacy layout) must not outlive "the next
          // sync rebuilds" just because the batch folded nothing
          Some(rebuildColumn(spark, currentDir, dir, column, meta, nb,
            touchedSet, Some(stageDf)))
        else if (touched.isEmpty)
          // healthy index, zero touched buckets (a batch of zero-row
          // files) changed no bloom: publishing would re-point groups
          // at byte-identical data
          None
        else {
          val fresh = bloomsOf(spark, stageDf, column, meta.bits,
            meta.shards)
          // incremental: read ONLY the touched groups' old rows,
          // drop the touched buckets' among them, add the fresh ones.
          // Old rows read under the fresh frame's EXPLICIT schema
          // (nullable — a pre-r15 group's rows carry no nrows and
          // must read as null, not as an inference coin-flip over
          // mixed-generation footers)
          val touchedGroups = touchedSet.map(b => b % meta.groups)
          val oldPaths = touchedGroups.toSeq.sorted.flatMap(g =>
            meta.pointers.get(g).map(d => s"$dir/$d/grp=$g"))
          val rows =
            if (oldPaths.isEmpty) fresh
            else spark.read
              .schema(org.apache.spark.sql.types.StructType(
                fresh.schema.fields.map(_.copy(nullable = true))))
              .parquet(oldPaths: _*)
              .filter(!col("kb").isin(touchedSet.toSeq: _*))
              .unionByName(fresh)
          Some(stageGrouped(spark, dir, nb, meta.bits, meta.shards,
            meta.groups, meta.sizing, rows,
            writeTasks = touchedGroups.size,
            carry = meta.pointers.filter(kv => !touchedGroups(kv._1))))
        }
      }
    }
    () => publishes.foreach(_.apply())
  }

  /** The full-rebuild unit both [[prepareSync]] (rescale-stale or
    * legacy meta, delta in hand) and [[rebuildStale]] (zero-delta
    * sync, no stage) share: blooms recomputed from the untouched live
    * buckets plus the staged fold, one table-sized read — the
    * rescale's (or legacy upgrade's) own cost class, paid once.
    */
  private def rebuildColumn(spark: SparkSession, currentDir: String,
      dir: String, column: String, meta: Meta, nb: Int,
      touchedSet: Set[Int], stage: Option[DataFrame]): () => Unit = {
    val cfs = new Path(currentDir)
      .getFileSystem(spark.sessionState.newHadoopConf())
    val untouched = cfs.listStatus(new Path(currentDir)).toSeq
      .map(_.getPath.getName)
      .filter(n => n.startsWith("kb=") &&
        !touchedSet(n.stripPrefix("kb=").toInt))
      .map(n => s"$currentDir/$n")
    def untouchedDf = spark.read.option("basePath", currentDir)
      .parquet(untouched: _*)
    val live: Option[DataFrame] = (untouched.nonEmpty, stage) match {
      // no buckets and no stage: nothing to size or bloom from — keep
      // the stale meta (lookups already serve the exact full scan of
      // an essentially-empty table; the next data-bearing sync
      // rebuilds)
      case (false, None) => None
      case (false, Some(s)) => Some(s)
      case (true, None) => Some(untouchedDf)
      case (true, Some(s)) => Some(untouchedDf.unionByName(s))
    }
    live match {
      case None => () => ()
      case Some(df) =>
        // AUTO-sized indexes re-measure here: rows/bucket changed
        // with the modulus, and keeping the old per-bucket capacity
        // across a shrink-rescale would silently saturate the
        // filters (the attach doc promises rescale re-sizes). The
        // per-bucket count pass is column-pruned — cheap next to the
        // bloom aggregation that follows over the same frames — and
        // uses the same p99 statistic the attach used.
        val (bits, shards) = meta.sizing match {
          case s @ ("auto" | "auto-bits") =>
            // auto-bits: the operator's shard count is kept, only
            // the per-shard bits re-measure
            autoSize(sizingRows(perBucketCounts(df, column)),
              if (s == "auto-bits") meta.shards else 0)
          // "fixed", a missing line, AND any unrecognized value (a
          // future version's mode, a hand edit): never silently
          // resize an index whose intent this binary can't read
          case _ => (meta.bits, meta.shards)
        }
        val groups = math.max(meta.groups, autoGroups(nb, bits, shards))
        stageGrouped(spark, dir, nb, bits, shards, groups, meta.sizing,
          bloomsOf(spark, df, column, bits, shards),
          writeTasks = groups, carry = Map.empty)
    }
  }

  /** Rebuild any attached index left stale by a rescale (or a legacy
    * pre-group layout) on a sync that FOLDED NOTHING: the zero-delta
    * early returns in [[graft.streaming.CurrentTable.sync]] never
    * reach [[prepareSync]], so without this hook a run of empty
    * batches after a rescale would keep every lookup on the exact
    * full-scan fallback indefinitely — correct rows, prune lost —
    * despite the class doc's "the next sync rebuilds". Publishes
    * immediately: with nothing folded there is no bucket swap to
    * defer the flip past. No-op (two small meta reads per index) when
    * every sidecar is healthy.
    */
  private[graft] def rebuildStale(spark: SparkSession,
      currentDir: String, nb: Int): Unit =
    for (column <- list(spark, currentDir)) {
      val dir = s"${indexRoot(currentDir)}/$column"
      for (meta <- readMeta(spark, dir)
          if meta.legacy || meta.nb != nb)
        rebuildColumn(spark, currentDir, dir, column, meta, nb,
          Set.empty, None)()
    }

  /** Sizing-health measurement behind the pipeline's
    * `"advice":"reattach-index"` record: filters do NOT resize as the
    * table grows (only a rescale rebuild re-measures), so a table
    * that grew well past its attach-time sizing quietly degrades
    * toward every-bucket candidacy — the runbook's "re-attach when
    * rows/bucket has grown well past the sizing", measured instead of
    * manual. Per-bucket live counts come from the sidecar's OWN
    * `nrows` column (each publish's bloom rows carry the count they
    * were built from — zero table reads; the scan below is pruned to
    * two int/long sidecar columns), compared with the same p99
    * statistic the sizing used, so a stable hot outlier above the p99
    * can never advise a re-attach that re-attaching would not fix.
    * Returns Some when implied bits/row fell below `minBitsPerRow`
    * (default 5 — half the ~10-bit design point, ≈5–10% fpp and
    * worsening — `reason = "outgrown"`); None while healthy or while
    * awaiting the rescale rebuild that re-measures anyway.
    *
    * Buckets whose sidecar rows predate the counts (pre-`nrows`
    * publishes) are UNKNOWN — they regain counts as syncs touch them,
    * and the recently-touched are typically the hottest, so a p99
    * over a known MINORITY would be hot-biased (it could advise a
    * re-attach an unrepresentative subset suggested). The measured
    * verdict therefore requires counts on more than half the buckets
    * holding sidecar rows; below that, Some with
    * `reason = "counts-unknown"` — the one table shape the advisory
    * would otherwise be permanently blind to is a pre-upgrade sidecar
    * on a table that grew and then went append-quiet, and "re-attach
    * to measure" IS the remedy there (the re-attach both re-sizes and
    * stamps every bucket's count). In the counts-unknown case
    * `sizingRowsPerBucket`/`bitsPerRow` report the known subset
    * (zero/0.0 when none) — context, not the trigger.
    *
    * `approxLiveRows` is the size signal for ordering the work: a
    * fleet upgrade emits one counts-unknown advisory per
    * pre-measurement sidecar at once, and a cron acting on them needs
    * the big tables first. Known buckets contribute their exact live
    * counts, unknown buckets the known average; −1 when no bucket has
    * a count at all (an estimate from nothing would order by noise —
    * treat those as unknown-size, not as empty).
    */
  case class CapacityStats(column: String, bits: Int, shards: Int,
      sizingRowsPerBucket: Long, bitsPerRow: Double, knownBuckets: Int,
      unknownBuckets: Int, approxLiveRows: Long, reason: String,
      call: String)

  def capacityAdvice(spark: SparkSession, currentDir: String,
      column: String, minBitsPerRow: Double = 5.0): Option[CapacityStats] = {
    validColumn(column)
    require(minBitsPerRow > 0,
      s"minBitsPerRow must be positive, got $minBitsPerRow")
    val dir = s"${indexRoot(currentDir)}/$column"
    readMeta(spark, dir).flatMap { meta =>
      val nb = graft.streaming.CurrentTable.bucketCount(spark, currentDir)
      if (meta.legacy || !nb.contains(meta.nb)) None
      else {
        val paths = meta.dataPaths(dir)
        if (paths.isEmpty) None // zero live indexed values
        else {
          val perBucket = spark.read
            .schema(org.apache.spark.sql.types.StructType(Seq(
              org.apache.spark.sql.types.StructField("kb",
                org.apache.spark.sql.types.IntegerType),
              org.apache.spark.sql.types.StructField("nrows",
                org.apache.spark.sql.types.LongType))))
            .parquet(paths: _*)
            .groupBy("kb")
            .agg(sum("nrows").as("rows"),
              count(when(col("nrows").isNull, 1)).as("unknown"))
            .collect()
          // a bucket with any count-less (pre-nrows) rows is unknown,
          // not zero — measuring it would under-count
          val counts = perBucket
            .filter(r => r.getLong(2) == 0L && !r.isNullAt(1))
            .map(_.getLong(1)).toIndexedSeq
          val unknown = perBucket.length - counts.size
          val call =
            s"""BucketIndex.detach(spark, "$currentDir", "$column"); """ +
              s"""BucketIndex.attach(spark, "$currentDir", "$column")"""
          val rows = sizingRows(counts)
          val bitsPerRow =
            if (rows > 0) meta.bits.toDouble * meta.shards / rows else 0.0
          // SIZE signal for cron ordering (same two-column sidecar
          // scan): a fleet upgrade emits one counts-unknown advisory
          // per pre-measurement sidecar, and without a magnitude the
          // operator can't put the big tables first. Known buckets
          // contribute their exact live counts; unknown buckets the
          // known average (−1 when NO bucket has a count — an
          // estimate from nothing would order the queue by noise)
          val approxLiveRows =
            if (counts.isEmpty) -1L
            else math.round(
              counts.sum.toDouble / counts.size * perBucket.length)
          if (unknown > 0 && unknown >= counts.size)
            // known minority: the p99 would be hot-biased, and a
            // grown-then-static pre-upgrade table would otherwise
            // never be measured at all — advise the measuring
            // re-attach instead of a biased verdict or silence
            Some(CapacityStats(column, meta.bits, meta.shards, rows,
              bitsPerRow, counts.size, unknown, approxLiveRows,
              "counts-unknown", call))
          else if (rows <= 0 || bitsPerRow >= minBitsPerRow) None
          else Some(CapacityStats(column, meta.bits, meta.shards,
            rows, bitsPerRow, counts.size, unknown, approxLiveRows,
            "outgrown", call))
        }
      }
    }
  }
}
