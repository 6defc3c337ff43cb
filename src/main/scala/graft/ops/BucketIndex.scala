package graft.ops

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Secondary (non-key) point-lookup indexes over a
  * [[graft.streaming.CurrentTable]]: one Bloom filter PER KEY BUCKET
  * over a declared column's live values, maintained by every sync
  * from the staged files its fold just produced — the same
  * recompute-from-state discipline as the tombstone census and
  * [[RollupTable]] partials, so crash replay converges with no
  * transactional pairing.
  *
  * Why: the current table's layout prunes by PRIMARY key only — a
  * lookup on any other column scans every bucket. A 100 TB table at
  * 4096 buckets answers "which rows have email = X" by reading 25 GB
  * per bucket × 4096; with a per-bucket bloom the driver tests X
  * against ≤ 4096 bitsets (a few KB each, one tiny parquet read) and
  * scans only the buckets that MIGHT hold it — for a selective value
  * that is one or two buckets plus false positives (~fpp × buckets).
  * Blooms never produce false negatives, and the exact `IN` filter
  * runs on the scanned rows anyway, so false positives cost reads,
  * never wrong rows — the Hudi/Iceberg bloom-index shape, applied to
  * the bucket grain this table maintains.
  *
  * Layout under `<currentDir>/_index/<column>/`: `_meta.txt` (bucket
  * modulus, bloom bits, data pointer — atomic flip via [[PointerDir]])
  * and `d_<nonce>/` parquet rows `(kb, bloom)`. Maintenance rides
  * [[graft.streaming.CurrentTable.sync]]: touched buckets' blooms
  * recompute from the staged fold (a bloom cannot "remove" a value,
  * so recompute — not delta-update — is also the only way a DELETE
  * or UPDATE-away ever tightens the filter).
  *
  * A [[graft.streaming.CurrentTable.rescale]] re-keys every bucket,
  * and unlike rollup partials a bloom keyed under a dead modulus
  * CANNOT serve (bucket 3-of-4 and 3-of-9 hold different keys — a
  * stale index would produce false NEGATIVES, i.e. missing rows).
  * [[lookupBy]] detects the mismatch and falls back to the exact
  * full scan until the next sync rebuilds the index under the new
  * modulus.
  */
object BucketIndex {

  private def indexRoot(currentDir: String) = s"$currentDir/_index"

  private[graft] def validColumn(c: String): Unit =
    PointerDir.validSegment("index column", c)

  private case class Meta(nb: Int, bits: Int, data: Option[String])

  private def renderMeta(nb: Int, bits: Int)(data: String): Seq[String] =
    Seq(s"nb=$nb", s"bits=$bits", s"data=$data")

  private def readMeta(spark: SparkSession, dir: String): Option[Meta] =
    PointerDir.readMetaLines(spark, dir).map { lines =>
      Meta(PointerDir.metaField(lines, "nb").toInt,
        PointerDir.metaField(lines, "bits").toInt,
        Some(PointerDir.metaField(lines, "data")).filter(_.nonEmpty))
    }

  /** One bloom per bucket over LIVE rows' values — the one aggregate
    * every build path shares. Null values don't insert (SQL `IN`
    * never matches null, so skipping them loses nothing and keeps
    * the filter tight).
    */
  private def bloomsOf(spark: SparkSession, df: DataFrame,
      column: String, bits: Int): DataFrame =
    df.filter(!TimeTravel.isTombstone)
      .filter(col(column).isNotNull)
      .withColumn("kb", col("kb").cast("int"))
      .groupBy("kb")
      .agg(graft.functions.BloomSketch.bloom(spark,
        graft.functions.KmvSketch.md5Hash60(col(column)), bits)
        .as("bloom"))

  /** Bloom sizing: ~10 bits per element at K=4 hashes ≈ 1% false
    * positives; rounded up to a power of two, floored at 1 Ki bits
    * (tiny tables), capped at 2^24 (2 MB per bucket — past that the
    * operator should rescale rather than fatten filters).
    */
  private[graft] def autoBits(rowsPerBucket: Long): Int = {
    val want = math.max(1024L, math.min(1L << 24, rowsPerBucket * 10L))
    Integer.highestOneBit(want.toInt) match {
      case p if p >= want => p
      case p => p << 1
    }
  }

  /** Attach a bloom index on `column`: full-build from the live
    * table; every later sync maintains it at delta cost. `numBits`
    * sizes EACH bucket's filter; the default (0 = auto) measures the
    * table and allocates ~10 bits per live row per bucket (≈1% false
    * positives at K=4 — an UNDERSIZED filter silently degrades to a
    * near-full scan: at 2M rows / 64 buckets a fixed 2^16-bit filter
    * measured 52% fpp, 32 of 64 buckets read per probe). FPP only
    * costs extra bucket reads, never wrong rows, and the filter does
    * not resize as the table grows — re-attach (or rescale, which
    * rebuilds) when rows/bucket has grown well past the sizing.
    */
  def attach(spark: SparkSession, currentDir: String, column: String,
      numBits: Int = 0): Unit = {
    validColumn(column)
    require(numBits == 0 || (numBits >= 64 && numBits % 64 == 0),
      s"numBits must be 0 (auto) or a positive multiple of 64, " +
        s"got $numBits")
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
    val bits =
      if (numBits > 0) numBits
      // auto: one count over the live table — attach is the one
      // full-build pass anyway, and a blind default measured 52% fpp
      else autoBits(live.count() / math.max(1, nb))
    PointerDir.publish(spark, dir,
      bloomsOf(spark, live, column, bits), renderMeta(nb, bits))
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
    * it).
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
    // the fallback (table scan + semi-join) is built only on the
    // branches that need it: the indexed happy path must not pay
    // CurrentTable.read's full bucket listing per probe
    def fullScan(): DataFrame =
      graft.streaming.CurrentTable.read(spark, currentDir)
        .join(keys, Seq(keys.columns.head), "left_semi")
    val nb = graft.streaming.CurrentTable.bucketCount(spark, currentDir)
      .getOrElse(throw new IllegalStateException(
        s"no current table at $currentDir"))
    val data = meta.data.getOrElse(throw new IllegalStateException(
      s"index on '$column' has no published data — detach and re-attach"))
    if (meta.nb != nb) return fullScan() // rescaled; index awaits rebuild
    val maxKeys = graft.streaming.CurrentTable.resolveMaxKeys(
      spark, maxDriverKeys)
    val collected = keys.limit(maxKeys + 1).collect()
    if (collected.length > maxKeys) return fullScan()
    val local = spark.createDataFrame(
      java.util.Arrays.asList(collected: _*), keys.schema)
    // probe hashes via the SAME column recipe the blooms were built
    // with; a local relation, so this collapses driver-side
    val hashes = local.select(graft.functions.KmvSketch
        .md5Hash60(col(keys.columns.head)).as("h"))
      .filter(col("h").isNotNull)
      .distinct().collect().map(_.getLong(0))
    // the index itself: ≤ buckets rows of (kb, bloom words)
    val blooms = spark.read.parquet(new Path(dir, data).toString)
      .collect().map(r => r.getInt(0) ->
        new org.apache.spark.sql.catalyst.util.GenericArrayData(
          r.getSeq[Long](1).toArray))
    val candidates = blooms.collect {
      case (kb, grid) if hashes.exists(
        graft.functions.BloomSketch.mightContain(grid, _)) => kb
    }.sorted
    val cfs = new Path(currentDir)
      .getFileSystem(spark.sessionState.newHadoopConf())
    // healed-guarded like read/lookup: a candidate bucket mid-swap is
    // ABSENT from the listing — silently skipping it would return
    // incomplete rows, the exact failure requireHealed exists to
    // refuse (an absent candidate on a HEALTHY table is legitimate:
    // a prune emptied the bucket, and the bloom is one publish stale)
    graft.streaming.CurrentTable.buildHealed(spark, cfs, currentDir) {
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
      val dirs = candidates.map(b => s"kb=$b").filter(existing)
        .map(n => s"$currentDir/$n")
      if (dirs.isEmpty)
        schemaSrc.limit(0).join(local, Seq(keys.columns.head), "left_semi")
      else spark.read.option("basePath", currentDir)
        .parquet(dirs.toIndexedSeq: _*)
        .filter(!TimeTravel.isTombstone)
        .join(local, Seq(keys.columns.head), "left_semi")
    }
  }

  /** Sync-side maintenance, two-phase around the bucket swap exactly
    * like [[RollupTable.prepareSync]]: touched buckets' blooms
    * recompute from the staged fold NOW (the swap deletes the stage);
    * the pointer flip runs after the swap. Modulus mismatch (a
    * rescale landed since the last sync) rebuilds the whole index
    * from untouched live buckets + the stage — one table-sized read,
    * once per rescale, the cost the rescale itself already paid.
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
        val blooms = PointerDir.mergeBucketed(spark, currentDir, dir,
          nb, meta.nb, meta.data, touchedSet,
          bloomsOf(spark, stageDf, column, meta.bits),
          bloomsOf(spark, _, column, meta.bits))
        PointerDir.stage(spark, dir, blooms, renderMeta(nb, meta.bits))
      }
    }
    () => publishes.foreach(_.apply())
  }
}
