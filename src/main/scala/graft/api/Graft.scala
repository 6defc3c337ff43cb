package graft.api

import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** The library surface for users bringing their OWN DataFrames.
  *
  * Every entry point is a thin delegation to (or tiny composition
  * of) the engine's parameterized kernels — the `qNN` queries in
  * `SparkEntry` are the oracle-checked demonstrations of the SAME
  * kernels over the driver's test tables, so nothing here can drift
  * from what the correctness gate checks. Components that are
  * already public APIs are linked rather than wrapped:
  *
  *  - CDC ingestion: [[graft.streaming.CdcPipeline]] /
  *    [[graft.streaming.CdcMain]] (config-file entry)
  *  - streaming event-time ops: [[graft.streaming.EventTimeOps]]
  *  - change-feed materialization + SCD2:
  *    [[graft.streaming.Materialize]]
  *  - skew tooling: [[graft.ops.SkewJoin]]
  *  - durable maintained indexes (build/delta/probe-or-search/
  *    compact): [[graft.ops.NeardupIndex]] (MinHash bands),
  *    [[graft.ops.AnnIndex]] (IVF postings; hybrid `searchWhere`,
  *    `trainCodebook`), [[graft.ops.TextIndex]] (inverted BM25
  *    postings — [[bm25]] without scanning the corpus per query)
  *  - layout + file skipping: [[graft.ops.ZOrder]] (write layout),
  *    [[graft.ops.ZoneMaps]] (min/max + bloom manifests,
  *    pruned/conjunction/point reads)
  *  - time travel over the CDC sink: [[graft.ops.TimeTravel]]
  *    (asOf / currentState)
  *  - copy-on-write current-state TABLE, incrementally synced from
  *    the sink: [[graft.streaming.CurrentTable]]
  *  - incremental aggregate views:
  *    [[graft.streaming.Materialize.aggDeltas]]
  *  - media decode/features: [[graft.multimodal.Multimodal]]
  *  - native SQL functions for plain-SQL sessions:
  *    [[graft.GraftExtensions]]
  */
object Graft {

  /** Register every sink table of `sourceId` under `sinkRoot` as a
    * SQL temp view named `<db>__<table>` (the sink dir name minus
    * the `{sourceId}_` prefix), so a plain-SQL session queries the
    * whole CDC lake by name. A table with a maintained `._zonemaps`
    * manifest beside it registers through the planner-integrated
    * [[graft.ops.ZoneMapTable]] — its filters skip files with no
    * caller cooperation; a maintained current table (a `__current`
    * sibling with a `_synced.txt` cursor) registers through
    * [[graft.streaming.CurrentTable.read]] so SQL users see live
    * keys only (tombstones filtered, partial tables refused); plain
    * tables register as plain parquet. Bookkeeping (`_checkpoints`,
    * manifests, staging dirs) never registers. A table whose read
    * REFUSES (a crashed bucket swap awaiting `CurrentTable.heal`) is
    * skipped with a warning instead of aborting the rest of the
    * lake — its view is never registered, so querying it stays a
    * loud TABLE_NOT_FOUND, and its evolution forks' `__all` view is
    * withheld with it. Returns the view names actually registered,
    * sorted.
    *
    * Views snapshot the file listing at registration (Spark's normal
    * FileIndex behavior) — re-register after heavy ingestion, or for
    * always-current reads use the streaming path.
    */
  /** EVERY view (base tables included, beside their rollup + `__all`
    * derivatives) registered by the LAST [[registerSinkTables]] call,
    * per (session, root, source) — swept at the start of the next
    * call, so a rollup detached, a fork whose base turned unhealthy,
    * or a base table whose DIRECTORY was deleted since then (simply
    * absent from the listing — not refused) fails TABLE_NOT_FOUND
    * instead of serving a stale snapshot (for a vanished base, one
    * that would only fail later, at scan time, on missing files).
    * Scoped to names THIS api registered: a user's own temp views —
    * whatever they're named — are never touched, and no catalog
    * listing is ever needed. WeakHashMap on the session: entries die
    * with it (a per-request-session server never accumulates), and a
    * recycled identity hash can never hand one session's name list to
    * another.
    */
  private val registryViews: java.util.Map[SparkSession,
      scala.collection.concurrent.TrieMap[(String, String), Seq[String]]] =
    java.util.Collections.synchronizedMap(
      new java.util.WeakHashMap())

  def registerSinkTables(spark: SparkSession, sinkRoot: String,
      sourceId: String): Seq[String] = {
    val root = new org.apache.hadoop.fs.Path(sinkRoot)
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    val prefix = s"${sourceId}_"
    val names = fs.listStatus(root).toSeq
      .filter(_.isDirectory)
      .map(_.getPath.getName)
      .filter(n => n.startsWith(prefix) && !n.startsWith("_") &&
        !n.startsWith(".") && !n.contains("._"))
      .sorted
    // sweep the PREVIOUS call's views up front — before any base
    // table can refuse: a crashed-swap table must take its rollup
    // views down WITH its base view, not leave them serving
    // pre-crash partials while the base fails loudly; a base whose
    // directory VANISHED from the listing must be gone, not serving
    // its old file snapshot. Base views still listed are NOT swept:
    // they re-register atomically below (createOrReplaceTempView),
    // so a healthy table has no dropped-view window for concurrent
    // SQL, and a mid-call abort can never leave a healthy base
    // deregistered. The key is the CANONICAL root path ("/lake" and
    // "/lake/" are one lake — a spelling difference must not skip
    // the sweep).
    val sessionViews = registryViews.computeIfAbsent(spark,
      _ => scala.collection.concurrent.TrieMap.empty)
    val registryKey = (root.toString, sourceId)
    val baseNames = names.map(_.stripPrefix(prefix)).toSet
    val (kept, sweep) = sessionViews.getOrElse(registryKey, Nil)
      .partition(baseNames)
    for (v <- sweep) spark.catalog.dropTempView(v)
    // every view as it lands (base, rollup, __all), recorded even on
    // a mid-call failure (finally below): a view registered before a
    // later table threw must still be sweepable by the NEXT call, or
    // it would serve stale forever. ONE buffer — it is both the
    // registry record and the returned names.
    val recorded = scala.collection.mutable.ArrayBuffer.empty[String]
    try {
    val registered = names.filter { n =>
      val dir = s"$sinkRoot/$n"
      val manifest = s"$dir._zonemaps"
      try {
        val df =
          // a maintained current table (the `__current` sibling the
          // pipeline keeps beside its sink) must register through
          // CurrentTable.read — a plain parquet view would expose the
          // stored DELETE tombstone rows as live data to SQL users,
          // and would silently serve a table with a crashed bucket
          // swap instead of refusing
          if (fs.exists(new org.apache.hadoop.fs.Path(s"$dir/_synced.txt")))
            graft.streaming.CurrentTable.read(spark, dir)
          else if (fs.exists(new org.apache.hadoop.fs.Path(manifest)))
            graft.ops.ZoneMapTable(spark, dir, manifest)
          else spark.read.parquet(dir)
        df.createOrReplaceTempView(n.stripPrefix(prefix))
        recorded += n.stripPrefix(prefix)
        // a current table's maintained rollups are SQL tables too:
        // `<view>__<rollup>` serves the partials-merge read — the
        // O(groups) dashboard path — instead of making SQL users
        // re-aggregate the table the rollup exists to avoid. Each
        // rollup registers in ITS OWN guard: one corrupted rollup
        // meta must not take down its healthy base table's view (or
        // the rest of the lake) — it is skipped with a warning and
        // stays a loud TABLE_NOT_FOUND
        if (fs.exists(new org.apache.hadoop.fs.Path(s"$dir/_synced.txt"))) {
          val rel = n.stripPrefix(prefix)
          for (r <- graft.ops.RollupTable.list(spark, dir)) {
            val vn = s"${rel}__$r"
            try {
              graft.ops.RollupTable.read(spark, dir, r)
                .createOrReplaceTempView(vn)
              recorded += vn
            } catch {
              case scala.util.control.NonFatal(e) =>
                org.slf4j.LoggerFactory.getLogger(getClass).warn(
                  s"skipping rollup view $vn — ${e.getMessage}")
                spark.catalog.dropTempView(vn)
            }
          }
        }
        true
      } catch {
        // one table mid-crashed-swap must not take the whole lake's
        // SQL surface down: skip it (its view is never registered —
        // and a STALE view from an earlier registration is dropped,
        // so a query against it fails TABLE_NOT_FOUND rather than
        // silently serving an old snapshot), register everything
        // healthy, and name the heal lever here
        case e: IllegalStateException =>
          org.slf4j.LoggerFactory.getLogger(getClass).warn(
            s"skipping view for $n — ${e.getMessage}")
          spark.catalog.dropTempView(n.stripPrefix(prefix))
          // the base view was dropped; rollup views that landed
          // before the throw stay recorded — they are live temp
          // views the next call's sweep must still take down
          recorded -= n.stripPrefix(prefix)
          false
      }
    }.toSet
    // evolution forks get a LOGICAL view too: for every dated
    // `<base>_vYYYYMMDD` dir, `<base>__all` is the name-aligned union
    // across the fork ([[graft.ops.EvolvedRead]]) — SQL users read one
    // table whatever schema era a row landed in
    names.filter(registered)
      .flatMap { n =>
        "_v\\d{8}$".r.findFirstIn(n).map(_ => n.replaceAll("_v\\d{8}$", ""))
      }
      .distinct.filter(registered) // base must exist to anchor it
      .foreach { base =>
        val rel = base.stripPrefix(prefix)
        rel.split("__", 2) match {
          case Array(db, table) =>
            graft.ops.EvolvedRead.readAll(spark, sinkRoot, sourceId,
              db, table).createOrReplaceTempView(s"${rel}__all")
            recorded += s"${rel}__all"
          case _ => ()
        }
      }
    recorded.sorted.toSeq
    // kept (unswept) base views stay recorded even when an abort
    // stopped the call before re-registering them — they are live
    // temp views a later sweep must still be able to take down; a
    // kept name whose view was refused-and-dropped this call is a
    // harmless extra (sweeping a nonexistent temp view is a no-op)
    } finally sessionViews(registryKey) =
      (recorded ++ kept).distinct.toSeq
  }

  /** MinHash LSH band buckets `(doc_id, band, bucket)` for any
    * `(doc_id: BIGINT, text: STRING)` frame — batch or streaming
    * (every stage is a projection). This IS the banding scheme the
    * oracle-checked q37/q38 pipeline and the streaming gate use.
    */
  def minhashBands(spark: SparkSession, docs: DataFrame): DataFrame =
    graft.queries.TextQueries.docBands(spark, docs)

  /** Symmetric near-dup candidate pairs `(d1, d2)` (d1 < d2) for any
    * `(doc_id, text)` frame: band-bucket equality join over
    * [[minhashBands]] — shuffle keyed by bucket, never all-pairs.
    * Verify candidates with exact Jaccard (q39 shape) before acting.
    */
  def nearDupCandidates(spark: SparkSession, docs: DataFrame): DataFrame =
    graft.queries.TextQueries.candidatesFromBands(minhashBands(spark, docs))

  /** Asymmetric probe of a NEW batch against a stored band index
    * (the q102 / steady-state shape): `index` is the distinct
    * `(band, bucket)` frame persisted with the corpus; cost ∝ batch.
    */
  def nearDupProbe(spark: SparkSession, newDocs: DataFrame,
      index: DataFrame): DataFrame =
    graft.streaming.EventTimeOps.nearDupGate(spark, newDocs, index)

  /** Benchmark decontamination (the q74 kernel) over caller-supplied
    * `(doc_id, text)` frames: flags every train doc sharing an
    * n-token gram with the benchmark set. The benchmark gram set is
    * broadcast only while provably small
    * ([[graft.ops.Probes.broadcastIfSmall]]); an oversized benchmark
    * falls back to a shuffled gram join — same result, no driver OOM.
    */
  def decontaminate(train: DataFrame, benchmark: DataFrame, n: Int = 8,
      maxBroadcastRows: Long = graft.ops.Probes.DefaultMaxRows): DataFrame =
    graft.queries.TextQueries.decontaminateDocs(train, benchmark, n,
      maxBroadcastRows)

  /** Duplicate clusters `(doc_id, cluster)` from candidate pairs —
    * distributed min-label propagation ([[graft.ops.DupClusters]]).
    */
  def dupClusters(pairs: DataFrame): DataFrame =
    graft.ops.DupClusters.clusters(pairs)

  /** Bounded per-key top-k as an aggregate Column — the k smallest
    * (priority, id) rows per group, ascending; ≤ k rows per key per
    * task cross the shuffle ([[graft.functions.TopKAgg]]).
    */
  def topK(spark: SparkSession, priority: Column, id: Column,
      k: Int): Column =
    graft.functions.TopKAgg.topk(spark, priority, id, k)

  /** KMV distinct-count sketch over [[hash60]]-hashed keys —
    * deterministic, mergeable, exact below k
    * ([[graft.functions.KmvSketch]]).
    */
  def approxDistinct(spark: SparkSession, hash: Column,
      k: Int = 256): Column =
    graft.functions.KmvSketch.kmvDistinct(spark, hash, k)

  /** The shared 60-bit md5 hash recipe the sketches expect. */
  def hash60(c: Column): Column = graft.functions.KmvSketch.md5Hash60(c)

  /** Bloom bitset aggregate over [[hash60]] hashes + its membership
    * probe — the runtime-filter pair ([[graft.functions.BloomSketch]]).
    */
  def bloom(spark: SparkSession, hash: Column, numBits: Int): Column =
    graft.functions.BloomSketch.bloom(spark, hash, numBits)
  def bloomContains(spark: SparkSession, grid: Column,
      hash: Column): Column =
    graft.functions.BloomSketch.contains(spark, grid, hash)

  /** Salted join for skewed keys — result-identical to a plain join,
    * hot keys spread over (key, salt) tasks ([[graft.ops.SkewJoin]]).
    */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
      saltBuckets: Int = 8): DataFrame =
    graft.ops.SkewJoin.saltedJoin(big, small, key, saltBuckets)

  /** Write a frame as a bucketed, bucket-sorted parquet table at
    * `path` — the co-located join layout SCALE.md's join analysis
    * prescribes: two tables bucketed on the same key with the same
    * bucket count join with ZERO exchange (each bucket pair joins in
    * place; GraftApiSpec asserts the exchange-free plan), so a
    * repeatedly-joined 100 TB fact pays its shuffle once at write
    * time instead of per query.
    *
    * `mode` defaults to Overwrite, which REPLACES any existing
    * catalog table of the same name — including one registered at a
    * different path. Pass `SaveMode.ErrorIfExists` to refuse instead
    * when the table name may already be taken.
    */
  def writeBucketed(df: DataFrame, table: String, path: String,
      key: String, buckets: Int,
      mode: SaveMode = SaveMode.Overwrite): Unit =
    df.write.bucketBy(buckets, key).sortBy(key)
      .option("path", path)
      .format("parquet").mode(mode).saveAsTable(table)

  /** BM25 lexical retrieval scores for caller-supplied `(doc_id,
    * text)` docs against query `terms` — the q111 kernel: map-only
    * per-doc term frequencies, one broadcast stats row, rational
    * Robertson IDF (deterministic, no transcendentals). Returns
    * `(doc_id, bm25)` for docs matching ≥1 term; rank/limit yourself.
    * `docs` must be deterministic across evaluations (the stats row
    * and the scoring each read it once) — persist a nondeterministic
    * frame (unseeded sample, rand() filter) before passing it.
    */
  def bm25(docs: DataFrame, terms: Seq[String], k1: Double = 1.2,
      b: Double = 0.75): DataFrame =
    graft.queries.TextQueries.bm25Docs(docs, terms, k1, b)

  /** The documented top-k path over [[bm25]]: `(rank, doc_id, bm25)`
    * for the k highest-scoring docs, ranked descending with
    * ascending-doc_id ties — routed through the bounded-heap
    * [[topK]] aggregate, NOT a window: each map task reduces to a
    * ≤k-row heap and only heaps cross the shuffle, where a
    * `row_number()` window would sort every scored doc in one task
    * (GraftApiSpec asserts the window-free plan). The score is
    * encoded for the heap as a fixed-width decimal complement —
    * exact at bm25's 6-decimal rounding for any score below 10^18,
    * far above what the formula can produce on real corpora.
    */
  def bm25TopK(spark: SparkSession, docs: DataFrame, terms: Seq[String],
      k: Int, k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    // the Okapi domain: outside it (b > 1 on short docs) the tf
    // denominator — and so the score — can go NEGATIVE, which would
    // overflow the fixed-width complement encoding below (lpad would
    // TRUNCATE the extra digit and corrupt the ordering silently)
    require(k1 >= 0 && b >= 0 && b <= 1,
      s"bm25TopK needs k1 >= 0 and b in [0, 1], got k1=$k1 b=$b")
    val cap = new java.math.BigDecimal("999999999999999999.999999")
    // descending numeric order as ASCENDING fixed-width string order:
    // complement against the cap, zero-pad to the cap's width —
    // byte-lexicographic on the result == numeric descending
    val pr = lpad((lit(cap) - col("bm25").cast(DecimalType(24, 6)))
      .cast("string"), 25, "0")
    bm25(docs, terms, k1, b)
      .agg(topK(spark, pr, col("doc_id"), k).as("t"))
      .select(posexplode(col("t")).as(Seq("pos", "r")))
      .select((col("pos") + 1).as("rank"), col("r.id").as("doc_id"),
        (lit(cap) - col("r.pr").cast(DecimalType(25, 6)))
          .cast(DoubleType).as("bm25"))
  }

  /** Sequence packing with a per-(source, shard) token budget — the
    * q101/q110 kernel ([[graft.ops.Packing.packBins]]): window
    * partitions hold ~`shardTokens` in expectation regardless of
    * source skew (hashed shard assignment; the bound is statistical,
    * so size the budget with headroom).
    */
  def packBins(docs: DataFrame, ctx: Int,
      shardTokens: Long = Long.MaxValue): DataFrame =
    graft.ops.Packing.packBins(docs, ctx, shardTokens)

  /** Z-order the frame for writing: range-partitioned and sorted by
    * the Morton interleave of two pre-bucketed dimensions, so every
    * output file is bounded in BOTH — zone maps prune on either
    * predicate ([[graft.ops.ZOrder]]; q81 audits the tightness).
    */
  def zorderLayout(df: DataFrame, x: Column, y: Column, bits: Int = 8,
      partitions: Int = 200): DataFrame =
    graft.ops.ZOrder.layout(df, x, y, bits, partitions)

  /** Int8 scalar quantization over any `(vec_id, e: ARRAY<DOUBLE>)`
    * frame: per-dimension [min, max] learned from the corpus
    * (order-free partials), codes + dequantized reconstructions via
    * the native codec kernels. Returns
    * (vec_id, e, mns, mxs, q, de) — store `q` (4× smaller) and the
    * broadcastable stats; scan `de` for retrieval (q91 audits the
    * recall cost of doing so).
    */
  def int8Codec(spark: SparkSession, embeddings: DataFrame): DataFrame =
    graft.queries.VectorQueries.quantCodesOf(spark, embeddings)

  /** A maintained index's measured sizing verdict: the load stats it
    * was measured from and the recommendation — BOTH typed per index
    * family (the IVF advice is a centroid count; the text index's is
    * a [[graft.ops.TextIndex.Rebuild]], fanout AND skew floor — an
    * Int here would lose the floor for every consumer that doesn't
    * parse the call string, silently reopening the grow↔shrink
    * oscillation the floor closes) — and the exact maintenance call
    * to run at a window: the shape an operator cron consumes (same
    * discipline as the pipeline's `reattach-index` status record:
    * act on the LATEST measurement, one job per subject, not per
    * record).
    *
    * Compatibility note: this type was `IndexHealth[S]` (with an Int
    * recommendation) before the text index's typed
    * [[graft.ops.TextIndex.Rebuild]] forced the second parameter — a
    * SOURCE-BREAKING change for external consumers, taken deliberately
    * while
    * the library is pre-release rather than kept alive as a deprecated
    * single-param alias that would silently drop the skew floor.
    */
  case class IndexHealth[S, R](stats: S, recommended: R, call: String)

  /** One-call serving-health check for a maintained IVF vector index
    * ([[graft.ops.AnnIndex]]) — the cron entry that makes the
    * advisory usable without knowing the measurement internals:
    * `loadStats` (one cid-pruned pass; plus, ONLY when the same-k
    * rebalance arm could fire at this target, the bounded
    * coincidence-veto pass over the tied p99 cells) fed to
    * `retrainAdvice` (2×
    * hysteresis; a recommendation EQUAL to the current k means
    * "retrain at the same k to rebalance" — k-means splits dense
    * regions where re-hashing spreads nothing). None = healthy, do
    * nothing. Some = run the returned call's retrain+build into a
    * FRESH dir and swap readers; check [[annIndexCompactHealth]]
    * first — it MEASURES whether generations piled up, and advice a
    * compact would clear is not a retrain signal — or call
    * [[annIndexMaintenance]], which encodes that ordering in one
    * prioritized verdict.
    */
  def annIndexHealth(spark: SparkSession, dir: String,
      targetRowsPerCentroid: Long)
      : Option[IndexHealth[graft.ops.AnnIndex.LoadStats, Int]] = {
    val st = graft.ops.AnnIndex.loadStats(spark, dir,
      coincidenceTarget = targetRowsPerCentroid)
    graft.ops.AnnIndex.retrainAdvice(st, targetRowsPerCentroid).map { k =>
      // a SAME-K verdict is the rebalance bet whose act-once-compare-
      // stop rule is encoded in the index meta: the advised build
      // records the fingerprint of the layout it writes (the
      // post-act basis, so the stop engages on the FIRST act even
      // over a backlogged index), and a reproduced layout reads
      // silent next window (AnnIndex.retrainAdvice's fixed point)
      // instead of repeating the work order forever
      val fp =
        if (k == st.centroids) ", recordSameKAct = true"
        else ""
      IndexHealth(st, k,
        // iters has no default on trainCodebook — the advised call
        // must be runnable as written; 10 Lloyd rounds is the q63
        // fixture's converged depth, a sane maintenance default
        s"""val cb = AnnIndex.trainCodebook(spark, vectors, k = $k, """ +
          s"""iters = 10); """ +
          s"""AnnIndex.build(spark, vectors, cb, "<fresh-dir>"$fp) """ +
          "// then point readers at <fresh-dir>")
    }
  }

  /** [[annIndexHealth]]'s twin for the maintained inverted text index
    * ([[graft.ops.TextIndex]]): measured postings-bucket load →
    * recommended fanout (always ≥2× current on grow — a hash modulus
    * rebuilt at the same count reproduces the identical layout — and
    * silent when one indivisible mega-term is the whole hot bucket).
    * `recommended` is the full [[graft.ops.TextIndex.Rebuild]] —
    * fanout AND skew floor — and the advised call spells both out:
    * a consumer that rebuilt from a bare fanout would forget the
    * collision evidence the rebuild just paid to learn, re-opening
    * the grow↔shrink oscillation the floor exists to close. Check
    * [[textIndexCompactHealth]] first — sizing stats count raw rows
    * as laid out, and advice a compact would clear is not a rebuild
    * signal — or call [[textIndexMaintenance]], which encodes that
    * ordering in one prioritized verdict.
    */
  def textIndexHealth(spark: SparkSession, dir: String,
      targetRowsPerBucket: Long)
      : Option[IndexHealth[graft.ops.TextIndex.LoadStats,
        graft.ops.TextIndex.Rebuild]] = {
    val st = graft.ops.TextIndex.loadStats(spark, dir)
    graft.ops.TextIndex.rebuildAdvice(st, targetRowsPerBucket).map { r =>
      IndexHealth(st, r,
        s"""TextIndex.build(spark, docs, "<fresh-dir>", """ +
          s"termBuckets = ${r.termBuckets}, " +
          s"termBucketsFloor = ${r.termBucketsFloor}) " +
          "// then point readers at <fresh-dir>")
    }
  }

  /** The WHEN-to-compact verdict for a maintained index — the other
    * half of index maintenance ([[annIndexHealth]]/[[textIndexHealth]]
    * answer when to re-SIZE; this answers when the tombstone backlog
    * makes the in-place `compact` worth running):
    * [[graft.ops.IndexCompaction.compactStats]] fed to
    * [[graft.ops.IndexCompaction.compactAdvice]]. None = the backlog
    * is under the live row count (reads pay <2× the post-compact
    * scan), or there is nothing to reclaim — do nothing. Some = the
    * measured stats, the reclaimable row count as `recommended`, and
    * the exact in-place call to run at a maintenance window (no
    * fresh-dir swap needed — compact is crash-safe in place, unlike
    * the rebuilds the sizing advisories recommend). Run this BEFORE
    * acting on a sizing advisory: sizing stats count raw rows as laid
    * out, so advice a compact would have cleared is not a rebuild
    * signal — [[textIndexMaintenance]] encodes that ordering in one
    * call. `minReclaimable` (default 0: the pure relative threshold)
    * lets a fleet cron skip compacts whose absolute payoff is under
    * the cost of scheduling one; order a fleet wave
    * largest-`recommended`-first (the `approx_live_rows` reattach
    * discipline) so the biggest read-side wins land first. The
    * `call` record carries the reclaimable count AND the formatted
    * dead fraction — the number operators alert on.
    */
  def textIndexCompactHealth(spark: SparkSession, dir: String,
      minReclaimable: Long = 0L)
      : Option[IndexHealth[graft.ops.IndexCompaction.CompactStats, Long]] =
    compactHealth(graft.ops.TextIndex.compactStats(spark, dir),
      s"""TextIndex.compact(spark, "$dir")""", minReclaimable)

  /** [[textIndexCompactHealth]] for the maintained IVF vector index. */
  def annIndexCompactHealth(spark: SparkSession, dir: String,
      minReclaimable: Long = 0L)
      : Option[IndexHealth[graft.ops.IndexCompaction.CompactStats, Long]] =
    compactHealth(graft.ops.AnnIndex.compactStats(spark, dir),
      s"""AnnIndex.compact(spark, "$dir")""", minReclaimable)

  /** The near-dup band index's ONE health check: its band count is a
    * scheme constant (the MinHash (bands, rows) tradeoff — nothing to
    * re-size, so no sizing twin exists), but its delta protocol
    * accumulates the same tombstone backlog as the other two
    * maintained indexes, measured and advised identically
    * ([[textIndexCompactHealth]]).
    */
  def neardupIndexHealth(spark: SparkSession, dir: String,
      minReclaimable: Long = 0L)
      : Option[IndexHealth[graft.ops.IndexCompaction.CompactStats, Long]] =
    compactHealth(graft.ops.NeardupIndex.compactStats(spark, dir),
      s"""NeardupIndex.compact(spark, "$dir")""", minReclaimable)

  private def compactHealth(
      st: graft.ops.IndexCompaction.CompactStats, call: String,
      minReclaimable: Long)
      : Option[IndexHealth[graft.ops.IndexCompaction.CompactStats, Long]] =
    graft.ops.IndexCompaction.compactAdvice(st, minReclaimable).map(reclaim =>
      // the dead fraction rides formatted in the call record — the
      // number operators alert/triage on, so a consumer that only
      // keeps the call string still has it
      IndexHealth(st, reclaim, s"$call // folds $reclaim rows, " +
        "dead fraction " +
        "%.3f".formatLocal(java.util.Locale.ROOT, st.deadFraction)))

  /** One prioritized maintenance verdict for a maintained index — the
    * shape [[textIndexMaintenance]]/[[annIndexMaintenance]]/
    * [[neardupIndexMaintenance]] return so an operator cron needs ONE
    * call per index per window, not two health checks it must
    * remember to run in the right order.
    */
  sealed trait Maintenance[+S, +R] {
    def call: String
    /** Stable record discriminator (`compact-first` /
      * `compact-deferred` / `resize`) — what the pipeline's
      * `advice:index-maintenance` status records carry as `verdict`,
      * so a fleet consumer filters verdict kinds without parsing the
      * call string.
      */
    def kind: String
  }
  /** Run the in-place compact this cycle; re-check next cycle. */
  case class CompactFirst(
      health: IndexHealth[graft.ops.IndexCompaction.CompactStats, Long])
      extends Maintenance[Nothing, Nothing] {
    def call: String = health.call
    def kind: String = "compact-first"
  }
  /** A compact IS owed (backlog ≥ live rows) but its reclaimable
    * count sits under the caller's `minReclaimable` fleet floor:
    * deferred, not hidden. The sizing axis is deliberately NOT
    * measured in this state (it would count the uncompacted ≥2×
    * backlog as load — the inflated-rebuild advice the compact-first
    * ordering exists to prevent), and without this case an index
    * whose churn then STOPS would read healthy forever while every
    * query pays the backlog and any real sizing need stays invisible.
    * A cron treats it as a no-op; a dashboard can alert on it, and an
    * operator can run the carried compact call anyway — the next
    * window then measures sizing clean. `call` is COMMENT-PREFIXED:
    * the health record's runnable line is inside `health.call`, but a
    * consumer that uniformly executes `verdict.call` (the
    * [[IndexHealth]] consumption shape) must not be tricked into
    * running the very compacts the fleet floor exists to skip — a
    * pasted deferred line is a no-op by construction.
    */
  case class CompactDeferred(
      health: IndexHealth[graft.ops.IndexCompaction.CompactStats, Long])
      extends Maintenance[Nothing, Nothing] {
    def call: String =
      "// deferred under the fleet floor — run anyway to clear: " +
        health.call
    def kind: String = "compact-deferred"
  }
  /** No compact is owed — act on the measured sizing verdict. */
  case class Resize[S, R](health: IndexHealth[S, R])
      extends Maintenance[S, R] {
    def call: String = health.call
    def kind: String = "resize"
  }

  /** The one ordering/floor decision all three maintenance one-calls
    * share: compact verdicts win outright; under the fleet floor the
    * owed compact is surfaced as [[CompactDeferred]] (never silently
    * swallowed, never falling through to backlog-inflated sizing);
    * only a genuinely-unbacklogged index measures `sizing` (by-name —
    * the measurement must not run otherwise).
    */
  private def prioritized[S, R](
      compact: Option[IndexHealth[graft.ops.IndexCompaction.CompactStats,
        Long]],
      minReclaimable: Long)(sizing: => Option[IndexHealth[S, R]])
      : Option[Maintenance[S, R]] =
    compact match {
      case Some(h) =>
        if (h.recommended >= minReclaimable) Some(CompactFirst(h))
        else Some(CompactDeferred(h))
      case None => sizing.map(Resize(_))
    }

  /** ONE maintenance verdict per window for the maintained inverted
    * text index — the cron entry that encodes the
    * compact-before-resize ordering instead of documenting it:
    * [[textIndexCompactHealth]] is measured first, and when it fires
    * the verdict is [[CompactFirst]] WITHOUT measuring sizing at all —
    * sizing stats count raw rows as laid out, so a sizing verdict
    * computed over an uncompacted backlog can advise a rebuild the
    * compact would have made unnecessary (and the rebuild is the
    * expensive, fresh-dir-and-swap op of the two). Only when no
    * compact is owed is [[textIndexHealth]] measured, surfacing as
    * [[Resize]]. The deferral converges in one extra cycle: act on
    * the compact, and the NEXT window measures sizing over clean
    * arithmetic — GraftApiSpec drives simultaneous churn+skew through
    * exactly that loop (compact first, then the sizing verdict, then
    * silence). None = healthy on both axes, do nothing. The
    * owed-but-floored state (a compact owed, reclaimable under
    * `minReclaimable`) surfaces as [[CompactDeferred]]: sizing is
    * still NOT measured (it would count the uncompacted backlog as
    * load), but the owed state is visible — a fleet whose churn stops
    * inside the floor window must not read healthy forever.
    */
  def textIndexMaintenance(spark: SparkSession, dir: String,
      targetRowsPerBucket: Long, minReclaimable: Long = 0L)
      : Option[Maintenance[graft.ops.TextIndex.LoadStats,
        graft.ops.TextIndex.Rebuild]] =
    prioritized(textIndexCompactHealth(spark, dir), minReclaimable)(
      textIndexHealth(spark, dir, targetRowsPerBucket))

  /** [[textIndexMaintenance]] for the maintained IVF vector index:
    * compact verdicts win over retrain verdicts for the same reason —
    * retrain advice measured over an uncompacted backlog counts dead
    * postings as load. A SAME-K retrain verdict is a rebalance bet:
    * see [[graft.ops.AnnIndex.retrainAdvice]]'s stop rule — a
    * repeated same-k verdict with unchanged stats means maintenance
    * cannot help (act once, compare stats, stop on a fixed point).
    */
  def annIndexMaintenance(spark: SparkSession, dir: String,
      targetRowsPerCentroid: Long, minReclaimable: Long = 0L)
      : Option[Maintenance[graft.ops.AnnIndex.LoadStats, Int]] =
    prioritized(annIndexCompactHealth(spark, dir), minReclaimable)(
      annIndexHealth(spark, dir, targetRowsPerCentroid))

  /** [[textIndexMaintenance]] for the near-dup band index — which has
    * no sizing axis (the band count is a scheme constant), so this
    * delegates to its single compact check and only ever returns
    * [[CompactFirst]] or (under the fleet floor) [[CompactDeferred]],
    * never [[Resize]]; it exists so a fleet cron can treat all three
    * maintained indexes uniformly.
    */
  def neardupIndexMaintenance(spark: SparkSession, dir: String,
      minReclaimable: Long = 0L)
      : Option[Maintenance[Nothing, Nothing]] =
    prioritized(neardupIndexHealth(spark, dir), minReclaimable)(None)

  /** Release the clean-corpus stage cache the q89/q108 pipelines
    * memoize (one survivor-stage set per (session, dir), pinned in
    * executor storage until replaced): long-lived sessions that ran
    * the capstone pipelines call this when done with them. No-op if
    * nothing is cached.
    */
  def releaseStageCache(): Unit =
    graft.queries.TextQueries.releaseStages()
}
