package graft.ops

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.functions.VectorExpressions

/** Durable, incrementally-maintained ANN (IVF) index — the 100 TB
  * answer to "the corpus changed, search its embeddings": re-assigning
  * 100 TB of vectors per delta is off the table, so the posting table
  * is a MAINTAINED dataset with the same delta protocol as
  * [[NeardupIndex]] (append-only deltas, generation-stamped
  * tombstones, tmp/trash/rename compaction).
  *
  * The centroid codebook is FROZEN at build time (classic IVF: the
  * codebook is retrained rarely and deliberately, never drifted by a
  * delta — a drifting codebook would silently invalidate every
  * already-assigned posting). Delta vectors are assigned to the frozen
  * centroids with the SAME nearest-centroid math as the batch IVF
  * queries (cosine, ties to the lower cid), so an index maintained
  * here and a from-scratch q45/q46 assignment can never disagree.
  *
  * Layout under `dir`:
  *   - `centroids/` — (cid, ce, cnm): the frozen codebook, broadcast
  *     side of every assignment and every search
  *   - `postings/` — (vec_id, e, nm, gen) parquet PARTITIONED BY
  *     `cid`: append-only between compactions. Partitioning by the
  *     cluster id is the scale move — a probe of `nprobe` centroids
  *     reads only those partitions (dynamic partition pruning from
  *     the broadcast probe side), never the corpus.
  *   - `tombstones/` — (vec_id, gen): a row kills every posting of
  *     that vector with a STRICTLY OLDER generation
  *
  * Delta protocol (`applyDelta`, identical to [[NeardupIndex]]): one
  * generation per delta; tombstones for every touched vector (updates
  * AND deletes) land first, then the updated vectors' new postings at
  * the same generation. The strict `tombstone.gen > posting.gen` kill
  * rule makes the write pair crash-retryable in either half:
  * at-least-once applies converge to the same live set.
  *
  * Scale shape: assignment is a map-side broadcast cross of the delta
  * (small) against the codebook (tiny); tombstones stay ∝ CHANGES
  * since the last compaction (collapsed to one max-gen row per vector
  * and broadcast via [[Probes.broadcastIfSmall]]); `search` broadcasts
  * queries and probes, touches only `nprobe` partitions per query set,
  * and scores with the codegen'd native dot expression. Nothing ever
  * rewrites the index on the delta path.
  */
object AnnIndex {

  private def centroidsDir(dir: String) = s"$dir/centroids"
  private def postingsDir(dir: String) = s"$dir/postings"
  private def tombsDir(dir: String) = s"$dir/tombstones"

  private val TombSchema = StructType(Seq(
    StructField("vec_id", LongType), StructField("gen", LongType)))

  /** The posting layout's BASE row shape as a read returns it
    * (partition column `cid` last, integer-inferred) — the
    * [[IndexCompaction.readOrEmpty]] fallback of last resort for a
    * fully-deleted-then-compacted index (postings dir with no `cid=`
    * partitions), so it stays readable instead of bricking every
    * later call on schema inference. Indexes built since the meta
    * landed record their FULL as-read schema — caller extras
    * included — as the `schema=` meta line ([[storedPostingsSchema]]),
    * so a [[searchWhere]] predicate naming an extra column survives
    * the empty excursion; only a LEGACY index (no `_meta.txt`) falls
    * back to this base shape and loses its extras until a delta or
    * rebuild restores them.
    */
  private[graft] val PostingsBaseSchema = StructType(Seq(
    StructField("vec_id", LongType),
    StructField("e", ArrayType(DoubleType)),
    StructField("nm", DoubleType), StructField("gen", LongType),
    StructField("cid", IntegerType)))

  /** The postings-as-read schema recorded at [[build]] (`schema=` in
    * `_meta.txt`): the written shape with the `cid` partition column
    * re-appended last, exactly as a parquet read returns it. None for
    * indexes built before the meta existed.
    */
  private[graft] def storedPostingsSchema(spark: SparkSession,
      dir: String): Option[StructType] =
    PointerDir.readMetaLines(spark, dir)
      .flatMap(_.find(_.startsWith("schema=")))
      .map(s => org.apache.spark.sql.types.DataType.fromJson(s.drop(7))
        .asInstanceOf[StructType])

  /** The layout fingerprint recorded by the last ACTED-ON same-k
    * rebalance (`samekfp=` in `_meta.txt`, computed by [[build]] from
    * the layout it wrote when `recordSameKAct` is set) — the
    * act-once-compare-stop memory [[retrainAdvice]]'s fixed-point
    * silence compares against. None when no same-k verdict was ever
    * acted on (or the index predates the meta).
    */
  private[graft] def actedFingerprintOf(spark: SparkSession,
      dir: String): Option[String] =
    PointerDir.readMetaLines(spark, dir)
      .flatMap(_.find(_.startsWith("samekfp=")).map(_.drop(8)))

  /** The layout fingerprint the same-k stop rule compares: the four
    * posting aggregates a same-k rebalance exists to change PLUS the
    * raw tombstone count ([[build]] spells the identical format from
    * the layout it writes, tombstones 0). A measurement matching the
    * recorded post-act layout means nothing changed since the act —
    * retraining the same live set is deterministic k-means
    * reproducing itself. Any churn re-arms the verdict: upserts move
    * the posting aggregates, and DELETE-ONLY deltas — which append
    * tombstones without touching a single posting row — move the
    * tombstone component (without it the stop would silence a
    * shrinking live set on a stale basis forever).
    */
  def fingerprintOf(stats: LoadStats): String =
    s"${stats.centroids}|${stats.postingRows}|${stats.p99Rows}|" +
      s"${stats.maxRows}|${stats.tombstoneRows}"

  /** THE one stored-fingerprint comparison ([[retrainAdvice]]'s stop
    * rule and [[loadStats]]' veto short-circuit both call it — one
    * spelling, so the two sites cannot drift). Also accepts the
    * pre-tombstone 4-field format when `tombstoneRows` is 0: an index
    * acted on before that component landed must not pay one futile
    * retrain just to re-record in the wider format.
    */
  private[graft] def fingerprintMatches(acted: Option[String],
      stats: LoadStats): Boolean =
    acted.exists(a => a == fingerprintOf(stats) ||
      // the legacy value extended with the zero it predates — keeps
      // fingerprintOf the file's ONE spelling of the format
      (stats.tombstoneRows == 0L && s"$a|0" == fingerprintOf(stats)))

  private def postingRows(spark: SparkSession, dir: String): DataFrame =
    IndexCompaction.readOrEmpty(spark, postingsDir(dir),
      // by-name: the stored-schema meta read costs nothing unless the
      // layout is actually empty
      storedPostingsSchema(spark, dir).getOrElse(PostingsBaseSchema))

  private def dot(a: Column, b: Column): Column =
    call_function(VectorExpressions.FnName, a, b)

  /** vectors (vec_id, e: array<double>) with the L2 norm appended —
    * one codegen'd pass, same as the batch queries' `withNorm`.
    */
  private def withNorm(spark: SparkSession, vectors: DataFrame): DataFrame = {
    VectorExpressions.ensureRegistered(spark)
    // extra columns (metadata the caller wants filterable at search
    // time — lang, source, quality tier) ride along into the postings
    vectors
      .withColumn("vec_id", col("vec_id").cast("long"))
      .withColumn("e", col("e").cast("array<double>"))
      .withColumn("nm", sqrt(dot(col("e"), col("e"))))
  }

  /** Deterministic seed codebook: the `k` lowest vec_ids of `vectors`
    * (the q45 convention — deterministic, so an oracle can reproduce
    * it). Production codebooks come from a k-means pass (q63's
    * kernel); the index only requires (cid, ce).
    */
  def seedCentroids(spark: SparkSession, vectors: DataFrame,
      k: Int): DataFrame =
    // orderBy+limit = distributed TakeOrdered (per-partition top-k,
    // k rows to the driver), not a single-partition global sort
    withNorm(spark, vectors).orderBy("vec_id").limit(k)
      .select(col("vec_id").cast("int").as("cid"), col("e").as("ce"))

  /** Train a codebook with `iters` Lloyd rounds from the
    * deterministic seeds: assign every vector to its nearest centroid
    * (same math as the index), recompute each centroid as the
    * element-wise mean of its members, empty clusters keep their
    * previous centroid. Deterministic end to end, so a trained
    * codebook is as reproducible as the seeds — train rarely, pass
    * the result to [[build]], and the frozen-codebook contract holds.
    *
    * Scale shape (the q63 kernel): each round shuffles (cid, dim)
    * partial sums, never whole vectors to one task; the k-row
    * codebook collects to the driver per round (it is broadcast-sized
    * by definition), which also truncates the iteration's lineage.
    */
  def trainCodebook(spark: SparkSession, vectors: DataFrame, k: Int,
      iters: Int): DataFrame = {
    import spark.implicits._
    val n = withNorm(spark, vectors)
      .select(col("vec_id"), col("e"), col("nm"))
    var cb: Seq[(Int, Seq[Double])] =
      seedCentroids(spark, vectors, k)
        .collect().map(r => r.getInt(0) -> r.getSeq[Double](1)).toSeq
    for (_ <- 1 to iters) {
      val cbDf = cb.toDF("cid", "ce")
      val assign = assigned(spark,
        n.select(col("vec_id"), col("e")), cbDf, 0L)
        .select(col("vec_id"), col("cid"))
      val means = n.join(assign, "vec_id")
        .select(col("cid"), posexplode(col("e")).as(Seq("dim", "v")))
        .groupBy("cid", "dim").agg(avg("v").as("m"))
        .groupBy("cid")
        .agg(array_sort(collect_list(struct(col("dim"), col("m"))))
          .as("dm"))
        .select(col("cid"), expr("transform(dm, x -> x.m)").as("ce"))
        .collect().map(r => r.getInt(0) -> r.getSeq[Double](1)).toMap
      cb = cb.map { case (cid, old) => cid -> means.getOrElse(cid, old) }
    }
    cb.toDF("cid", "ce")
  }

  /** Nearest-centroid assignment against the frozen codebook — the
    * SAME math as the batch IVF queries (cosine, ties to the lower
    * cid). Emits the posting shape (cid, vec_id, e, nm, gen).
    */
  private def assigned(spark: SparkSession, vectors: DataFrame,
      codebook: DataFrame, gen: Long): DataFrame = {
    val n = withNorm(spark, vectors)
    val c = codebook.withColumn("cnm", sqrt(dot(col("ce"), col("ce"))))
    val w = Window.partitionBy("vec_id").orderBy(col("cos").desc, col("cid"))
    val extras = vectors.columns.filterNot(Set("vec_id", "e")).toSeq
    n.crossJoin(broadcast(c))
      .withColumn("cos", dot(col("e"), col("ce")) / (col("nm") * col("cnm")))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select((Seq(col("cid"), col("vec_id"), col("e"), col("nm"),
        lit(gen).as("gen")) ++ extras.map(col)): _*)
  }

  private def writeEmptyTombstones(spark: SparkSession, dir: String): Unit =
    spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], TombSchema)
      .repartition(1)
      .write.mode(SaveMode.Overwrite).parquet(tombsDir(dir))

  /** Cut the index fresh from `vectors` (vec_id, e) with `codebook`
    * (cid, ce) at generation 0, replacing whatever was at `dir`.
    * Replace-not-atomic with [[graft.ops.TextIndex.build]]'s
    * delete-data-first ordering — the codebook-vs-postings pairing is
    * this index's analog of the fanout-vs-postings one: a crash
    * between the centroid and posting writes would otherwise pair the
    * NEW codebook with postings assigned under the OLD one (probes
    * read the wrong cid partitions — silently wrong results), and a
    * crash before the tombstone clear would let OLD tombstones kill
    * the new gen-0 postings. With the sweep (compact staging dirs
    * included, so a stale trash can't be healed back over the new
    * postings) every torn state fails LOUDLY on a missing dir; a
    * crash mid-build means re-run build.
    *
    * `recordSameKAct`: when this build IS the act on a same-k
    * rebalance verdict (the advised call from `Graft.annIndexHealth`
    * spells it), the new index records the fingerprint of THE LAYOUT
    * THIS BUILD WRITES — not the verdict's pre-act stats — and
    * [[retrainAdvice]] goes silent when the next measurement
    * reproduces it. The post-act basis is what makes the stop rule
    * engage on the FIRST act regardless of backlog: pre-act stats
    * count superseded postings, so a rebuild (which resets raw to
    * live) could never match them unless the acted-on index happened
    * to be backlog-free — the cron would pay one extra futile retrain
    * before silence. Recording what was written instead means: no
    * deltas since the act → stats match → silence (a same-k retrain
    * of an unchanged live set is deterministic k-means reproducing
    * itself, provably futile); any churn moves the raw aggregates and
    * re-arms the verdict on fresh evidence. Leave false for fresh
    * builds and capacity grows/shrinks — a build that is not an act
    * has nothing to remember.
    */
  def build(spark: SparkSession, vectors: DataFrame, codebook: DataFrame,
      dir: String, recordSameKAct: Boolean = false): Unit = {
    val fs = new Path(dir).getFileSystem(
      spark.sessionState.newHadoopConf())
    for (p <- Seq(centroidsDir(dir), postingsDir(dir), tombsDir(dir))
        ++ CompactStaging.all(postingsDir(dir)))
      fs.delete(new Path(p), true)
    // meta BEFORE data (the TextIndex.build ordering): the as-read
    // postings schema (written shape minus the partition column, with
    // `cid` re-appended last as the read returns it); a crash after
    // the meta fails loudly on the missing data dirs, never pairs
    // stale meta with new data (the old meta was for old data this
    // build just deleted — hence written unconditionally, so no stale
    // samekfp can survive). The samekfp line itself is the one meta
    // component written AFTER the data — see the acted-build block at
    // the end.
    val toWrite = assigned(spark, vectors, codebook, 0L)
    val asRead = StructType(
      toWrite.schema.fields.filterNot(_.name == "cid").toSeq :+
        StructField("cid", IntegerType))
    // schema-only meta FIRST, unconditionally — clears any stale
    // samekfp from the data this build just deleted
    PointerDir.writeMetaLines(spark, dir, Seq(s"schema=${asRead.json}"))
    codebook.select(col("cid").cast("int"), col("ce").cast("array<double>"))
      .repartition(1)
      .write.mode(SaveMode.Overwrite).parquet(centroidsDir(dir))
    toWrite
      .write.mode(SaveMode.Overwrite).partitionBy("cid")
      .parquet(postingsDir(dir))
    writeEmptyTombstones(spark, dir)
    // the act-once memory, recorded AFTER the data lands: the
    // fingerprint is measured off the WRITTEN postings with loadStats'
    // own read (a zero-data-column scan — counts come from footers),
    // so it matches a later measurement over an unchanged corpus BY
    // CONSTRUCTION, and nothing caches or recomputes the full-corpus
    // assignment. Crash between the data write and this meta rewrite:
    // schema-only meta, no fingerprint — the verdict re-fires once
    // and the re-act re-records, the same bounded behavior as a
    // consumer that rebuilt without the flag. The tombstone
    // component is 0 (writeEmptyTombstones above); it is what
    // re-arms the stop on DELETE-ONLY churn, which appends
    // tombstones without moving any posting aggregate.
    if (recordSameKAct) {
      // LITERALLY loadStats' own census over the just-written index —
      // not a re-spelling of its measurement — so the recorded value
      // matches a later measurement by construction and can never
      // drift from it (a drifted copy would silently disarm the stop
      // rule and re-run the full retrain every maintenance window)
      val fp = fingerprintOf(loadStats(spark, dir))
      PointerDir.writeMetaLines(spark, dir,
        Seq(s"schema=${asRead.json}", s"samekfp=$fp"))
    }
  }

  /** The frozen codebook as persisted at build. */
  def codebook(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(centroidsDir(dir))

  /** Highest generation recorded anywhere in the index — parquet
    * column statistics make both aggregates footer reads, fused into
    * ONE Spark job ([[IndexCompaction.maxGenOf]]).
    */
  def currentGen(spark: SparkSession, dir: String): Long =
    IndexCompaction.maxGenOf(Seq(postingRows(spark, dir),
      spark.read.parquet(tombsDir(dir))))

  /** Apply one delta: `upserts` (vec_id, e — inserts and updates
    * alike) and `deletes` (vec_id). Appends only; assignment uses the
    * FROZEN codebook; returns the generation the delta landed as.
    * Upserts must carry the SAME attribute columns the index was
    * built with — posting files are appended, and a column present in
    * some files but not others forks the read schema.
    */
  def applyDelta(spark: SparkSession, dir: String,
      upserts: DataFrame, deletes: DataFrame): Long = {
    val gen = currentGen(spark, dir) + 1
    // tombstones FIRST (the NeardupIndex protocol): either order is
    // retry-safe, but tombstone-first means a torn delta under-counts
    // (vectors missing until retry) rather than double-counts (a
    // stale and a fresh posting of the same vector both live)
    upserts.select(col("vec_id").cast("long"))
      .union(deletes.select(col("vec_id").cast("long")))
      .distinct()
      .withColumn("gen", lit(gen))
      .write.mode(SaveMode.Append).parquet(tombsDir(dir))
    assigned(spark, upserts, codebook(spark, dir), gen)
      .write.mode(SaveMode.Append).partitionBy("cid")
      .parquet(postingsDir(dir))
    gen
  }

  /** The live posting set: every appended posting not killed by a
    * strictly newer tombstone. Tombstones collapse to one max-gen row
    * per vector and broadcast when small (the steady state — they are
    * ∝ changes since the last compaction, not corpus size).
    */
  def live(spark: SparkSession, dir: String): DataFrame =
    liveWithGen(spark, dir).drop("gen")

  private def liveWithGen(spark: SparkSession, dir: String): DataFrame = {
    val tombs = spark.read.parquet(tombsDir(dir))
      .groupBy("vec_id").agg(max("gen").as("tgen"))
    val p = postingRows(spark, dir)
    p.as("p")
      .join(Probes.broadcastIfSmall(tombs).as("t"),
        col("p.vec_id") === col("t.vec_id") && col("t.tgen") > col("p.gen"),
        "left_anti")
      .select(p.columns.map(col).toSeq: _*) // postings incl. extras
  }

  /** IVF search over the live index: per query (qid, qe), score the
    * `nprobe` nearest centroids' partitions exactly and keep the
    * top-`k` by cosine (ties to the lower vec_id; a hit with
    * vec_id == qid is excluded — a vector is not its own neighbor).
    * Returns (qid, vec_id, cos, rn).
    *
    * Queries and probes broadcast; the posting side joins on its
    * partition column, so at scale dynamic partition pruning limits
    * the read to the probed clusters — the corpus never shuffles.
    */
  def search(spark: SparkSession, dir: String, queries: DataFrame,
      nprobe: Int, k: Int): DataFrame =
    searchWhere(spark, dir, queries, nprobe, k, lit(true))

  /** Filtered (hybrid) search: like [[search]], but only postings
    * satisfying `predicate` are scored — metadata-filtered ANN
    * ("nearest docs WHERE lang='en'"), with the filter applied BEFORE
    * ranking so the top-k is the top-k OF THE FILTERED SET (the
    * post-filter alternative silently returns fewer than k when the
    * filter is selective). The predicate sees the posting columns
    * (vec_id, cid, plus whatever the caller joined into the posting
    * table); at scale it rides the same partition-pruned scan.
    */
  def searchWhere(spark: SparkSession, dir: String, queries: DataFrame,
      nprobe: Int, k: Int, predicate: Column): DataFrame = {
    VectorExpressions.ensureRegistered(spark)
    val q = queries.select(col("qid").cast("long").as("qid"),
        col("qe").cast("array<double>").as("qe"))
      .withColumn("qnm", sqrt(dot(col("qe"), col("qe"))))
    val c = codebook(spark, dir)
      .withColumn("cnm", sqrt(dot(col("ce"), col("ce"))))
    val probeW = Window.partitionBy("qid").orderBy(col("cos").desc, col("cid"))
    val probes = q.crossJoin(broadcast(c))
      .withColumn("cos", dot(col("qe"), col("ce")) / (col("qnm") * col("cnm")))
      .withColumn("rn", row_number().over(probeW))
      .filter(col("rn") <= nprobe)
      .select(col("qid"), col("cid"))
    val knnW = Window.partitionBy("qid").orderBy(col("cos").desc, col("vec_id"))
    broadcast(probes).join(live(spark, dir).filter(predicate), "cid")
      .join(broadcast(q), "qid")
      .filter(col("vec_id") =!= col("qid"))
      .withColumn("cos", dot(col("qe"), col("e")) / (col("qnm") * col("nm")))
      .withColumn("rn", row_number().over(knnW))
      .filter(col("rn") <= k)
      .select(col("qid"), col("vec_id"), col("cos"), col("rn"))
  }

  /** Fold tombstones into the posting table: rewrite the live set,
    * swap it in with the sink compaction's tmp/trash/rename
    * discipline, and clear the tombstones. Postings KEEP their
    * generations through the rewrite (the [[NeardupIndex.compact]]
    * rationale: a reset gen would let a crash between the swap and
    * the tombstone clear silently kill every previously-updated
    * vector's rewritten posting).
    *
    * Returns the folded index's [[IndexCompaction.CompactStats]],
    * measured on the rewrite's own write via an `observe` metric —
    * the post-compact state is (live, live, 0) by construction, so a
    * re-measured [[compactStats]] right after would re-scan the
    * postings for numbers the compact already counted.
    */
  def compact(spark: SparkSession, dir: String): IndexCompaction.CompactStats = {
    val target = new Path(postingsDir(dir))
    val fs = target.getFileSystem(spark.sessionState.newHadoopConf())
    val tmp = new Path(CompactStaging.tmp(postingsDir(dir)))
    val trash = new Path(CompactStaging.trash(postingsDir(dir)))
    // heal an interrupted previous swap before anything else
    if (!fs.exists(target) && fs.exists(trash)) fs.rename(trash, target)
    fs.delete(tmp, true); fs.delete(trash, true)
    val obs = org.apache.spark.sql.Observation()
    liveWithGen(spark, dir)
      .observe(obs, count(lit(1)).as("rows"))
      .write.mode(SaveMode.Overwrite).partitionBy("cid")
      .parquet(tmp.toString)
    if (!fs.rename(target, trash))
      throw new IllegalStateException(s"index compact swap failed: $target")
    if (!fs.rename(tmp, target)) {
      fs.rename(trash, target)
      throw new IllegalStateException(s"index compact swap failed: $target")
    }
    fs.delete(trash, true)
    writeEmptyTombstones(spark, dir)
    val n = obs.get("rows").asInstanceOf[Long]
    IndexCompaction.CompactStats(n, n, 0L)
  }

  /** Measured tombstone backlog — the WHEN-to-compact half of this
    * index's health ([[IndexCompaction]]; [[loadStats]] answers the
    * when-to-RETRAIN half): counted over the postings, the table every
    * probe scans. Feed to [[IndexCompaction.compactAdvice]], or call
    * `Graft.annIndexCompactHealth` for the one-call verdict.
    */
  def compactStats(spark: SparkSession,
      dir: String): IndexCompaction.CompactStats =
    IndexCompaction.measure(spark, postingsDir(dir), "vec_id",
      tombsDir(dir))

  /** Posting-layout health, for operators deciding WHEN to retrain —
    * the IVF analog of [[graft.streaming.CurrentTable.layoutStats]]:
    * the codebook is FROZEN at build time, so a corpus that grew N×
    * scans ~N× more candidates per probed partition (probe cost ∝
    * nprobe × rows/centroid) and nothing resizes by itself. Counts
    * RAW posting rows per centroid — appended generations and their
    * tombstone-superseded rows included — because that is the scan
    * cost a probe actually pays as laid out; run [[compact]] first if
    * generations have piled up, and re-measure (advice that a compact
    * would have cleared is not a retrain signal). One column-pruned
    * pass over the postings (`cid` only) plus a codebook count —
    * maintenance cadence, not per query. `p99Rows` is the p99-by-rank
    * per-centroid count (= max below 100 centroids), the same
    * skew-aware statistic the bloom-index sizing uses.
    *
    * `p99TopVectorRows` — the largest group of LIVE rows sharing one
    * identical embedding inside the p99-rank cell — is the IVF analog
    * of [[TextIndex.LoadStats.p99TopTermRows]]: coincident vectors
    * are the one load k-means provably cannot split (every codebook
    * assigns identical points identically), so when they dominate the
    * sizing cell a same-k rebalance is STATICALLY futile and
    * [[retrainAdvice]] vetoes it. Counted over the LIVE set, not raw
    * rows — a vector re-upserted many times with an unchanged
    * embedding leaves dead generations that hash identically, and a
    * raw count would read that BACKLOG as coincidence, permanently
    * vetoing a rebalance that would in fact pay (the rebuild sheds
    * the backlog and splits the live load; reachable whenever the
    * concentrated churn stays under the global compact threshold).
    * Scoped to the cells tied at the p99 count and, among ties, to
    * the least-dominated one — the [[TextIndex.loadStats]] tie
    * discipline, for the same reason: if ANY tied cell is splittable
    * the rebalance is not futile. This is the ONLY measurement that
    * touches the wide `e` column, and it runs only when
    * `coincidenceTarget` is set AND the same-k arm could fire at that
    * target ([[sameKArm]] — the SAME predicate [[retrainAdvice]]
    * decides with) AND at most [[VetoTieCells]] cells tie — a healthy
    * index, a capacity grow, and a wide tie all keep loadStats a
    * single cid-only pass (the skipped pass reads as 0, which never
    * vetoes; the act-once-compare-stop cron rule bounds any residual
    * futile retrain to exactly one). `vetoMeasuredAt` records the
    * target the pass ran under (0 = skipped) and [[retrainAdvice]]
    * consults the veto ONLY when it equals the decision target —
    * census stats, or stats measured for a different target, can
    * never veto on a stale basis. `Graft.annIndexHealth` threads its
    * target through; call `loadStats(spark, dir)` bare for the pure
    * layout census.
    */
  case class LoadStats(centroids: Int, postingRows: Long,
      meanRows: Double, p99Rows: Long, maxRows: Long,
      /** Raw tombstone-table rows — the fingerprint component that
        * re-arms the act-once stop on DELETE-ONLY churn, which
        * appends tombstones without moving any posting aggregate.
        */
      tombstoneRows: Long = 0L,
      p99TopVectorRows: Long = 0L, vetoMeasuredAt: Long = 0L,
      /** [[actedFingerprintOf]]'s stored value, riding the stats so
        * [[retrainAdvice]] stays a pure decision over one measurement.
        */
      actedFingerprint: Option[String] = None)

  /** Max cells tied at the p99 count whose wide `e` column the
    * coincidence-veto pass will read — see [[loadStats]].
    */
  private[graft] val VetoTieCells = 8

  /** corpus / target, the advisory family's ideal cell count. */
  private def idealK(postingRows: Long, target: Long): Long =
    math.max(1L, math.round(postingRows.toDouble / target))

  /** THE same-k trigger — the one definition [[retrainAdvice]]'s
    * rebalance arm and [[loadStats]]' veto-pass gate share, so the
    * gate can never drift from the decision it exists to serve
    * (measuring the veto when the arm can't fire wastes the wide
    * pass; skipping it when the arm can fire advises a futile
    * retrain). `p99Rows / 2 >= target` is the overflow-proof spelling
    * of the family's 2× threshold (exactly equivalent over positive
    * integers; `2 * target` wraps for a Long.MaxValue-style sentinel
    * target).
    */
  private[graft] def sameKArm(postingRows: Long, p99Rows: Long,
      centroids: Int, target: Long): Boolean =
    p99Rows / 2 >= target && idealK(postingRows, target) <= centroids

  def loadStats(spark: SparkSession, dir: String,
      coincidenceTarget: Long = 0L): LoadStats = {
    // a fully-deleted-then-compacted corpus (or a build over an empty
    // frame) leaves a postings dir with no cid= partitions at all —
    // exactly the shrunken state the advisory exists to measure, so
    // it must read as zero rows, not crash schema inference
    // (postingRows' readOrEmpty fallback)
    val perCid = postingRows(spark, dir)
      .groupBy("cid").count()
      .collect().map(r => (r.getInt(0), r.getLong(1)))
    val counts = perCid.map(_._2).sorted.toIndexedSeq
    val k = spark.read.parquet(centroidsDir(dir)).count().toInt
    val total = counts.sum
    // LITERALLY the bloom-index sizing statistic, not a re-derivation
    val p99 = BucketIndex.sizingRows(counts)
    val mx = if (counts.isEmpty) 0L else counts.last
    // raw tombstone rows: a parquet count() — footer row-counts, no
    // column data — that completes the fingerprint (see LoadStats)
    val tombs = spark.read.parquet(tombsDir(dir)).count()
    val acted = actedFingerprintOf(spark, dir)
    // RAW-tied cells (the scan-cost statistic the p99 rank is about);
    // non-empty whenever the gate below holds, because sizingRows
    // returns an element of `counts`
    val tied = perCid.filter(_._2 == p99).map(_._1)
    // gate + cap + live-set measurement: see the LoadStats scaladoc.
    // The acted-fingerprint short-circuit: when this census already
    // matches the last act's recorded layout, retrainAdvice's stop
    // rule silences the verdict on the cid-only aggregates alone —
    // paying the wide tied-cell pass first would scan vector
    // partitions every maintenance window of the (now common)
    // fingerprint-silenced steady state for a veto that cannot
    // change the outcome. The SAME matcher the stop rule uses, so
    // the short-circuit can never diverge from the decision.
    val census = LoadStats(k, total, 0.0, p99, mx, tombs)
    val runVeto = coincidenceTarget > 0 && k > 0 && total > 0 &&
      sameKArm(total, p99, k, coincidenceTarget) &&
      tied.length <= VetoTieCells &&
      !fingerprintMatches(acted, census)
    val p99Top =
      if (!runVeto) 0L
      else {
        val tops = live(spark, dir)
          .filter(col("cid").isin(tied.map(Int.box): _*))
          .groupBy(col("cid"), xxhash64(col("e")).as("eh"))
          .agg(count(lit(1)).as("c"))
          .groupBy("cid").agg(max("c").as("mt"))
          .collect().map(_.getLong(1))
        // a raw-tied cell with NO live rows yields no group row — it
        // is trivially splittable (a rebuild sheds its backlog
        // entirely), so it contributes 0 to the least-dominated min,
        // never silently drops out (dropping it would over-veto, and
        // an ALL-dead tie must not crash an empty min)
        if (tops.length < tied.length) 0L else tops.min
      }
    LoadStats(k, total, total.toDouble / math.max(1, k), p99,
      mx, tombs, p99Top,
      if (runVeto) coincidenceTarget else 0L,
      acted)
  }

  /** Pure retrain decision over [[loadStats]] — the
    * [[graft.streaming.CurrentTable.rescaleAdvice]] analog:
    * Some(recommendedK) when the p99 partition holds ≥2× the target
    * rows (grow — or REBALANCE: unlike re-hashing a hot key, which a
    * rescale cannot spread, retraining k-means DOES split dense
    * regions, so skew is a reason to retrain, never an exclusion) or
    * when the corpus shrank to ≤half the centroids' worth (tiny
    * posting lists pay per-partition task overhead for nothing);
    * None inside the band. The recommendation is corpus/target,
    * floored at the current k in the grow case — a recommendation
    * EQUAL to the current k means "retrain at the same k to
    * rebalance", which is meaningful for k-means where it would be a
    * no-op for a hash modulus. The 2× hysteresis keeps a corpus near
    * a boundary from flapping advice delta over delta. Act with
    * [[trainCodebook]] + [[build]] into a fresh dir and swap readers.
    *
    * THE SAME-K ARM's two futility guards: retraining at the current
    * k is a REBALANCE bet — it pays when the corpus drifted under a
    * stale codebook (spec-pinned: the drifted fixture converges to
    * silence in one act). When the sizing cell is dominated by
    * COINCIDENT vectors (`2 * p99TopVectorRows ≥ p99Rows`) the bet is
    * statically lost — every codebook assigns identical points
    * identically, the exact analog of [[TextIndex.rebuildAdvice]]'s
    * indivisible-mega-term veto — so the same-k arm is silent rather
    * than sending a cron to retrain forever (capacity grows, where
    * `ideal > centroids`, are still advised: more centroids DO help
    * the rest of the corpus). The comparison deliberately mixes
    * bases — LIVE top group against the RAW cell count — which only
    * ever UNDER-vetoes: backlog inflating the cell makes the veto
    * harder to clear exactly when acting on the advice would shed
    * that backlog. And like the text veto it silences the WHOLE
    * verdict, a shrink the volume test would otherwise advise
    * included — one verdict per measurement is the family rule, and
    * the shrink resurfaces once churn or a compact clears the hot
    * cell. Past the veto a residual fixed point
    * remains possible — NEAR-coincident load is splittable in
    * principle but a converged k-means may reproduce itself
    * ([[trainCodebook]] is deterministic) — and that case is only
    * knowable by doing it once: act-once-compare-stop, ENCODED here
    * rather than documented. A same-k rebuild run with [[build]]'s
    * `recordSameKAct` stamps the fingerprint of the layout it WROTE
    * into the index meta (the post-act basis — pre-act stats count
    * superseded postings a rebuild sheds, so they could only ever
    * match from a backlog-free start); when the next measurement
    * reproduces it (`stats.actedFingerprint` matches), the same-k arm
    * is silent — the fixed point is a dashboard fact, not a repeating
    * work order. A consumer that rebuilds WITHOUT the flag keeps the
    * old behavior (the verdict repeats); the advised call spells the
    * flag out precisely so the default act path remembers.
    */
  def retrainAdvice(stats: LoadStats,
      targetRowsPerCentroid: Long): Option[Int] = {
    require(targetRowsPerCentroid > 0,
      s"targetRowsPerCentroid must be positive, got $targetRowsPerCentroid")
    if (stats.postingRows == 0L || stats.centroids == 0) return None
    val ideal = idealK(stats.postingRows, targetRowsPerCentroid)
    // the 2^20 cap applies to the RETURNED recommendation only — a
    // capped ideal in the band decisions would let a corpus too big
    // for its current k pass the shrink test and be advised DOWN
    def cap(k: Long): Int = math.min(1L << 20, k).toInt
    // p99/2 >= target: the overflow-proof 2x spelling (see sameKArm)
    if (stats.p99Rows / 2 >= targetRowsPerCentroid) {
      val sameK = sameKArm(stats.postingRows, stats.p99Rows,
        stats.centroids, targetRowsPerCentroid)
      // the veto binds only to stats whose coincidence pass was
      // MEASURED at this same target (loadStats' coincidenceTarget —
      // Graft.annIndexHealth threads it): census stats, or stats
      // measured for a different target, read p99TopVectorRows the
      // gate skipped (or computed under a different trigger), and
      // consulting them could veto on a stale basis. The mismatch
      // direction is safe — no binding, no veto, advice fires, and
      // the act-once-compare-stop rule bounds any futile retrain
      if (sameK && stats.vetoMeasuredAt == targetRowsPerCentroid &&
        2 * stats.p99TopVectorRows >= stats.p99Rows) None
      else {
        val rec = cap(math.max(ideal, stats.centroids.toLong))
        // THE ACT-ONCE-COMPARE-STOP RULE, encoded: a same-k rebalance
        // verdict whose stats MATCH the layout fingerprint recorded
        // by the last act ([[build]]'s recordSameKAct) means nothing
        // changed since that rebuild — re-running deterministic
        // k-means on the same live set reproduces it, so re-advising
        // would send a cron in circles. Silence, like the coincidence
        // veto; the comparison self-clears on ANY real change (churn
        // moves postingRows, a compact moves it, a capacity grow
        // changes k — all four aggregates are in the fingerprint).
        if (rec == stats.centroids &&
            fingerprintMatches(stats.actedFingerprint, stats)) None
        else Some(rec)
      }
    }
    else if (ideal * 2 <= stats.centroids) Some(cap(ideal))
    else None
  }
}
