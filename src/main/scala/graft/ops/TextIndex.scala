package graft.ops

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Durable, incrementally-maintained INVERTED TEXT INDEX — the third
  * member of the maintained-index family ([[NeardupIndex]] bands,
  * [[AnnIndex]] postings): BM25 retrieval over a 100 TB corpus
  * without scanning the corpus per query. `Graft.bm25` tokenizes and
  * scores the whole corpus each call — right for one-off audits,
  * wrong as a serving path; here the corpus is tokenized ONCE into a
  * term-bucketed postings table, and a query reads only its terms'
  * buckets.
  *
  * Layout under `dir`:
  *   - `_meta.txt` — `tb=N`, the postings bucket count the index was
  *     built with (the `nb`-in-meta discipline [[BucketIndex]] uses):
  *     readers and delta writers take the stored value, so the fanout
  *     is a build-time choice, not a compile-time constant. Plus
  *     `tbfloor=F` when a skew-driven grow has been acted on — the
  *     advisory's memory that counts ≤ F collision-concentrate for
  *     this term distribution ([[rebuildAdvice]]'s anti-flap floor).
  *   - `postings/` — (term, doc_id, tf, dl, gen) parquet, partitioned
  *     by `tb = pmod(xxhash64(term), N)`: a term lookup
  *     partition-prunes to one bucket dir. `dl` (doc token length)
  *     rides denormalized so scoring never joins the corpus.
  *   - `docs/` — (doc_id, dl, gen): the corpus census behind the BM25
  *     stats row (N, Σdl).
  *   - `tombstones/` — (doc_id, gen): kills postings/docs rows of
  *     that doc with a STRICTLY OLDER generation.
  *
  * The delta protocol, kill rule, crash-retry convergence argument,
  * and compaction swap discipline are [[NeardupIndex]]'s verbatim —
  * one generation per delta, tombstones first, strictly-older kills,
  * tmp/trash/rename fold. Tokenization and the scoring formula are
  * the ONE shared implementation the oracle-checked q111 uses
  * (whitespace tokens; rational Robertson IDF, Okapi tf saturation),
  * so index-served scores cannot drift from the audited kernel —
  * TextIndexSpec asserts search ≡ `Graft.bm25` to the kernel's own
  * 6-decimal rounding, including after update/delete deltas.
  *
  * Scale shape: building is one explode + (doc, term) partial-agg
  * (shuffle ∝ distinct doc-term pairs); a query touches ≤ |terms|
  * postings buckets + one stats aggregate over the docs census;
  * tombstones stay ∝ changes since the last compaction and broadcast
  * at read.
  */
object TextIndex {

  /** DEFAULT postings bucket count — the partition-pruning fanout
    * when [[build]] isn't told otherwise, and the assumed count for
    * legacy indexes built before the count was persisted. The count
    * is fixed per index LIFETIME (the bucket of a term must never
    * move between write and read, so every reader takes the value
    * stored in the index's `_meta.txt`, never this constant);
    * changing it requires a rebuild — [[rebuildAdvice]] measures
    * when that is worth paying.
    */
  val TermBuckets = 64

  private def postingsDir(dir: String) = s"$dir/postings"
  private def docsDir(dir: String) = s"$dir/docs"
  private def tombsDir(dir: String) = s"$dir/tombstones"

  /** The index's postings bucket count, from its `_meta.txt`. An
    * index that predates the meta (or whose meta predates the `tb=`
    * line) was necessarily built with the then-hard-coded
    * [[TermBuckets]], so that is the correct legacy fallback — NOT a
    * guess. Every routing site (delta writes, query-term bucket
    * resolution) calls this, so a caller-side constant can never
    * misroute a term.
    */
  def termBucketsOf(spark: SparkSession, dir: String): Int =
    PointerDir.readMetaLines(spark, dir)
      .flatMap(_.find(_.startsWith("tb=")).map(_.drop(3).toInt))
      .getOrElse(TermBuckets)

  /** The index's SKEW FLOOR, from its `_meta.txt` (`tbfloor=`; 0 when
    * never recorded — every pre-floor index). The floor is advisory
    * memory, not routing state: when [[rebuildAdvice]] recommends a
    * grow whose trigger was hash-collision skew rather than corpus
    * volume (the p99 bucket tripped while `ideal ≤ termBuckets`), the
    * count that PROVED overloaded is remembered as a floor the shrink
    * branch never advises back below. Without it the advisory can
    * ping-pong forever: the grow spreads the colliding terms, the
    * very next measurement satisfies the volume-only shrink condition
    * and advises back down to ~`ideal` — at or below the fanout that
    * just tripped — where the collision skew re-concentrates and
    * re-fires the grow. A literal cron would rebuild between the two
    * layouts indefinitely, the exact futile-maintenance loop the
    * advisory family exists to prevent.
    */
  def termBucketsFloorOf(spark: SparkSession, dir: String): Int =
    PointerDir.readMetaLines(spark, dir)
      .flatMap(_.find(_.startsWith("tbfloor=")).map(_.drop(8).toInt))
      .getOrElse(0)

  private def writeMeta(spark: SparkSession, dir: String,
      termBuckets: Int, termBucketsFloor: Int): Unit =
    PointerDir.writeMetaLines(spark, dir,
      Seq(s"tb=$termBuckets") ++
        (if (termBucketsFloor > 0) Seq(s"tbfloor=$termBucketsFloor")
         else Seq.empty))

  private val TombSchema = StructType(Seq(
    StructField("doc_id", LongType), StructField("gen", LongType)))

  /** The postings layout's row shape as a READ returns it (partition
    * column `tb` last, integer-inferred) — the
    * [[IndexCompaction.readOrEmpty]] fallback, so a fully-deleted-
    * then-compacted index (postings dir with no `tb=` partitions)
    * stays readable instead of bricking every later call on schema
    * inference.
    */
  private[graft] val PostingsSchema = StructType(Seq(
    StructField("term", StringType), StructField("doc_id", LongType),
    StructField("tf", IntegerType), StructField("dl", IntegerType),
    StructField("gen", LongType), StructField("tb", IntegerType)))

  /** The docs census's row shape — same empty-layout rationale (a
    * plain write of zero census rows can produce no part files).
    */
  private[graft] val CensusSchema = StructType(Seq(
    StructField("doc_id", LongType), StructField("dl", IntegerType),
    StructField("gen", LongType)))

  private def postingRows(spark: SparkSession, dir: String): DataFrame =
    IndexCompaction.readOrEmpty(spark, postingsDir(dir), PostingsSchema)

  private def censusRows(spark: SparkSession, dir: String): DataFrame =
    IndexCompaction.readOrEmpty(spark, docsDir(dir), CensusSchema)

  private def bucketOf(term: org.apache.spark.sql.Column,
      termBuckets: Int) =
    pmod(xxhash64(term), lit(termBuckets.toLong))

  /** The distinct postings buckets `terms` hash to at `termBuckets`
    * fanout — derived from [[bucketOfTerms]], the one
    * routing-evaluation path.
    */
  private[graft] def bucketsOf(spark: SparkSession, terms: Seq[String],
      termBuckets: Int): Seq[Long] =
    bucketOfTerms(spark, terms, termBuckets).values.toSeq.distinct

  /** Each term's bucket at `termBuckets` fanout, with the SAME
    * expression the write side buckets with (one tiny local job; a
    * caller-side hash reimplementation could silently drift from
    * xxhash64) — the ONE routing-evaluation path [[bucketsOf]]
    * derives from. Package-visible for measurement code that needs
    * the assignment itself: [[graft.ScaleBench]]'s floor experiment
    * engineers a collision-skewed vocabulary with the index's own
    * routing (a re-derived hash would demonstrate nothing about this
    * index).
    */
  private[graft] def bucketOfTerms(spark: SparkSession,
      terms: Seq[String], termBuckets: Int): Map[String, Long] = {
    import spark.implicits._
    terms.toDF("term")
      .select(col("term"), bucketOf(col("term"), termBuckets).as("tb"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
  }

  /** (term, doc_id, tf, dl, tb, gen) for `docs` (doc_id, text) —
    * the q111 tokenizer, exploded and counted. Zero-token docs keep a
    * census row but no postings (they can never match a term).
    */
  private def posted(docs: DataFrame, gen: Long,
      termBuckets: Int): DataFrame =
    graft.queries.TextQueries.tokenized(docs)
      .select(col("doc_id").cast("long").as("doc_id"),
        size(col("t")).as("dl"), explode(col("t")).as("term"))
      .groupBy("doc_id", "dl", "term")
      .agg(count(lit(1)).cast("int").as("tf"))
      .select(col("term"), col("doc_id"), col("tf"), col("dl"),
        bucketOf(col("term"), termBuckets).as("tb"), lit(gen).as("gen"))

  private def census(docs: DataFrame, gen: Long): DataFrame =
    graft.queries.TextQueries.tokenized(docs)
      .select(col("doc_id").cast("long").as("doc_id"),
        size(col("t")).as("dl"), lit(gen).as("gen"))

  private def writeEmptyTombstones(spark: SparkSession, dir: String): Unit =
    spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], TombSchema)
      .repartition(1)
      .write.mode(SaveMode.Overwrite).parquet(tombsDir(dir))

  /** Cut the index fresh from `docs` (doc_id, text) at generation 0,
    * replacing whatever was at `dir`. `termBuckets` is persisted in
    * the index meta and governs the index for its whole lifetime —
    * size it for the corpus you expect ([[rebuildAdvice]] names the
    * number once the corpus is measurable). `termBucketsFloor`
    * (0 = none) is the skew floor to remember ([[termBucketsFloorOf]]);
    * when acting on a [[rebuildAdvice]] recommendation pass the
    * advised [[Rebuild.termBucketsFloor]] through, or the new index
    * forgets the collision skew the advice just paid a rebuild to
    * learn. The floor only ever RATCHETS upward through the advisory
    * (skew grows raise it; volume grows and shrinks carry it), so it
    * can outlive the vocabulary that earned it — rebuilding with
    * `termBucketsFloor = 0` is the deliberate escape hatch: it
    * forgets collision evidence that a wholly-replaced corpus made
    * stale, and the next skew trip (if the skew is real) re-learns a
    * fresh floor from current measurements. Build (like
    * [[NeardupIndex.build]]) is
    * replace-not-atomic: any old index data is deleted FIRST — the
    * compact staging dirs (`._compact_tmp`/`._compact_trash`)
    * included, because a trash dir surviving into the new index is a
    * time bomb: if this build then crashes after its meta lands but
    * before its postings land, the NEXT compact's heal step would
    * rename the OLD-fanout trash back to `postings/`, silently
    * pairing the new `tb=` with postings bucketed under the old
    * count — then the meta lands, then the new data. So no crash
    * state ever pairs a stored count with postings bucketed under a
    * different one (that would misroute every search SILENTLY; this
    * ordering makes every torn state fail LOUDLY on the missing data
    * dir instead). A crash mid-build means re-run build; for reader
    * continuity across a fanout change, build into a FRESH dir and
    * swap readers — the shape [[rebuildAdvice]]'s consumers are told
    * to use.
    */
  def build(spark: SparkSession, docs: DataFrame, dir: String,
      termBuckets: Int = TermBuckets, termBucketsFloor: Int = 0): Unit = {
    require(termBuckets > 0,
      s"termBuckets must be positive, got $termBuckets")
    require(termBucketsFloor >= 0,
      s"termBucketsFloor must be >= 0, got $termBucketsFloor")
    val fs = new Path(dir).getFileSystem(
      spark.sessionState.newHadoopConf())
    for (base <- Seq(postingsDir(dir), docsDir(dir), tombsDir(dir));
        p <- base +: CompactStaging.all(base))
      fs.delete(new Path(p), true)
    writeMeta(spark, dir, termBuckets, termBucketsFloor)
    posted(docs, 0L, termBuckets)
      .write.mode(SaveMode.Overwrite).partitionBy("tb")
      .parquet(postingsDir(dir))
    census(docs, 0L)
      .write.mode(SaveMode.Overwrite).parquet(docsDir(dir))
    writeEmptyTombstones(spark, dir)
  }

  /** Highest generation recorded anywhere — footer-statistics reads,
    * fused into ONE Spark job (the three per-table max aggregates used
    * to run as three sequential driver-latency-bound jobs; a union max
    * reads the same footers in one).
    */
  def currentGen(spark: SparkSession, dir: String): Long =
    IndexCompaction.maxGenOf(
      Seq(postingRows(spark, dir), censusRows(spark, dir),
        spark.read.parquet(tombsDir(dir))))

  /** Apply one delta: `upserts` (doc_id, text) and `deletes`
    * (doc_id); appends only, returns the landed generation.
    * Tombstone-first like [[NeardupIndex.applyDelta]] — a torn delta
    * under-counts until the retry, never double-counts.
    */
  def applyDelta(spark: SparkSession, dir: String,
      upserts: DataFrame, deletes: DataFrame): Long = {
    val gen = currentGen(spark, dir) + 1
    val nb = termBucketsOf(spark, dir)
    upserts.select(col("doc_id").cast("long"))
      .union(deletes.select(col("doc_id").cast("long")))
      .distinct()
      .withColumn("gen", lit(gen))
      .write.mode(SaveMode.Append).parquet(tombsDir(dir))
    posted(upserts, gen, nb)
      .write.mode(SaveMode.Append).partitionBy("tb")
      .parquet(postingsDir(dir))
    census(upserts, gen)
      .write.mode(SaveMode.Append).parquet(docsDir(dir))
    gen
  }

  private def tombs(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(tombsDir(dir))
      .groupBy("doc_id").agg(max("gen").as("tgen"))

  private def liveOf(spark: SparkSession, dir: String,
      rows: DataFrame): DataFrame =
    rows.as("r")
      .join(Probes.broadcastIfSmall(tombs(spark, dir)).as("t"),
        col("r.doc_id") === col("t.doc_id") && col("t.tgen") > col("r.gen"),
        "left_anti")

  /** BM25 scores of the live corpus for `terms` — `(doc_id, bm25)`
    * for docs matching ≥1 term, identical to `Graft.bm25` over the
    * same corpus (same tokens, same rational-IDF/Okapi formula, same
    * 6-decimal rounding; per-term partials fold in fixed term order
    * so even the float summation order matches). Reads ≤ |terms|
    * postings buckets + the docs census; the corpus text is never
    * touched.
    */
  def search(spark: SparkSession, dir: String, terms: Seq[String],
      k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(terms.nonEmpty, "search needs at least one query term")
    require(terms.distinct.size == terms.size,
      s"duplicate query terms: ${terms.mkString(", ")}")
    import spark.implicits._
    // the terms' bucket values under the STORED fanout — a
    // caller-side constant could silently misroute an index built
    // at a different count
    val tbs = bucketsOf(spark, terms, termBucketsOf(spark, dir))
    // ONE tombstone fold per query (broadcastIfSmall probes its input
    // eagerly — building it per live-side would re-run that probe),
    // shared by the census aggregate and the postings read
    val tomb = Probes.broadcastIfSmall(tombs(spark, dir))
    def live(rows: DataFrame): DataFrame =
      rows.as("r")
        .join(tomb.as("t"),
          col("r.doc_id") === col("t.doc_id") &&
            col("t.tgen") > col("r.gen"),
          "left_anti")
    // corpus stats from the live census: one aggregate row, broadcast
    val stats = live(censusRows(spark, dir))
      .agg(count(lit(1)).as("n"), sum("dl").as("sdl"))
    // live postings of just these terms: partition-pruned to the
    // terms' buckets, then term-filtered inside them
    val termIdx = terms.zipWithIndex.toDF("term", "i")
    val fetched = live(postingRows(spark, dir))
      .filter(col("tb").isin(tbs: _*) && col("term").isin(terms: _*))
      .join(broadcast(termIdx), "term")
    // per-term document frequency over the fetched postings (each
    // (doc, term) appears once, so a count IS the df). `fetched`
    // feeds this aggregate AND the scoring join, so the pruned-bucket
    // scan runs twice — deliberately unpersisted (the facade returns
    // a lazy frame; a cache here would leak past the call), and the
    // re-read is bounded by the terms' buckets, not the index
    val dfs = fetched.groupBy("i").agg(count(lit(1)).as("df"))
    val partial =
      ((col("n") - col("df") + lit(0.5)) / (col("df") + lit(0.5))) *
        ((col("tf") * lit(k1 + 1)) / (col("tf") + lit(k1) *
          (lit(1 - b) + lit(b) * col("dl")
            / (col("sdl") * lit(1.0) / col("n")))))
    fetched
      .join(broadcast(dfs), "i")
      .crossJoin(broadcast(stats))
      .select(col("doc_id"), col("i"), partial.as("p"))
      // fixed-order fold: absent terms contribute exact 0.0 in the
      // kernel, so left-folding the PRESENT partials in term order
      // reproduces its float sum bit-for-bit
      .groupBy("doc_id")
      .agg(aggregate(sort_array(collect_list(struct(col("i"), col("p")))),
        lit(0.0), (acc, x) => acc + x("p")).as("score"))
      .select(col("doc_id"), round(col("score"), 6).as("bm25"))
  }

  /** Fold tombstones away: rewrite the live postings and census with
    * the swap discipline (gens preserved — [[NeardupIndex.compact]]'s
    * crash-window argument), then clear tombstones.
    *
    * Returns the folded index's [[IndexCompaction.CompactStats]] —
    * measured on the rewrite's OWN write via an `observe` metric
    * (zero extra jobs): the post-compact state is by construction
    * (live rows, live rows, 0 tombstones), so a caller re-running
    * [[compactStats]] right after would pay two more full postings
    * scans for numbers the compact already counted. The two rewrites
    * (postings, census) stage their tmp dirs CONCURRENTLY — they are
    * independent jobs sharing no target (guide: overlap independent
    * jobs) — and swap sequentially only once both are staged, so
    * every crash window is one the re-run-compact convergence
    * argument already covers.
    */
  def compact(spark: SparkSession, dir: String): IndexCompaction.CompactStats = {
    // heal any interrupted previous swap BEFORE building the rewrite
    // frames: liveRows eagerly resolves the target dir's schema, so a
    // restore that only ran inside swapIn (after the frame is built)
    // would never be reached — the crash window between the two
    // renames would leave the index permanently unreadable
    // (NeardupIndex.compact restores first for the same reason)
    val hfs = new Path(dir).getFileSystem(
      spark.sessionState.newHadoopConf())
    for (p <- Seq(postingsDir(dir), docsDir(dir))) {
      val (t, tr) = (new Path(p), new Path(CompactStaging.trash(p)))
      if (!hfs.exists(t) && hfs.exists(tr)) hfs.rename(tr, t)
    }
    def stage(path: String, partitionBy: Option[String])(
        rows: DataFrame): Unit = {
      val fs = new Path(path).getFileSystem(
        spark.sessionState.newHadoopConf())
      fs.delete(new Path(CompactStaging.tmp(path)), true)
      fs.delete(new Path(CompactStaging.trash(path)), true)
      val w = rows.write.mode(SaveMode.Overwrite)
      partitionBy.fold(w)(c => w.partitionBy(c))
        .parquet(CompactStaging.tmp(path))
    }
    def swap(path: String): Unit = {
      val target = new Path(path)
      val fs = target.getFileSystem(spark.sessionState.newHadoopConf())
      val tmp = new Path(CompactStaging.tmp(path))
      val trash = new Path(CompactStaging.trash(path))
      if (!fs.rename(target, trash))
        throw new IllegalStateException(s"index compact swap failed: $target")
      if (!fs.rename(tmp, target)) {
        fs.rename(trash, target)
        throw new IllegalStateException(s"index compact swap failed: $target")
      }
      fs.delete(trash, true)
    }
    val obs = org.apache.spark.sql.Observation()
    val postingsLive = liveOf(spark, dir, postingRows(spark, dir))
      .observe(obs, count(lit(1)).as("rows"))
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    implicit val ec: scala.concurrent.ExecutionContext =
      scala.concurrent.ExecutionContext.global
    val staged = Seq(
      Future(stage(postingsDir(dir), Some("tb"))(postingsLive)),
      Future(stage(docsDir(dir), None)(
        liveOf(spark, dir, censusRows(spark, dir)))))
    staged.foreach(Await.result(_, 1.hour))
    swap(postingsDir(dir))
    swap(docsDir(dir))
    writeEmptyTombstones(spark, dir)
    val n = obs.get("rows").asInstanceOf[Long]
    IndexCompaction.CompactStats(n, n, 0L)
  }

  /** Measured tombstone backlog — the WHEN-to-compact half of this
    * index's health ([[IndexCompaction]]; [[loadStats]] answers the
    * when-to-REBUILD half): counted over the postings, the dominant
    * read-side table every search scans. The docs census is governed
    * by the SAME tombstones, so its dead fraction tracks this one, and
    * [[compact]] rewrites both. Feed to
    * [[IndexCompaction.compactAdvice]], or call
    * `Graft.textIndexCompactHealth` for the one-call verdict.
    */
  def compactStats(spark: SparkSession,
      dir: String): IndexCompaction.CompactStats =
    IndexCompaction.measure(spark, postingsDir(dir), "doc_id",
      tombsDir(dir))

  /** Postings-layout health, for operators deciding WHEN to rebuild
    * at a different bucket count — the inverted-index member of the
    * advisory family ([[BucketIndex.capacityAdvice]],
    * [[AnnIndex.loadStats]]): `termBuckets` is FROZEN at build time,
    * so a corpus that grew N× serves every term lookup from a bucket
    * dir holding ~N× more posting rows, and nothing resizes by
    * itself. Counts RAW posting rows per bucket — appended
    * generations and tombstone-superseded rows included — because
    * that is the scan a term lookup pays as laid out; run [[compact]]
    * first if generations piled up, and re-measure (advice a compact
    * would have cleared is not a rebuild signal). One column-pruned
    * pass over the postings (`tb`, `term` only), ≤ termBuckets rows
    * to the driver — maintenance cadence, never per query. `p99Rows`
    * is the p99-by-rank per-bucket count (= max below 100 buckets),
    * the shared [[BucketIndex.sizingRows]] statistic.
    * `p99TopTermRows` — the largest single term's posting-list length
    * INSIDE the p99-rank bucket — rides along because it is that
    * bucket's INDIVISIBLE floor: a term's postings hash to one bucket
    * whole, so no fanout gets the sizing bucket under its own hottest
    * term's list ([[rebuildAdvice]] uses it to never advise a rebuild
    * that rebuilding cannot fix). Scoped to the p99 bucket, not the
    * global hottest term — a mega-term living in a COOLER bucket says
    * nothing about whether the overloaded bucket would split — and
    * among buckets TIED at the p99 row count, to the least-dominated
    * one: a tie means several buckets carry the sizing load, and if
    * any of them is splittable the rebuild helps, so the veto must
    * not be decided by whichever tied bucket a sort order happens to
    * surface.
    */
  case class LoadStats(termBuckets: Int, postingRows: Long,
      meanRows: Double, p99Rows: Long, maxRows: Long,
      p99TopTermRows: Long, termBucketsFloor: Int = 0)

  def loadStats(spark: SparkSession, dir: String): LoadStats = {
    val nb = termBucketsOf(spark, dir)
    // a fully-deleted-then-compacted corpus (or a build over an
    // all-empty-text frame) leaves a postings dir with no tb=
    // partitions — exactly the shrunken state the advisory exists to
    // measure, so it must read as zero rows, not crash inference
    // (postingRows' readOrEmpty fallback)
    val perTb: Array[(Long, Long)] =
      postingRows(spark, dir)
        // one pass, two fold levels: rows per (bucket, term), then
        // per bucket (rows, hottest term's rows) — the term-level
        // shuffle is ∝ distinct (bucket, term), the driver gets ≤ nb
        .groupBy("tb", "term").agg(count(lit(1)).as("c"))
        .groupBy("tb").agg(sum("c").as("rows"), max("c").as("mt"))
        .collect().map(r => (r.getLong(1), r.getLong(2)))
    val counts = perTb.map(_._1).toIndexedSeq
    val total = counts.sum
    val p99 = BucketIndex.sizingRows(counts)
    // the sizing bucket's own hottest term, derived from sizingRows'
    // OWN answer (no re-implemented rank arithmetic to drift): among
    // buckets tied at the p99 row count, take the LEAST dominated —
    // if ANY bucket at the sizing load is splittable, a rebuild is
    // not futile, so the veto must not hide behind a tied mega-term
    val p99Top =
      if (perTb.isEmpty) 0L
      else perTb.filter(_._1 == p99).map(_._2).min
    LoadStats(nb, total, total.toDouble / math.max(1, nb), p99,
      if (counts.isEmpty) 0L else counts.max,
      p99Top, termBucketsFloorOf(spark, dir))
  }

  /** A [[rebuildAdvice]] recommendation: rebuild at `termBuckets`,
    * persisting `termBucketsFloor` in the new index's meta (pass both
    * to [[build]]). The floor rides the advice because it is PART of
    * what the measurement learned: a skew-driven grow proves the
    * current count collision-concentrates, and a rebuilt index that
    * doesn't remember that would advise shrinking right back into it.
    */
  case class Rebuild(termBuckets: Int, termBucketsFloor: Int)

  /** Pure rebuild decision over [[loadStats]] — Some([[Rebuild]])
    * when the p99 bucket holds ≥2× the target rows (grow) or the
    * corpus shrank to ≤half the buckets' worth (tiny buckets pay
    * per-partition task overhead for nothing); None inside the band —
    * 2× hysteresis keeps a corpus near a boundary from flapping
    * advice delta over delta, like [[AnnIndex.retrainAdvice]]. Two
    * twists the hash modulus forces, where k-means has neither: a
    * recommendation EQUAL to the current count is meaningless (the
    * same modulus reproduces the identical layout bit for bit, where
    * re-running k-means rebalances), so the grow branch always
    * recommends ≥2× the current count — also the honest minimum,
    * since the trigger statistic already proves ≥2× the designed
    * load; and a single term's posting list is INDIVISIBLE (it hashes
    * to one bucket whole), so when the SIZING bucket is mostly its
    * own one mega-term (`p99TopTermRows` ≥ half of `p99Rows`) and
    * total volume alone doesn't warrant more buckets, the advice is
    * None — a rebuild would move the list, not shrink it.
    *
    * The SKEW FLOOR closes the one loop hysteresis alone cannot: a
    * grow whose trigger was collision skew (`p99Rows` tripped while
    * `ideal ≤ termBuckets` — volume alone didn't warrant the count)
    * spreads the hot terms at 2× the buckets, after which the
    * volume-only shrink condition (`ideal*2 ≤ termBuckets`) holds BY
    * CONSTRUCTION of that grow — without memory the next measurement
    * advises back down to ~`ideal`, at or below the count that just
    * tripped, where the skew re-concentrates and re-fires the grow:
    * a cron oscillates between two layouts forever. So a skew-driven
    * grow carries its recommendation as [[Rebuild.termBucketsFloor]]
    * (persisted by [[build]], surfaced by [[loadStats]]), and the
    * shrink branch never recommends below the stored floor: it
    * shrinks to `max(ideal, floor)` and only when THAT still halves
    * the current count. Grow recommendations respect the floor too —
    * an operator who once built below it is advised at least the
    * floor, never a count inside the proven-collision zone. A
    * volume-driven grow and a shrink carry the existing floor
    * forward unchanged — the skew evidence doesn't expire just
    * because the corpus grew.
    *
    * The same no-futile-advice rule governs the 2^20 fanout cap: a
    * grow recommendation clamped to ≤ the current count would
    * rebuild into the identical (or a coarser) layout, so past the
    * cap the advisory stays silent rather than sending a cron in
    * circles. Act with [[build]] into a fresh dir (same corpus, new
    * count AND floor) and swap readers.
    */
  def rebuildAdvice(stats: LoadStats,
      targetRowsPerBucket: Long): Option[Rebuild] = {
    require(targetRowsPerBucket > 0,
      s"targetRowsPerBucket must be positive, got $targetRowsPerBucket")
    if (stats.postingRows == 0L || stats.termBuckets == 0) return None
    val ideal = math.max(1L,
      math.round(stats.postingRows.toDouble / targetRowsPerBucket))
    // the 2^20 cap applies to the RETURNED recommendation only — a
    // capped ideal inside the band decisions could advise a too-big
    // corpus DOWN (the AnnIndex.retrainAdvice argument)
    def cap(n: Long): Int = math.min(1L << 20, n).toInt
    // the stored floor participates in recommendations, so it is
    // clamped to the same cap FIRST: a hand-persisted floor above
    // 2^20 would otherwise force every recommendation below its own
    // floor (no fanout above the cap is ever advised), and carrying
    // the uncapped value forward would persist the inconsistency
    val floor = cap(stats.termBucketsFloor.toLong)
    // p99/2 >= target: the overflow-proof 2x spelling (equivalent
    // over positive integers; 2 * target wraps for a sentinel target
    // near Long.MaxValue — AnnIndex.sameKArm's rationale)
    if (stats.p99Rows / 2 >= targetRowsPerBucket) {
      val skewDriven = ideal <= stats.termBuckets
      if (skewDriven && 2 * stats.p99TopTermRows >= stats.p99Rows) None
      else {
        // every recommendation respects the stored floor, grows
        // included: an operator who once built below the floor could
        // otherwise be advised a volume grow INTO the proven-collision
        // zone (max(ideal, 2×current) < floor)
        val rec = cap(math.max(math.max(ideal, 2L * stats.termBuckets),
          floor.toLong))
        if (rec <= stats.termBuckets) None
        // a skew grow remembers the count it proved overloaded by
        // flooring at its own recommendation; a volume grow learned
        // nothing new about collisions and carries the floor as is
        else if (skewDriven) Some(Rebuild(rec, math.max(floor, rec)))
        else Some(Rebuild(rec, floor))
      }
    } else {
      val floored = math.max(ideal, floor.toLong)
      if (floored * 2 <= stats.termBuckets)
        Some(Rebuild(cap(floored), floor))
      else None
    }
  }
}
