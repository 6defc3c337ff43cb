package graft.ops

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Durable, incrementally-maintained near-dup (MinHash/LSH) index —
  * the 100 TB answer to "the corpus changed, find its near-dups":
  * re-banding 100 TB per delta is off the table, so the band table is
  * a MAINTAINED dataset. Deltas append; deletes and updates are
  * generation-stamped tombstones folded in by compaction; probes are
  * a bucket join of the (small) delta against the live index. Banding
  * comes from the ONE scheme implementation
  * ([[graft.queries.TextQueries.docBands]]) the batch queries
  * (q37-q39, q102/q103) and the streaming gate already share, so an
  * index maintained here and a probe banded there can never disagree.
  *
  * Layout under `dir`:
  *   - `bands/` — (bucket, doc_id, gen) parquet, partitioned by
  *     `band`: append-only between compactions
  *   - `tombstones/` — (doc_id, gen): a row kills every band row of
  *     that doc with a STRICTLY OLDER generation
  *
  * Delta protocol (`applyDelta`): one generation per delta; tombstones
  * for every touched doc (updates AND deletes) land first, then the
  * updated docs' new band rows at the same generation. The strict
  * `tombstone.gen > band.gen` kill rule makes the write pair
  * crash-retryable in either half: a retry re-applies at the next
  * generation and its tombstones kill whichever half the crash left
  * behind — at-least-once applies converge to the same live set.
  *
  * Scale shape: signatures/bands are map-only per delta row;
  * tombstones stay ∝ CHANGES since the last compaction (broadcast at
  * read via [[Probes.broadcastIfSmall]], collapsed to one max-gen row
  * per doc first); `compact` folds them away with the same
  * tmp/trash/rename swap discipline as the sink compaction. Nothing
  * ever rewrites the index on the delta path.
  */
object NeardupIndex {

  private def bandsDir(dir: String) = s"$dir/bands"
  private def tombsDir(dir: String) = s"$dir/tombstones"

  private val TombSchema = StructType(Seq(
    StructField("doc_id", LongType), StructField("gen", LongType)))

  /** The band layout's row shape as a read returns it (partition
    * column `band` last, integer-inferred) — the
    * [[IndexCompaction.readOrEmpty]] fallback, so a fully-deleted-
    * then-compacted index (bands dir with no `band=` partitions)
    * stays readable instead of bricking every later call on schema
    * inference.
    */
  private[graft] val BandsSchema = StructType(Seq(
    StructField("doc_id", LongType), StructField("bucket", StringType),
    StructField("gen", LongType), StructField("band", IntegerType)))

  private def bandRows(spark: SparkSession, dir: String): DataFrame =
    IndexCompaction.readOrEmpty(spark, bandsDir(dir), BandsSchema)

  private def banded(spark: SparkSession, docs: DataFrame,
      gen: Long): DataFrame =
    graft.queries.TextQueries.docBands(spark, docs)
      .withColumn("gen", lit(gen))

  private def writeEmptyTombstones(spark: SparkSession, dir: String): Unit =
    spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], TombSchema)
      .repartition(1)
      .write.mode(SaveMode.Overwrite).parquet(tombsDir(dir))

  /** Cut the index fresh from `docs` (columns `doc_id`, `text`) at
    * generation 0, replacing whatever was at `dir`. Replace-not-
    * atomic with [[graft.ops.TextIndex.build]]'s delete-data-first
    * ordering: the old bands, tombstones AND compact staging dirs go
    * before anything new lands, so every torn state fails LOUDLY on
    * a missing dir instead of serving a silent mix — without the
    * sweep, a crash after the new bands but before the tombstone
    * clear would pair them with the OLD tombstones (whose higher
    * generations kill the new gen-0 rows of every previously-updated
    * doc), and a surviving `._compact_trash` could be healed back
    * over the new bands by the next compact. A crash mid-build means
    * re-run build.
    */
  def build(spark: SparkSession, docs: DataFrame, dir: String): Unit = {
    val fs = new Path(dir).getFileSystem(
      spark.sessionState.newHadoopConf())
    for (p <- Seq(bandsDir(dir), tombsDir(dir))
        ++ CompactStaging.all(bandsDir(dir)))
      fs.delete(new Path(p), true)
    banded(spark, docs, 0L)
      .write.mode(SaveMode.Overwrite).partitionBy("band")
      .parquet(bandsDir(dir))
    writeEmptyTombstones(spark, dir)
  }

  /** Highest generation recorded anywhere in the index — parquet
    * column statistics make both aggregates footer reads, fused into
    * ONE Spark job ([[IndexCompaction.maxGenOf]]).
    */
  def currentGen(spark: SparkSession, dir: String): Long =
    IndexCompaction.maxGenOf(Seq(bandRows(spark, dir),
      spark.read.parquet(tombsDir(dir))))

  /** Apply one delta: `upserts` (doc_id, text — inserts and updates
    * alike) and `deletes` (doc_id). Appends only; returns the
    * generation the delta landed as.
    */
  def applyDelta(spark: SparkSession, dir: String,
      upserts: DataFrame, deletes: DataFrame): Long = {
    val gen = currentGen(spark, dir) + 1
    // tombstones FIRST: see the delta protocol in the object doc —
    // either write order is retry-safe, but tombstone-first means a
    // torn delta under-counts (rows missing until retry) rather than
    // double-counts (stale rows alongside new ones)
    upserts.select(col("doc_id").cast("long"))
      .union(deletes.select(col("doc_id").cast("long")))
      .distinct()
      .withColumn("gen", lit(gen))
      .write.mode(SaveMode.Append).parquet(tombsDir(dir))
    banded(spark, upserts, gen)
      .write.mode(SaveMode.Append).partitionBy("band")
      .parquet(bandsDir(dir))
    gen
  }

  /** The live band set: every appended row not killed by a strictly
    * newer tombstone. Tombstones collapse to one max-gen row per doc
    * and broadcast when small (the steady state — they are ∝ changes
    * since the last compaction, not corpus size).
    */
  def live(spark: SparkSession, dir: String): DataFrame =
    liveWithGen(spark, dir).select(col("band"), col("bucket"), col("doc_id"))

  private def liveWithGen(spark: SparkSession, dir: String): DataFrame = {
    val tombs = spark.read.parquet(tombsDir(dir))
      .groupBy("doc_id").agg(max("gen").as("tgen"))
    bandRows(spark, dir).as("b")
      .join(Probes.broadcastIfSmall(tombs).as("t"),
        col("b.doc_id") === col("t.doc_id") && col("t.tgen") > col("b.gen"),
        "left_anti")
      .select(col("band"), col("bucket"), col("doc_id"), col("gen"))
  }

  /** Candidate near-dups of `newDocs` (doc_id, text) against the live
    * index: the delta's bands broadcast to the index side (the index
    * never shuffles), bucket-equality only — exact-Jaccard
    * verification stays the caller's choice, same contract as
    * `Graft.nearDupProbe`. Returns (new_id, index_id) distinct;
    * index rows whose doc is IN the delta are excluded (a probe right
    * after applyDelta must not report a doc as its own near-dup).
    */
  def probe(spark: SparkSession, dir: String, newDocs: DataFrame): DataFrame = {
    val nb = graft.queries.TextQueries.docBands(spark, newDocs)
    broadcast(nb).as("n")
      .join(live(spark, dir).as("i"),
        col("n.band") === col("i.band") &&
          col("n.bucket") === col("i.bucket") &&
          col("n.doc_id") =!= col("i.doc_id"))
      .select(col("n.doc_id").as("new_id"), col("i.doc_id").as("index_id"))
      .distinct()
  }

  /** Measured tombstone backlog — this index's FIRST health surface
    * ([[IndexCompaction]]): the band count is a scheme constant (the
    * MinHash banding's (bands, rows) tradeoff, not frozen sizing), so
    * unlike [[TextIndex]]/[[AnnIndex]] there is nothing to re-SIZE —
    * but the delta protocol accumulates the same tombstone backlog
    * every probe pays for, and WHEN a [[compact]] is worth running is
    * just as measurable. Counted over the bands, the table every probe
    * joins. Feed to [[IndexCompaction.compactAdvice]], or call
    * `Graft.neardupIndexHealth` for the one-call verdict.
    */
  def compactStats(spark: SparkSession,
      dir: String): IndexCompaction.CompactStats =
    IndexCompaction.measure(spark, bandsDir(dir), "doc_id",
      tombsDir(dir))

  /** Fold tombstones into the band table: rewrite the live set, swap
    * it in with the sink compaction's tmp/trash/rename discipline,
    * and clear the tombstones. Rows KEEP their generations through
    * the rewrite — resetting them would let a crash between the swap
    * and the tombstone clear silently kill the rewritten rows of
    * every previously-updated doc (old tombstones outrank a reset
    * gen). With gens preserved, surviving tombstones kill nothing
    * `live` hadn't already excluded, so every crash window here is
    * benign: before the swap nothing changed, between the renames the
    * next compact restores from trash, after the swap the stale
    * tombstones are inert until re-cleared.
    */
  def compact(spark: SparkSession, dir: String): IndexCompaction.CompactStats = {
    val target = new Path(bandsDir(dir))
    val fs = target.getFileSystem(spark.sessionState.newHadoopConf())
    val tmp = new Path(CompactStaging.tmp(bandsDir(dir)))
    val trash = new Path(CompactStaging.trash(bandsDir(dir)))
    // heal an interrupted previous swap before anything else
    if (!fs.exists(target) && fs.exists(trash)) fs.rename(trash, target)
    fs.delete(tmp, true); fs.delete(trash, true)
    // the folded stats ride the rewrite's own write as an observe
    // metric — the post-compact state is (live, live, 0) by
    // construction, so a re-measured compactStats right after would
    // re-scan the bands for numbers this write already counted
    val obs = org.apache.spark.sql.Observation()
    liveWithGen(spark, dir)
      .observe(obs, count(lit(1)).as("rows"))
      .write.mode(SaveMode.Overwrite).partitionBy("band")
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
}
