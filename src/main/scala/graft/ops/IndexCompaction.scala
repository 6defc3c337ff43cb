package graft.ops

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** The WHEN-to-compact half of maintained-index health, shared by all
  * three indexes ([[TextIndex]], [[AnnIndex]], [[NeardupIndex]]) the
  * way [[CompactStaging]] shares their staging names: the sizing half
  * of the maintenance question is measured and advised per index
  * ([[TextIndex.rebuildAdvice]], [[AnnIndex.retrainAdvice]]), but
  * between rebuilds the delta protocol accumulates a TOMBSTONE BACKLOG
  * every read pays for — superseded generations scanned and discarded,
  * tombstones folded and broadcast — and nothing measured when that
  * backlog makes [[TextIndex.compact]]/[[AnnIndex.compact]]/
  * [[NeardupIndex.compact]] worth running. An operator cron without
  * this either compacts on a timer (wasted rewrites of an
  * append-mostly index) or never (reads that degrade ∝ churn).
  *
  * Measurement counts the index's DOMINANT read-side table (postings /
  * bands — the one every probe scans), one two-column pass (id + gen)
  * plus ONE pass over the tombstone table (collapsed to max-gen per id
  * with the raw count riding the same aggregate): maintenance cadence,
  * never per query.
  */
object IndexCompaction {

  /** One index's measured tombstone backlog: `rawRows` is the row
    * count as laid out (every appended generation — the scan a read
    * pays), `liveRows` the rows surviving the strictly-newer-tombstone
    * kill rule (the scan a read pays AFTER a compact), `tombstoneRows`
    * the uncollapsed tombstone table (read and folded per query).
    */
  case class CompactStats(rawRows: Long, liveRows: Long,
      tombstoneRows: Long) {
    /** Rows a strictly newer tombstone has already killed. */
    def deadRows: Long = rawRows - liveRows
    /** Rows a [[compactAdvice]]-recommended compact folds away. */
    def reclaimableRows: Long = deadRows + tombstoneRows
    def deadFraction: Double =
      if (rawRows == 0L) 0.0 else deadRows.toDouble / rawRows
  }

  /** Read a maintained-index table tolerating the EMPTY LAYOUT state:
    * a dir that EXISTS but holds no data files at all — what a build
    * over an empty frame, or a compact of a fully-deleted corpus,
    * leaves behind (a partitioned write of zero rows produces no
    * partition dirs, a plain write of zero rows can produce no part
    * files). Parquet schema inference crashes on such a dir, which
    * without this fallback BRICKS the index: every later read —
    * currentGen, search/probe, applyDelta, the next compact — throws,
    * so a corpus that legitimately emptied out could never be
    * repopulated. Falls back to an empty frame with `schema` (the
    * layout's declared row shape) exactly when the dir exists with no
    * data entries; a MISSING dir still fails loudly through the normal
    * read — that is the torn-build state the builds' delete-data-first
    * ordering deliberately surfaces, not a valid empty index.
    * `schema` is BY-NAME, evaluated only on the fallback path — a
    * caller that resolves its declared shape from a sidecar meta file
    * ([[AnnIndex]]'s stored extras schema) pays that read only when
    * the layout is actually empty, never on the populated hot path.
    */
  private[graft] def readOrEmpty(spark: SparkSession, dir: String,
      schema: => StructType): DataFrame = {
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    val exists = fs.exists(p)
    // hidden entries (_SUCCESS, .crc) are not data; partition dirs
    // (tb=/cid=/band=) and part files are. The compact staging dirs
    // are SIBLINGS of the table dir (CompactStaging), never inside it.
    val hasData = exists && fs.listStatus(p).exists { st =>
      val n = st.getPath.getName
      !n.startsWith("_") && !n.startsWith(".")
    }
    if (!exists || hasData) spark.read.parquet(dir)
    else Probes.emptyFrame(spark, schema)
  }

  /** Highest `gen` across several index tables in ONE Spark job — the
    * shared `currentGen` kernel ([[TextIndex]]/[[AnnIndex]]/
    * [[NeardupIndex]]): each table's max(gen) is a parquet
    * footer-statistics read, but running them as separate actions paid
    * one driver-scheduled job per table; a union of the pruned `gen`
    * columns folds them into one. Empty tables contribute nothing
    * (null max → 0, the family's empty-index convention).
    */
  private[graft] def maxGenOf(tables: Seq[DataFrame]): Long =
    tables.map(_.select(col("gen").cast("long").as("gen")))
      .reduce(_ unionAll _)
      .agg(max("gen")).head() match {
        case r if r.isNullAt(0) => 0L
        case r => r.getLong(0)
      }

  /** Measure one index's backlog: `rowsDir` is its dominant read-side
    * table (read via [[readOrEmpty]] — a fully-deleted-then-compacted
    * index has a data dir with no partitions and must read as zero
    * rows, not crash schema inference), `idCol` the key the tombstones
    * kill by. One scan of each table: the tombstones collapse to
    * max-gen per id with the raw count riding the same aggregate
    * (persisted across its two consumers), and the collapsed side
    * broadcasts when its measured id count is broadcast-sized — the
    * size is already known here, so no separate bounded probe runs.
    */
  private[graft] def measure(spark: SparkSession, rowsDir: String,
      idCol: String, tombsDir: String): CompactStats = {
    val tm = spark.read.parquet(tombsDir)
      .groupBy(idCol).agg(max("gen").as("tgen"), count(lit(1)).as("tn"))
    tm.persist()
    try {
      val t = tm.agg(coalesce(sum("tn"), lit(0L)), count(lit(1))).head()
      val (tombstoneRows, tombIds) = (t.getLong(0), t.getLong(1))
      // id + gen only — column-pruned like the sizing stats' passes
      val rows = readOrEmpty(spark, rowsDir, StructType(Seq(
          StructField(idCol, LongType), StructField("gen", LongType))))
        .select(col(idCol), col("gen"))
      val tside = if (tombIds <= Probes.DefaultMaxRows) broadcast(tm) else tm
      // raw and live measured in ONE job: tm is unique per id (the
      // groupBy above), so a left-outer join preserves the raw row
      // count and the kill-rule predicate — LITERALLY the reads' rule,
      // strictly newer tombstone wins — rides the same pass as a
      // conditional count (the former raw-count job re-scanned the
      // whole postings table only to count it)
      val c = rows.as("r")
        .join(tside.as("t"), col(s"r.$idCol") === col(s"t.$idCol"),
          "left_outer")
        .agg(count(lit(1)).as("raw"),
          coalesce(sum(when(col("t.tgen") > col("r.gen"), 1L)
            .otherwise(0L)), lit(0L)).as("dead"))
        .head()
      val (raw, dead) = (c.getLong(0), c.getLong(1))
      CompactStats(raw, raw - dead, tombstoneRows)
    } finally tm.unpersist()
  }

  /** Pure compact decision over [[CompactStats]] — Some(reclaimable
    * rows) when the backlog (dead rows + tombstones) has reached the
    * LIVE row count, i.e. the as-laid-out scan (raw + tombstones =
    * live + backlog) pays ≥2× what the post-compact scan would: the
    * advisory family's 2× threshold ([[TextIndex.rebuildAdvice]],
    * [[AnnIndex.retrainAdvice]]), applied to the read-amplification
    * ratio a compact resets. None below it, and None whenever there is
    * NOTHING to reclaim — a compact that folds zero rows is the futile
    * maintenance the family never advises, however small the index.
    * Flap-proof by direction: a compact only shrinks the backlog, so
    * acted-on advice is silent until real churn re-accumulates.
    *
    * The threshold is RELATIVE, so a 4-row index with a 6-row backlog
    * fires just like a 4-billion-row one — deliberate (the tiny
    * compact is also tiny to run), but a fleet cron acting on hundreds
    * of small indexes can raise `minReclaimable` to skip compacts
    * whose absolute payoff is under the cost of scheduling one, and
    * should order a wave largest-`recommended`-first (the
    * `approx_live_rows` reattach discipline) so the biggest read-side
    * wins land first. `minReclaimable = 0` (the default) keeps the
    * pure relative threshold.
    */
  def compactAdvice(stats: CompactStats,
      minReclaimable: Long = 0L): Option[Long] = {
    val backlog = stats.reclaimableRows
    if (backlog > 0 && backlog >= stats.liveRows &&
      backlog >= minReclaimable) Some(backlog)
    else None
  }
}
