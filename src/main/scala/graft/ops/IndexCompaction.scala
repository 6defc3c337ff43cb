package graft.ops

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

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
  * plus the tombstone fold the reads already pay: maintenance cadence,
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

  /** Measure one index's backlog: `rowsDir` is its dominant read-side
    * table (partition dirs prefixed `partitionPrefix` — the
    * [[TextIndex.loadStats]] empty-layout guard, because a fully-
    * deleted-then-compacted index has a data dir with no partitions
    * and must read as zero rows, not crash schema inference), `idCol`
    * the key the tombstones kill by.
    */
  private[graft] def measure(spark: SparkSession, rowsDir: String,
      partitionPrefix: String, idCol: String,
      tombsDir: String): CompactStats = {
    val p = new Path(rowsDir)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    val hasData = fs.exists(p) && fs.listStatus(p).exists(st =>
      st.isDirectory && st.getPath.getName.startsWith(partitionPrefix))
    val tombs = spark.read.parquet(tombsDir)
    val tombstoneRows = tombs.count()
    if (!hasData) return CompactStats(0L, 0L, tombstoneRows)
    // id + gen only — column-pruned like the sizing stats' passes
    val rows = spark.read.parquet(rowsDir).select(col(idCol), col("gen"))
    val raw = rows.count()
    val tmax = tombs.groupBy(idCol).agg(max("gen").as("tgen"))
    // LITERALLY the reads' kill rule (strictly newer tombstone wins),
    // so the measured live count can never drift from what a compact
    // would actually keep
    val live = rows.as("r")
      .join(Probes.broadcastIfSmall(tmax).as("t"),
        col(s"r.$idCol") === col(s"t.$idCol") &&
          col("t.tgen") > col("r.gen"), "left_anti")
      .count()
    CompactStats(raw, live, tombstoneRows)
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
    */
  def compactAdvice(stats: CompactStats): Option[Long] = {
    val backlog = stats.reclaimableRows
    if (backlog > 0 && backlog >= stats.liveRows) Some(backlog) else None
  }
}
