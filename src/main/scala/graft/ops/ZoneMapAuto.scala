package graft.ops

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat

/** Zero-code-change file skipping: an OPT-IN optimizer rule that
  * spots a plain `spark.read.parquet(dir)` scan whose directory has a
  * maintained `<dir>._zonemaps` sibling (the CDC sink's
  * `sink.zonemap.columns` layout) and wraps the relation's FileIndex
  * with the manifest verdicts — after `ZoneMapAuto.enable(spark)`,
  * EVERY existing query over a zone-mapped table skips files, no
  * `ZoneMapTable` call anywhere.
  *
  * This is the `SparkSessionExtensions`-shaped integration delivered
  * through `spark.experimental.extraOptimizations`, which (unlike
  * session extensions) can be toggled on a LIVE session — the same
  * mechanism, the same `Rule[LogicalPlan]` contract.
  *
  * Soundness: the rule only WRAPS the relation's own file index
  * ([[ZoneMapPrunedIndex]] delegates the listing, so the files seen
  * are exactly the files the plain read would see), and the verdict
  * layer keeps its over-read-never-under-read contract; an
  * ineligible shape (multi-root scan, non-parquet format, streaming
  * relation, already wrapped) is left untouched. The manifest
  * snapshot is taken per planned query — stale manifests over-read.
  */
object ZoneMapAuto {

  /** The manifest convention: a `<dir>._zonemaps` SIBLING of the
    * table directory (what the CDC sink maintains).
    */
  def manifestOf(root: Path): Path =
    new Path(root.getParent, root.getName + "._zonemaps")

  /** Verdicts cached per manifest path, validated by the manifest
    * dir's mtime (overwrite/append both touch it): the manifest
    * collect is a small Spark job, and paying it once per PLANNED
    * QUERY would tax every query over a hot table — with the cache
    * it is paid once per manifest VERSION. A stale hit is impossible
    * beyond the mtime window, and even then the contract degrades to
    * over- or under-SKIPPING files the verdicts were built for —
    * never to wrong rows, because pruning only consults stats of
    * files it recognizes and keeps everything else.
    */
  private val cache =
    new java.util.concurrent.ConcurrentHashMap[String,
      (Long, ZoneMapVerdicts)]()

  private def verdictsFor(spark: SparkSession, manifest: Path,
      mtime: Long): ZoneMapVerdicts = {
    if (cache.size > 256) cache.clear() // crude bound; rebuilt on miss
    val key = manifest.toString
    val hit = cache.get(key)
    if (hit != null && hit._1 == mtime) hit._2
    else {
      val v = new ZoneMapVerdicts(spark, key)
      cache.put(key, (mtime, v))
      v
    }
  }

  final case class AutoRule(spark: SparkSession)
      extends Rule[LogicalPlan] {
    override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
      case l @ LogicalRelation(r: HadoopFsRelation, _, _, false, _)
          if eligible(r) =>
        // DEGRADE, NEVER BREAK: between eligible()'s exists() and the
        // reads below, a concurrent maintenance pass can be rewriting
        // the manifest (rebuild = delete + rewrite over seconds). A
        // vanished or half-written manifest must leave the user's
        // plain read exactly as it was — an unpruned scan — not fail
        // the query from inside the optimizer.
        try {
          val manifest = manifestOf(r.location.rootPaths.head)
          val fs = manifest.getFileSystem(
            spark.sessionState.newHadoopConf())
          val mtime = fs.getFileStatus(manifest).getModificationTime
          l.copy(relation = r.copy(
            location = new ZoneMapPrunedIndex(r.location,
              verdictsFor(spark, manifest, mtime)))(spark))
        } catch {
          case scala.util.control.NonFatal(e) =>
            logWarning(s"ZoneMapAuto: leaving scan unpruned " +
              s"(manifest unreadable: ${e.getMessage})")
            l
        }
    }

    private def eligible(r: HadoopFsRelation): Boolean =
      r.fileFormat.isInstanceOf[ParquetFileFormat] &&
        !r.location.isInstanceOf[ZoneMapPrunedIndex] &&
        !r.location.isInstanceOf[ZoneMapFileIndex] &&
        r.location.rootPaths.size == 1 && {
          val root = r.location.rootPaths.head
          val fs = root.getFileSystem(
            spark.sessionState.newHadoopConf())
          fs.exists(manifestOf(root))
        }
  }

  /** Install the rule on a live session (idempotent). */
  def enable(spark: SparkSession): Unit = {
    val exp = spark.experimental
    if (!exp.extraOptimizations.exists(_.isInstanceOf[AutoRule]))
      exp.extraOptimizations = exp.extraOptimizations :+ AutoRule(spark)
  }

  /** Remove the rule (queries return to plain listings). */
  def disable(spark: SparkSession): Unit = {
    val exp = spark.experimental
    exp.extraOptimizations =
      exp.extraOptimizations.filterNot(_.isInstanceOf[AutoRule])
  }
}
