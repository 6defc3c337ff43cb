package graft.ops

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** The atomic publish discipline shared by every sidecar a
  * maintenance pass derives from a current table ([[RollupTable]]
  * partials, [[BucketIndex]] blooms): data lives in an immutable
  * `d_<nonce>/` parquet dir, a tiny `_meta.txt` (written atomically,
  * LAST) points at the current one, and unpointed dirs are
  * garbage-collected after each flip. Readers resolve the pointer
  * then read — they see the old complete artifact or the new one,
  * never a mix; a crash between data write and pointer flip leaks
  * one orphan dir until the next publish's GC, never a wrong answer.
  *
  * Data is written as ONE file (coalesce) — the artifacts published
  * through this single-pointer form (rollup partials) are small BY
  * CONTRACT (buckets × groups rows; see the countd sizing note on
  * [[RollupTable.Agg]]) and read whole in one request. Artifacts that
  * legitimately grow with the table — a correctly-sized bloom sidecar
  * is ~10 bits per live row — outgrow a single pointer ENTIRELY:
  * [[graft.ops.BucketIndex]] keeps its own grouped manifest (one
  * pointer per bucket-group, per-sync IO ∝ touched groups) while
  * sharing this module's meta/GC/attached discipline.
  */
private[graft] object PointerDir {

  def metaFile(dir: String): Path = new Path(dir, "_meta.txt")

  def readMetaLines(spark: SparkSession, dir: String): Option[Vector[String]] = {
    val p = metaFile(dir)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(p)) return None
    val in = fs.open(p)
    try Some(scala.io.Source.fromInputStream(in, "UTF-8")
      .getLines().map(_.trim).filter(_.nonEmpty).toVector)
    finally in.close()
  }

  def writeMetaLines(spark: SparkSession, dir: String,
      lines: Seq[String]): Unit =
    graft.streaming.AtomicFiles.write(metaFile(dir).toString,
      lines.mkString("\n"), spark.sparkContext.hadoopConfiguration)

  def metaField(lines: Seq[String], k: String): String =
    lines.find(_.startsWith(k + "="))
      .getOrElse(throw new IllegalStateException(
        s"sidecar meta missing '$k='")).drop(k.length + 1)

  /** Write `data` as a fresh `d_<nonce>` under `dir` NOW; return the
    * deferred FLIP that publishes it (meta rewrite via `renderMeta`,
    * then GC). Callers that must order the data write against
    * another swap (sync's bucket swap deletes the staged fold this
    * data is derived from) run the two phases on either side of it.
    *
    * GC retains ONE previous generation besides the newly-pointed
    * dir: a reader (an executing frame, a registered SQL view) that
    * resolved the pointer just before the flip keeps reading intact
    * files through one concurrent publish — only a reader TWO
    * publishes behind can hit FileNotFound, the same re-register-
    * after-ingestion contract table views already carry.
    */
  def stage(spark: SparkSession, dir: String, data: DataFrame,
      renderMeta: String => Seq[String]): () => Unit = {
    val dataName = s"d_${java.util.UUID.randomUUID()}"
    data.coalesce(1).write.mode(SaveMode.Overwrite)
      .parquet(new Path(dir, dataName).toString)
    () => {
      val previous = readMetaLines(spark, dir)
        .map(ls => metaField(ls, "data")).filter(_.nonEmpty)
      writeMetaLines(spark, dir, renderMeta(dataName))
      val keep = Set(dataName) ++ previous
      val fs = new Path(dir)
        .getFileSystem(spark.sessionState.newHadoopConf())
      for (st <- fs.listStatus(new Path(dir))
          if st.isDirectory && st.getPath.getName.startsWith("d_") &&
            !keep(st.getPath.getName))
        fs.delete(st.getPath, true)
    }
  }

  /** [[stage]] + immediate flip — the attach/full-build path. */
  def publish(spark: SparkSession, dir: String, data: DataFrame,
      renderMeta: String => Seq[String]): Unit =
    stage(spark, dir, data, renderMeta)()

  /** Shared filename hygiene for sidecar names (rollup names, index
    * columns) — one charset rule so the two can never drift.
    */
  def validSegment(kind: String, s: String): Unit =
    require(s.nonEmpty && s.forall(c =>
      c.isLetterOrDigit && c < 128 || c == '_' || c == '-'),
      s"$kind '$s' — letters, digits, _ and - only")

  /** The ONE incremental-vs-rebuild rule every bucketed sidecar
    * (rollup partials, index blooms) maintains by: when the sidecar's
    * persisted modulus matches the table's, carry the untouched
    * buckets' rows from the OLD data dir and recompute only the
    * touched buckets from the staged fold; when a rescale flipped
    * the modulus (or a crashed attach left no data), rebuild from the
    * untouched live buckets + the stage — one table-sized read, once
    * per rescale, the cost the rescale itself already paid. The
    * pre-swap read of untouched live buckets is exactly their
    * post-swap content (the swap only replaces touched buckets).
    */
  def mergeBucketed(spark: SparkSession, currentDir: String, dir: String,
      nb: Int, metaNb: Int, oldData: Option[String], touched: Set[Int],
      fresh: DataFrame, aggOf: DataFrame => DataFrame): DataFrame =
    oldData match {
      case Some(d) if metaNb == nb =>
        spark.read.parquet(new Path(dir, d).toString)
          .filter(!org.apache.spark.sql.functions.col("kb")
            .isin(touched.toSeq: _*))
          .unionByName(fresh)
      case _ =>
        val cfs = new Path(currentDir)
          .getFileSystem(spark.sessionState.newHadoopConf())
        val untouched = cfs.listStatus(new Path(currentDir)).toSeq
          .map(_.getPath.getName)
          .filter(n => n.startsWith("kb=") &&
            !touched(n.stripPrefix("kb=").toInt))
          .map(n => s"$currentDir/$n")
        if (untouched.isEmpty) fresh
        else aggOf(spark.read.option("basePath", currentDir)
          .parquet(untouched: _*)).unionByName(fresh)
    }

  /** Sidecar dirs under `root` that have a PUBLISHED meta — a dir
    * without one is a crashed attach's residue: invisible to
    * maintenance and to SQL registration, re-attachable (the publish
    * overwrite GCs its orphan data).
    */
  def attached(spark: SparkSession, root: String): Seq[String] = {
    val r = new Path(root)
    val fs = r.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(r)) Nil
    else fs.listStatus(r).toSeq.filter(_.isDirectory)
      .map(_.getPath.getName)
      .filter(n => fs.exists(metaFile(s"$root/$n")))
      .sorted
  }
}
