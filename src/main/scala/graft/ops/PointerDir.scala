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
    * then GC of every other `d_*`). Callers that must order the data
    * write against another swap (sync's bucket swap deletes the
    * staged fold this data is derived from) run the two phases on
    * either side of it.
    */
  def stage(spark: SparkSession, dir: String, data: DataFrame,
      renderMeta: String => Seq[String]): () => Unit = {
    val dataName = s"d_${java.util.UUID.randomUUID()}"
    data.coalesce(1).write.mode(SaveMode.Overwrite)
      .parquet(new Path(dir, dataName).toString)
    () => {
      writeMetaLines(spark, dir, renderMeta(dataName))
      val fs = new Path(dir)
        .getFileSystem(spark.sessionState.newHadoopConf())
      for (st <- fs.listStatus(new Path(dir))
          if st.isDirectory && st.getPath.getName.startsWith("d_") &&
            st.getPath.getName != dataName)
        fs.delete(st.getPath, true)
    }
  }

  /** [[stage]] + immediate flip — the attach/full-build path. */
  def publish(spark: SparkSession, dir: String, data: DataFrame,
      renderMeta: String => Seq[String]): Unit =
    stage(spark, dir, data, renderMeta)()
}
