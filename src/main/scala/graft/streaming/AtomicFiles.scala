package graft.streaming

import java.nio.charset.StandardCharsets
import java.util.EnumSet

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{CreateFlag, FileContext, Options, Path}

/** Atomic last-write-wins small-file writes for the pipeline's
  * bookkeeping (offset store, status store, commit markers, the
  * `_snapshot.done` marker): write a hidden unique temp file in the
  * target directory, then rename it onto the final name with
  * `Options.Rename.OVERWRITE` — atomic replacement on both POSIX and
  * HDFS, so a reader can observe the OLD complete content or the NEW
  * complete content, never a truncated in-between. The reference's
  * own `SingleFileSinkFunction.java:31-39` truncates in place (a
  * crash mid-write leaves a torn offset file); this is the same
  * deliberate durability improvement as publishing offsets after the
  * batch commit.
  *
  * `FileContext` (not `FileSystem.rename`): the `FileSystem` rename
  * contract returns false when the destination exists on HDFS but
  * silently overwrites on local POSIX — exactly the divergence that
  * made a tmp-rename scheme unsound as a create-once claim
  * ([[JdbcSnapshot.FileChunkProgress.savePlan]] uses
  * create-no-overwrite for that); for overwrite-intended publication
  * the OVERWRITE rename option states the semantics explicitly and
  * is atomic on both.
  */
private[graft] object AtomicFiles {

  /** Unique-enough temp suffix: concurrent writers of the same path
    * (two pipelines publishing the same offset file — already an
    * operational error) each rename their own complete temp; last
    * rename wins whole, nothing tears.
    */
  private val seq = new java.util.concurrent.atomic.AtomicLong()

  def write(path: String, content: String, conf: Configuration): Unit = {
    val fin = new Path(path)
    val fc = FileContext.getFileContext(fin.toUri, conf)
    val tmp = new Path(fin.getParent,
      s".${fin.getName}.${System.nanoTime()}-${seq.incrementAndGet()}.tmp")
    val out = fc.create(tmp,
      EnumSet.of(CreateFlag.CREATE, CreateFlag.OVERWRITE),
      Options.CreateOpts.createParent())
    try out.write(content.getBytes(StandardCharsets.UTF_8))
    finally out.close()
    fc.rename(tmp, fin, Options.Rename.OVERWRITE)
  }
}
