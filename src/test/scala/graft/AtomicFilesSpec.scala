package graft

import java.nio.file.Files

import scala.jdk.CollectionConverters._

import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.AtomicFiles

/** Atomic bookkeeping writes: the final name only ever holds a
  * COMPLETE value (old or new), no temp residue survives, and
  * concurrent last-write-wins publication never tears.
  */
class AtomicFilesSpec extends AnyFunSuite {
  private def conf = new org.apache.hadoop.conf.Configuration()

  test("write creates parents, round-trips content, leaves no temp") {
    val dir = Files.createTempDirectory("atomic-")
    val target = dir.resolve("nested/deeper/offsets.json")
    AtomicFiles.write(target.toString, """{"file":"b.1","pos":42}""", conf)
    assert(new String(Files.readAllBytes(target), "UTF-8") ==
      """{"file":"b.1","pos":42}""")
    // nothing but the final file (no .tmp residue — the rename
    // consumed it; checksum sidecars from the local FS are fine)
    val residue = Files.list(target.getParent).iterator().asScala
      .map(_.getFileName.toString).filter(_.contains(".tmp")).toSeq
    assert(residue.isEmpty, residue)
  }

  test("overwrite replaces whole values; a reader never sees a mix") {
    val dir = Files.createTempDirectory("atomic-ow-")
    val target = dir.resolve("status.json")
    AtomicFiles.write(target.toString, "A" * 1000, conf)
    AtomicFiles.write(target.toString, "B" * 10, conf)
    // a truncate-in-place overwrite of a SHORTER value can leave the
    // old tail visible mid-write; rename replacement cannot
    assert(new String(Files.readAllBytes(target), "UTF-8") == "B" * 10)
  }

  test("concurrent writers: final content is one writer's COMPLETE " +
      "value, never interleaved or truncated") {
    val dir = Files.createTempDirectory("atomic-race-")
    val target = dir.resolve("offsets")
    val a = "A" * 4096
    val b = "B" * 4096
    for (_ <- 1 to 20) {
      val ta = new Thread(() => AtomicFiles.write(target.toString, a, conf))
      val tb = new Thread(() => AtomicFiles.write(target.toString, b, conf))
      ta.start(); tb.start(); ta.join(); tb.join()
      val got = new String(Files.readAllBytes(target), "UTF-8")
      assert(got == a || got == b, s"torn value: ${got.take(40)}...")
    }
  }
}
