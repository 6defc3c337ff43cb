package graft

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path}

import org.apache.hadoop.conf.Configuration
import org.apache.spark.util.SerializableConfiguration
import org.scalatest.funsuite.AnyFunSuite

import graft.source.{CdcSegmentPartition, CdcSegmentReaderFactory}

/** Property test of the Hadoop-text-split handshake the byte-addressed
  * DSv2 source rides on: over random content (empty lines, CRLF, lines
  * longer than the reader's 64 KB buffer, multi-byte UTF-8 — whose
  * continuation bytes can never alias '\n', which is exactly why a cut
  * inside a character is safe) and ARBITRARY cut points, every line is
  * read by exactly one split, in order, with its true start byte as
  * `_feed_pos`. The two deterministic split tests in CdcDsv2SourceSpec
  * pin the planner; this pins the read-side math they rely on.
  */
class ByteSplitFuzzSpec extends AnyFunSuite {

  private val conf = new SerializableConfiguration(new Configuration())

  /** Read one byte-range split exactly as the source does. */
  private def readSplit(path: Path, start: Long, end: Long,
      aligned: Boolean): Seq[(String, Long)] = {
    val p = CdcSegmentPartition(path.toString, path.getFileName.toString,
      start, end, aligned)
    val r = new CdcSegmentReaderFactory(conf).createReader(p)
    val out = scala.collection.mutable.ArrayBuffer.empty[(String, Long)]
    try while (r.next()) {
      val row = r.get()
      out += ((row.getUTF8String(0).toString, row.getLong(2)))
    } finally r.close()
    out.toSeq
  }

  /** Expected (line, startByte) pairs for `content` (terminators
    * stripped, CR-before-LF stripped, terminal unterminated line
    * kept) — computed independently of the reader under test.
    */
  private def expectedLines(content: Array[Byte]): Seq[(String, Long)] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[(String, Long)]
    var start = 0
    var i = 0
    while (i < content.length) {
      if (content(i) == '\n') {
        val end = if (i > start && content(i - 1) == '\r') i - 1 else i
        out += ((new String(content, start, end - start,
          StandardCharsets.UTF_8), start.toLong))
        start = i + 1
      }
      i += 1
    }
    if (start < content.length) {
      val end = if (content(content.length - 1) == '\r') content.length - 1
        else content.length
      out += ((new String(content, start, end - start,
        StandardCharsets.UTF_8), start.toLong))
    }
    out.toSeq
  }

  private def randomContent(rnd: scala.util.Random): Array[Byte] = {
    val alphabets = Seq("ab c", "é日本語", "x\tY-0123456789")
    val n = rnd.nextInt(40)
    val sb = new StringBuilder
    for (_ <- 0 until n) {
      val len = rnd.nextInt(5) match {
        case 0 => 0 // empty line
        case 1 => 70 * 1024 / 4 // spans the 64 KB buffer (×≤4B/char)
        case _ => rnd.nextInt(60)
      }
      val a = alphabets(rnd.nextInt(alphabets.length))
      for (_ <- 0 until len) sb.append(a.charAt(rnd.nextInt(a.length)))
      sb.append(if (rnd.nextInt(4) == 0) "\r\n" else "\n")
    }
    if (rnd.nextInt(3) == 0) sb.append("tail-without-newline")
    sb.toString.getBytes(StandardCharsets.UTF_8)
  }

  test("random content × random cut points: every line exactly once, " +
      "in order, with its true start byte") {
    val rnd = new scala.util.Random(0xC0FFEE)
    val dir = Files.createTempDirectory("graft-bytesplit-")
    for (iter <- 0 until 60) {
      val content = randomContent(rnd)
      val path = dir.resolve(s"seg-$iter")
      Files.write(path, content)
      val expected = expectedLines(content)
      // arbitrary strictly-increasing cut points over [0, len] — the
      // planner only guarantees the FIRST split starts on a line
      // boundary (offset 0 or a committed offset); later cuts land
      // anywhere, including inside multi-byte characters
      val len = content.length.toLong
      val cuts = (0 until rnd.nextInt(6))
        .map(_ => (rnd.nextDouble() * len).toLong)
        .filter(c => c > 0 && c < len).distinct.sorted
      val bounds = (0L +: cuts) :+ len
      val got = bounds.sliding(2).zipWithIndex.flatMap {
        case (Seq(a, b), i) if b > a =>
          readSplit(path, a, b, aligned = i == 0)
        case _ => Seq.empty
      }.toSeq
      assert(got == expected,
        s"iter $iter: cuts=$cuts len=$len got=${got.take(5)}… " +
          s"expected=${expected.take(5)}…")
    }
  }

  test("a split starting at a committed mid-file offset (aligned) " +
      "resumes without the discard handshake") {
    val rnd = new scala.util.Random(0xBEEF)
    val dir = Files.createTempDirectory("graft-bytesplit-")
    for (iter <- 0 until 30) {
      val content = randomContent(rnd)
      if (content.nonEmpty) {
        val path = dir.resolve(s"seg-$iter")
        Files.write(path, content)
        val expected = expectedLines(content)
        if (expected.length > 1) {
          // resume from a real line boundary, like a checkpointed
          // (file, pos) offset does
          val k = 1 + rnd.nextInt(expected.length - 1)
          val resumeAt = expected(k)._2
          val got = readSplit(path, resumeAt, content.length.toLong,
            aligned = true)
          assert(got == expected.drop(k), s"iter $iter resumeAt=$resumeAt")
        }
      }
    }
  }
}
