package graft.source

import java.nio.charset.StandardCharsets
import java.util

import scala.jdk.CollectionConverters._
import scala.collection.mutable

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{CompositeReadLimit, MicroBatchStream, Offset, ReadLimit, ReadMaxFiles, ReadMaxRows, SupportsAdmissionControl, SupportsTriggerAvailableNow}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.SerializableConfiguration

/** DataSourceV2 micro-batch CDC source over an append-only directory
  * of envelope JSON-lines files — a real `MicroBatchStream`
  * implementation of the S1-S4 connector seam (not Spark's
  * FileStreamSource): offsets are MySQL-binlog-shaped `(file, pos)`
  * pairs, rate limiting goes through DSv2 admission control
  * (`maxRecordsPerTrigger` / `maxFilesPerTrigger`), and
  * Trigger.AvailableNow is supported natively.
  *
  * Model (mirrors the reference's binlog reading contract,
  * `MySQLStreamer.java` S1/P3): the directory is a log — files sorted
  * by name are segments, lines within a file are ordered events, and
  * a (file, pos) offset is a durable resume point exactly like
  * `binlog.000042,1337`. `pos` is a BYTE offset into the segment,
  * the same unit a real binlog position is — so seeking to an offset
  * is an O(1) `seek`, never a scan from line 0. Files must be
  * immutable once visible (the standard log-segment contract; a live
  * Debezium adapter replaces only the listing/reading internals, the
  * offset algebra is identical).
  *
  * Scale notes: a segment's byte range is SPLIT into multiple
  * InputPartitions (Hadoop text-split semantics: a split owns every
  * line that STARTS inside it; an unaligned split start discards the
  * partial line its predecessor owns), sized by the session's file
  * split knobs (`spark.sql.files.maxPartitionBytes` /
  * `openCostInBytes` / default parallelism) FLOORED at
  * `min.split.bytes` (default 4 MiB) — parallelism is decoupled from
  * segment layout, so one multi-GB binlog segment does not serialize
  * a 1000-core batch, while a session whose split knobs are tuned
  * small for columnar scans cannot shatter a line feed into sub-MB
  * splits (per-line decode is cheap; a tiny split is pure task/seek
  * overhead, not parallelism — measured 2× on the 10-table ingest
  * when a 512 KB parquet-tuned knob leaked into the feed). Each row carries its line's
  * start byte as `_feed_pos`, so within-segment source order is
  * recoverable by sort regardless of the split plan (J3). The
  * all-available path plans from file LENGTHS alone (no content IO
  * on the driver); only row-capped admission reads lines, memoizing
  * one full count per immutable file plus a bounded partial scan of
  * the single cut file per trigger.
  */
object CdcBinlogSource {

  val Schema: StructType = StructType(Seq(
    StructField("value", StringType, nullable = false),
    StructField("_feed_file", StringType, nullable = false),
    StructField("_feed_pos", LongType, nullable = false)))

  /** (file, pos) offset; `file` is the segment name ("" = before the
    * first segment), `pos` = number of BYTES already consumed from it
    * (= the start byte of the next unread line).
    */
  final case class CdcOffset(file: String, pos: Long) extends Offset {
    override def json(): String = {
      // segment names are filesystem-arbitrary: escape for JSON —
      // quotes, backslashes AND control chars (a raw newline would
      // also defeat parse()'s regex) — or a hostile name wedges the
      // checkpoint offset log
      val esc = file.flatMap {
        case '\\' => "\\\\"
        case '"' => "\\\""
        case c if c < ' ' => f"\\u${c.toInt}%04x"
        case c => c.toString
      }
      s"""{"file":"$esc","pos":$pos}"""
    }
  }

  object CdcOffset {
    private val Re = """\{"file":"(.*)","pos":(\d+)\}""".r
    def parse(json: String): CdcOffset = json match {
      case Re(f, p) =>
        // the shared single-pass JSON unescape (handles \uXXXX too)
        CdcOffset(graft.streaming.JobConfig.unescape(f), p.toLong)
      case other => throw new IllegalArgumentException(
        s"malformed CDC offset: $other")
    }
    implicit val ordering: Ordering[CdcOffset] =
      Ordering.by(o => (o.file, o.pos))
  }
}

class CdcBinlogSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-cdc"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    CdcBinlogSource.Schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    // normalize keys: option-map casing differs between entry paths
    new CdcBinlogTable(properties.asScala.map {
      case (k, v) => k.toLowerCase(java.util.Locale.ROOT) -> v
    }.toMap)
}

final class CdcBinlogTable(properties: Map[String, String])
    extends Table with SupportsRead {
  private val path = properties.getOrElse("path",
    throw new IllegalArgumentException("graft-cdc: 'path' option is required"))

  override def name(): String = s"graft-cdc($path)"
  override def schema(): StructType = CdcBinlogSource.Schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.MICRO_BATCH_READ, TableCapability.BATCH_READ)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder with Scan {
      override def build(): Scan = this
      override def readSchema(): StructType = CdcBinlogSource.Schema
      override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
        new CdcBinlogStream(path, properties)
      // batch form: the whole log in one scan (backfill / inspection —
      // `spark.read.format("graft-cdc")`), same partitions + reader as
      // one maximal micro-batch
      override def toBatch: org.apache.spark.sql.connector.read.Batch =
        new org.apache.spark.sql.connector.read.Batch {
          private val stream = new CdcBinlogStream(path, properties)
          override def planInputPartitions(): Array[InputPartition] =
            stream.planInputPartitions(
              CdcBinlogSource.CdcOffset("", 0L), stream.reportLatestOffset())
          override def createReaderFactory(): PartitionReaderFactory =
            stream.createReaderFactory()
        }
    }
}

final class CdcBinlogStream(dir: String, properties: Map[String, String])
    extends MicroBatchStream with SupportsAdmissionControl
    with SupportsTriggerAvailableNow {
  import CdcBinlogSource._

  private val spark = SparkSession.active
  private val hadoopConf: Configuration =
    spark.sessionState.newHadoopConf()
  private val maxRecords = properties.get("maxrecordspertrigger").map(_.toLong)
  private val maxFiles = properties.get("maxfilespertrigger").map(_.toInt)

  // Driver-side memos: segments are immutable, so a file's byte
  // length is recorded at listing time and its line count (needed
  // only by row-capped admission) is computed at most once over the
  // stream's lifetime.
  private val segLens = mutable.Map.empty[String, Long]
  private val lineCounts = mutable.Map.empty[String, Long]
  private var availableNowTarget: Option[CdcOffset] = None

  private def fs: FileSystem = new Path(dir).getFileSystem(hadoopConf)

  private def segments(): Seq[String] = {
    val base = new Path(dir)
    val f = fs
    if (!f.exists(base)) Seq.empty
    else f.listStatus(base).filter(_.isFile)
      .map { s => segLens(s.getPath.getName) = s.getLen; s.getPath.getName }
      .filterNot(_.startsWith(".")).filterNot(_.startsWith("_")).sorted.toSeq
  }

  private def segLen(name: String): Long = segLens.getOrElse(name, 0L)

  /** Scan lines of `name` from byte `fromByte` (exclusive cap
    * `toByte`), at most `maxLines`; returns (lines read, end byte —
    * the byte after the last consumed line's terminator). The only
    * content IO admission control ever does.
    */
  private def scanLines(name: String, fromByte: Long, toByte: Long,
      maxLines: Long): (Long, Long) = {
    val in = fs.open(new Path(dir, name))
    try {
      in.seek(fromByte)
      val r = new ByteLineReader(in, fromByte)
      var n = 0L
      var end = fromByte
      while (n < maxLines && end < toByte && r.readLine() != null) {
        n += 1; end = r.pos
      }
      (n, math.min(end, toByte))
    } finally in.close()
  }

  private def countLines(name: String): Long =
    lineCounts.getOrElseUpdate(name,
      scanLines(name, 0L, Long.MaxValue, Long.MaxValue)._1)

  private def fullLatest(): CdcOffset = {
    val segs = segments()
    if (segs.isEmpty) CdcOffset("", 0L)
    else CdcOffset(segs.last, segLen(segs.last))
  }

  override def prepareForTriggerAvailableNow(): Unit =
    availableNowTarget = Some(fullLatest())

  override def getDefaultReadLimit: ReadLimit = (maxRecords, maxFiles) match {
    case (Some(n), Some(m)) => ReadLimit.compositeLimit(
      Array(ReadLimit.maxRows(n), ReadLimit.maxFiles(m)))
    case (Some(n), None) => ReadLimit.maxRows(n)
    case (None, Some(m)) => ReadLimit.maxFiles(m)
    case _ => ReadLimit.allAvailable()
  }

  /** S5 startup modes (reference `mysql.startup.mode` et al). Only
    * consulted on first start — a checkpoint's stored offset wins on
    * restart (S6), which Spark enforces by never calling this again.
    *
    *  - initial/earliest: beginning of the log (for a log-directory
    *    feed the snapshot IS the head of the log)
    *  - latest: skip the existing backlog
    *  - `startup.offset` "file,pos": the reference's offset-store
    *    format (P3), resuming mid-segment
    *  - `startup.timestamp.ms`: first event with `_ts` at/after the
    *    timestamp — one sequential driver-side scan of the backlog,
    *    paid once at first start (the binlog-connector equivalent
    *    seeks server-side)
    */
  override def initialOffset(): Offset = {
    import graft.streaming.StartupMode
    StartupMode.resolve(
      properties.get("startup.mode"),
      properties.get("startup.offset"),
      properties.get("startup.timestamp.ms").map(_.toLong),
      snapshotOnly = false) match {
      case StartupMode.Initial | StartupMode.Earliest => CdcOffset("", 0L)
      case StartupMode.Latest => fullLatest()
      case StartupMode.Offset(v) => v.split(",", 2) match {
        case Array(f, p) => CdcOffset(f, p.trim.toLong)
        case _ => throw new IllegalArgumentException(
          s"startup.offset must be 'file,pos': $v")
      }
      case StartupMode.Timestamp(t) => seekTimestamp(t)
    }
  }

  private val TsRe = """"_ts"\s*:\s*(\d+)""".r

  private def seekTimestamp(t: Long): CdcOffset = {
    for (s <- segments()) {
      val in = fs.open(new Path(dir, s))
      try {
        val r = new ByteLineReader(in, 0L)
        var lineStart = 0L
        var line = r.readLine()
        while (line != null) {
          val ts = TsRe.findFirstMatchIn(line).map(_.group(1).toLong)
          if (ts.exists(_ >= t)) return CdcOffset(s, lineStart)
          lineStart = r.pos
          line = r.readLine()
        }
      } finally in.close()
    }
    fullLatest()
  }
  override def deserializeOffset(json: String): Offset = CdcOffset.parse(json)
  override def commit(end: Offset): Unit = () // segments are retained
  override def stop(): Unit = ()

  override def latestOffset(): Offset = throw new UnsupportedOperationException(
    "latestOffset(start, limit) is used (SupportsAdmissionControl)")

  override def reportLatestOffset(): Offset = fullLatest()

  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val from = start.asInstanceOf[CdcOffset]
    val cap = availableNowTarget.getOrElse(fullLatest())
    val segs = segments().filter(s =>
      s > from.file || (s == from.file && from.pos < segLen(s)))
      .filter(s => s <= cap.file)
    if (segs.isEmpty) return from
    applyLimit(from, cap, segs, limit)
  }

  private def applyLimit(from: CdcOffset, cap: CdcOffset,
      segs: Seq[String], limit: ReadLimit): CdcOffset = limit match {
    case r: ReadMaxRows =>
      var remaining = r.maxRows()
      var end = from
      for (s <- segs if remaining > 0) {
        val startB = if (s == from.file) from.pos else 0L
        val endB = if (s == cap.file) math.min(segLen(s), cap.pos)
          else segLen(s)
        if (endB > startB) {
          // whole-file shortcut: the memoized count decides "fits
          // entirely" without re-reading; only the single CUT file
          // pays a partial scan (bounded by maxRows lines)
          if (startB == 0L && endB == segLen(s) &&
              countLines(s) <= remaining) {
            end = CdcOffset(s, endB)
            remaining -= countLines(s)
          } else {
            val (n, cut) = scanLines(s, startB, endB, remaining)
            if (n > 0) { end = CdcOffset(s, cut); remaining -= n }
          }
        }
      }
      end
    case f: ReadMaxFiles =>
      val taken = segs.take(f.maxFiles())
      val last = taken.last
      val lastPos = if (last == cap.file) math.min(segLen(last), cap.pos)
        else segLen(last)
      CdcOffset(last, lastPos)
    case c: CompositeReadLimit =>
      // most restrictive wins: the minimum end offset of the parts
      c.getReadLimits.map(applyLimit(from, cap, segs, _))
        .min(CdcOffset.ordering)
    case _ => cap
  }

  /** Target split size, mirroring Spark's own file-scan formula:
    * `min(maxPartitionBytes, max(openCostInBytes, total/parallelism))`
    * — so the session knobs that tune parquet scans tune this source
    * the same way, and a small batch still fans across the cluster.
    *
    * Floored at `min.split.bytes` (default 4 MiB): the session knobs
    * are sized for COLUMNAR scans, where a small split still carries
    * real per-byte decode work. A JSON line is decoded by one cheap
    * pass — a sub-MB split of a line feed buys no parallelism, just
    * per-task overhead and an extra seek+discard handshake (measured:
    * a 512 KB parquet-tuned session knob doubled the 10-table ingest
    * wall time by cutting a ~60 MB batch into ~120 splits on 4
    * cores). Tests that exercise cut-point edge cases lower the
    * floor explicitly.
    */
  private val minSplitBytes = properties.get("min.split.bytes")
    .map(_.toLong).getOrElse(4L * 1024 * 1024)

  private def maxSplitBytes(totalBytes: Long): Long = {
    val conf = spark.sessionState.conf
    val par = math.max(1, spark.sparkContext.defaultParallelism)
    math.max(math.max(1L, minSplitBytes),
      math.min(conf.filesMaxPartitionBytes,
        math.max(conf.filesOpenCostInBytes, totalBytes / par)))
  }

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val from = start.asInstanceOf[CdcOffset]
    val to = end.asInstanceOf[CdcOffset]
    if (CdcOffset.ordering.lteq(to, from)) return Array.empty
    // per-segment byte ranges from file LENGTHS alone — planning does
    // zero content IO regardless of batch size
    val ranges = segments()
      .filter(s => (s > from.file || (s == from.file && from.pos < segLen(s))) && s <= to.file)
      .flatMap { s =>
        val startB = if (s == from.file) from.pos else 0L
        val endB = if (s == to.file) math.min(to.pos, segLen(s)) else segLen(s)
        if (endB > startB) Some((s, startB, endB)) else None
      }
    if (ranges.isEmpty) return Array.empty
    // Hadoop text-split semantics: each sub-range owns the lines that
    // START inside it. The first split of a range begins at a known
    // line boundary (0 or a committed offset); later splits seek to
    // `start - 1` and discard through the next '\n', so a line
    // starting exactly at the cut is kept by exactly one split.
    val split = maxSplitBytes(ranges.map { case (_, a, b) => b - a }.sum)
    ranges.flatMap { case (s, startB, endB) =>
      val path = new Path(dir, s).toString
      val pieces = (((endB - startB) + split - 1) / split).toInt
      (0 until pieces).map { i =>
        val a = startB + i * split
        val b = math.min(a + split, endB)
        CdcSegmentPartition(path, s, a, b, aligned = i == 0)
      }
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new CdcSegmentReaderFactory(new SerializableConfiguration(hadoopConf))
}

/** One contiguous BYTE range of one immutable segment file. A reader
  * owns every line that STARTS in [startByte, endByte); `aligned`
  * marks a range beginning at a known line boundary (0 or a committed
  * offset) — an unaligned split instead seeks to `startByte - 1` and
  * discards through the next '\n' (the Hadoop text-split handshake:
  * the partial line belongs to the predecessor split, and a line
  * starting exactly at the cut survives because the discarded "line"
  * is then empty).
  */
final case class CdcSegmentPartition(path: String, name: String,
    startByte: Long, endByte: Long, aligned: Boolean) extends InputPartition

/** Byte-accurate line reader: lines terminated by '\n' (a trailing
  * '\r' is stripped, so CRLF feeds decode identically), `pos` is the
  * absolute byte offset of the next unread byte — exactly the offset
  * algebra a binlog (file, pos) resume needs, which
  * `BufferedReader.readLine` cannot provide (it conflates chars with
  * bytes and eats terminators silently).
  */
private[source] final class ByteLineReader(in: java.io.InputStream,
    startByte: Long) {
  private val buf = new Array[Byte](64 * 1024)
  private var bufLen = 0
  private var bufPos = 0
  private var bytePos = startByte
  private val line = new java.io.ByteArrayOutputStream(256)

  /** Absolute byte offset of the next unread byte (= the next line's
    * start once the previous `readLine` consumed its terminator).
    */
  def pos: Long = bytePos

  /** Next line without its terminator, null at EOF. A terminal line
    * with no trailing newline is returned (its end byte is EOF).
    */
  def readLine(): String = {
    line.reset()
    var found = false
    var eof = false
    while (!found && !eof) {
      if (bufPos >= bufLen) {
        bufLen = in.read(buf); bufPos = 0
        if (bufLen <= 0) eof = true
      }
      if (!eof) {
        val start = bufPos
        while (bufPos < bufLen && buf(bufPos) != '\n') bufPos += 1
        line.write(buf, start, bufPos - start)
        bytePos += bufPos - start
        if (bufPos < bufLen) { bufPos += 1; bytePos += 1; found = true }
      }
    }
    if (!found && line.size == 0) null
    else {
      val arr = line.toByteArray
      val n = if (arr.nonEmpty && arr(arr.length - 1) == '\r') arr.length - 1
        else arr.length
      new String(arr, 0, n, StandardCharsets.UTF_8)
    }
  }
}

final class CdcSegmentReaderFactory(conf: SerializableConfiguration)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[CdcSegmentPartition]
    new PartitionReader[InternalRow] {
      private val (in, reader) = {
        val path = new Path(p.path)
        val fs = path.getFileSystem(conf.value)
        val stream = fs.open(path)
        // unaligned split: seek one byte back and discard through the
        // next '\n' — for an aligned resume offset the previous byte
        // IS a '\n', so the same discard is a no-op by construction
        val begin = if (p.aligned) p.startByte else p.startByte - 1
        stream.seek(begin)
        val r = new ByteLineReader(stream, begin)
        if (!p.aligned) r.readLine()
        (stream, r)
      }
      private var lineStart = 0L
      private var line: String = _

      override def next(): Boolean = {
        lineStart = reader.pos
        if (lineStart >= p.endByte) return false
        line = reader.readLine()
        line != null // null = segment shrank: fail-soft
      }

      override def get(): InternalRow = new GenericInternalRow(Array[Any](
        UTF8String.fromString(line), UTF8String.fromString(p.name), lineStart))

      override def close(): Unit = in.close()
    }
  }
}

/** [[CdcFeed]] over the DSv2 source — drop-in for [[JsonLinesFeed]]
  * (projects the pipeline's `value` contract; `_feed_file`/`_feed_pos`
  * stay available to direct `readStream.format("graft-cdc")` users).
  */
final case class Dsv2Feed(dir: String,
    maxRecordsPerTrigger: Option[Long] = None,
    maxFilesPerTrigger: Option[Int] = None,
    options: Map[String, String] = Map.empty) extends CdcFeed {
  override def lines(spark: SparkSession): DataFrame = {
    val r = spark.readStream.format(classOf[CdcBinlogSource].getName)
      .option("path", dir)
    maxRecordsPerTrigger.foreach(n => r.option("maxRecordsPerTrigger", n))
    maxFilesPerTrigger.foreach(n => r.option("maxFilesPerTrigger", n))
    options.foreach { case (k, v) => r.option(k, v) }
    r.load().select("value")
  }
}
