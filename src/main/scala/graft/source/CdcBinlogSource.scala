package graft.source

import java.io.{BufferedReader, InputStreamReader}
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
  * `binlog.000042,1337`. Files must be immutable once visible (the
  * standard log-segment contract; a live Debezium adapter replaces
  * only the listing/reading internals, the offset algebra is
  * identical).
  *
  * Scale notes: one InputPartition per file segment per batch —
  * within-segment event order is preserved per partition (the
  * reference's J3 guarantee holds per segment), distinct segments
  * read in parallel. Per-file line counts are memoized on the driver
  * (files are immutable), so steady-state admission control costs one
  * directory listing plus one count of each NEW file per trigger.
  */
object CdcBinlogSource {

  val Schema: StructType = StructType(Seq(
    StructField("value", StringType, nullable = false),
    StructField("_feed_file", StringType, nullable = false),
    StructField("_feed_pos", LongType, nullable = false)))

  /** (file, pos) offset; `file` is the segment name ("" = before the
    * first segment), `pos` = number of lines already consumed from it.
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

  // Driver-side memo: segments are immutable, so each file is counted
  // exactly once over the stream's lifetime.
  private val lineCounts = mutable.Map.empty[String, Long]
  private var availableNowTarget: Option[CdcOffset] = None

  private def fs: FileSystem = new Path(dir).getFileSystem(hadoopConf)

  private def segments(): Seq[String] = {
    val base = new Path(dir)
    val f = fs
    if (!f.exists(base)) Seq.empty
    else f.listStatus(base).filter(_.isFile).map(_.getPath.getName)
      .filterNot(_.startsWith(".")).filterNot(_.startsWith("_")).sorted.toSeq
  }

  private def countLines(name: String): Long =
    lineCounts.getOrElseUpdate(name, {
      val in = new BufferedReader(new InputStreamReader(
        fs.open(new Path(dir, name)), StandardCharsets.UTF_8))
      try { var n = 0L; while (in.readLine() != null) n += 1; n }
      finally in.close()
    })

  private def fullLatest(): CdcOffset = {
    val segs = segments()
    if (segs.isEmpty) CdcOffset("", 0L)
    else CdcOffset(segs.last, countLines(segs.last))
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
      val in = new BufferedReader(new InputStreamReader(
        fs.open(new Path(dir, s)), StandardCharsets.UTF_8))
      try {
        var pos = 0L
        var line = in.readLine()
        while (line != null) {
          val ts = TsRe.findFirstMatchIn(line).map(_.group(1).toLong)
          if (ts.exists(_ >= t)) return CdcOffset(s, pos)
          pos += 1
          line = in.readLine()
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
      s > from.file || (s == from.file && from.pos < countLines(s)))
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
        val startPos = if (s == from.file) from.pos else 0L
        val avail0 = countLines(s) - startPos
        val avail = if (s == cap.file) math.min(avail0, cap.pos - startPos)
          else avail0
        if (avail > 0) {
          val take = math.min(avail, remaining)
          end = CdcOffset(s, startPos + take)
          remaining -= take
        }
      }
      end
    case f: ReadMaxFiles =>
      val taken = segs.take(f.maxFiles())
      val last = taken.last
      val lastPos = if (last == cap.file) cap.pos else countLines(last)
      CdcOffset(last, lastPos)
    case c: CompositeReadLimit =>
      // most restrictive wins: the minimum end offset of the parts
      c.getReadLimits.map(applyLimit(from, cap, segs, _))
        .min(CdcOffset.ordering)
    case _ => cap
  }

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val from = start.asInstanceOf[CdcOffset]
    val to = end.asInstanceOf[CdcOffset]
    if (CdcOffset.ordering.lteq(to, from)) return Array.empty
    // Only the BOUNDARY segments need driver-side line counts; middle
    // segments read to EOF (endLine = MaxValue, the reader stops at
    // null) — planning cost is O(1) files, not O(batch) files.
    segments()
      .filter(s => (s > from.file || (s == from.file && from.pos < countLines(s))) && s <= to.file)
      .flatMap { s =>
        val startPos = if (s == from.file) from.pos else 0L
        val endPos = if (s == to.file) to.pos else Long.MaxValue
        if (endPos > startPos)
          Some(CdcSegmentPartition(new Path(dir, s).toString, s, startPos, endPos))
        else None
      }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new CdcSegmentReaderFactory(new SerializableConfiguration(hadoopConf))
}

/** One contiguous line range of one immutable segment file. */
final case class CdcSegmentPartition(path: String, name: String,
    startLine: Long, endLine: Long) extends InputPartition

final class CdcSegmentReaderFactory(conf: SerializableConfiguration)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[CdcSegmentPartition]
    new PartitionReader[InternalRow] {
      private val in = {
        val path = new Path(p.path)
        val fs = path.getFileSystem(conf.value)
        new BufferedReader(new InputStreamReader(fs.open(path),
          StandardCharsets.UTF_8))
      }
      private var pos = 0L
      private var line: String = _
      // skip to the partition's start line
      while (pos < p.startLine && in.readLine() != null) pos += 1

      override def next(): Boolean = {
        if (pos >= p.endLine) return false
        line = in.readLine()
        if (line == null) return false // segment shrank: fail-soft
        pos += 1
        true
      }

      override def get(): InternalRow = new GenericInternalRow(Array[Any](
        UTF8String.fromString(line), UTF8String.fromString(p.name), pos - 1))

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
