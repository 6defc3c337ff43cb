package graft.ops

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.{CatalystTypeConverters, InternalRow}
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.types.DataTypeUtils
import org.apache.spark.sql.execution.datasources.{FileIndex, FileStatusWithMetadata, HadoopFsRelation, InMemoryFileIndex, PartitionDirectory}
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.types._

import graft.functions.BloomSketch

/** Zone maps wired INTO the planner: a [[ZoneMapFileIndex]] prunes a
  * parquet table's file list from Catalyst's own pushed-down data
  * filters, so `ZoneMaps.table(...)` behaves like a plain
  * `spark.read.parquet` DataFrame — any filter, any query shape, SQL
  * or DataFrame — but every scan consults the manifest first and
  * reads only files whose stats can match. The explicit
  * `ZoneMaps.prunedRead`/`prunedLookup` API stays for callers that
  * want the file list; this is the same skipping with ZERO caller
  * cooperation, the way a lakehouse table format hooks its stats
  * into Spark (Delta's TahoeFileIndex shape: a custom
  * `FileIndex` under a `HadoopFsRelation`, file-level verdicts at
  * `listFiles` time).
  *
  * Soundness contract (same as the explicit API): per-file tests are
  * necessary conditions only, evaluated per CONJUNCT —
  *  - range/equality against `<c>_min`/`<c>_max` (NULL stats = the
  *    file is all-NULL in `c` = cannot match a comparison ⇒ skip),
  *  - equality additionally probes the per-file Bloom grid when the
  *    manifest carries `<c>_bloom` (no false negatives),
  *  - `IsNotNull(c)` skips all-NULL stripes (`<c>_min IS NOT NULL`),
  *  - `In`/`InSet` fold as a disjunction of equality tests,
  *  - anything unrecognized prunes NOTHING (Literal-true verdict),
  *  - files absent from the manifest are always kept (a stale
  *    manifest over-reads, never under-reads).
  * Surviving files still evaluate the real predicate row-by-row in
  * the scan — pruning can only drop files that cannot matter.
  *
  * Planning cost: the manifest is collected ONCE at index
  * construction (a row per file); each `listFiles` call evaluates
  * the translated verdict driver-side with an interpreted/codegen
  * Catalyst [[Predicate]] — no nested Spark job inside planning.
  * At 100 TB that replaces millions of footer opens with one small
  * in-memory scan per query plan.
  *
  * Reference scope note: the reference engine (flink-cdc-multi) has
  * no scan-side statistics pruning at all — this is part of the
  * lake-side completeness layer, like compaction and time travel.
  */
object ZoneMapTable {

  /** A `spark.read.parquet`-equivalent DataFrame over `dataDir`
    * whose scans skip files via the `manifestDir` zone-map manifest
    * (built/maintained by [[ZoneMaps]]). Partition columns (`dt=`)
    * keep their normal partition-pruning path; manifest pruning
    * applies to the data filters on top. The manifest snapshot is
    * taken HERE — re-call after a refresh to see newly indexed
    * stats (unindexed files are merely over-read, never missed).
    */
  def apply(spark: SparkSession, dataDir: String,
      manifestDir: String): DataFrame =
    withIndex(spark, dataDir, manifestDir)._1

  /** [[apply]], returning the backing index too — its
    * `prunedFileCount` is the observability channel specs and
    * benchmarks assert actual skipping on (the answer alone cannot
    * distinguish "pruned" from "read everything and filtered").
    */
  def withIndex(spark: SparkSession, dataDir: String,
      manifestDir: String): (DataFrame, ZoneMapFileIndex) = {
    val index = new ZoneMapFileIndex(spark, dataDir, manifestDir)
    val partitionSchema = index.partitionSpec().partitionColumns
    // data schema from the index's OWN file listing — a
    // spark.read.parquet(dataDir) here would build a second file
    // index and re-list the whole tree (at millions of files, twice
    // the planning cost for nothing); partition columns come from the
    // index's partition discovery, so the footer-inferred schema is
    // exactly the data schema
    val fmt = new ParquetFileFormat()
    // nullable-coerced like spark.read.parquet does: footer schemas
    // mark parquet `required` fields non-nullable, but that is a
    // PER-FILE fact — another file of the same table can hold nulls,
    // and a non-nullable relation schema lets the optimizer fold
    // `IsNull(c)` to false over rows that do contain nulls
    val dataSchema = asNullable(
      fmt.inferSchema(spark, Map.empty, index.allFiles())
        .getOrElse(throw new IllegalArgumentException(
          s"no parquet data under $dataDir")))
    val relation = HadoopFsRelation(index, partitionSchema, dataSchema,
      None, fmt, Map("basePath" -> dataDir))(spark)
    (spark.baseRelationToDataFrame(relation), index)
  }

  private def asNullable(s: StructType): StructType =
    StructType(s.fields.map(f =>
      f.copy(dataType = nullableType(f.dataType), nullable = true)))

  private def nullableType(dt: DataType): DataType = dt match {
    case s: StructType => asNullable(s)
    case a: ArrayType =>
      a.copy(elementType = nullableType(a.elementType), containsNull = true)
    case m: MapType => m.copy(valueType = nullableType(m.valueType),
      valueContainsNull = true)
    case other => other
  }
}

/** The [[org.apache.spark.sql.execution.datasources.FileIndex]] that
  * does the skipping: a plain [[InMemoryFileIndex]] (normal
  * directory listing + partition discovery) whose `listFiles`
  * additionally drops files the zone-map manifest rules out for the
  * pushed data filters. See [[ZoneMapTable]] for the contract.
  */
final class ZoneMapFileIndex(spark: SparkSession, dataDir: String,
    manifestDir: String)
    extends InMemoryFileIndex(spark, Seq(new Path(dataDir)),
      Map("basePath" -> dataDir), None) {

  private val verdicts = new ZoneMapVerdicts(spark, manifestDir)

  /** How many files the manifest verdict dropped across all
    * `listFiles` calls on this index — observability for specs and
    * operators (the scan metric a caller can assert on).
    */
  val prunedFileCount = new java.util.concurrent.atomic.AtomicLong(0L)

  override def listFiles(partitionFilters: Seq[Expression],
      dataFilters: Seq[Expression]): Seq[PartitionDirectory] =
    verdicts.prune(super.listFiles(partitionFilters, dataFilters),
      dataFilters, prunedFileCount)
}

/** Wrap ANY existing [[FileIndex]] with manifest verdicts — the
  * delegation form [[ZoneMapAuto]]'s optimizer rule uses to add
  * skipping to a relation Spark already built (reusing its listing
  * instead of re-walking the tree). Same contract as
  * [[ZoneMapFileIndex]].
  */
final class ZoneMapPrunedIndex(underlying: FileIndex,
    verdicts: ZoneMapVerdicts) extends FileIndex {
  val prunedFileCount = new java.util.concurrent.atomic.AtomicLong(0L)
  override def rootPaths: Seq[Path] = underlying.rootPaths
  override def listFiles(partitionFilters: Seq[Expression],
      dataFilters: Seq[Expression]): Seq[PartitionDirectory] =
    verdicts.prune(underlying.listFiles(partitionFilters, dataFilters),
      dataFilters, prunedFileCount)
  override def inputFiles: Array[String] = underlying.inputFiles
  override def refresh(): Unit = underlying.refresh()
  override def sizeInBytes: Long = underlying.sizeInBytes
  override def partitionSchema: StructType = underlying.partitionSchema
  override def metadataOpsTimeNs: Option[Long] =
    underlying.metadataOpsTimeNs
}

/** The pushed-filter → per-file-verdict translation over one
  * manifest snapshot, shared by [[ZoneMapFileIndex]] (construct-time
  * listing) and [[ZoneMapPrunedIndex]] (wrap an existing index).
  */
private[ops] final class ZoneMapVerdicts(spark: SparkSession,
    manifestDir: String) {

  // ---- manifest snapshot (one row per indexed file), driver-side ----
  private val (manifestSchema: StructType,
      rowByFile: Map[String, InternalRow]) = {
    // a crashed ZoneMaps.patch parks the manifest in `._patch_trash`
    // between its two renames — restore before reading, like every
    // ZoneMaps entry point does
    ZoneMaps.restorePatchIfInterrupted(spark, manifestDir)
    val df = spark.read.parquet(manifestDir)
    val schema = df.schema
    val fileAt = schema.fieldIndex("file")
    val conv = CatalystTypeConverters.createToCatalystConverter(schema)
    val m = df.collect().map { r =>
      r.getString(fileAt) -> conv(r).asInstanceOf[InternalRow]
    }.toMap
    (schema, m)
  }
  private val manifestAttrs = DataTypeUtils.toAttributes(manifestSchema)
  private def mAttr(name: String): Option[Attribute] =
    manifestAttrs.find(_.name.equalsIgnoreCase(name))
  // indexed data columns, keyed lowercase (manifest names come from
  // the build call; filter attrs from the parquet schema — match
  // case-insensitively like the rest of the SQL surface)
  private val statsByCol: Map[String, (Attribute, Attribute)] =
    manifestSchema.fieldNames.filter(_.endsWith("_min"))
      .map(_.stripSuffix("_min")).flatMap { c =>
        for (mn <- mAttr(s"${c}_min"); mx <- mAttr(s"${c}_max"))
          yield c.toLowerCase -> (mn, mx)
      }.toMap
  private val bloomByCol: Map[String, Attribute] =
    manifestSchema.fieldNames.filter(_.endsWith("_bloom"))
      .map(_.stripSuffix("_bloom")).flatMap { c =>
        mAttr(s"${c}_bloom").map(c.toLowerCase -> _)
      }.toMap

  /** Drop the files the manifest rules out for `dataFilters`;
    * `counter` accumulates how many were dropped.
    */
  def prune(parts: Seq[PartitionDirectory], dataFilters: Seq[Expression],
      counter: java.util.concurrent.atomic.AtomicLong)
      : Seq[PartitionDirectory] = {
    if (dataFilters.isEmpty || rowByFile.isEmpty) parts
    else dataFilters.flatMap(translate).reduceOption(And) match {
      case None => parts
      case Some(verdict) =>
        val pred = Predicate.create(verdict, manifestAttrs)
        pred.initialize(0)
        parts.map { pd =>
          val kept = pd.files.filter { f: FileStatusWithMetadata =>
            rowByFile.get(f.getPath.toUri.getPath).forall(pred.eval)
          }
          counter.addAndGet(pd.files.size - kept.size)
          pd.copy(files = kept)
        }.filter(_.files.nonEmpty)
    }
  }

  // ---- data-filter → manifest-verdict translation ----

  /** The shared 60-bit md5 hash as a raw Catalyst tree (the
    * [[graft.functions.KmvSketch.md5Hash60]] recipe the grids were
    * built with — same string cast, so probe and build agree
    * bit-for-bit). Built on a LITERAL, so it constant-folds to one
    * hash per probe at Predicate.create time.
    */
  private def hash60(l: Literal): Expression = {
    val tz = Some(spark.sessionState.conf.sessionLocalTimeZone)
    Cast(Conv(Substring(Md5(Cast(Cast(l, StringType, tz), BinaryType, tz)),
      Literal(1), Literal(15)), Literal(16), Literal(10)),
      LongType, tz)
  }

  /** NULL manifest stats mean "this file is all-NULL in the tested
    * column" — a comparison can never match there, so a NULL verdict
    * collapses to skip. Applied at each LEAF so `Or` keeps its SQL
    * semantics over the collapsed legs.
    */
  private def nn(e: Expression): Expression =
    Coalesce(Seq(e, Literal(false)))

  /** Equality test for `c = l`: [min, max] containment, sharpened by
    * the Bloom grid when the manifest carries one. Only same-type
    * literals translate — a cross-type comparison would be an
    * analyzer-inserted cast we did not see; prune nothing rather
    * than guess.
    */
  private def eqTest(name: String, l: Literal): Option[Expression] =
    statsByCol.get(name).filter(_._1.dataType == l.dataType)
      .map { case (mn, mx) =>
        val range = And(GreaterThanOrEqual(mx, l), LessThanOrEqual(mn, l))
        bloomByCol.get(name) match {
          case Some(grid) =>
            And(range, BloomSketch.BloomContains(grid, hash60(l)))
          case None => range
        }
      }.map(nn(_))

  private def cmpTest(name: String, l: Literal,
      build: ((Attribute, Attribute), Literal) => Expression)
      : Option[Expression] =
    statsByCol.get(name).filter(_._1.dataType == l.dataType)
      .map(st => nn(build(st, l)))

  /** Disjunction-of-equalities cap: each value costs one test per
    * manifest row at planning time; past this, keep the files. */
  private val MaxInValues = 256

  private def colName(e: Expression): Option[String] = e match {
    case a: AttributeReference => Some(a.name.toLowerCase)
    case _ => None
  }

  /** One pushed conjunct → an optional manifest-side verdict.
    * None = "this shape proves nothing at file granularity" — the
    * conjunct still runs row-level in the scan, so skipping the
    * translation is always sound.
    */
  private def translate(e: Expression): Option[Expression] = e match {
    case EqualTo(a, l: Literal) if l.value != null =>
      colName(a).flatMap(eqTest(_, l))
    case EqualTo(l: Literal, a) if l.value != null =>
      colName(a).flatMap(eqTest(_, l))
    case EqualNullSafe(a, l: Literal) if l.value != null =>
      colName(a).flatMap(eqTest(_, l))
    case EqualNullSafe(l: Literal, a) if l.value != null =>
      colName(a).flatMap(eqTest(_, l))
    case GreaterThan(a, l: Literal) if l.value != null =>
      colName(a).flatMap(cmpTest(_, l, (st, v) => GreaterThan(st._2, v)))
    case GreaterThan(l: Literal, a) if l.value != null => // l > a ⇔ a < l
      colName(a).flatMap(cmpTest(_, l, (st, v) => LessThan(st._1, v)))
    case GreaterThanOrEqual(a, l: Literal) if l.value != null =>
      colName(a).flatMap(cmpTest(_, l,
        (st, v) => GreaterThanOrEqual(st._2, v)))
    case GreaterThanOrEqual(l: Literal, a) if l.value != null =>
      colName(a).flatMap(cmpTest(_, l,
        (st, v) => LessThanOrEqual(st._1, v)))
    case LessThan(a, l: Literal) if l.value != null =>
      colName(a).flatMap(cmpTest(_, l, (st, v) => LessThan(st._1, v)))
    case LessThan(l: Literal, a) if l.value != null => // l < a ⇔ a > l
      colName(a).flatMap(cmpTest(_, l, (st, v) => GreaterThan(st._2, v)))
    case LessThanOrEqual(a, l: Literal) if l.value != null =>
      colName(a).flatMap(cmpTest(_, l,
        (st, v) => LessThanOrEqual(st._1, v)))
    case LessThanOrEqual(l: Literal, a) if l.value != null =>
      colName(a).flatMap(cmpTest(_, l,
        (st, v) => GreaterThanOrEqual(st._2, v)))
    case In(a, vs) if vs.nonEmpty && vs.size <= MaxInValues &&
        vs.forall { case Literal(v, _) => v != null; case _ => false } =>
      colName(a).flatMap { n =>
        val tests = vs.map(v => eqTest(n, v.asInstanceOf[Literal]))
        if (tests.forall(_.isDefined)) Some(tests.flatten.reduce(Or))
        else None
      }
    case InSet(a, vs) if vs.nonEmpty && vs.size <= MaxInValues =>
      for {
        n <- colName(a)
        dt = a.dataType
        tests = vs.toSeq.filter(_ != null)
          .map(v => eqTest(n, Literal(v, dt)))
        if tests.nonEmpty && tests.forall(_.isDefined)
      } yield tests.flatten.reduce(Or)
    case IsNotNull(a) =>
      colName(a).flatMap(statsByCol.get).map(st => IsNotNull(st._1))
    case And(x, y) => (translate(x), translate(y)) match {
      case (Some(tx), Some(ty)) => Some(And(tx, ty))
      case (tx, ty) => tx.orElse(ty)
    }
    case Or(x, y) =>
      for (tx <- translate(x); ty <- translate(y)) yield Or(tx, ty)
    case _ => None
  }
}
