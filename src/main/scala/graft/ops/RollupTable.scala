package graft.ops

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incrementally-maintained aggregate tables (materialized rollups)
  * over a [[graft.streaming.CurrentTable]] — the "dashboard table"
  * a warehouse refreshes by rescanning the corpus, maintained here
  * for the cost of each sync's OWN delta.
  *
  * The classic way to keep `SELECT dims, agg(...) FROM current GROUP
  * BY dims` fresh against a changelog is signed-delta view
  * maintenance (see [[graft.streaming.Materialize.aggDeltas]] for the
  * in-stream shape) — but deltas are not idempotent, so a durable
  * delta-merged table needs transactional pairing with the sync
  * cursor or a crash double-applies. This module sidesteps deltas
  * entirely with the same trick the tombstone census uses: store the
  * rollup as PER-KEY-BUCKET PARTIAL aggregates, and have each sync
  * RECOMPUTE (not adjust) the partials of exactly the buckets it
  * rewrote, from the staged files the fold just produced. Overwrite-
  * from-state is idempotent, so the crash contract is inherited from
  * the sync itself: any replay re-folds to the same bucket contents
  * and therefore re-publishes the same partials — convergence with
  * zero extra transactional machinery.
  *
  * Scale shape: maintenance reads only the sync's staged delta (data
  * the fold already materialized) plus the old partials (tiny —
  * ≤ buckets × groups rows); the global rollup is read by merging
  * partials across buckets (count/sum re-sum, min/max re-min/max —
  * every supported aggregate is algebraic, which is WHY it can live
  * as partials). A 100 TB table's rollup refresh costs O(delta),
  * never O(table); the one full pass is [[attach]] (birth) or the
  * rebuild after a [[graft.streaming.CurrentTable.rescale]] (the
  * modulus the partials are keyed by changed — detected via the
  * bucket count persisted in the rollup meta, rebuilt on the next
  * sync; until then reads stay CORRECT, because summing partials
  * over all buckets is modulus-independent).
  *
  * Layout under `<currentDir>/_rollup/<name>/` (underscore-prefixed,
  * so current-table reads and sync listings skip it):
  *   - `_meta.txt` — bucket count the partials are keyed under, the
  *     pointed data dir, dims, and one agg line per measure; written
  *     atomically LAST, so the pointer flip is the publish.
  *   - `d_<nonce>/` — the partials parquet (kb, dims..., partials...).
  *     A new dir per publish; the meta pointer flips onto it, then
  *     unpointed dirs are garbage-collected (a crash between write
  *     and flip leaks a dir until the next publish's GC, never a
  *     wrong answer).
  *
  * Consistency: after a COMPLETED sync the rollup equals the grouped
  * aggregate over [[graft.streaming.CurrentTable.read]] exactly
  * (tombstones excluded — q129 hash-pins it against DuckDB). Between
  * a crash and the replay that converges it, rollup and table can
  * disagree — same window the table's own buckets have, closed by
  * the same replay.
  */
object RollupTable {

  /** One measure: `op` ∈ count/sum/min/max/countd over `col` (count
    * takes `*`), published as column `as`. avg is deliberately
    * absent — declare sum + count and divide at read; storing a
    * ratio as a partial would not merge. `countd` is the KMV
    * approximate distinct count ([[graft.functions.KmvSketch]],
    * deterministic and SQL-mirrorable like q60, EXACT below `k`
    * distinct values): the partial is the materialized ≤k min-hash
    * sketch, and merging bucket sketches is exactly the sketch of
    * the whole table — a distinct count maintained at delta cost,
    * which no exact partial can do (distinct does not decompose
    * across buckets for non-key columns). SIZING: a countd partial
    * is ≤k longs per (bucket, group) — the partials file grows as
    * buckets × groups × 8k bytes, so a high-cardinality dims set
    * with a large k stops being "tiny" (1000 groups × 256 buckets ×
    * k=1024 ≈ 2 GB); keep k at the accuracy you need (~256 ⇒ ~6%
    * standard error) and rollup dims low-cardinality, which is what
    * a rollup is for. `k` is part of the stored layout (it
    * round-trips through the rollup meta): the read-side guard
    * catches a meta whose k SHRANK below the stored sketches', but a
    * k GROWN past them is undetectable by construction — a
    * smaller-k state is structurally identical to a legitimately
    * under-full sketch — and would merge to a silent underestimate.
    * Changing k means detach and re-attach the rollup.
    */
  case class Agg(op: String, col: String, as: String, k: Int = 256)

  case class Spec(dims: Seq[String], aggs: Seq[Agg]) {
    require(aggs.nonEmpty, "rollup: no aggregates declared")
    require(aggs.map(_.as).distinct.size == aggs.size,
      s"rollup: duplicate output names in ${aggs.map(_.as)}")
    require((dims ++ aggs.map(_.as)).map(_.toLowerCase).distinct.size ==
      dims.size + aggs.size,
      "rollup: a measure output name collides with a dimension")
    // the meta file encodes dims comma-joined and aggs colon-joined —
    // a column name carrying either separator (legal in a parquet
    // schema) would parse back as two, wedging every later sync
    for (c <- dims ++ aggs.map(_.as) ++ aggs.map(_.col))
      require(!c.exists(",:\n\r".contains(_)),
        s"rollup: name '$c' may not contain ',' ':' or line breaks " +
          "(the spec is persisted in a line-oriented meta file)")
    // `kb` is the bucket-layout column every partials pass groups by
    // and every merge filters on — a dim, output or measure named kb
    // would pass attach's schema check (kb IS in the table schema)
    // then hit ambiguous-column errors on every later sync, wedging
    // the pipeline until detach. It is also layout, not data: a
    // measure over kb would change value on rescale.
    for (c <- dims ++ aggs.map(_.as) ++ aggs.map(_.col).filter(_ != "*"))
      require(!c.equalsIgnoreCase("kb"),
        s"rollup: '$c' is reserved (kb names the bucket layout)")
    for (a <- aggs) {
      require(Set("count", "sum", "min", "max", "countd")(a.op),
        s"rollup: unsupported aggregate '${a.op}' " +
          "(count/sum/min/max/countd)")
      require(a.op == "count" || a.col != "*",
        s"rollup: ${a.op}(*) is not an aggregate — name a column")
      require(a.op != "countd" || a.k > 1,
        s"rollup: countd k must be > 1, got ${a.k}")
    }
  }

  private def rollupRoot(currentDir: String) = s"$currentDir/_rollup"

  private def validName(name: String): Unit =
    PointerDir.validSegment("rollup name", name)

  private case class Meta(nb: Int, data: Option[String], spec: Spec)

  private def renderMeta(nb: Int, spec: Spec)(data: String): Seq[String] =
    Seq(s"nb=$nb", s"data=$data", s"dims=${spec.dims.mkString(",")}") ++
      spec.aggs.map { a =>
        val kSuffix = if (a.op == "countd") s":${a.k}" else ""
        s"agg=${a.op}:${a.col}:${a.as}$kSuffix"
      }

  private def parseMeta(lines: Seq[String]): Meta = {
    val aggs = lines.filter(_.startsWith("agg=")).map { l =>
      l.drop(4).split(":", 4) match {
        case Array(op, c, as) => Agg(op, c, as)
        case Array(op, c, as, k) => Agg(op, c, as, k.toInt)
        case _ => throw new IllegalStateException(
          s"rollup meta: malformed '$l'")
      }
    }
    val dims = PointerDir.metaField(lines, "dims")
      .split(",").map(_.trim).filter(_.nonEmpty)
    Meta(PointerDir.metaField(lines, "nb").toInt,
      Some(PointerDir.metaField(lines, "data")).filter(_.nonEmpty),
      Spec(dims.toIndexedSeq, aggs))
  }

  private def readMeta(spark: SparkSession, dir: String): Option[Meta] =
    PointerDir.readMetaLines(spark, dir).map(parseMeta)

  /** The partial-aggregate columns for one bucket-grouped pass. Count
    * partials are SUMs at merge time, so they materialize as longs;
    * sum/min/max keep the input column's own type; countd stores the
    * materialized ≤k min-hash sketch (array<long>).
    */
  private def partialCols(spark: SparkSession,
      spec: Spec): Seq[org.apache.spark.sql.Column] =
    spec.aggs.map { a =>
      (a.op match {
        case "count" =>
          if (a.col == "*") count(lit(1)) else count(col(a.col))
        case "sum" => sum(col(a.col))
        case "min" => min(col(a.col))
        case "max" => max(col(a.col))
        case "countd" => graft.functions.KmvSketch.kmvState(spark,
          graft.functions.KmvSketch.md5Hash60(col(a.col)), a.k)
      }).as(a.as)
    }

  /** Merge partials ACROSS buckets into the global rollup: counts and
    * sums re-sum, min/max re-min/max — null partials (an all-null
    * bucket) fall out exactly as they would in the direct aggregate —
    * and countd sketches union back into one bounded sketch, which
    * for k-min sets is EXACTLY the whole table's sketch.
    */
  private def mergeCols(spark: SparkSession,
      spec: Spec): Seq[org.apache.spark.sql.Column] =
    spec.aggs.map { a =>
      (a.op match {
        case "count" | "sum" => sum(col(a.as))
        case "min" => min(col(a.as))
        case "max" => max(col(a.as))
        case "countd" => graft.functions.KmvSketch.kmvMergeEstimate(
          spark, col(a.as), a.k)
      }).as(a.as)
    }

  private def requireCols(schema: Seq[String], spec: Spec,
      where: String): Unit = {
    val have = schema.map(_.toLowerCase).toSet
    for (c <- spec.dims ++ spec.aggs.map(_.col).filter(_ != "*"))
      require(have(c.toLowerCase),
        s"rollup: column '$c' is not in the $where schema " +
          s"(${schema.mkString(", ")})")
  }

  /** LIVE rows bucket-partial-aggregated — the one aggregate shape
    * every build path (attach, incremental maintain, rebuild) runs,
    * so they cannot drift. Input must carry `kb`; tombstones are
    * excluded HERE, which is what makes the rollup agree with
    * [[graft.streaming.CurrentTable.read]] rather than the raw
    * buckets.
    */
  private def partialsOf(df: DataFrame, spec: Spec): DataFrame = {
    val cols = partialCols(df.sparkSession, spec)
    df.filter(!TimeTravel.isTombstone)
      .withColumn("kb", col("kb").cast("int"))
      .groupBy(("kb" +: spec.dims).map(col): _*)
      .agg(cols.head, cols.tail: _*)
  }

  /** Attach a rollup to a maintained current table: full-build the
    * partials from the live table (the ONE table-sized pass this
    * rollup ever pays outside a rescale), persist the spec, and from
    * then on every [[graft.streaming.CurrentTable.sync]] maintains it
    * for delta cost. Fails if `name` is already attached (detach
    * first — silently replacing a spec would leave readers mixing two
    * definitions).
    */
  def attach(spark: SparkSession, currentDir: String, name: String,
      spec: Spec): Unit = {
    validName(name)
    val nb = graft.streaming.CurrentTable.bucketCount(spark, currentDir)
      .getOrElse(throw new IllegalStateException(
        s"no current table at $currentDir — sync it before attaching"))
    val dir = s"${rollupRoot(currentDir)}/$name"
    val fs = new Path(dir)
      .getFileSystem(spark.sessionState.newHadoopConf())
    require(!fs.exists(PointerDir.metaFile(dir)),
      s"rollup '$name' already attached at $dir — detach it first")
    val cfs = new Path(currentDir)
      .getFileSystem(spark.sessionState.newHadoopConf())
    // the ZERO-BUCKET state attaches fine — the `#schema` root line
    // types the empty read, the spec validates against it, and the
    // partials are trivially empty until the next sync maintains them
    // (attach-then-populate is the natural provisioning order for a
    // fresh fleet). Refused only on a PRE-SCHEMA root, where no
    // schema exists to validate the spec against: there the remedy
    // really is syncing data first.
    require(cfs.listStatus(new Path(currentDir))
        .exists(_.getPath.getName.startsWith("kb=")) ||
        graft.streaming.CurrentTable.rootSchema(spark, currentDir)
          .isDefined,
      s"current table at $currentDir holds no data yet and records " +
        "no schema (a pre-schema root) — sync data before attaching " +
        "(the spec is validated against a real schema)")
    val live = graft.streaming.CurrentTable.read(spark, currentDir)
    requireCols(live.columns.toIndexedSeq, spec, "current table")
    PointerDir.publish(spark, dir, partialsOf(live, spec),
      renderMeta(nb, spec))
  }

  /** Drop a rollup. */
  def detach(spark: SparkSession, currentDir: String,
      name: String): Unit = {
    validName(name)
    val p = new Path(s"${rollupRoot(currentDir)}/$name")
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    fs.delete(p, true)
  }

  /** Attached rollup names — dirs with a PUBLISHED meta only, so a
    * crashed attach (data written, meta never landed) is invisible to
    * maintenance and SQL registration and simply re-attachable.
    */
  def list(spark: SparkSession, currentDir: String): Seq[String] =
    PointerDir.attached(spark, rollupRoot(currentDir))

  /** The maintained rollup as a frame: partials merged across buckets
    * into one row per dims group. Cost is the partials scan —
    * ≤ buckets × groups rows — regardless of table size.
    */
  def read(spark: SparkSession, currentDir: String,
      name: String): DataFrame = {
    validName(name)
    val dir = s"${rollupRoot(currentDir)}/$name"
    val meta = readMeta(spark, dir).getOrElse(
      throw new IllegalStateException(
        s"no rollup '$name' at $dir — attach it first"))
    val data = meta.data.getOrElse(throw new IllegalStateException(
      s"rollup '$name' has no published data — attach crashed before " +
        "its first publish; detach and re-attach"))
    val partials = spark.read.parquet(new Path(dir, data).toString)
    val grouped =
      if (meta.spec.dims.isEmpty) partials.groupBy()
      else partials.groupBy(meta.spec.dims.map(col): _*)
    val cols = mergeCols(spark, meta.spec)
    val merged = grouped.agg(cols.head, cols.tail: _*)
    // a dims-less rollup over a table whose every key was deleted has
    // ZERO partial rows; the global sum-of-counts is then NULL where
    // the direct count(*) the contract promises gives 0 — coalesce
    // exactly the count measures (sum/min/max over nothing are NULL
    // in the direct aggregate too, and countd's agg already yields 0)
    val countAs = meta.spec.aggs.filter(_.op == "count").map(_.as).toSet
    if (meta.spec.dims.nonEmpty || countAs.isEmpty) merged
    else merged.select(merged.columns.map { c =>
      if (countAs(c)) coalesce(col(c), lit(0L)).as(c) else col(c)
    }: _*)
  }

  /** Sync-side maintenance, two-phase around the bucket swap. Called
    * by [[graft.streaming.CurrentTable.sync]] AFTER its stage write
    * (the staged files hold exactly the touched buckets' post-fold
    * contents) and BEFORE its swap (the stage is deleted by the
    * swap): computes and writes each attached rollup's new partials —
    * incremental (old partials minus touched buckets, union the
    * staged delta's) when the modulus matches, a full rebuild
    * (untouched live buckets + stage — the pre-swap read of untouched
    * buckets is exactly their post-swap content) when a rescale
    * changed it. Returns the PUBLISH closure the sync runs after the
    * swap: pointer flips are the last step, so a crash anywhere
    * replays to identical partials (the cursor hasn't advanced, the
    * re-fold reproduces the same staged contents) and the rollup
    * converges with the table.
    */
  private[graft] def prepareSync(spark: SparkSession, currentDir: String,
      nb: Int, touched: Seq[Int], stageDf: DataFrame): () => Unit = {
    val names = list(spark, currentDir)
    if (names.isEmpty) return () => ()
    val touchedSet = touched.toSet
    val publishes = names.flatMap { name =>
      val dir = s"${rollupRoot(currentDir)}/$name"
      readMeta(spark, dir).map { meta =>
        requireCols(stageDf.columns.toIndexedSeq, meta.spec,
          s"sink (rollup '$name')")
        val partials = PointerDir.mergeBucketed(spark, currentDir, dir,
          nb, meta.nb, meta.data, touchedSet,
          partialsOf(stageDf, meta.spec), partialsOf(_, meta.spec))
        PointerDir.stage(spark, dir, partials, renderMeta(nb, meta.spec))
      }
    }
    () => publishes.foreach(_.apply())
  }
}
