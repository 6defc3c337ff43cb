package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      // the test tables are single parquet files well under the 128 MB
      // default split, which would make every scan one partition —
      // split small so compute-heavy per-row ops actually parallelize
      .config("spark.sql.files.maxPartitionBytes", (512 * 1024).toString)
      .config("spark.sql.files.openCostInBytes", (64 * 1024).toString)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warm the session so the first timed query doesn't absorb one-
    // time init: codegen/JIT infra, AND the parquet reader + shuffle +
    // sort machinery (region = 5 rows; warms code paths, not data)
    spark.range(1000).selectExpr("sum(id)").write
      .format("noop").mode("overwrite").save()
    spark.read.parquet(s"$sfDir/region.parquet")
      .groupBy("r_regionkey").count().orderBy("r_regionkey")
      .write.format("noop").mode("overwrite").save()
    // warm EVERY table's read path (footer decode, page-cache, column
    // readers) once before timing: cold first reads otherwise land on
    // the alphabetically-first query touching each table (r2 showed
    // q10/q11/q16 absorbing the orders/lineitem/part cold costs),
    // hiding plan regressions behind IO noise. Data volume at sf0.1 is
    // tens of MB — one untimed pass is cheap.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    for (t <- Seq("region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "documents", "embeddings"))
      spark.read.parquet(s"$sfDir/$t.parquet")
        .write.format("noop").mode("overwrite").save()
    // sorted: Map iteration order varies with hashing, and run order
    // matters for first-run codegen/JIT costs — keep rounds comparable
    // SPARK_GRAFT_ONLY=q132,q133 restricts the run to a named subset —
    // the targeted-measurement lever for per-query A/Bs (a full suite
    // run to time three lifecycle entries wastes ten minutes of box
    // time per data point). Unset (the driver's run) = everything.
    val only: Option[Set[String]] = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val names = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter(q => only.forall(o =>
        o(q._1) || o(q._1.takeWhile(_ != '_'))))
    // untimed warm-up for EVERY query (round 19; previously only the
    // stateful lifecycle family got one): pass 1 of a never-executed
    // query absorbs its plan's one-time codegen/JIT, which read as
    // pass-disagreement noise — r18's artifact sent 42 of 132 queries
    // to a targeted third pass on a busy box. Measured A/B on one
    // idle-box session (sf0.1, r19): stateful-only warm-up → p3_n 5,
    // spread tail q28 2.7× … q30 2.1×; warm-all → p3_n 0, spread map
    // EMPTY, cal-adjusted queries_total equal — both timed passes are
    // steady-state, so the min measures the PLAN and the remaining
    // p3_n on a busy box isolates genuine ambient-load hits (which no
    // warm-up can fix — the r18 verdict's cal-series finding). Cost:
    // one extra untimed pass (~+90 s wall at sf0.1).
    // SPARK_GRAFT_WARMUP=stateful reverts to the narrow warm-up (the
    // A/B lever this was measured with).
    val statefulNames = SparkEntry.allDefs.filter(_.stateful)
      .map(_.name).toSet
    val warmAll = !sys.env.get("SPARK_GRAFT_WARMUP").contains("stateful")
    for ((name, fn) <- names if warmAll || statefulNames(name)) {
      // NonFatal only: an OOM mid-warm-up must crash the run, not be
      // swallowed into a silently contaminated artifact; ordinary
      // failures print (the timed passes log theirs — warm-up should
      // not be the one silent phase)
      try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      catch { case scala.util.control.NonFatal(e) =>
        System.err.println(s"[bench] warm-up $name failed: ${e.getMessage}")
      }
      spark.catalog.clearCache()
    }
    def timedPass(subset: Set[String] = names.map(_._1).toSet)
        : Seq[(String, Double)] =
      names.filter(q => subset(q._1)).map { case (name, fn) =>
      val t0 = System.nanoTime()
      // noop sink: full execution incl. final sort and all output
      // columns (count() would let Catalyst prune both)
      val ok =
        try { fn(spark, sfDir).write.format("noop").mode("overwrite").save(); true }
        catch { case e: Throwable =>
          System.err.println(s"[bench] $name failed: ${e.getMessage}"); false
        }
      // a failed pass must never win the min as a fast "measurement" —
      // time-to-exception is not a runtime
      val dt = if (ok) (System.nanoTime() - t0) / 1e9
        else Double.PositiveInfinity
      // free frames persisted inside queries (LSH pipeline etc.) so
      // later queries aren't taxed by another query's cached state
      spark.catalog.clearCache()
      name -> dt
    }
    // Box-speed calibration: a fixed pure-CPU job (range + sum inside
    // one whole-stage-codegen loop — no IO, no shuffle, never touched
    // by query changes) timed before, between and after the passes.
    // Two consecutive rounds' cal_med ratio separates AMBIENT box
    // slowdown from real plan regressions mechanically: r12→r13 spent
    // a verdict section proving a +13% drift was the box (identical
    // tests 1.6x slower) — this number answers it in one division.
    def calProbe(): Double = {
      val t0 = System.nanoTime()
      // pmod keeps every addend < 1000 so the 400M-row sum can never
      // hit ANSI's long-overflow error; xxhash64 keeps it CPU-bound
      spark.range(400000000L)
        .selectExpr("sum(pmod(xxhash64(id), 1000))")
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    // Each SAMPLE is the median of three back-to-back probe runs:
    // the single-shot probe spread ±30% within one session (the r14
    // judge run measured cal [0.36, 0.51, 0.67]) — wider than the
    // ±15% round-over-round box drift the number exists to resolve.
    // Median-of-3 keeps a one-off scheduler stall in any single run
    // out of the sample, at ~1.5 s per sample (<5 s for the round).
    def calibrate(): Double =
      Bench.medianOf(Seq(calProbe(), calProbe(), calProbe()))
    calProbe() // untimed warm (JIT)
    val calBuf = scala.collection.mutable.ArrayBuffer(calibrate())
    // Two full passes, report per-query MIN (steady-state): a single
    // pass conflates plan cost with one-time codegen/JIT (measured
    // q59 14 s first vs 2.7 s steady) and with ambient box load —
    // r3's driver run recorded 147 s for a suite that measures 65 s
    // on an idle box, entirely transient noise. Min-of-2 measures the
    // PLAN, which is what scale tuning acts on — plus a TARGETED
    // third pass for the handful of entries whose first two passes
    // left the min untrustworthy ([[needsThirdPass]]); the pass count
    // and the third-pass count (`p3_n`) are reported so the
    // methodology is explicit.
    val pass1 = timedPass()
    calBuf += calibrate()
    val pass2 = timedPass().toMap
    calBuf += calibrate()
    // TARGETED third pass: a query whose two passes disagreed ≥2× was
    // hit by ambient load in at least one of them, and min-of-2 then
    // has a coin-flip chance of still carrying contamination — two
    // consecutive rounds' artifacts (r16 q112, r17 q59/q89/q43)
    // manufactured phantom regressions a judge re-run erased. One more
    // measurement of JUST those queries (bounded: the spread tail is
    // ~5-10 queries × ~1 s) gives the min a third sample where it
    // matters, without re-paying the whole suite.
    val p3names = pass1.flatMap { case (n, d1) =>
      if (needsThirdPass(Seq(d1, pass2(n)))) Some(n) else None
    }.toSet
    val pass3 = timedPass(p3names).toMap
    calBuf += calibrate()
    // all passes failed → -1 marker (keeps the JSON line valid and
    // the failure visible; the driver's correctness gate catches the
    // broken query itself)
    val results = pass1.map { case (n, d) =>
      val m = (Seq(d, pass2(n)) ++ pass3.get(n)).min
      n -> (if (m.isFinite) m else -1.0)
    }
    // per-query max/min ratio across ALL of a query's passes: min-of-N
    // hides WHICH entries were contaminated by ambient box load
    // (BENCH_r06 carried q17 at 8.7× its idle-box time with nothing in
    // the artifact revealing both passes were hit). A big ratio = the
    // passes disagreed = the min is trustworthy (and for ≥2× entries a
    // third sample backed it); a ratio near 1 on an inflated number =
    // every pass was hit, re-measure before calling it a regression.
    val spread = pass1.flatMap { case (n, d1) =>
      spreadRatio(Seq(d1, pass2(n)) ++ pass3.get(n)).map(n -> _)
    }
    // CDC ingestion throughput: replay the events table as a
    // Debezium-shaped envelope feed through the full pipeline
    // (decode → gate → demux → dt-partitioned parquet). The reference
    // pins this path to parallelism 1; this is the number that shows
    // the Spark pipeline beating that by construction.
    //
    // Min-of-2, same methodology as the query loop: BENCH_r05's
    // official cdc number (46.6 s) was a single exposed pass that
    // absorbed ~41 s of ambient box load the same commit measures at
    // 5.1 s on an idle box — the ingest metrics get the identical
    // noise protection the queries already had.
    // each pass in its own try: a transient failure on pass 2 must
    // not discard a successful pass-1 measurement — min over whatever
    // succeeded, None only when both passes fail
    def ingestMin(tables: Int, label: String)
        : (Option[(Double, Double)], Option[Double]) = {
      def onePass(): Option[(Double, Double)] =
        try Some(benchIngest(spark, sfDir, tables))
        catch { case e: Throwable =>
          System.err.println(s"[bench] $label failed: ${e.getMessage}"); None
        }
      val passes = Seq(onePass(), onePass()).flatten
      val best = if (passes.isEmpty) None else Some(passes.minBy(_._1))
      // pass-disagreement ratio for the ingest metric, same diagnostic
      // the query spread map provides (r7: driver cdcm 29.1k vs judge
      // 18.9k rows/s was unexplainable from the artifact alone)
      val spr = if (passes.size == 2) {
        val ts = passes.map(_._1); Some(ts.max / ts.min)
      } else None
      (best, spr)
    }
    val (ingest, ingestSpread) = ingestMin(1, "cdc_ingest")
    // the reference's REAL workload shape: one stream multiplexing N
    // tables through the demux (`FlinkCDCMulti.java:345-391`) — same
    // row volume as above, fanned across a 10-table registry, so the
    // delta vs `cdc` prices the per-batch O(N tables) filter+write
    // loop the SURVEY flags (§7.4)
    val (multi, multiSpread) = ingestMin(MultiTables, "cdc_multi")
    spark.stop()
    println(renderJson(results, spread, ingest, multi, sfDir,
      ingestSpread, multiSpread, calBuf.toSeq, p3names.size))
  }

  /** Table count for the multiplexed ingest bench. */
  private[graft] val MultiTables = 10

  /** Pass-1-vs-2 disagreement at which a query earns a third targeted
    * measurement: 2× is where contamination stops being jitter — the
    * floor the verdict's phantom-regression entries all cleared.
    */
  private[graft] val ThirdPassFloor = 2.0

  /** Whether a query's first passes left its min untrustworthy enough
    * to buy one more measurement: they disagreed ≥ [[ThirdPassFloor]],
    * OR at least one FAILED (non-finite) — the surviving measurement
    * is then a single sample, often the first-execution JIT-
    * contaminated one the warm-up didn't cover, and a double failure
    * gets one bounded retry rather than a guaranteed -1.
    */
  private[graft] def needsThirdPass(ds: Seq[Double]): Boolean = {
    val finite = ds.filter(_.isFinite)
    finite.size < ds.size ||
      (finite.nonEmpty && finite.min > 0 &&
        finite.max / finite.min >= ThirdPassFloor)
  }

  /** Per-query pass-disagreement ratio for the JSON `spread` map:
    * max/min over the FINITE samples only (a failed retry must not
    * knock a real ≥2× disagreement out of the map — the entries with
    * disagreement are exactly the ones a reader needs flagged), None
    * with fewer than two successful samples or below [[SpreadFloor]].
    */
  private[graft] def spreadRatio(ds: Seq[Double]): Option[Double] = {
    val finite = ds.filter(_.isFinite)
    if (finite.size < 2 || finite.min <= 0) None
    else {
      val r = finite.max / finite.min
      if (r >= SpreadFloor) Some(r) else None
    }
  }

  /** Minimum max/min pass ratio a query must show to be listed in the
    * JSON `spread` map — below this, run-to-run variance is noise not
    * worth line budget (the driver parses only the last ~2000 chars).
    */
  private[graft] val SpreadFloor = 1.5

  /** Max failed-query NAMES in the JSON line (`failed_n` always
    * carries the true count) — same parse-window protection as
    * [[SpreadCap]]: 15 × ~7 chars bounds a total-failure round.
    */
  private[graft] val FailedCap = 15

  /** Max spread entries in the JSON line (worst first). Sized from a
    * live measurement, not hope: the r13 line is ~1730 chars before
    * spread at 129 queries (2-decimal per-query seconds), the driver
    * parses the LAST ~2000 and sbt appends its own ~70-char
    * [success] line — 5 × ~13 chars plus the ~50-char calibration
    * block keeps the worst case ~1880 with room for a few more
    * rounds of query growth.
    */
  private[graft] val SpreadCap = 5

  /** Median (upper median for even sizes) — the calibration samples'
    * per-sample reducer and the `cal_med` reducer share it.
    */
  private[graft] def medianOf(xs: Seq[Double]): Double =
    xs.sorted.apply(xs.size / 2)

  /** The one line the driver parses — factored pure so its contract
    * (valid JSON, Locale-proof decimals, short keys, failure
    * markers) is spec-testable without running the suite
    * (BenchJsonSpec). The driver captures only the LAST ~2000 chars
    * of output and json-parses lines from it; sbt appends a
    * "[success] ..." line after ours. Keep this line well under
    * that window: short keys (the qNN prefix of each query name)
    * and TWO-decimal per-query seconds (10 ms resolution — ample for
    * 0.2-6 s queries; the r12 line hit 1809 chars at 3 decimals and
    * 126 queries, one spread map away from the window edge). The
    * totals keep 3 decimals — two entries cost nothing and carry the
    * round-over-round trend.
    */
  private[graft] def renderJson(results: Seq[(String, Double)],
      spread: Seq[(String, Double)],
      ingest: Option[(Double, Double)],
      multi: Option[(Double, Double)], sfDir: String,
      ingestSpread: Option[Double] = None,
      multiSpread: Option[Double] = None,
      cal: Seq[Double] = Nil,
      thirdPassed: Int = 0): String = {
    def short(name: String): String = {
      val m = "^(q\\d+)_".r.findFirstMatchIn(name)
      m.map(_.group(1)).getOrElse(name)
    }
    // Locale.ROOT: the f-interpolator honors the default locale, and a
    // comma-decimal locale would corrupt the JSON line
    def sec(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    def sec2(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.2f", Double.box(v))
    def ratio(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.2f", Double.box(v))
    val qs = (results.map { case (k, v) => short(k) -> v } ++
      ingest.map("cdc" -> _._1) ++ multi.map("cdcm" -> _._1)).map {
      case (k, v) => "\"" + k + "\":" + sec2(v)
    }.mkString("{", ",", "}")
    // queries_total excludes the cdc/cdcm ingest metrics so the
    // round-over-round trend line sums the same workload each round
    // even as ingest metrics are added (r5 added cdcm to the sum,
    // making r5's "value" incomparable to r4's)
    val queriesTotal = results.map(_._2).filter(_ >= 0).sum
    val total = queriesTotal +
      ingest.map(_._1).getOrElse(0.0) + multi.map(_._1).getOrElse(0.0)
    val extra = ingest.map { case (_, rate) =>
      s""","cdc_ingest_rows_per_sec":${rate.toLong}"""
    }.getOrElse("") + multi.map { case (_, rate) =>
      s""","cdc_multi_rows_per_sec":${rate.toLong},"cdc_multi_tables":$MultiTables"""
    }.getOrElse("") +
      // ingest pass-disagreement, same floor as the query spread map
      ingestSpread.filter(_ >= SpreadFloor).map(r =>
        s""","cdc_spread":${ratio(r)}""").getOrElse("") +
      multiSpread.filter(_ >= SpreadFloor).map(r =>
        s""","cdcm_spread":${ratio(r)}""").getOrElse("")
    // failed queries listed EXPLICITLY (always, even when empty): a
    // reader must be able to tell "-1 = did not run" from "not
    // benchmarked this round" without diffing the correctness artifact
    // (BENCH_r08 carried 25 silent -1s from a testdata schema change).
    // failed_n is the TRUE count and the name list is capped like
    // spread — a mass failure (the exact scenario this field exists
    // for) must not push the line past the driver's ~2000-char parse
    // window and destroy the whole record.
    val failed = results.filter(_._2 < 0)
    val failedJson = s""","failed_n":${failed.length}""" +
      failed.take(FailedCap).map(r => "\"" + short(r._1) + "\"")
        .mkString(""","failed":[""", ",", "]")
    // spread: only queries whose two passes disagreed ≥ SpreadFloor —
    // lets a reader bound run-to-run variance per entry (a min that
    // looks regressed but has spread ≈ 1 means BOTH passes were hit
    // by ambient load; re-measure before believing it). Capped to the
    // worst entries so a fully contaminated run can't push the line
    // past the driver's ~2000-char parse window.
    val spreadJson =
      if (spread.isEmpty) ""
      else spread.sortBy(-_._2).take(SpreadCap).map { case (k, r) =>
        "\"" + short(k) + "\":" + ratio(r)
      }.mkString(""","spread":{""", ",", "}")
    // box-speed calibration samples + their median: divide another
    // round's cal_med by this one's to convert its raw seconds into
    // this box-state's terms (the probe is pure CPU and code-frozen,
    // so the ratio is ambient load/thermal state, never the diff)
    val calJson =
      if (cal.isEmpty) ""
      else cal.map(ratio).mkString(""","cal":[""", ",",
        s"""],"cal_med":${ratio(medianOf(cal))}""")
    // p3_n: queries that earned a targeted third pass (pass-1-vs-2
    // disagreement ≥ ThirdPassFloor) — the methodology is 2 passes +
    // a third for the spread tail, so the base "passes" stays 2 and
    // this field says how many entries carry a third sample
    val p3Json = if (thirdPassed > 0) s""","p3_n":$thirdPassed""" else ""
    s"""{"metric":"total","value":${sec(total)},"unit":"sec","passes":2,"agg":"min"$p3Json,"queries_total":${sec(queriesTotal)},"queries":$qs$failedJson$spreadJson$extra$calJson,"sf":"$sfDir"}"""
  }

  /** Events → JSON-lines envelope feed → CdcPipeline (AvailableNow);
    * returns (seconds, rows/sec). Feed-write time is excluded.
    */
  /** Exposed for graft.ProfileIngest. */
  private[graft] def profileIngest(spark: SparkSession, sfDir: String,
      tables: Int = 1): (Double, Double) =
    benchIngest(spark, sfDir, tables)

  /** Debezium-shaped envelope JSON lines from an events frame,
    * multiplexed over `tables` routing keys (`event_id % N`) — shared
    * with graft.ScaleBench's ingest-scaling experiments.
    */
  private[graft] def envelopeLines(
      events: org.apache.spark.sql.DataFrame,
      tables: Int): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    // tables > 1: the SAME row volume multiplexed over an N-table
    // registry (rows routed by event_id % N), so cdc vs cdcm isolates
    // the demux fan-out cost at constant data
    val tblExpr =
      if (tables == 1) lit("events")
      else concat(lit("events_"), expr(s"event_id % $tables"))
    // `_ts` is epoch-millis (Debezium ts_ms shape). `ts` may be a
    // timestamp (current testdata, TIMESTAMP(MICROS) — surfaced as NTZ
    // when isAdjustedToUTC=false; session tz is UTC so the cast is a
    // no-op on the instant) or a raw nanos long (older testdata read
    // via nanosAsLong) — dispatch.
    val tsMillis = events.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType => expr("ts div 1000000")
      case org.apache.spark.sql.types.TimestampNTZType =>
        unix_millis(col("ts").cast(org.apache.spark.sql.types.TimestampType))
      case _ => unix_millis(col("ts"))
    }
    events.select(concat(
      lit("""{"_op":"CREATE","_ts":"""), tsMillis,
      lit(""","_db":"bench","_tbl":""""), tblExpr,
      lit("""","event_id":{"long":"""),
      col("event_id"),
      lit("""},"user_id":{"long":"""), col("user_id"),
      lit("""},"event_type":{"string":""""), col("event_type"),
      lit(""""},"value":{"double":"""), col("value"),
      lit("""},"_binlog_file":"bench-bin.000001","_binlog_pos_end":""""),
      col("event_id"), lit("\"}")).as("value"))
  }

  /** The N-table registry the envelope feed routes into. */
  private[graft] def eventsRegistry(tables: Int): graft.model.TableRegistry = {
    val eventsSchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("event_id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("user_id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("event_type",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("value",
        org.apache.spark.sql.types.DoubleType)))
    val tableNames =
      if (tables == 1) Seq("events")
      else (0 until tables).map(i => s"events_$i")
    graft.model.TableRegistry(tableNames.map(t =>
      graft.model.TableSpec("bench", t, eventsSchema)))
  }

  private def benchIngest(spark: SparkSession, sfDir: String,
      tables: Int = 1): (Double, Double) = {
    val tmp = java.nio.file.Files.createTempDirectory("graft-bench-cdc-")
    val feedDir = s"$tmp/feed"
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val events = spark.read.parquet(s"$sfDir/events.parquet")
    envelopeLines(events, tables).write.mode("overwrite").text(feedDir)
    val n = events.count()

    val pipeline = new graft.streaming.CdcPipeline(spark,
      graft.streaming.CdcConfig("bench", Bench.eventsRegistry(tables),
        s"$tmp/sink", offsetStorePath = Some(s"$tmp/offsets")))
    // the DSv2 binlog source (graft-cdc) by default: the headline
    // ingest number exercises graft's own connector seam.
    // SPARK_GRAFT_FEED=file switches to FileStreamSource for A/B.
    val feed: graft.source.CdcFeed =
      if (sys.env.get("SPARK_GRAFT_FEED").contains("file"))
        graft.source.JsonLinesFeed(feedDir)
      else graft.source.Dsv2Feed(feedDir)
    val t0 = System.nanoTime()
    pipeline.startFeed(feed, s"$tmp/ck",
      org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .awaitTermination()
    val dt = (System.nanoTime() - t0) / 1e9
    require(pipeline.recordCount == n,
      s"ingest row mismatch: ${pipeline.recordCount} != $n")
    // the feed/sink/checkpoint staging is dead once the pass is
    // measured — two passes × two ingest metrics per bench run would
    // otherwise leak 4 copies of the envelope feed into /tmp per run
    org.apache.hadoop.fs.FileUtil
      .fullyDelete(new java.io.File(tmp.toString))
    (dt, n / dt)
  }
}
