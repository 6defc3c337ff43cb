package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.api.Graft

/** The public facade: every entry point works on a caller-supplied
  * frame (not the fixture tables) and delegates to the same kernels
  * the oracle-checked queries run.
  */
class GraftApiSpec extends AnyFunSuite {
  lazy val spark = TestSpark.session
  import spark.implicits._

  private val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog today"),
    (2L, "the quick brown fox jumps over the lazy dog today"), // dup of 1
    (3L, "an entirely different document about spark internals and shuffles"),
    (4L, "the quick brown fox jumps over the lazy cat today")  // near-dup of 1
  ).toDF("doc_id", "text")

  test("near-dup candidates on a user frame find the planted dup pair") {
    val cand = Graft.nearDupCandidates(spark, docs)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(cand.contains((1L, 2L)), s"exact dup pair missing from $cand")
    // doc 3 shares no shingles — must never be a candidate
    assert(!cand.exists(p => p._1 == 3L || p._2 == 3L))
  }

  test("dup clusters collapse the candidate pairs to min labels") {
    val cl = Graft.dupClusters(Graft.nearDupCandidates(spark, docs))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(cl(2L) == 1L) // doc 2 clusters under doc 1
  }

  test("index probe flags only new docs that hit the stored buckets") {
    import spark.implicits._
    val index = Graft.minhashBands(spark, docs.filter(col("doc_id") <= 2))
      .select("band", "bucket").distinct()
    // the "new batch": an exact copy of indexed doc 1 (must hit every
    // bucket) plus the unrelated doc 3 (must never hit)
    val newDocs = docs.filter(col("doc_id") === 3)
      .unionByName(docs.filter(col("doc_id") === 1)
        .select(lit(5L).as("doc_id"), col("text")))
    val hits = Graft.nearDupProbe(spark, newDocs, index)
      .select("doc_id").distinct().collect().map(_.getLong(0)).toSet
    assert(hits.contains(5L), s"planted duplicate missed: $hits")
    assert(!hits.contains(3L)) // unrelated doc never probes in
  }

  test("decontaminate guards the benchmark broadcast: both paths, same rows") {
    // train docs 1/3/4, benchmark = doc 2 (dup of 1): doc 1 must flag,
    // doc 3 must not
    val train = docs.filter(col("doc_id") =!= 2L)
    val bench = docs.filter(col("doc_id") === 2L)
    def run(cap: Long) = Graft.decontaminate(train, bench, n = 8,
      maxBroadcastRows = cap)

    // the assertions target the GRAM join specifically — AQE may
    // legitimately broadcast the small per-doc rollup elsewhere
    val bcastGram = "BroadcastHashJoin \\[gram".r
    val shuffledGram = "(SortMergeJoin|ShuffledHashJoin) \\[gram".r

    // the guard controls the HINT; on this tiny fixture the planner's
    // auto-broadcast would mask its absence, so turn thresholds off —
    // hinted joins still broadcast, unhinted ones shuffle (exactly
    // what a genuinely oversized benchmark would see)
    val prev = spark.conf.getOption("spark.sql.autoBroadcastJoinThreshold")
    val prevA = spark.conf
      .getOption("spark.sql.adaptive.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    val (smallDf, bigDf) = try {
      // small-benchmark path: the broadcast plan q74 plan-asserts
      val s = run(graft.ops.Probes.DefaultMaxRows)
      s.collect()
      val smallPlan = s.queryExecution.executedPlan.toString
      assert(bcastGram.findFirstIn(smallPlan).isDefined, smallPlan.take(600))

      // forced-oversize path (cap 0): unhinted shuffled join on the
      // gram — a working plan, not a broadcast
      val b = run(0L)
      b.collect()
      val bigPlan = b.queryExecution.executedPlan.toString
      assert(bcastGram.findFirstIn(bigPlan).isEmpty, bigPlan.take(600))
      assert(shuffledGram.findFirstIn(bigPlan).isDefined, bigPlan.take(600))
      (s, b)
    } finally {
      prev.fold(spark.conf.unset("spark.sql.autoBroadcastJoinThreshold"))(
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", _))
      prevA.fold(spark.conf
        .unset("spark.sql.adaptive.autoBroadcastJoinThreshold"))(
        spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", _))
    }

    // identical results either way — the guard changes the PLAN only
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("doc_id").collect().map(_.toSeq).toSeq
    assert(rows(smallDf) == rows(bigDf))
    val flagged = smallDf.filter(col("contaminated")).collect()
      .map(_.getLong(0)).toSet
    assert(flagged.contains(1L) && !flagged.contains(3L), flagged)
  }

  test("bucketed tables join with zero exchange — the co-located layout") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-bucket-")
    val a = spark.range(1000).select(col("id"), (col("id") * 2).as("x"))
    val b = spark.range(1000).select(col("id"), (col("id") * 3).as("y"))
    Graft.writeBucketed(a, "graft_bucket_a", s"$tmp/a", "id", 4)
    Graft.writeBucketed(b, "graft_bucket_b", s"$tmp/b", "id", 4)
    // force the shuffle-join path a non-bucketed layout would take
    val prev = spark.conf.getOption("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val j = spark.table("graft_bucket_a")
        .join(spark.table("graft_bucket_b"), "id")
      assert(j.count() == 1000)
      val plan = j.queryExecution.executedPlan.toString
      // co-location is the whole point: bucket pairs join in place,
      // no hash-partition exchange on either side
      assert(!plan.contains("Exchange hashpartitioning"), plan.take(800))
      assert(plan.contains("SortMergeJoin"), plan.take(800))
      assert(plan.contains("SelectedBucketsCount") || plan.contains("Bucketed"),
        plan.take(800))
    } finally {
      prev.fold(spark.conf.unset("spark.sql.autoBroadcastJoinThreshold"))(
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", _))
      spark.sql("DROP TABLE IF EXISTS graft_bucket_a")
      spark.sql("DROP TABLE IF EXISTS graft_bucket_b")
    }
  }

  test("bm25 on a user frame matches the hand-computed Okapi score") {
    import spark.implicits._
    // 2 docs, term "fox": doc 1 has tf=2/dl=4, doc 2 has tf=0/dl=2
    val frame = Seq((1L, "fox fox dog cat"), (2L, "dog cat"))
      .toDF("doc_id", "text")
    val got = Graft.bm25(frame, Seq("fox")).collect()
    assert(got.length == 1 && got(0).getLong(0) == 1L)
    // N=2, df=1 → idf = (2-1+0.5)/(1+0.5) = 1.0; avgdl = 3;
    // tfn = 2*2.2 / (2 + 1.2*(0.25 + 0.75*4/3)) = 4.4/3.5
    val want = BigDecimal(1.0 * (2 * 2.2 / (2 + 1.2 * (0.25 + 0.75 * 4 / 3.0))))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got(0).getDouble(1) == want, s"${got(0).getDouble(1)} vs $want")
    // packing facade: starts 0,2,4,7 at ctx 4 → bins 0,0,1,1
    val packed = Graft.packBins(
      Seq(("s", 1L, 2), ("s", 2L, 2), ("s", 3L, 3), ("s", 4L, 1))
        .toDF("source", "doc_id", "n_tok"), 4).collect()
      .map(r => r.getLong(1) -> r.getLong(5)).toMap
    assert(packed == Map(1L -> 0L, 2L -> 0L, 3L -> 1L, 4L -> 1L))
  }

  test("bm25TopK ranks through the bounded heap — window-free plan, window-equal rows") {
    import spark.implicits._
    val frame = Seq((1L, "fox fox dog cat"), (2L, "dog cat"),
      (3L, "fox dog"), (4L, "fox"), (5L, "cat fox fox fox dog dog"))
      .toDF("doc_id", "text")
    val top = Graft.bm25TopK(spark, frame, Seq("fox"), 3)
    val plan = top.queryExecution.executedPlan.toString
    // the whole point: a bounded-heap aggregate, not a row_number()
    // window that would sort every scored doc in one task
    assert(!plan.contains("Window"), plan.take(800))
    assert(plan.contains("ObjectHashAggregate") ||
      plan.contains("SortAggregate"), plan.take(800))
    val got = top.collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2))).toSeq
    val want = Graft.bm25(frame, Seq("fox"))
      .orderBy(col("bm25").desc, col("doc_id")).limit(3)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(got.map(_._1) == Seq(1, 2, 3)) // dense ranks, descending
    assert(got.map(t => (t._2, t._3)) == want,
      s"heap top-k ${got.toList} != sorted top-k ${want.toList}")
  }

  test("broadcastIfSmall: cap at/above Int.MaxValue is explicit always-broadcast") {
    // regression: maxRows+1 used to overflow at Long.MaxValue, making
    // limit(0).count()==0 "pass" the guard — same outcome, via wrap
    val df = spark.range(10).toDF("id")
    for (cap <- Seq(Int.MaxValue.toLong, Long.MaxValue)) {
      val hinted = graft.ops.Probes.broadcastIfSmall(df, cap)
      assert(hinted.queryExecution.analyzed.toString.contains("ResolvedHint"),
        s"cap=$cap should broadcast without a probe")
    }
    // the bounded-probe path still works right at the boundary
    val under = graft.ops.Probes.broadcastIfSmall(df, Int.MaxValue.toLong - 1)
    assert(under.queryExecution.analyzed.toString.contains("ResolvedHint"))
  }

  test("topK aggregate and sketches run on arbitrary frames") {
    val df = spark.range(100).select(col("id"),
      (col("id") % 5).as("g"), md5(col("id").cast("string")).as("pr"))
    val top = df.groupBy("g")
      .agg(Graft.topK(spark, col("pr"), col("id"), 3).as("t"))
      .select(explode(col("t"))).count()
    assert(top == 15) // 5 groups × 3

    val d = spark.range(1000)
      .agg(Graft.approxDistinct(spark, Graft.hash60(col("id")), 2048))
      .collect()(0).getDouble(0)
    assert(d == 1000.0) // below k the sketch is exact

    val misses = spark.range(50).agg(
        Graft.bloom(spark, Graft.hash60(col("id")), 1024).as("g"))
      .crossJoin(spark.range(50))
      .filter(!Graft.bloomContains(spark, col("g"), Graft.hash60(col("id"))))
      .count()
    assert(misses == 0) // no false negatives
  }

  test("int8 codec on a user frame: codes in range, reconstruction in cell") {
    import spark.implicits._
    val emb = Seq((1L, Seq(0.0, 1.0, -3.0)), (2L, Seq(2.0, 1.0, 5.0)))
      .toDF("vec_id", "e")
    val out = Graft.int8Codec(spark, emb).orderBy("vec_id").collect()
    assert(out.length == 2)
    for (r <- out) {
      val (e, q, de) = (r.getSeq[Double](1), r.getSeq[Int](4), r.getSeq[Double](5))
      assert(q.forall(c => c >= 0 && c <= 255))
      // reconstruction error bounded by one quantization cell
      val (mns, mxs) = (r.getSeq[Double](2), r.getSeq[Double](3))
      e.indices.foreach { i =>
        assert(math.abs(de(i) - e(i)) <= (mxs(i) - mns(i)) / 255.0 + 1e-12)
      }
    }
  }

  test("salted join equals the plain join on a user frame") {
    val big = spark.range(200).select((col("id") % 3).as("k"), col("id"))
    val dim = Seq((0L, "a"), (1L, "b"), (2L, "c")).toDF("k", "v")
    val salted = Graft.saltedJoin(big, dim, "k").orderBy("id")
      .select("k", "id", "v").collect().toSeq
    val plain = big.join(dim, "k").orderBy("id")
      .select("k", "id", "v").collect().toSeq
    assert(salted == plain)
  }

  test("derived-view registry: canonical root spellings share one " +
      "sweep, and views registered before a mid-call failure are " +
      "swept by the next call") {
    val root = java.nio.file.Files
      .createTempDirectory("graft-api-reg-").toString
    val sink = s"$root/lake2_db__events"
    spark.range(10).select(col("id"), lit("UPDATE").as("_op"),
        (lit(1000L) + col("id")).as("_ts"),
        lit("f1").as("_binlog_file_internal"),
        col("id").as("_binlog_pos_internal"),
        lit("2024-01-01").as("dt"))
      .write.mode("overwrite").partitionBy("dt").parquet(sink)
    graft.streaming.CurrentTable.sync(spark, sink, s"${sink}__current",
      Seq("id"), buckets = 4)
    def attachTotals(): Unit =
      graft.ops.RollupTable.attach(spark, s"${sink}__current", "totals",
        graft.ops.RollupTable.Spec(Nil, Seq(
          graft.ops.RollupTable.Agg("count", "*", "n"))))
    attachTotals()
    val vn = "db__events__current__totals"
    // register under a TRAILING-SLASH spelling of the same root
    assert(Graft.registerSinkTables(spark, s"$root/", "lake2")
      .contains(vn))
    // detach, re-register under the canonical spelling: the sweep
    // must still find the previous call's record — the registry key
    // is the canonicalized path, not the raw string
    graft.ops.RollupTable.detach(spark, s"${sink}__current", "totals")
    assert(!Graft.registerSinkTables(spark, root, "lake2").contains(vn))
    assert(!spark.catalog.tableExists(vn),
      "a path-spelling difference must not skip the sweep")
    // mid-call failure AFTER some derived views registered: an empty
    // plain-table dir that sorts last throws uncaught AnalysisException
    attachTotals()
    val broken = new java.io.File(s"$root/lake2_zz__broken")
    assert(broken.mkdir())
    intercept[Exception] {
      Graft.registerSinkTables(spark, root, "lake2")
    }
    assert(spark.catalog.tableExists(vn),
      "the rollup view registered before the failure")
    // the finally recorded it: after detaching, the NEXT call sweeps
    // it even though the call that registered it never completed
    graft.ops.RollupTable.detach(spark, s"${sink}__current", "totals")
    assert(broken.delete())
    assert(!Graft.registerSinkTables(spark, root, "lake2").contains(vn))
    assert(!spark.catalog.tableExists(vn),
      "a view from a failed call must still be sweepable")
  }

  test("a base table whose directory vanished is swept on the next " +
      "register — TABLE_NOT_FOUND, not a stale file snapshot failing " +
      "at scan time") {
    val root = java.nio.file.Files
      .createTempDirectory("graft-api-gone-").toString
    for (t <- Seq("keep", "gone"))
      spark.range(10).select(col("id"), lit("2024-01-01").as("dt"))
        .write.mode("overwrite").partitionBy("dt")
        .parquet(s"$root/lake3_db__$t")
    assert(Graft.registerSinkTables(spark, root, "lake3")
      == Seq("db__gone", "db__keep"))
    assert(spark.sql("SELECT count(*) FROM db__gone").collect()
      .head.getLong(0) == 10L)
    // the table's directory is DELETED outside the session (not
    // refused — simply absent from the next listing)
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(rm)
      f.delete()
    }
    rm(new java.io.File(s"$root/lake3_db__gone"))
    assert(Graft.registerSinkTables(spark, root, "lake3")
      == Seq("db__keep"))
    assert(!spark.catalog.tableExists("db__gone"),
      "a vanished base table's view must be swept with the rest")
    assert(spark.sql("SELECT count(*) FROM db__keep").collect()
      .head.getLong(0) == 10L)
  }

  test("registerSinkTables exposes the lake to plain SQL, zone-mapped " +
      "tables through the planner path, bookkeeping excluded") {
    val root = java.nio.file.Files
      .createTempDirectory("graft-api-sink-").toString
    spark.range(100).select(col("id"), lit("2024-01-01").as("dt"))
      .write.mode("overwrite").partitionBy("dt")
      .parquet(s"$root/lake1_db__users")
    spark.range(50).select(col("id").as("order_id"),
        (col("id") % 7).as("qty"), lit("2024-01-01").as("dt"))
      .write.mode("overwrite").partitionBy("dt")
      .parquet(s"$root/lake1_db__orders")
    graft.ops.ZoneMaps.build(spark, s"$root/lake1_db__orders",
      s"$root/lake1_db__orders._zonemaps", Seq("order_id"))
    // bookkeeping siblings that must never register
    new java.io.File(s"$root/_checkpoints").mkdirs()
    new java.io.File(s"$root/other_db__ghost").mkdirs()

    val views = Graft.registerSinkTables(spark, root, "lake1")
    assert(views == Seq("db__orders", "db__users"))
    assert(spark.sql("SELECT count(*) FROM db__users").as[Long].head()
      == 100L)
    // the zone-mapped table answers SQL through the pruned scan
    assert(spark.sql(
      "SELECT sum(qty) FROM db__orders WHERE order_id BETWEEN 10 AND 19")
      .as[Long].head()
      == (10 until 20).map(_ % 7).sum.toLong)
    // another source's tables and bookkeeping stayed unregistered
    assert(!spark.catalog.tableExists("ghost") &&
      !spark.catalog.tableExists("_checkpoints"))

    // an evolution fork additionally registers the logical union view
    spark.range(10).select(col("id"), lit("x").as("extra"),
        lit("2024-02-01").as("dt"))
      .write.mode("overwrite").partitionBy("dt")
      .parquet(s"$root/lake1_db__users_v20240201")
    val views2 = Graft.registerSinkTables(spark, root, "lake1")
    assert(views2.contains("db__users__all"))
    val all = spark.sql("SELECT count(*) FROM db__users__all").as[Long]
      .head()
    assert(all == 110L)
    // base-era rows null-filled in the fork's added column
    assert(spark.sql(
      "SELECT count(*) FROM db__users__all WHERE extra IS NULL")
      .as[Long].head() == 100L)

    // a maintained current table registers through CurrentTable.read:
    // SQL users see LIVE keys only, never the stored DELETE
    // tombstone rows a plain parquet view would surface
    val sink = s"$root/lake1_db__events"
    spark.range(20).select(col("id"),
        when(col("id") === 7L, "DELETE").otherwise("UPDATE").as("_op"),
        (lit(1000L) + col("id")).as("_ts"),
        lit("f1").as("_binlog_file_internal"),
        col("id").as("_binlog_pos_internal"),
        lit("2024-01-01").as("dt"))
      .write.mode("overwrite").partitionBy("dt").parquet(sink)
    graft.streaming.CurrentTable.sync(spark, sink, s"${sink}__current",
      Seq("id"), buckets = 4)
    // an attached rollup becomes a SQL table of its own: the
    // partials-merge read, not a re-aggregation of the current view
    graft.ops.RollupTable.attach(spark, s"${sink}__current", "totals",
      graft.ops.RollupTable.Spec(Nil, Seq(
        graft.ops.RollupTable.Agg("count", "*", "n"))))
    val views3 = Graft.registerSinkTables(spark, root, "lake1")
    assert(views3.contains("db__events__current"))
    assert(spark.sql("SELECT count(*) FROM db__events__current")
      .as[Long].head() == 19L,
      "the deleted key's tombstone row must not surface in SQL")
    assert(views3.contains("db__events__current__totals"))
    assert(spark.sql("SELECT n FROM db__events__current__totals")
      .as[Long].head() == 19L,
      "the rollup view must serve the maintained partials")

    // a rollup DETACHED since the last registration must not keep
    // serving its dropped partials' final read through a stale temp
    // view: re-registering sweeps `<view>__*` first, so the query
    // fails loudly
    graft.ops.RollupTable.detach(spark, s"${sink}__current", "totals")
    // ...while a USER's own temp view — even one named inside the
    // derived-view namespace — is never swept (the registry drops
    // only names this api registered)
    spark.sql("SELECT 42 AS x")
      .createOrReplaceTempView("db__events__current__scratch")
    val viewsDetached = Graft.registerSinkTables(spark, root, "lake1")
    assert(!viewsDetached.contains("db__events__current__totals"))
    assert(!spark.catalog.tableExists("db__events__current__totals"),
      "stale rollup view must be dropped on re-registration")
    assert(viewsDetached.contains("db__events__current"))
    assert(spark.sql("SELECT x FROM db__events__current__scratch")
      .as[Long].head() == 42L, "user view must survive the sweep")
    spark.catalog.dropTempView("db__events__current__scratch")
    // re-attach: the view comes back on the next registration
    graft.ops.RollupTable.attach(spark, s"${sink}__current", "totals",
      graft.ops.RollupTable.Spec(Nil, Seq(
        graft.ops.RollupTable.Agg("count", "*", "n"))))
    assert(Graft.registerSinkTables(spark, root, "lake1")
      .contains("db__events__current__totals"))

    // ONE corrupted rollup meta must not take down its healthy base
    // table's view (or the rest of the lake): the rollup view is
    // skipped, the base table stays queryable
    val metaPath = java.nio.file.Paths.get(
      s"${sink}__current/_rollup/totals/_meta.txt")
    val goodMeta = java.nio.file.Files.readAllBytes(metaPath)
    java.nio.file.Files.write(metaPath,
      "nb=not-a-number\ndata=d_x\ndims=\nagg=count:*:n".getBytes)
    try {
      val views3b = Graft.registerSinkTables(spark, root, "lake1")
      assert(views3b.contains("db__events__current"),
        "base view must survive a broken rollup sidecar")
      assert(!views3b.contains("db__events__current__totals"))
      assert(!spark.catalog.tableExists("db__events__current__totals"))
      assert(spark.sql("SELECT count(*) FROM db__events__current")
        .as[Long].head() == 19L)
    } finally java.nio.file.Files.write(metaPath, goodMeta)
    // healthy again: the rollup view serves — so the crashed-swap
    // case below proves the sweep takes a LIVE rollup view down with
    // its refused base, not a trivially-absent one
    assert(Graft.registerSinkTables(spark, root, "lake1")
      .contains("db__events__current__totals"))
    assert(spark.catalog.tableExists("db__events__current__totals"))

    // ONE table with a crashed bucket swap must not take down the
    // whole lake's SQL surface: the broken table is skipped (querying
    // it stays a loud failure — its view is gone), everything healthy
    // still registers
    val cur = s"${sink}__current"
    assert(new java.io.File(s"$cur/kb=0").renameTo(
      new java.io.File(s"$cur/._ct_trash_kb=0")))
    spark.conf.set("spark.graft.current.healGraceMs", "0")
    try {
      val views4 = Graft.registerSinkTables(spark, root, "lake1")
      assert(!views4.contains("db__events__current"))
      assert(views4.contains("db__orders") && views4.contains("db__users"))
      assert(spark.sql("SELECT count(*) FROM db__users").as[Long].head()
        == 100L)
      assert(!spark.catalog.tableExists("db__events__current"))
      // the broken table's ROLLUP view goes down WITH it: the base
      // read refuses before the rollup loop runs, and the up-front
      // registry sweep must not leave the previous registration's
      // rollup view serving pre-crash partials
      assert(!spark.catalog.tableExists("db__events__current__totals"),
        "a refused base table must not leave its rollup view serving")
    } finally {
      spark.conf.unset("spark.graft.current.healGraceMs")
      graft.streaming.CurrentTable.heal(spark, cur)
    }
  }

  test("annIndexHealth / textIndexHealth surface the maintained-index " +
      "advisories as one operator call: silent healthy, measured " +
      "stats + the exact maintenance call when outgrown") {
    import graft.ops.{AnnIndex, TextIndex}
    // ANN: 6 base vectors on 2 centroids, then a 60-vector growth
    // spike into one cluster (the AnnIndexSpec fixture)
    val annDir = java.nio.file.Files
      .createTempDirectory("graft-api-ann-").toString
    def vecs(rows: (Long, Seq[Double])*) = rows.toSeq.toDF("vec_id", "e")
    val base = (1L to 3L).map(i => i -> Seq(1.0, i * 0.03, 0.0, 0.0)) ++
      (4L to 6L).map(i => i -> Seq(0.03 * i, 1.0, 0.0, 0.0))
    val cb = AnnIndex.seedCentroids(spark, vecs(base: _*), 2)
    AnnIndex.build(spark, vecs(base: _*), cb, annDir)
    assert(Graft.annIndexHealth(spark, annDir, 4).isEmpty,
      "healthy index must be silent")
    AnnIndex.applyDelta(spark, annDir,
      vecs((100L until 160L).map(i =>
        i -> Seq(1.0, i / 1000.0, 0.0, 0.0)): _*), vecs())
    val ann = Graft.annIndexHealth(spark, annDir, 4)
      .getOrElse(fail("grown index must advise"))
    assert(ann.recommended == 17 && ann.stats.postingRows == 66L,
      ann.toString)
    // the call must be runnable as written — trainCodebook has no
    // default for iters, so the advised line must supply it
    assert(ann.call.contains("trainCodebook") &&
      ann.call.contains("k = 17") && ann.call.contains("iters ="),
      ann.call)

    // text: 300 docs into 2 postings buckets
    val tDir = java.nio.file.Files
      .createTempDirectory("graft-api-ti-").toString
    val docs = spark.range(300).select(col("id").as("doc_id"),
      concat_ws(" ", lit("alpha"), lit("beta"),
        concat(lit("w"), (col("id") % 50).cast("string"))).as("text"))
    TextIndex.build(spark, docs, tDir, termBuckets = 2)
    assert(Graft.textIndexHealth(spark, tDir, 500).isEmpty,
      "in-band fanout must be silent")
    val ti = Graft.textIndexHealth(spark, tDir, 50)
      .getOrElse(fail("overloaded fanout must advise"))
    // the TYPED recommendation carries the skew floor (0 here — a
    // volume-driven grow), so a cron acting on the field, not the
    // call string, can never rebuild floorless
    assert(ti.recommended == TextIndex.Rebuild(18, 0) &&
      ti.stats.postingRows == 900L, ti.toString)
    // the advised build carries the skew floor (0 here — a
    // volume-driven grow; TextIndexSpec pins the skew-grow case) so
    // an operator pasting the call can never forget the advisory's
    // anti-flap memory
    assert(ti.call.contains("termBuckets = 18") &&
      ti.call.contains("termBucketsFloor = 0"), ti.call)
  }

  test("the skew-grow advisory loop converges through the one-call " +
      "health check: fire with a floor, act on the typed " +
      "recommendation, re-measure to silence") {
    import graft.ops.TextIndex
    // a vocabulary engineered to collision-concentrate at fanout 4
    // with the index's OWN routing — p99 trips while volume alone
    // fits the current buckets, the SKEW-driven grow
    val perTerm = TextIndex.bucketOfTerms(spark,
      (0 until 400).map(i => s"sk$i"), 4)
    val hotBucket = perTerm.values.head
    val hotAll = perTerm.collect { case (t, b) if b == hotBucket => t }
      .toSeq.sorted
    // the convergence half below asserts the GROWN index reads back
    // silent, which needs the hot postings to split ~evenly between
    // the hot bucket's two mod-8 residues — xxhash64 guarantees no
    // such balance, so pick the hot terms in PAIRS, one per residue,
    // verified with the index's own routing at the grown fanout
    // (a lopsided draw would fail the silence assertion against the
    // FIXTURE, not the advisory)
    val grownOf = TextIndex.bucketOfTerms(spark, hotAll, 8)
    val (resLo, resHi) = hotAll.partition(t => grownOf(t) == hotBucket)
    val hot = (resLo.take(20) ++ resHi.take(20)).sorted
    val cold = perTerm.collect { case (t, b) if b != hotBucket => t }
      .toSeq.sorted.take(5)
    // loud guard (the ScaleBench twin's discipline): an undersized
    // vocabulary would change the p99 arithmetic the Rebuild(8, 8)
    // assertion depends on, or divide by a zero-sized cold set
    assert(resLo.size >= 20 && resHi.size >= 20 && cold.size == 5,
      s"vocabulary too small: ${resLo.size}/${resHi.size} hot residues" +
        s" / ${cold.size} cold")
    val docs = (0 until 60).map { i =>
      (i.toLong, ((0 until 5).map(j => hot((i * 7 + j) % hot.size)) :+
        cold(i % cold.size)).mkString(" "))
    }.toDF("doc_id", "text")
    val d1 = java.nio.file.Files
      .createTempDirectory("graft-api-tif-").toString
    TextIndex.build(spark, docs, d1, termBuckets = 4)
    val h = Graft.textIndexHealth(spark, d1, targetRowsPerBucket = 120)
      .getOrElse(fail("collision-skewed index must advise"))
    assert(h.recommended == TextIndex.Rebuild(8, 8),
      s"skew grow must floor at its own recommendation: $h")
    // act on the TYPED recommendation, exactly as a cron would
    val d2 = java.nio.file.Files
      .createTempDirectory("graft-api-tif2-").toString
    TextIndex.build(spark, docs, d2,
      termBuckets = h.recommended.termBuckets,
      termBucketsFloor = h.recommended.termBucketsFloor)
    // converged: the floored index measures back to SILENCE — the
    // shrink-back that closed the r16 oscillation cannot fire
    assert(Graft.textIndexHealth(spark, d2, 120).isEmpty,
      "acted-on skew advice must converge in one step")

    // the floored SHRINK through the same one-call loop: an operator
    // who over-built at 64 with the learned floor 8 persisted must be
    // advised down to EXACTLY the floor (shrink lands on max(ideal,
    // floor), never below the count skew proved overloaded), and the
    // acted-on shrink re-measures to silence in one step — the other
    // arm of the convergence the synthetic decision table pins
    val d3 = java.nio.file.Files
      .createTempDirectory("graft-api-tif3-").toString
    TextIndex.build(spark, docs, d3, termBuckets = 64,
      termBucketsFloor = 8)
    val hs = Graft.textIndexHealth(spark, d3, targetRowsPerBucket = 120)
      .getOrElse(fail("over-bucketed floored index must advise"))
    assert(hs.recommended == TextIndex.Rebuild(8, 8),
      s"floored shrink must land exactly on the floor: $hs")
    val d4 = java.nio.file.Files
      .createTempDirectory("graft-api-tif4-").toString
    TextIndex.build(spark, docs, d4,
      termBuckets = hs.recommended.termBuckets,
      termBucketsFloor = hs.recommended.termBucketsFloor)
    assert(Graft.textIndexHealth(spark, d4, 120).isEmpty,
      "acted-on floored shrink must converge in one step")
  }

  test("neardupIndexHealth and the text/ann compact twins surface the " +
      "when-to-compact verdict as one operator call") {
    import graft.ops.{AnnIndex, NeardupIndex, TextIndex}
    import graft.ops.IndexCompaction.CompactStats
    // near-dup: its FIRST health surface (the band count is a scheme
    // constant — nothing to size — but the tombstone backlog is as
    // measurable as the other two indexes')
    val nd = java.nio.file.Files
      .createTempDirectory("graft-api-ndc-").toString
    val ndDocs = Seq(
      1L -> "the quick brown fox jumps over the lazy dog",
      2L -> "pack my box with five dozen liquor jugs",
      3L -> "how vexingly quick daft zebras jump around",
      4L -> "sphinx of black quartz judge my vow")
      .toDF("doc_id", "text")
    NeardupIndex.build(spark, ndDocs, nd)
    assert(Graft.neardupIndexHealth(spark, nd).isEmpty,
      "fresh index must be silent")
    // delete half the corpus: backlog 6 (4 dead band rows + 2
    // tombstones) >= live 4
    NeardupIndex.applyDelta(spark, nd,
      Seq.empty[(Long, String)].toDF("doc_id", "text"),
      Seq(1L, 2L).toDF("doc_id"))
    val ndh = Graft.neardupIndexHealth(spark, nd)
      .getOrElse(fail("backlogged index must advise"))
    assert(ndh.stats == CompactStats(8, 4, 2) && ndh.recommended == 6L,
      ndh.toString)
    // the call names the exact in-place maintenance op — run it as
    // advised, and the verdict converges to silence
    assert(ndh.call.contains(s"""NeardupIndex.compact(spark, "$nd")"""),
      ndh.call)
    NeardupIndex.compact(spark, nd)
    assert(Graft.neardupIndexHealth(spark, nd).isEmpty,
      "acted-on compact advice must be silent")

    // the text/ann twins share the verdict shape and the call naming
    val td = java.nio.file.Files
      .createTempDirectory("graft-api-tic-").toString
    TextIndex.build(spark,
      Seq((1L, "alpha beta"), (2L, "gamma delta")).toDF("doc_id", "text"),
      td)
    assert(Graft.textIndexCompactHealth(spark, td).isEmpty)
    TextIndex.applyDelta(spark, td,
      Seq.empty[(Long, String)].toDF("doc_id", "text"),
      Seq(2L).toDF("doc_id"))
    val th = Graft.textIndexCompactHealth(spark, td)
      .getOrElse(fail("backlogged text index must advise"))
    assert(th.stats == CompactStats(4, 2, 1) && th.recommended == 3L &&
      th.call.contains("TextIndex.compact"), th.toString)

    val ad = java.nio.file.Files
      .createTempDirectory("graft-api-annc-").toString
    val vs = Seq(1L -> Seq(1.0, 0.0), 2L -> Seq(0.0, 1.0))
      .toDF("vec_id", "e")
    AnnIndex.build(spark, vs, AnnIndex.seedCentroids(spark, vs, 1), ad)
    assert(Graft.annIndexCompactHealth(spark, ad).isEmpty)
    AnnIndex.applyDelta(spark, ad,
      Seq.empty[(Long, Seq[Double])].toDF("vec_id", "e"),
      Seq(2L).toDF("vec_id"))
    val ah = Graft.annIndexCompactHealth(spark, ad)
      .getOrElse(fail("backlogged ann index must advise"))
    assert(ah.stats == CompactStats(2, 1, 1) && ah.recommended == 2L &&
      ah.call.contains("AnnIndex.compact"), ah.toString)
  }

  test("the one-call maintenance verdict prioritizes compact over " +
      "resize: simultaneous churn+skew converges compact-first, then " +
      "the sizing verdict, then silence") {
    import graft.ops.{AnnIndex, NeardupIndex, TextIndex}
    // the skew-grow fixture (residue-paired hot terms, verified with
    // the index's own routing — see the advisory-loop test above)
    val perTerm = TextIndex.bucketOfTerms(spark,
      (0 until 400).map(i => s"sk$i"), 4)
    val hotBucket = perTerm.values.head
    val hotAll = perTerm.collect { case (t, b) if b == hotBucket => t }
      .toSeq.sorted
    val grownOf = TextIndex.bucketOfTerms(spark, hotAll, 8)
    val (resLo, resHi) = hotAll.partition(t => grownOf(t) == hotBucket)
    val hot = (resLo.take(20) ++ resHi.take(20)).sorted
    val cold = perTerm.collect { case (t, b) if b != hotBucket => t }
      .toSeq.sorted.take(5)
    assert(resLo.size >= 20 && resHi.size >= 20 && cold.size == 5,
      s"vocabulary too small: ${resLo.size}/${resHi.size}/${cold.size}")
    val docs = (0 until 60).map { i =>
      (i.toLong, ((0 until 5).map(j => hot((i * 7 + j) % hot.size)) :+
        cold(i % cold.size)).mkString(" "))
    }.toDF("doc_id", "text")
    val d1 = java.nio.file.Files
      .createTempDirectory("graft-api-mt-").toString
    TextIndex.build(spark, docs, d1, termBuckets = 4)
    // CHURN on top of the SKEW: rewrite every doc once (same text, so
    // the post-compact corpus keeps the fixture's sizing arithmetic).
    // Backlog 120 (60 dead + 60 tombstones) >= live 60: a compact is
    // owed — and sizing measured NOW would count 120 raw docs' worth
    // of postings, advice the compact makes moot
    TextIndex.applyDelta(spark, d1, docs,
      Seq.empty[Long].toDF("doc_id"))
    // cycle 1: compact wins; sizing is not even measured
    val m1 = Graft.textIndexMaintenance(spark, d1,
      targetRowsPerBucket = 120)
      .getOrElse(fail("churned+skewed index must advise"))
    val c1 = m1 match {
      case Graft.CompactFirst(h) => h
      case other => fail(s"compact must win over resize: $other")
    }
    // raw 720 postings (60 docs * 6 terms * 2 generations), live 360,
    // 60 tombstones: backlog 420 = 360 dead + 60 tombstones
    assert(c1.stats == graft.ops.IndexCompaction.CompactStats(
      720L, 360L, 60L) && c1.recommended == 420L, c1.toString)
    // the call record carries the formatted dead fraction operators
    // alert on (raw 720, dead 360)
    assert(c1.call.contains("dead fraction 0.500"), c1.call)
    // owed-but-floored: a fleet floor above the backlog surfaces the
    // owed compact as DEFERRED — visible to a dashboard, a no-op for
    // the cron — and must NOT fall through to sizing: the skew
    // verdict WOULD fire here (proven below post-compact), and
    // measuring it now would count the 2x backlog as load. Without
    // the explicit deferred case, an index whose churn stops inside
    // the floor window would read healthy forever
    Graft.textIndexMaintenance(spark, d1,
      targetRowsPerBucket = 120, minReclaimable = 1000000L) match {
      case Some(d @ Graft.CompactDeferred(h)) =>
        assert(h.recommended == 420L, h.toString)
        // the deferred verdict's call is comment-prefixed: a cron
        // that uniformly executes verdict.call must not be tricked
        // into running the compact the floor exists to skip
        assert(d.call.startsWith("//") &&
          d.call.contains("TextIndex.compact"), d.call)
      case other => fail("an owed-but-floored compact must surface " +
        s"as deferred, never as backlog-inflated sizing: $other")
    }
    TextIndex.compact(spark, d1) // act as advised
    // cycle 2: no compact owed — NOW the skew verdict surfaces, with
    // clean post-compact arithmetic (the same Rebuild(8, 8) the
    // advisory-loop test pins for the un-churned corpus)
    val m2 = Graft.textIndexMaintenance(spark, d1,
      targetRowsPerBucket = 120)
      .getOrElse(fail("post-compact skew must advise"))
    val r2 = m2 match {
      case Graft.Resize(h) => h
      case other => fail(s"no compact owed — resize must surface: $other")
    }
    assert(r2.recommended == TextIndex.Rebuild(8, 8), r2.toString)
    // cycle 3: act on the sizing verdict (fresh dir, reader swap) —
    // and the one call reads back silence on BOTH axes
    val d2 = java.nio.file.Files
      .createTempDirectory("graft-api-mt2-").toString
    TextIndex.build(spark, docs, d2,
      termBuckets = r2.recommended.termBuckets,
      termBucketsFloor = r2.recommended.termBucketsFloor)
    assert(Graft.textIndexMaintenance(spark, d2, 120).isEmpty,
      "acted-on compact-then-resize must converge to silence")

    // the ann twin: churn (every vector rewritten) + growth spike at
    // once — compact wins cycle 1, the retrain verdict surfaces with
    // post-compact arithmetic cycle 2 (17 = 66 live / target 4, the
    // annIndexHealth fixture's number, NOT one inflated by the 66
    // dead postings a pre-compact measurement would have counted)
    val ad = java.nio.file.Files
      .createTempDirectory("graft-api-mta-").toString
    def vecs(rows: (Long, Seq[Double])*) = rows.toSeq.toDF("vec_id", "e")
    val base = (1L to 3L).map(i => i -> Seq(1.0, i * 0.03, 0.0, 0.0)) ++
      (4L to 6L).map(i => i -> Seq(0.03 * i, 1.0, 0.0, 0.0))
    AnnIndex.build(spark, vecs(base: _*),
      AnnIndex.seedCentroids(spark, vecs(base: _*), 2), ad)
    assert(Graft.annIndexMaintenance(spark, ad, 4).isEmpty,
      "healthy index must be silent on both axes")
    AnnIndex.applyDelta(spark, ad,
      vecs((base ++ (100L until 160L).map(i =>
        i -> Seq(1.0, i / 1000.0, 0.0, 0.0))): _*), vecs())
    val am1 = Graft.annIndexMaintenance(spark, ad, 4)
      .getOrElse(fail("churned+grown index must advise"))
    assert(am1.isInstanceOf[Graft.CompactFirst], am1.toString)
    AnnIndex.compact(spark, ad)
    val am2 = Graft.annIndexMaintenance(spark, ad, 4)
      .getOrElse(fail("post-compact growth must advise retrain"))
    val ar2 = am2 match {
      case Graft.Resize(h) => h
      case other => fail(s"no compact owed — retrain must surface: $other")
    }
    assert(ar2.recommended == 17 && ar2.stats.postingRows == 66L,
      ar2.toString)

    // the near-dup twin has no sizing axis: its maintenance call
    // delegates to the single compact check, so a fleet cron treats
    // all three indexes uniformly
    val nd = java.nio.file.Files
      .createTempDirectory("graft-api-mtn-").toString
    NeardupIndex.build(spark, Seq(
      1L -> "the quick brown fox jumps over the lazy dog",
      2L -> "pack my box with five dozen liquor jugs")
      .toDF("doc_id", "text"), nd)
    NeardupIndex.applyDelta(spark, nd,
      Seq.empty[(Long, String)].toDF("doc_id", "text"),
      Seq(1L).toDF("doc_id"))
    val nm = Graft.neardupIndexMaintenance(spark, nd)
      .getOrElse(fail("backlogged band index must advise"))
    assert(nm.isInstanceOf[Graft.CompactFirst] &&
      nm.call.contains("NeardupIndex.compact"), nm.toString)
    // minReclaimable threads through the one call: the SAME fired
    // verdict defers (visible, non-actionable) under the fleet floor
    assert(Graft.neardupIndexMaintenance(spark, nd,
      minReclaimable = 1000L).exists(_.isInstanceOf[Graft.CompactDeferred]),
      "a 3-row backlog must defer under a 1000-row fleet floor")
    NeardupIndex.compact(spark, nd)
    assert(Graft.neardupIndexMaintenance(spark, nd).isEmpty,
      "acted-on compact must converge to silence")
  }
}
