package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.api.Graft
import graft.ops.TextIndex

/** The maintained inverted index: search must equal the oracle-checked
  * BM25 kernel over the same live corpus — after build, after
  * update/delete deltas, after a torn-delta retry, and after
  * compaction — while reading only the query terms' postings buckets.
  */
class TextIndexSpec extends AnyFunSuite {
  lazy val spark = TestSpark.session
  import spark.implicits._

  private def tmp() = Files.createTempDirectory("graft-ti-").toString

  private val corpus = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, "the quick red fox"),
    (3L, "lazy dogs sleep all day the whole day"),
    (4L, "quick quick quick brown foxes"),
    (5L, "an unrelated document about spark and scala"),
    (6L, "dog dog dog dog"),
    (7L, "")).toDF("doc_id", "text")

  private val terms = Seq("quick", "dog", "spark")

  private def scores(df: DataFrame): Map[Long, Double] =
    df.select("doc_id", "bm25").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap

  test("search equals the BM25 kernel over the same corpus") {
    val dir = tmp()
    TextIndex.build(spark, corpus, dir)
    val got = scores(TextIndex.search(spark, dir, terms))
    val want = scores(Graft.bm25(corpus, terms))
    assert(got == want, s"index $got vs kernel $want")
    assert(got.nonEmpty && got.keySet.subsetOf(Set(1L, 2L, 3L, 4L, 5L, 6L)))
  }

  test("update and delete deltas converge to the kernel over the " +
      "edited corpus; a torn delta's retry heals") {
    val dir = tmp()
    TextIndex.build(spark, corpus, dir)
    // doc 2 rewritten (loses 'quick', gains 'dog'), doc 6 deleted,
    // doc 8 added
    val upserts = Seq((2L, "the red fox barks at the dog"),
      (8L, "a brand new quick document")).toDF("doc_id", "text")
    val deletes = Seq(Tuple1(6L)).toDF("doc_id")
    val gen = TextIndex.applyDelta(spark, dir, upserts, deletes)
    assert(gen == 1L)
    val edited = corpus.filter(!col("doc_id").isin(2L, 6L, 8L))
      .unionByName(upserts)
    assert(scores(TextIndex.search(spark, dir, terms))
      == scores(Graft.bm25(edited, terms)))

    // torn-delta retry: re-applying the SAME delta at the next
    // generation must not change the answer (the kill rule retires
    // the first application's rows)
    assert(TextIndex.applyDelta(spark, dir, upserts, deletes) == 2L)
    assert(scores(TextIndex.search(spark, dir, terms))
      == scores(Graft.bm25(edited, terms)))

    // compaction folds tombstones away without changing answers
    TextIndex.compact(spark, dir)
    assert(spark.read.parquet(s"$dir/tombstones").count() == 0)
    assert(scores(TextIndex.search(spark, dir, terms))
      == scores(Graft.bm25(edited, terms)))
    // and the index keeps absorbing deltas after the fold
    TextIndex.applyDelta(spark, dir,
      Seq((9L, "dog spark")).toDF("doc_id", "text"),
      spark.emptyDataset[Long].toDF("doc_id"))
    val edited2 = edited.unionByName(
      Seq((9L, "dog spark")).toDF("doc_id", "text"))
    assert(scores(TextIndex.search(spark, dir, terms))
      == scores(Graft.bm25(edited2, terms)))
  }

  test("a compact() crash between the swap renames heals on the next " +
      "compact run") {
    val dir = tmp()
    TextIndex.build(spark, corpus, dir)
    TextIndex.applyDelta(spark, dir,
      Seq((8L, "quick dog")).toDF("doc_id", "text"),
      Seq(Tuple1(5L)).toDF("doc_id"))
    val edited = corpus.filter(!col("doc_id").isin(5L, 8L))
      .unionByName(Seq((8L, "quick dog")).toDF("doc_id", "text"))
    // crash strictly between rename(postings, trash) and
    // rename(tmp, postings): postings gone, trash intact
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sessionState.newHadoopConf())
    assert(fs.rename(new org.apache.hadoop.fs.Path(s"$dir/postings"),
      new org.apache.hadoop.fs.Path(s"$dir/postings._compact_trash")))
    // the retry must restore BEFORE building its rewrite frames —
    // an eager read of the missing dir would throw and never heal
    TextIndex.compact(spark, dir)
    assert(scores(TextIndex.search(spark, dir, terms))
      == scores(Graft.bm25(edited, terms)))
    assert(!fs.exists(
      new org.apache.hadoop.fs.Path(s"$dir/postings._compact_trash")))
  }

  test("the bucket count round-trips through the index meta: readers " +
      "and delta writers take the stored value, so a non-default " +
      "build cannot be misrouted by the compile-time constant") {
    val dir = tmp()
    TextIndex.build(spark, corpus, dir, termBuckets = 8)
    assert(TextIndex.termBucketsOf(spark, dir) == 8)
    assert(TextIndex.TermBuckets == 64,
      "fixture relies on the built fanout differing from the default")
    // search routes by the STORED 8 — with the constant 64 the terms
    // would prune to the wrong tb dirs and silently return nothing
    assert(scores(TextIndex.search(spark, dir, terms))
      == scores(Graft.bm25(corpus, terms)))
    // a delta writer buckets new postings with the stored value too:
    // the new doc's terms must land where subsequent reads look
    TextIndex.applyDelta(spark, dir,
      Seq((8L, "quick spark dog")).toDF("doc_id", "text"),
      spark.emptyDataset[Long].toDF("doc_id"))
    val edited = corpus.unionByName(
      Seq((8L, "quick spark dog")).toDF("doc_id", "text"))
    assert(scores(TextIndex.search(spark, dir, terms))
      == scores(Graft.bm25(edited, terms)))
    // and the on-disk fanout really is 8, not 64
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sessionState.newHadoopConf())
    val tbDirs = fs.listStatus(
        new org.apache.hadoop.fs.Path(s"$dir/postings"))
      .map(_.getPath.getName).filter(_.startsWith("tb=")).toSet
    assert(tbDirs.forall(_.drop(3).toInt < 8), s"fanout leaked: $tbDirs")
  }

  test("a legacy index without a meta reads with the historical " +
      "default fanout") {
    val dir = tmp()
    TextIndex.build(spark, corpus, dir) // default = the legacy 64
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sessionState.newHadoopConf())
    assert(fs.delete(new org.apache.hadoop.fs.Path(s"$dir/_meta.txt"),
      false))
    assert(TextIndex.termBucketsOf(spark, dir) == TextIndex.TermBuckets)
    assert(scores(TextIndex.search(spark, dir, terms))
      == scores(Graft.bm25(corpus, terms)))
  }

  test("loadStats measures raw per-bucket postings with the shared " +
      "p99 statistic; rebuildAdvice fires on a grown corpus, stays " +
      "silent healthy, shrinks an over-bucketed one, and never " +
      "advises a rebuild an indivisible mega-term makes futile") {
    val dir = tmp()
    // 2 buckets, 300 docs × ~4 terms: mean ≫ target ⇒ grow
    val grown = spark.range(300)
      .select(col("id").as("doc_id"),
        concat_ws(" ", lit("alpha"), lit("beta"),
          concat(lit("w"), (col("id") % 50).cast("string"))).as("text"))
    TextIndex.build(spark, grown, dir, termBuckets = 2)
    val s = TextIndex.loadStats(spark, dir)
    assert(s.termBuckets == 2)
    assert(s.postingRows == 900L) // 3 distinct terms per doc
    assert(s.p99Rows == s.maxRows, "p99 = max below 100 buckets")
    assert(s.p99TopTermRows == 300L) // the p99 bucket holds alpha or beta
    // grown: p99 ≥ 2×target and total warrants more buckets — the
    // recommendation is ≥ 2× current (same modulus = same layout)
    val rec = TextIndex.rebuildAdvice(s, targetRowsPerBucket = 50)
      .map(_.termBuckets)
    assert(rec.exists(r => r >= 4 && r == math.round(900.0 / 50)))
    // healthy: inside the band ⇒ silent (500/bucket: the p99 bucket
    // cannot reach 2×500 with only 900 rows total, and 900 rows are
    // still ≥ a bucket's worth each, so neither branch fires)
    assert(TextIndex.rebuildAdvice(s, targetRowsPerBucket = 500).isEmpty)
    // the advice round-trips: rebuilding at the recommendation brings
    // the measured mean to the target's order
    val dir2 = tmp()
    TextIndex.build(spark, grown, dir2, termBuckets = rec.get)
    val s2 = TextIndex.loadStats(spark, dir2)
    assert(s2.termBuckets == rec.get && s2.postingRows == 900L)
    assert(s2.meanRows <= 50.0 + 1e-9)
    // shrink: corpus worth ≤ half the buckets
    val tiny = tmp()
    TextIndex.build(spark, corpus, tiny, termBuckets = 32)
    val st = TextIndex.loadStats(spark, tiny)
    val shrink = TextIndex.rebuildAdvice(st, targetRowsPerBucket = 16)
    assert(shrink.exists(_.termBuckets < 32),
      s"expected shrink advice, got $shrink")
    // mega-term: one term dominates the hot bucket and total volume
    // fits the current fanout — more buckets cannot split one
    // posting list, so the advice is None, not a futile rebuild
    val hot = spark.range(200)
      .select(col("id").as("doc_id"), lit("stopword").as("text"))
    val hotDir = tmp()
    TextIndex.build(spark, hot, hotDir, termBuckets = 4)
    val sh = TextIndex.loadStats(spark, hotDir)
    assert(sh.p99TopTermRows == 200L && sh.p99Rows == 200L)
    assert(TextIndex.rebuildAdvice(sh, targetRowsPerBucket = 60).isEmpty)
    // empty index: None, and loadStats reads zero, not a crash
    val empty = tmp()
    TextIndex.build(spark,
      Seq.empty[(Long, String)].toDF("doc_id", "text"), empty,
      termBuckets = 4)
    val se = TextIndex.loadStats(spark, empty)
    assert(se.postingRows == 0L && se.p99TopTermRows == 0L)
    assert(TextIndex.rebuildAdvice(se, targetRowsPerBucket = 10).isEmpty)
  }

  test("rebuildAdvice's mega-term veto is scoped to the SIZING bucket " +
      "(a mega-term in a cooler bucket must not silence a fixable " +
      "overload), and at the 2^20 fanout cap a grow that cannot " +
      "exceed the current count stays silent instead of advising a " +
      "no-op rebuild") {
    // cooler-bucket mega-term: the p99 bucket (1000 rows) is fully
    // splittable (its top term is 5 rows); a 600-row single-term
    // bucket elsewhere is irrelevant to whether MORE buckets help
    val splittable = TextIndex.LoadStats(termBuckets = 4,
      postingRows = 1700L, meanRows = 425.0, p99Rows = 1000L,
      maxRows = 1000L, p99TopTermRows = 5L)
    assert(TextIndex.rebuildAdvice(splittable, 500L)
        .contains(TextIndex.Rebuild(8, 8)),
      "a splittable hot bucket must advise 2x the fanout, flooring " +
        "the shrink branch at its own recommendation (the grow was " +
        "skew-driven: volume alone fits 4 buckets)")
    // the SAME shape with the p99 bucket itself mega-term-dominated
    // is futile: no fanout splits one posting list
    val dominated = splittable.copy(p99TopTermRows = 600L)
    assert(TextIndex.rebuildAdvice(dominated, 500L).isEmpty)
    // at the cap: p99 trips the band but the recommendation cannot
    // exceed the current count — same-count hash rebuild = identical
    // layout, so silence, not a cron loop
    val capped = TextIndex.LoadStats(termBuckets = 1 << 20,
      postingRows = (1L << 20) * 100L, meanRows = 100.0,
      p99Rows = 10000L, maxRows = 10000L, p99TopTermRows = 5L)
    assert(TextIndex.rebuildAdvice(capped, 100L).isEmpty,
      "cap-clamped grow must be silent, never a no-op recommendation")
  }

  test("an in-place rebuild can never pair a stored count with " +
      "postings bucketed under a different one: the torn state fails " +
      "loudly, a completed rebuild serves the new fanout") {
    val dir = tmp()
    TextIndex.build(spark, corpus, dir) // 64
    // the worst crash state the delete-data-first ordering can leave:
    // old data gone, new meta landed, new postings never written —
    // a search must THROW (missing dir), not silently misroute or
    // return empty over stale postings
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sessionState.newHadoopConf())
    assert(fs.delete(new org.apache.hadoop.fs.Path(s"$dir/postings"),
      true))
    graft.streaming.AtomicFiles.write(s"$dir/_meta.txt", "tb=8",
      spark.sparkContext.hadoopConfiguration)
    intercept[Exception] {
      TextIndex.search(spark, dir, terms).collect()
    }
    // re-running build (the documented crash remedy) completes the
    // fanout change and serves correctly at the new count
    TextIndex.build(spark, corpus, dir, termBuckets = 8)
    assert(TextIndex.termBucketsOf(spark, dir) == 8)
    assert(scores(TextIndex.search(spark, dir, terms))
      == scores(Graft.bm25(corpus, terms)))
  }

  test("the skew floor closes the grow<->shrink oscillation: a " +
      "skew-driven grow's floor keeps the next measurement's shrink " +
      "branch silent, and the floor round-trips through build's meta") {
    // the r16 'splittable' fixture was the oscillation: nb=4, 1700
    // rows, target 500 — p99 trips on collision skew (ideal=3 fits 4
    // buckets) so the grow advises 8, AND remembers 8 as the floor
    val grownAt4 = TextIndex.LoadStats(termBuckets = 4,
      postingRows = 1700L, meanRows = 425.0, p99Rows = 1000L,
      maxRows = 1000L, p99TopTermRows = 5L)
    val grow = TextIndex.rebuildAdvice(grownAt4, 500L)
    assert(grow.contains(TextIndex.Rebuild(8, 8)))
    // rebuilt at 8 with the advised floor, the hot terms spread and
    // p99 falls back in band — the volume-only shrink condition
    // (ideal=3, 3*2 <= 8) holds BY CONSTRUCTION of the grow, so
    // without the floor the advisory would send the cron right back
    // to the count that just tripped
    val rebuiltAt8 = TextIndex.LoadStats(termBuckets = 8,
      postingRows = 1700L, meanRows = 212.5, p99Rows = 400L,
      maxRows = 400L, p99TopTermRows = 5L, termBucketsFloor = 8)
    assert(TextIndex.rebuildAdvice(rebuiltAt8, 500L).isEmpty,
      "shrink below the skew floor = the oscillation's second half")
    // the floor is load-bearing: the SAME stats without it reproduce
    // the r16 flap (shrink to ideal=3, below the overloaded 4)
    assert(TextIndex.rebuildAdvice(
        rebuiltAt8.copy(termBucketsFloor = 0), 500L)
      .contains(TextIndex.Rebuild(3, 0)))
    // a genuine large shrink still fires, floored: a 64-bucket index
    // whose corpus is worth 2 buckets shrinks to the floor, not below
    val shrunk = TextIndex.LoadStats(termBuckets = 64,
      postingRows = 1000L, meanRows = 15.6, p99Rows = 20L,
      maxRows = 20L, p99TopTermRows = 3L, termBucketsFloor = 8)
    assert(TextIndex.rebuildAdvice(shrunk, 500L)
      .contains(TextIndex.Rebuild(8, 8)))
    // a volume-driven grow learned nothing new about collisions: it
    // carries the existing floor forward unchanged
    val volumeGrown = TextIndex.LoadStats(termBuckets = 8,
      postingRows = 100000L, meanRows = 12500.0, p99Rows = 14000L,
      maxRows = 14000L, p99TopTermRows = 100L, termBucketsFloor = 8)
    assert(TextIndex.rebuildAdvice(volumeGrown, 500L)
      .contains(TextIndex.Rebuild(200, 8)))
    // and a grow can never recommend INTO the proven-collision zone:
    // an operator who built below the floor gets advised at least the
    // floor, not max(ideal, 2x current) inside it
    val belowFloor = TextIndex.LoadStats(termBuckets = 8,
      postingRows = 10000L, meanRows = 1250.0, p99Rows = 1400L,
      maxRows = 1400L, p99TopTermRows = 10L, termBucketsFloor = 64)
    assert(TextIndex.rebuildAdvice(belowFloor, 500L)
      .contains(TextIndex.Rebuild(64, 64)))
    // a hand-persisted floor ABOVE the 2^20 cap clamps with the
    // recommendation: the advice can never sit below its own floor
    val hugeFloor = grownAt4.copy(termBucketsFloor = 2000000)
    assert(TextIndex.rebuildAdvice(hugeFloor, 500L)
      .contains(TextIndex.Rebuild(1 << 20, 1 << 20)))
    // end to end: build persists the floor beside the fanout,
    // loadStats surfaces it, and routing still serves the kernel
    val dir = tmp()
    TextIndex.build(spark, corpus, dir, termBuckets = 8,
      termBucketsFloor = 8)
    assert(TextIndex.termBucketsOf(spark, dir) == 8)
    assert(TextIndex.termBucketsFloorOf(spark, dir) == 8)
    assert(TextIndex.loadStats(spark, dir).termBucketsFloor == 8)
    assert(scores(TextIndex.search(spark, dir, terms))
      == scores(Graft.bm25(corpus, terms)))
    // a pre-floor meta (tb= only) reads floor 0, not a crash
    graft.streaming.AtomicFiles.write(s"$dir/_meta.txt", "tb=8",
      spark.sparkContext.hadoopConfiguration)
    assert(TextIndex.termBucketsFloorOf(spark, dir) == 0)
  }

  test("build's initial sweep clears compact staging dirs: a trash " +
      "dir surviving a fanout rebuild could be healed back over the " +
      "new meta by the next compact — the silent-misroute state the " +
      "delete-data-first ordering exists to exclude") {
    val dir = tmp()
    TextIndex.build(spark, corpus, dir, termBuckets = 4)
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sessionState.newHadoopConf())
    // a compact crashed between its two renames: old-fanout postings
    // parked in trash, target gone; docs mid-swap with a stale tmp
    assert(fs.rename(new org.apache.hadoop.fs.Path(s"$dir/postings"),
      new org.apache.hadoop.fs.Path(s"$dir/postings._compact_trash")))
    fs.mkdirs(new org.apache.hadoop.fs.Path(s"$dir/docs._compact_tmp"))
    // the operator rebuilds at a new fanout instead of re-compacting
    TextIndex.build(spark, corpus, dir, termBuckets = 8)
    for (stale <- Seq("postings._compact_trash", "docs._compact_tmp",
        "docs._compact_trash", "postings._compact_tmp"))
      assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$dir/$stale")),
        s"$stale survived build — a later compact would heal " +
          "old-fanout postings back under the new tb= meta")
    // and the next compact (whose heal step would have restored the
    // stale trash) serves the kernel at the new fanout
    TextIndex.compact(spark, dir)
    assert(TextIndex.termBucketsOf(spark, dir) == 8)
    assert(scores(TextIndex.search(spark, dir, terms))
      == scores(Graft.bm25(corpus, terms)))
  }

  test("a query reads only its terms' postings buckets") {
    val dir = tmp()
    TextIndex.build(spark, corpus, dir)
    val q = TextIndex.search(spark, dir, Seq("quick"))
    q.collect()
    // the scan's pushed partition filter restricts tb: every file
    // read out of postings/ lives in a tb= dir the term hashes to.
    // AQE wraps the executed plan — unwrap adaptive/stage nodes to
    // reach the typed scans.
    import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    def scans(p: SparkPlan): Seq[FileSourceScanExec] = p match {
      case a: AdaptiveSparkPlanExec => scans(a.executedPlan)
      case qs: QueryStageExec => scans(qs.plan)
      case s: FileSourceScanExec => Seq(s)
      case other =>
        (other.children ++ other.subqueries).flatMap(scans)
    }
    val postingFiles = scans(q.queryExecution.executedPlan)
      .filter(_.relation.location.rootPaths
        .exists(_.toString.contains("postings")))
      .flatMap(s => s.relation.location
        .listFiles(s.partitionFilters, s.dataFilters)
        .flatMap(_.files.map(_.getPath.toString)))
    assert(postingFiles.nonEmpty)
    val tbDirs = postingFiles.map(p =>
      p.split('/').find(_.startsWith("tb=")).getOrElse("?")).toSet
    assert(tbDirs.size == 1,
      s"single-term query touched buckets: $tbDirs")
  }

  test("compactStats counts the postings backlog exactly and the " +
      "advice fires at the family's 2x read-amplification threshold") {
    import graft.ops.IndexCompaction
    import graft.ops.IndexCompaction.CompactStats
    val dir = tmp()
    // 2 distinct terms per doc -> posting counts are exact
    val docs = Seq((1L, "alpha beta"), (2L, "alpha gamma"))
      .toDF("doc_id", "text")
    TextIndex.build(spark, docs, dir)
    assert(TextIndex.compactStats(spark, dir) == CompactStats(4, 4, 0))
    assert(IndexCompaction.compactAdvice(
      TextIndex.compactStats(spark, dir)).isEmpty)
    // update doc 2: backlog 3 (2 dead postings + 1 tombstone) under
    // live 4, stays silent
    TextIndex.applyDelta(spark, dir,
      Seq((2L, "alpha delta")).toDF("doc_id", "text"),
      Seq.empty[Long].toDF("doc_id"))
    val st1 = TextIndex.compactStats(spark, dir)
    assert(st1 == CompactStats(6, 4, 1))
    assert(IndexCompaction.compactAdvice(st1).isEmpty,
      s"backlog 3 < live 4 must be silent: $st1")
    // delete doc 1: backlog 6 (4 dead + 2 tombstones) >= live 2
    TextIndex.applyDelta(spark, dir,
      Seq.empty[(Long, String)].toDF("doc_id", "text"),
      Seq(1L).toDF("doc_id"))
    val st2 = TextIndex.compactStats(spark, dir)
    assert(st2 == CompactStats(6, 2, 2))
    assert(IndexCompaction.compactAdvice(st2).contains(6L))
    // acted on: silent until real churn re-accumulates
    TextIndex.compact(spark, dir)
    val st3 = TextIndex.compactStats(spark, dir)
    assert(st3 == CompactStats(2, 2, 0))
    assert(IndexCompaction.compactAdvice(st3).isEmpty)
  }
}
