package graft

import java.nio.file.Files

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.api.Graft
import graft.ops.{AnnIndex, IndexCompaction, NeardupIndex, TextIndex}

/** The EMPTY-LAYOUT lifecycle of the three maintained indexes: a
  * corpus that legitimately empties out (every doc deleted, then the
  * advised compact folds the backlog) leaves a data dir with NO
  * partition dirs or part files at all — a partitioned rewrite of
  * zero rows writes nothing — and parquet schema inference crashes on
  * such a dir. Before [[IndexCompaction.readOrEmpty]] that state
  * BRICKED the index: currentGen, search/probe, applyDelta and the
  * next compact all threw, so an emptied corpus could never be
  * repopulated, and the compact-health advisory could advise a
  * recovery call that crashed (the (0,0,k) state: empty layout +
  * tombstones, reachable by a compact torn between the data swap and
  * the tombstone clear). These specs pin the whole loop: empty out →
  * every read serves zero rows → the (0,0,k) advice is ACTED ON and
  * succeeds → repopulate through the ordinary delta path → serving
  * equals the from-scratch kernel again. The randomized twin is the
  * fuzz harness's empty-excursion step.
  */
class IndexEmptyLayoutSpec extends AnyFunSuite {
  lazy val spark = TestSpark.session
  import spark.implicits._

  private def tmp() = Files.createTempDirectory("graft-empty-").toString

  private def noDocs = Seq.empty[(Long, String)].toDF("doc_id", "text")
  private def noIds = Seq.empty[Long].toDF("doc_id")

  test("the empty-layout fallback schemas track the writers' real " +
      "output shapes (drift trap)") {
    // the four fallback schemas are literals restating what the build
    // writers produce; if a writer gains or retypes a column, a
    // fully-emptied index would fork its read schema from a populated
    // one in exactly the state no ordinary test exercises — so pin
    // (name, type) pairs against REAL reads of just-built indexes
    // (nullability excluded: parquet reads and partition-column
    // inference flip it freely)
    def shape(s: org.apache.spark.sql.types.StructType) =
      s.fields.map(f => (f.name, f.dataType)).toSeq
    val td = tmp()
    TextIndex.build(spark, Seq((1L, "alpha beta")).toDF("doc_id", "text"),
      td, termBuckets = 2)
    assert(shape(spark.read.parquet(s"$td/postings").schema)
      == shape(TextIndex.PostingsSchema))
    assert(shape(spark.read.parquet(s"$td/docs").schema)
      == shape(TextIndex.CensusSchema))
    val ad = tmp()
    val vecs = Seq((1L, Seq(1.0, 0.0))).toDF("vec_id", "e")
    AnnIndex.build(spark, vecs, AnnIndex.seedCentroids(spark, vecs, 1), ad)
    assert(shape(spark.read.parquet(s"$ad/postings").schema)
      == shape(AnnIndex.PostingsBaseSchema))
    val nd = tmp()
    NeardupIndex.build(spark,
      Seq((1L, "alpha beta gamma delta")).toDF("doc_id", "text"), nd)
    assert(shape(spark.read.parquet(s"$nd/bands").schema)
      == shape(NeardupIndex.BandsSchema))
  }

  test("text index: fully-deleted corpus compacts, stays readable, " +
      "acts on the (0,0,k) advice, repopulates to the kernel") {
    val dir = tmp()
    TextIndex.build(spark, Seq((1L, "alpha beta"), (2L, "beta gamma"))
      .toDF("doc_id", "text"), dir, termBuckets = 4)
    TextIndex.applyDelta(spark, dir, noDocs, Seq(1L, 2L).toDF("doc_id"))
    // backlog 2 dead + 2 tombstones vs 0 live: advice fires, acting on
    // it folds everything to the empty layout
    assert(Graft.textIndexCompactHealth(spark, dir).isDefined)
    TextIndex.compact(spark, dir)
    // every entry point must serve the empty index, not crash schema
    // inference on the partition-less postings/docs dirs
    assert(TextIndex.currentGen(spark, dir) == 0L)
    assert(TextIndex.search(spark, dir, Seq("alpha")).isEmpty)
    assert(TextIndex.compactStats(spark, dir)
      == IndexCompaction.CompactStats(0L, 0L, 0L))
    assert(Graft.textIndexCompactHealth(spark, dir).isEmpty)
    // the ADVICE (0,0,k) state: deletes recorded against the EMPTY
    // layout (ids long gone — an at-least-once upstream replaying a
    // purge does exactly this). Health fires on the pure-tombstone
    // backlog and the advised call must SUCCEED, not crash
    TextIndex.applyDelta(spark, dir, noDocs, Seq(7L, 8L, 9L).toDF("doc_id"))
    assert(TextIndex.compactStats(spark, dir)
      == IndexCompaction.CompactStats(0L, 0L, 3L))
    val health = Graft.textIndexCompactHealth(spark, dir)
    assert(health.isDefined && health.get.recommended == 3L)
    TextIndex.compact(spark, dir) // the advised call, acted on
    assert(Graft.textIndexCompactHealth(spark, dir).isEmpty)
    // repopulation through the ordinary delta path serves the kernel
    val fresh = Seq((10L, "delta epsilon"), (11L, "epsilon zeta"))
      .toDF("doc_id", "text")
    TextIndex.applyDelta(spark, dir, fresh, noIds)
    val got = TextIndex.search(spark, dir, Seq("epsilon")).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val want = Graft.bm25(fresh, Seq("epsilon")).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got == want && got.keySet == Set(10L, 11L))
  }

  test("text index: a compact torn between the postings swap and the " +
      "docs swap folds the census on retry — tombstones are never " +
      "cleared while a table still holds rows they kill") {
    val dir = tmp()
    TextIndex.build(spark, Seq((1L, "alpha beta"), (2L, "beta gamma"))
      .toDF("doc_id", "text"), dir, termBuckets = 4)
    TextIndex.applyDelta(spark, dir, noDocs, Seq(1L, 2L).toDF("doc_id"))
    // fabricate the crash point AFTER swapIn(postings) fully completed
    // (empty live set swapped in, staging cleaned) but BEFORE
    // swapIn(docs): postings = empty layout, docs = 2 dead rows,
    // tombstones = 2
    val postings = new Path(s"$dir/postings")
    val fs = postings.getFileSystem(spark.sessionState.newHadoopConf())
    fs.delete(postings, true)
    fs.mkdirs(postings)
    assert(TextIndex.compactStats(spark, dir)
      == IndexCompaction.CompactStats(0L, 0L, 2L))
    // the retry must rewrite the DOCS table too — a short-circuit that
    // cleared tombstones on seeing the empty postings would RESURRECT
    // the two killed census rows and silently corrupt every BM25
    // stats row (N, Σdl) the index serves from then on
    TextIndex.compact(spark, dir)
    assert(IndexCompaction.readOrEmpty(spark, s"$dir/docs",
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("doc_id",
          org.apache.spark.sql.types.LongType)))).count() == 0L,
      "census rows resurrected by the torn-compact retry")
    assert(TextIndex.compactStats(spark, dir)
      == IndexCompaction.CompactStats(0L, 0L, 0L))
    // and the post-retry index serves correct stats for new docs
    val fresh = Seq((5L, "zeta eta")).toDF("doc_id", "text")
    TextIndex.applyDelta(spark, dir, fresh, noIds)
    val got = TextIndex.search(spark, dir, Seq("zeta")).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val want = Graft.bm25(fresh, Seq("zeta")).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got == want)
  }

  test("ann index: fully-deleted corpus compacts, stays readable, " +
      "acts on the (0,0,k) advice, repopulates and serves") {
    val dir = tmp()
    val vecs = Seq((1L, Seq(1.0, 0.0)), (2L, Seq(0.0, 1.0)))
      .toDF("vec_id", "e")
    AnnIndex.build(spark, vecs, AnnIndex.seedCentroids(spark, vecs, 2), dir)
    val noVecs = Seq.empty[(Long, Seq[Double])].toDF("vec_id", "e")
    AnnIndex.applyDelta(spark, dir, noVecs, Seq(1L, 2L).toDF("vec_id"))
    AnnIndex.compact(spark, dir)
    assert(AnnIndex.currentGen(spark, dir) == 0L)
    assert(AnnIndex.search(spark, dir,
      Seq((9L, Seq(1.0, 0.0))).toDF("qid", "qe"), 2, 3).isEmpty)
    assert(AnnIndex.compactStats(spark, dir)
      == IndexCompaction.CompactStats(0L, 0L, 0L))
    // (0,0,k): deletes against the empty layout, advice fires, the
    // advised compact succeeds and re-measures silent
    AnnIndex.applyDelta(spark, dir, noVecs, Seq(7L, 8L).toDF("vec_id"))
    val health = Graft.annIndexCompactHealth(spark, dir)
    assert(health.isDefined && health.get.recommended == 2L)
    AnnIndex.compact(spark, dir)
    assert(Graft.annIndexCompactHealth(spark, dir).isEmpty)
    // repopulate: assignment against the frozen codebook still works
    AnnIndex.applyDelta(spark, dir,
      Seq((3L, Seq(0.9, 0.1))).toDF("vec_id", "e"), noIds.toDF("vec_id"))
    val hits = AnnIndex.search(spark, dir,
      Seq((9L, Seq(1.0, 0.0))).toDF("qid", "qe"), 2, 3)
      .select("vec_id").as[Long].collect().toSet
    assert(hits == Set(3L))
  }

  test("neardup index: fully-deleted corpus compacts, stays readable, " +
      "acts on the (0,0,k) advice, repopulates and probes") {
    val dir = tmp()
    val text = "alpha beta gamma delta epsilon zeta eta theta"
    NeardupIndex.build(spark,
      Seq((1L, text)).toDF("doc_id", "text"), dir)
    NeardupIndex.applyDelta(spark, dir, noDocs, Seq(1L).toDF("doc_id"))
    NeardupIndex.compact(spark, dir)
    assert(NeardupIndex.currentGen(spark, dir) == 0L)
    assert(NeardupIndex.probe(spark, dir,
      Seq((2L, text)).toDF("doc_id", "text")).isEmpty)
    assert(NeardupIndex.compactStats(spark, dir)
      == IndexCompaction.CompactStats(0L, 0L, 0L))
    // (0,0,k): the advised compact from the pure-tombstone state runs
    NeardupIndex.applyDelta(spark, dir, noDocs, Seq(5L).toDF("doc_id"))
    val health = Graft.neardupIndexHealth(spark, dir)
    assert(health.isDefined && health.get.recommended == 1L)
    NeardupIndex.compact(spark, dir)
    assert(Graft.neardupIndexHealth(spark, dir).isEmpty)
    // repopulate and probe an exact near-dup
    NeardupIndex.applyDelta(spark, dir,
      Seq((3L, text)).toDF("doc_id", "text"), noIds)
    val pairs = NeardupIndex.probe(spark, dir,
      Seq((4L, text)).toDF("doc_id", "text"))
      .as[(Long, Long)].collect().toSet
    assert(pairs == Set((4L, 3L)))
  }

  test("ann index: caller extras survive the fully-emptied state via " +
      "the stored schema; a meta-less legacy index keeps the " +
      "documented base-shape fork") {
    val dir = tmp()
    val vecs = Seq((1L, Seq(1.0, 0.0), "en"), (2L, Seq(0.0, 1.0), "de"))
      .toDF("vec_id", "e", "lang")
    AnnIndex.build(spark, vecs, AnnIndex.seedCentroids(spark, vecs, 2), dir)
    val q = Seq((9L, Seq(1.0, 0.0))).toDF("qid", "qe")
    def hybrid() = AnnIndex.searchWhere(spark, dir, q, 2, 3,
      col("lang") === "en").select("vec_id").as[Long].collect().toSet
    assert(hybrid() == Set(1L))
    // empty it out completely — the partitioned rewrite of zero rows
    // leaves no cid= dirs, the exact state that used to drop extras
    val noVecs = Seq.empty[(Long, Seq[Double], String)]
      .toDF("vec_id", "e", "lang")
    AnnIndex.applyDelta(spark, dir, noVecs, Seq(1L, 2L).toDF("vec_id"))
    AnnIndex.compact(spark, dir)
    // the hybrid predicate still RESOLVES (typed-empty from the
    // stored schema) instead of AnalysisException-ing the serving path
    assert(hybrid().isEmpty)
    // and the extras ride repopulation unchanged
    AnnIndex.applyDelta(spark, dir,
      Seq((3L, Seq(0.9, 0.1), "en")).toDF("vec_id", "e", "lang"),
      Seq.empty[Long].toDF("vec_id"))
    assert(hybrid() == Set(3L))
    // LEGACY (pre-meta) indexes: without the stored schema the
    // fully-emptied fallback is the documented base shape — the
    // hybrid predicate fails LOUDLY, never silently serves wrong
    AnnIndex.applyDelta(spark, dir, noVecs, Seq(3L).toDF("vec_id"))
    AnnIndex.compact(spark, dir)
    val meta = new Path(s"$dir/_meta.txt")
    meta.getFileSystem(spark.sessionState.newHadoopConf())
      .delete(meta, false)
    intercept[org.apache.spark.sql.AnalysisException] { hybrid() }
  }
}
