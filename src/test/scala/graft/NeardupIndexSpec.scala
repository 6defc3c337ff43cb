package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.NeardupIndex

/** The durable maintained near-dup index: build → delta (update /
  * delete / insert) → probe → compact, with the invariant that the
  * live band set after ANY sequence of deltas equals a from-scratch
  * banding of the post-delta corpus — incremental maintenance must be
  * observationally identical to recompute, that is the whole
  * contract.
  */
class NeardupIndexSpec extends AnyFunSuite {
  lazy val spark = TestSpark.session
  import spark.implicits._

  private def docs(rows: (Long, String)*): DataFrame =
    rows.toSeq.toDF("doc_id", "text")

  private def bandsOf(d: DataFrame): Set[(Int, String, Long)] =
    graft.queries.TextQueries.docBands(spark, d)
      .select(col("band"), col("bucket"), col("doc_id"))
      .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2))).toSet

  private def liveSet(dir: String): Set[(Int, String, Long)] =
    NeardupIndex.live(spark, dir)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2))).toSet

  private val base = Seq(
    1L -> "the quick brown fox jumps over the lazy dog",
    2L -> "pack my box with five dozen liquor jugs",
    3L -> "how vexingly quick daft zebras jump around",
    4L -> "the quick brown fox jumps over the lazy cat")

  test("live set after deltas == from-scratch banding of the " +
      "post-delta corpus; probes hit the maintained index") {
    val dir = Files.createTempDirectory("graft-ndx-").toString
    NeardupIndex.build(spark, docs(base: _*), dir)
    assert(liveSet(dir) == bandsOf(docs(base: _*)))

    // delta 1: update doc 2, delete doc 3, insert doc 5
    val upserts = docs(
      2L -> "pack my box with five dozen liquor jugs again and again",
      5L -> "sphinx of black quartz judge my vow")
    val deletes = Seq(3L).toDF("doc_id")
    assert(NeardupIndex.applyDelta(spark, dir, upserts, deletes) == 1L)
    val after1 = Seq(
      base(0), base(3),
      2L -> "pack my box with five dozen liquor jugs again and again",
      5L -> "sphinx of black quartz judge my vow")
    assert(liveSet(dir) == bandsOf(docs(after1: _*)))

    // a probe with doc 1's exact text must surface doc 1 (same
    // signature ⇒ same buckets), and never the probe doc itself
    val hits = NeardupIndex.probe(spark, dir,
        docs(100L -> "the quick brown fox jumps over the lazy dog"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(hits.contains((100L, 1L)))
    assert(!hits.exists(_._2 == 100L))

    // delta 2: re-insert doc 3 with new text, delete doc 5
    assert(NeardupIndex.applyDelta(spark, dir,
      docs(3L -> "zebras are back with entirely different words now"),
      Seq(5L).toDF("doc_id")) == 2L)
    val after2 = Seq(base(0), base(3),
      2L -> "pack my box with five dozen liquor jugs again and again",
      3L -> "zebras are back with entirely different words now")
    assert(liveSet(dir) == bandsOf(docs(after2: _*)))

    // compact folds tombstones away without changing the live set
    val liveBefore = liveSet(dir)
    NeardupIndex.compact(spark, dir)
    assert(liveSet(dir) == liveBefore)
    assert(spark.read.parquet(s"$dir/tombstones").count() == 0)
    // and the band table physically dropped the dead rows
    assert(spark.read.parquet(s"$dir/bands").count() == liveBefore.size)

    // post-compact deltas keep composing
    NeardupIndex.applyDelta(spark, dir, docs(), Seq(1L).toDF("doc_id"))
    assert(liveSet(dir) == bandsOf(docs(after2.filter(_._1 != 1L): _*)))
  }

  test("a torn delta retried at the next generation converges to the " +
      "same live set (at-least-once applies)") {
    val dir = Files.createTempDirectory("graft-ndx-").toString
    NeardupIndex.build(spark, docs(base: _*), dir)
    val upserts = docs(2L -> "totally rewritten second document text")
    val deletes = Seq(4L).toDF("doc_id")
    // half-applied delta: tombstones landed, band rows did not (the
    // torn write the delta protocol documents) — simulated by a
    // tombstone-only delta carrying the SAME touched set
    NeardupIndex.applyDelta(spark, dir, docs(), // no band rows
      upserts.select("doc_id").union(deletes))
    // the retry applies the full delta at the next generation
    NeardupIndex.applyDelta(spark, dir, upserts, deletes)
    val expected = Seq(base(0), base(2),
      2L -> "totally rewritten second document text")
    assert(liveSet(dir) == bandsOf(docs(expected: _*)))
  }

  test("an in-place rebuild replaces everything: surviving tombstones " +
      "cannot kill the new corpus's gen-0 bands, and compact staging " +
      "dirs are swept so a later compact cannot heal stale bands back") {
    val dir = Files.createTempDirectory("graft-ndx-rb-").toString
    NeardupIndex.build(spark, docs(base: _*), dir)
    // a gen-1 tombstone for doc 1, then staging junk a crashed
    // compact could leave behind
    NeardupIndex.applyDelta(spark, dir, docs(), Seq(1L).toDF("doc_id"))
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sessionState.newHadoopConf())
    fs.mkdirs(new org.apache.hadoop.fs.Path(s"$dir/bands._compact_trash"))
    fs.mkdirs(new org.apache.hadoop.fs.Path(s"$dir/bands._compact_tmp"))
    // rebuild over a corpus that CONTAINS doc 1 — without the
    // delete-data-first sweep the old tombstone (gen 1) outranks the
    // rebuilt gen-0 rows and doc 1 silently vanishes from the index
    NeardupIndex.build(spark, docs(base: _*), dir)
    assert(liveSet(dir) == bandsOf(docs(base: _*)),
      "a pre-rebuild tombstone leaked into the rebuilt index")
    for (stale <- Seq("bands._compact_trash", "bands._compact_tmp"))
      assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$dir/$stale")),
        s"$stale survived build")
    // and the next compact (whose heal step would restore a stale
    // trash) still serves the rebuilt corpus
    NeardupIndex.compact(spark, dir)
    assert(liveSet(dir) == bandsOf(docs(base: _*)))
  }

  test("compactStats measures the tombstone backlog exactly and the " +
      "advice fires at the family's 2x read-amplification threshold") {
    import graft.ops.IndexCompaction
    import graft.ops.IndexCompaction.CompactStats
    val dir = Files.createTempDirectory("graft-ndc-").toString
    NeardupIndex.build(spark, docs(base: _*), dir)
    // fresh: 4 docs x 2 bands, nothing dead, nothing to advise
    assert(NeardupIndex.compactStats(spark, dir) == CompactStats(8, 8, 0))
    assert(IndexCompaction.compactAdvice(
      NeardupIndex.compactStats(spark, dir)).isEmpty)
    // update doc 2: 1 tombstone + 2 fresh band rows — backlog 3
    // (2 dead + 1 tombstone) under live 8, stays silent
    NeardupIndex.applyDelta(spark, dir,
      docs(2L -> "pack my box with five dozen liquor jugs again"),
      Seq.empty[Long].toDF("doc_id"))
    val st1 = NeardupIndex.compactStats(spark, dir)
    assert(st1 == CompactStats(10, 8, 1))
    assert(IndexCompaction.compactAdvice(st1).isEmpty,
      s"backlog 3 < live 8 must be silent: $st1")
    // delete docs 3 and 4: backlog 9 (6 dead + 3 tombstones) >=
    // live 4 — reads now pay >=2x the post-compact scan, advise
    NeardupIndex.applyDelta(spark, dir, docs(),
      Seq(3L, 4L).toDF("doc_id"))
    val st2 = NeardupIndex.compactStats(spark, dir)
    assert(st2 == CompactStats(10, 4, 3))
    assert(IndexCompaction.compactAdvice(st2).contains(9L))
    // acted on: the backlog folds away and the advice is silent until
    // real churn re-accumulates — flap-proof by direction
    NeardupIndex.compact(spark, dir)
    val st3 = NeardupIndex.compactStats(spark, dir)
    assert(st3 == CompactStats(4, 4, 0))
    assert(IndexCompaction.compactAdvice(st3).isEmpty)
  }
}
