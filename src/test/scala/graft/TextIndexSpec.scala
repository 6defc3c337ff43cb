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
}
