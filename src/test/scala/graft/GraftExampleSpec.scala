package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.api.Graft
import graft.examples.CorpusPipeline

/** Executes the README "using the library" walkthrough
  * ([[graft.examples.CorpusPipeline]]) — the documented facade chain
  * is a test, not prose.
  */
class GraftExampleSpec extends AnyFunSuite {
  lazy val spark = TestSpark.session
  import spark.implicits._

  test("corpus pipeline example: dedup → decontaminate → pack → write bucketed") {
    val docs = Seq(
      (1L, "web", "the quick brown fox jumps over the lazy dog today"),
      (2L, "web", "the quick brown fox jumps over the lazy dog today"),
      (3L, "web", "an entirely different document about spark internals and shuffles"),
      (5L, "books", "zeta alpha beta gamma delta unrelated tail words here"))
      .toDF("doc_id", "source", "text")
    val benchmark = Seq((100L, "alpha beta gamma delta epsilon"))
      .toDF("doc_id", "text")

    val packed = CorpusPipeline.cleanAndPack(spark, docs, benchmark,
      ctx = 8, gramN = 4)
    val rows = packed.orderBy("doc_id").collect()
    // doc 2 (exact dup of 1, non-canonical cluster member) and doc 5
    // (shares the 4-gram "alpha beta gamma delta" with the benchmark)
    // are gone; the canonical + clean docs survive
    assert(rows.map(_.getLong(1)).toSeq == Seq(1L, 3L))
    // packing laid the "web" stream out in doc_id order at ctx=8:
    // doc 1 (10 tokens) starts at 0 → bin 0; doc 3 starts at 10 → bin 1
    val byId = rows.map(r => r.getLong(1) ->
      ((r.getLong(2), r.getLong(4), r.getLong(5)))).toMap
    assert(byId(1L) == ((10L, 0L, 0L)))
    assert(byId(3L) == ((9L, 10L, 1L)))

    // finish the chain the way the README shows: bucketed layout so
    // the training loader's repeated joins on `bin` pay no exchange
    val tmp = Files.createTempDirectory("graft-example-")
    Graft.writeBucketed(packed, "graft_example_packed", s"$tmp/packed",
      "bin", 2)
    try assert(spark.table("graft_example_packed").count() == 2)
    finally spark.sql("DROP TABLE IF EXISTS graft_example_packed")

    // long-lived sessions release the capstone stage cache explicitly
    Graft.releaseStageCache() // no-op here; must not throw
  }
}
