package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.NeardupIndex

/** Randomized delta/compact schedules for the maintained near-dup
  * index under the shared [[IndexFuzzHarness]]: after every step the
  * index's LIVE band set must equal banding the expected corpus from
  * scratch (the maintained dataset is exactly the one a rebuild would
  * produce — the whole point of the generation/tombstone protocol),
  * and a probe of a fresh batch must equal the from-scratch candidate
  * join over that corpus.
  */
class NeardupIndexFuzzSpec extends AnyFunSuite {
  lazy val spark = TestSpark.session
  import spark.implicits._

  private val vocab = Vector("the", "quick", "brown", "fox", "lazy",
    "dog", "spark", "stream")

  // ≥3 tokens so every doc bands (the shingle kernel's loop bound);
  // a tiny vocab makes real shared shingles (and so real candidate
  // pairs) common
  private def docText(rnd: scala.util.Random): String =
    Seq.fill(3 + rnd.nextInt(5))(vocab(rnd.nextInt(vocab.size)))
      .mkString(" ")

  private def df(state: Map[Long, String]): DataFrame =
    state.toSeq.toDF("doc_id", "text")

  private def bandSet(d: DataFrame): Set[(Int, String, Long)] =
    d.select(col("band").cast("int"), col("bucket").cast("string"),
        col("doc_id").cast("long")).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2))).toSet

  test("random delta/compact schedules keep the live band set equal " +
      "to banding the corpus from scratch, and probes equal the " +
      "from-scratch candidate join") {
    for (seed <- 1 to 3) {
      val rnd = new scala.util.Random(seed)
      val dir = Files.createTempDirectory(s"graft-ndf-$seed-").toString
      val initial = (1L to (5 + rnd.nextInt(8)).toLong)
        .map(i => i -> docText(rnd)).toMap
      NeardupIndex.build(spark, df(initial), dir)
      IndexFuzzHarness.run[String](rnd, initial,
        freshValue = () => docText(rnd),
        upsert = up => NeardupIndex.applyDelta(spark, dir, df(up),
          spark.emptyDataset[Long].toDF("doc_id")),
        delete = dead => NeardupIndex.applyDelta(spark, dir,
          Seq.empty[(Long, String)].toDF("doc_id", "text"),
          dead.toDF("doc_id")),
        compact = () => NeardupIndex.compact(spark, dir),
        tearMidSwap = () => IndexFuzzHarness.tearCompactSwap(spark, rnd,
          Seq(s"$dir/bands")),
        rebuild = st => NeardupIndex.build(spark, df(st), dir),
        deleteFloor = 2,
        check = (state, step) => {
          val live = bandSet(NeardupIndex.live(spark, dir))
          val want = bandSet(
            graft.queries.TextQueries.docBands(spark, df(state)))
          assert(live == want,
            s"seed $seed $step: live bands diverged from a fresh banding")
          // the compact advisory's live count equals a fresh banding's
          // row count after every step — the measurement's kill rule
          // exercised under random generations, tears and rebuilds
          val cs = NeardupIndex.compactStats(spark, dir)
          assert(cs.liveRows == want.size,
            s"seed $seed $step: measured live ${cs.liveRows} != " +
              s"${want.size} ($cs)")
          // probe a fresh (unapplied) batch: index-served candidates
          // == the from-scratch candidate join over the same corpus
          val batch = (0 until 2).map(i =>
            (10000L + rnd.nextInt(100) * 2 + i, docText(rnd)))
            .toDF("doc_id", "text")
          val got = NeardupIndex.probe(spark, dir, batch)
            .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
          val wantPairs = graft.queries.TextQueries
            .docBands(spark, batch).as("n")
            .join(graft.queries.TextQueries
                .docBands(spark, df(state)).as("i"),
              col("n.band") === col("i.band") &&
                col("n.bucket") === col("i.bucket") &&
                col("n.doc_id") =!= col("i.doc_id"))
            .select(col("n.doc_id"), col("i.doc_id")).distinct()
            .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
          assert(got == wantPairs,
            s"seed $seed $step: probe $got != from-scratch $wantPairs")
        })
    }
  }
}
