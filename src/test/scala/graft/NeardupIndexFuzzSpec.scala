package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.NeardupIndex

/** Randomized delta/compact schedules for the maintained near-dup
  * index: after every step the index's LIVE band set must equal
  * banding the expected corpus from scratch (the maintained dataset
  * is exactly the one a rebuild would produce — the whole point of
  * the generation/tombstone protocol), and a probe of a fresh batch
  * must equal the from-scratch candidate join over that corpus.
  * Completes the fuzz family: [[TextIndexFuzzSpec]] (postings),
  * [[AnnIndexFuzzSpec]] (vectors), this (bands).
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
      var state = (1L to (5 + rnd.nextInt(8)).toLong)
        .map(i => i -> docText(rnd)).toMap
      var nextId = 100L
      NeardupIndex.build(spark, df(state), dir)

      def check(step: String): Unit = {
        val live = bandSet(NeardupIndex.live(spark, dir))
        val want = bandSet(
          graft.queries.TextQueries.docBands(spark, df(state)))
        assert(live == want,
          s"seed $seed $step: live bands diverged from a fresh banding")
        // probe a fresh (unapplied) batch: index-served candidates ==
        // the from-scratch candidate join over the same corpus
        val batch = (0 until 2).map { _ =>
          val id = nextId + 1000; (id + rnd.nextInt(3), docText(rnd))
        }.toMap.toSeq.toDF("doc_id", "text")
        val got = NeardupIndex.probe(spark, dir, batch)
          .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
        val wantPairs = graft.queries.TextQueries
          .docBands(spark, batch).as("n")
          .join(graft.queries.TextQueries.docBands(spark, df(state)).as("i"),
            col("n.band") === col("i.band") &&
              col("n.bucket") === col("i.bucket") &&
              col("n.doc_id") =!= col("i.doc_id"))
          .select(col("n.doc_id"), col("i.doc_id")).distinct()
          .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
        assert(got == wantPairs,
          s"seed $seed $step: probe $got != from-scratch $wantPairs")
      }
      check("build")

      for (step <- 0 until 4 + rnd.nextInt(4)) {
        rnd.nextInt(4) match {
          case 0 => // upserts: new docs + a rewrite
            val news = (0 until 1 + rnd.nextInt(3)).map { _ =>
              val id = nextId; nextId += 1; id -> docText(rnd)
            }
            val rewrites = rnd.shuffle(state.keys.toSeq)
              .take(rnd.nextInt(2)).map(id => id -> docText(rnd))
            val up = (news ++ rewrites).toMap
            NeardupIndex.applyDelta(spark, dir, df(up),
              spark.emptyDataset[Long].toDF("doc_id"))
            state = state ++ up
          case 1 => // deletes, never below 2 live docs
            if (state.size > 2) {
              val dead = rnd.shuffle(state.keys.toSeq)
                .take(1 + rnd.nextInt(2))
              NeardupIndex.applyDelta(spark, dir,
                Seq.empty[(Long, String)].toDF("doc_id", "text"),
                dead.toDF("doc_id"))
              state = state -- dead
            }
          case 2 => // torn-delta retry: the SAME delta applied twice
            val id = nextId; nextId += 1
            val up = Map(id -> docText(rnd))
            NeardupIndex.applyDelta(spark, dir, df(up),
              spark.emptyDataset[Long].toDF("doc_id"))
            NeardupIndex.applyDelta(spark, dir, df(up),
              spark.emptyDataset[Long].toDF("doc_id"))
            state = state ++ up
          case 3 =>
            NeardupIndex.compact(spark, dir)
        }
        check(s"step $step")
      }
    }
  }
}
