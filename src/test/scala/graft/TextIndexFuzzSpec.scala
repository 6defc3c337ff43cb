package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

import graft.api.Graft
import graft.ops.TextIndex

/** Randomized schedules for the maintained inverted index: random
  * fanouts (including the 1-bucket degenerate) under the shared
  * [[IndexFuzzHarness]] schedule — after EVERY step, index-served
  * BM25 must equal the kernel over the same live corpus to its own
  * rounding, and the stored fanout must be the one the index was
  * built with. The CurrentTableFuzzSpec discipline applied to the
  * index family's newest knob: example specs pin the designed states,
  * the fuzz walks the states nobody designed.
  */
class TextIndexFuzzSpec extends AnyFunSuite {
  lazy val spark = TestSpark.session
  import spark.implicits._

  private val vocab = Vector("alpha", "beta", "gamma", "delta", "spark",
    "shuffle", "window", "stream")

  private def docText(rnd: scala.util.Random): String =
    Seq.fill(1 + rnd.nextInt(6))(vocab(rnd.nextInt(vocab.size)))
      .mkString(" ")

  private def df(state: Map[Long, String]): DataFrame =
    state.toSeq.toDF("doc_id", "text")

  private def scores(d: DataFrame): Map[Long, Double] =
    d.select("doc_id", "bm25").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap

  test("random edit/compact schedules at random fanouts always serve " +
      "the kernel's scores") {
    for (seed <- 1 to 4) {
      val rnd = new scala.util.Random(seed)
      // the CURRENT build parameters — vars, because every in-place
      // rebuild step draws fresh ones: a schedule that always rebuilds
      // at the original fanout never crosses the fanout TRANSITION the
      // build's delete-data-first staging sweep exists to protect
      // (old-fanout trash healed back under a new tb= is the silent
      // misroute), so the transition must be reachable INTERLEAVED
      // with deltas, tombstones and torn compactions
      var nb = 1 + rnd.nextInt(12)
      // a random skew floor (0 = none) rides the meta: maintenance
      // must never lose or alter the advisory's memory
      var floor = rnd.nextInt(3) * nb
      val dir = Files.createTempDirectory(s"graft-tif-$seed-").toString
      val initial = (1L to (5 + rnd.nextInt(10)).toLong)
        .map(i => i -> docText(rnd)).toMap
      TextIndex.build(spark, df(initial), dir, termBuckets = nb,
        termBucketsFloor = floor)
      IndexFuzzHarness.run[String](rnd, initial,
        freshValue = () => docText(rnd),
        upsert = up => TextIndex.applyDelta(spark, dir, df(up),
          spark.emptyDataset[Long].toDF("doc_id")),
        delete = dead => TextIndex.applyDelta(spark, dir,
          Seq.empty[(Long, String)].toDF("doc_id", "text"),
          dead.toDF("doc_id")),
        compact = () => TextIndex.compact(spark, dir),
        tearMidSwap = () => IndexFuzzHarness.tearCompactSwap(spark, rnd,
          Seq(s"$dir/postings", s"$dir/docs")),
        rebuild = st => {
          nb = 1 + rnd.nextInt(12)
          floor = rnd.nextInt(3) * nb
          TextIndex.build(spark, df(st), dir,
            termBuckets = nb, termBucketsFloor = floor)
        },
        deleteFloor = 2,
        check = (state, step) => {
          val terms = rnd.shuffle(vocab).take(2) :+ "neverword"
          val got = scores(TextIndex.search(spark, dir, terms))
          val want = scores(Graft.bm25(df(state), terms))
          assert(got == want,
            s"seed $seed nb $nb $step: index $got != kernel $want")
          // the stored meta tracks the LATEST rebuild's parameters
          assert(TextIndex.termBucketsOf(spark, dir) == nb,
            s"seed $seed $step: stored fanout drifted")
          assert(TextIndex.termBucketsFloorOf(spark, dir) == floor,
            s"seed $seed $step: stored skew floor drifted")
          // the compact advisory's live count equals the oracle
          // corpus's posting count after EVERY step — the kill rule
          // the measurement claims to apply, exercised under random
          // generations, tears and rebuilds (a >= vs > drift in the
          // tombstone rule shows up here, not in designed states)
          val wantLive = state.values.map(t =>
            t.trim.toLowerCase.split("\\s+").distinct.length.toLong).sum
          val cs = TextIndex.compactStats(spark, dir)
          assert(cs.liveRows == wantLive,
            s"seed $seed $step: live postings ${cs.liveRows} != " +
              s"kernel count $wantLive ($cs)")
        })
      // the postings on disk never leak outside the LATEST fanout —
      // exactly the misroute a fanout-crossing rebuild could leave.
      // Hadoop FS like the prod twin (TextIndex.loadStats): the check
      // must see whatever filesystem the index was written through
      val pPath = new org.apache.hadoop.fs.Path(s"$dir/postings")
      val pfs = pPath.getFileSystem(spark.sessionState.newHadoopConf())
      val tbDirs = (if (pfs.exists(pPath)) pfs.listStatus(pPath)
        else Array.empty[org.apache.hadoop.fs.FileStatus])
        .filter(_.isDirectory).map(_.getPath.getName)
        .filter(_.startsWith("tb=")).map(_.stripPrefix("tb=").toInt)
      assert(tbDirs.forall(tb => tb >= 0 && tb < nb),
        s"seed $seed: fanout leaked: ${tbDirs.toSeq} at nb=$nb")
    }
  }
}
