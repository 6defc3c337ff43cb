package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.AnnIndex

/** Randomized delta/compact schedules for the maintained IVF index
  * under the shared [[IndexFuzzHarness]]: after every step, (1) the
  * index's live set must equal the expected key→vector state (the
  * generation/tombstone kill rule under torn retries and interleaved
  * compactions), (2) a full-probe search (nprobe = centroids, so IVF
  * degenerates to exact scan) must return exactly the brute-force
  * cosine top-k over that state, and (3) a PARTIAL-probe search
  * (nprobe = 1) must return exactly the brute-force top-k over the
  * probed cell's own live assignments — full-probe equality never
  * exercises the IVF prune, so a routing bug that silently dropped a
  * probed centroid's postings could hide behind (2). The per-seed
  * recall of the pruned search against the GLOBAL top-k is measured
  * and pinned (the q70 discipline), so a recall regression at these
  * fixtures is a test failure, not a silent quality drift.
  */
class AnnIndexFuzzSpec extends AnyFunSuite {
  lazy val spark = TestSpark.session
  import spark.implicits._

  private def vec(rnd: scala.util.Random): Seq[Double] =
    Seq.fill(4)(math.rint(rnd.nextGaussian() * 100) / 100.0 + 0.01)

  private def df(state: Map[Long, Seq[Double]]): DataFrame =
    state.toSeq.toDF("vec_id", "e")

  private def cosine(a: Seq[Double], b: Seq[Double]): Double = {
    val d = a.zip(b).map { case (x, y) => x * y }.sum
    d / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
  }

  test("random delta/compact schedules keep the live set exact and " +
      "full-probe search equal to brute-force cosine top-k") {
    for (seed <- 1 to 3) {
      val rnd = new scala.util.Random(seed)
      // CURRENT centroid count — a var, because every in-place rebuild
      // draws a fresh k and a fresh codebook from the live corpus (the
      // retrain+build maintenance op): the codebook TRANSITION is what
      // the build's delete-data-first sweep protects (old-codebook
      // postings or trash paired with the new centroids is the silent
      // misroute), and a schedule that always rebuilds with the
      // original codebook never crosses it
      var k = 2 + rnd.nextInt(3) // centroids
      val dir = Files.createTempDirectory(s"graft-annf-$seed-").toString
      val initial = (1L to (6 + rnd.nextInt(6)).toLong)
        .map(i => i -> vec(rnd)).toMap
      val cb = AnnIndex.seedCentroids(spark, df(initial), k)
      AnnIndex.build(spark, df(initial), cb, dir)
      var recallHit = 0
      var recallTot = 0
      IndexFuzzHarness.run[Seq[Double]](rnd, initial,
        freshValue = () => vec(rnd),
        upsert = up => AnnIndex.applyDelta(spark, dir, df(up),
          spark.emptyDataset[Long].toDF("vec_id")),
        delete = dead => AnnIndex.applyDelta(spark, dir,
          Seq.empty[(Long, Seq[Double])].toDF("vec_id", "e"),
          dead.toDF("vec_id")),
        compact = () => AnnIndex.compact(spark, dir),
        tearMidSwap = () => IndexFuzzHarness.tearCompactSwap(spark, rnd,
          Seq(s"$dir/postings")),
        rebuild = st => {
          k = 2 + rnd.nextInt(3)
          AnnIndex.build(spark, df(st),
            AnnIndex.seedCentroids(spark, df(st), k), dir)
        },
        deleteFloor = 5, // top-3 candidates + the query vector + slack
        check = (state, step) => {
          // ONE live collect feeds both (1) and (3)'s cell oracle
          val liveRows = AnnIndex.live(spark, dir)
            .select("vec_id", "cid", "e").collect()
            .map(r => (r.getLong(0), r.getInt(1),
              r.getSeq[Double](2).toSeq))
          // (1) the live set IS the expected state
          val got = liveRows.map(v => v._1 -> v._3).toMap
          assert(got == state, s"seed $seed $step: live set diverged")
          // the compact advisory's live count agrees (one posting per
          // vector) after every step — the measurement's kill rule
          // exercised under random generations, tears and rebuilds
          val cs = AnnIndex.compactStats(spark, dir)
          assert(cs.liveRows == state.size,
            s"seed $seed $step: measured live ${cs.liveRows} != " +
              s"${state.size} ($cs)")
          // (2) full-probe search == brute-force top-3 (ties to lower
          // id): distinct random vectors make exact score ties
          // vanishingly unlikely, and the 1e-9 rounding absorbs
          // float-order noise
          val q = state.head
          val want = state.toSeq.filter(_._1 != q._1)
            .map { case (id, e) =>
              (id, math.rint(cosine(q._2, e) * 1e9) / 1e9) }
            .sortBy { case (id, c) => (-c, id) }.take(3).map(_._1)
          val res = AnnIndex.search(spark, dir,
              Seq((q._1, q._2)).toDF("qid", "qe"), nprobe = k, k = 3)
            .orderBy("rn").select("vec_id").collect().map(_.getLong(0))
          assert(res.toSeq == want,
            s"seed $seed $step: search ${res.toSeq} != brute force $want")
          // (3) partial probe (nprobe = 1): exact oracle from the
          // index's OWN live assignments — the probed cell is the
          // query's nearest centroid (search's tie rule: cos desc,
          // cid asc), the expected result is the brute-force top-3
          // over exactly that cell's vectors. Full-probe can't see a
          // prune bug; this can.
          val cents = AnnIndex.codebook(spark, dir).collect()
            .map(r => r.getInt(0) ->
              r.getSeq[Double](1).toSeq)
          // the stored codebook tracks the LATEST rebuild's k — the
          // meta-follows-the-rebuild assertion, TextIndexFuzzSpec's
          // stored-fanout twin
          assert(cents.length == k,
            s"seed $seed $step: codebook size ${cents.length} != " +
              s"latest rebuild's k $k")
          val probedCid = cents
            .map { case (cid, ce) => (cid, cosine(q._2, ce)) }
            .minBy { case (cid, c) => (-c, cid) }._1
          val cellVecs = liveRows
            .filter(v => v._2 == probedCid && v._1 != q._1)
          val wantCell = cellVecs
            .map { case (id, _, e) =>
              (id, math.rint(cosine(q._2, e) * 1e9) / 1e9) }
            .sortBy { case (id, c) => (-c, id) }.take(3).map(_._1).toSeq
          val gotCell = AnnIndex.search(spark, dir,
              Seq((q._1, q._2)).toDF("qid", "qe"), nprobe = 1, k = 3)
            .orderBy("rn").select("vec_id").collect()
            .map(_.getLong(0)).toSeq
          assert(gotCell == wantCell,
            s"seed $seed $step: nprobe=1 $gotCell != cell-exact $wantCell")
          recallHit += gotCell.count(want.contains)
          recallTot += want.size
        })
      // pinned recall floor of the pruned search vs the GLOBAL top-k
      // at these fixed seeds — measured, then pinned: a routing or
      // assignment regression that keeps (3)'s oracle equality but
      // degrades what the probed cell CONTAINS shows up here
      val recall = recallHit.toDouble / math.max(1, recallTot)
      info(f"seed $seed: nprobe=1 recall $recall%.2f " +
        s"($recallHit/$recallTot)")
      // measured at these seeds: 0.43 / 0.54 / 0.71 (tiny corpora
      // at 2-4 centroids — the global top-3 legitimately spans cells,
      // so nprobe=1 recall is modest BY DESIGN here; the value being
      // pinned is that it cannot silently sink further) — the floor
      // sits just under the observed minimum, so any regression that
      // hollows out the probed cell (bad assignment, dropped
      // postings) fails loudly instead of drifting. This is the
      // smoke-alarm pin; the statistically meaningful recall floor
      // binds in ScaleBench's `ann` experiment at 2M vectors
      assert(recall >= 0.40,
        f"seed $seed: nprobe=1 recall $recall%.2f fell below the " +
          "pinned floor 0.40 (measured 0.43-0.71 at these seeds)")
    }
  }
}
