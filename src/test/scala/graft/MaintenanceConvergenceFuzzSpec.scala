package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.api.Graft
import graft.ops.TextIndex

/** The one-call maintenance loop driven the way a LITERAL cron would
  * drive it, under random corpora, fanouts, churn and targets: call
  * `Graft.textIndexMaintenance`, act on whatever verdict comes back
  * (CompactFirst → the in-place compact; Resize → rebuild at the
  * TYPED recommendation, floor carried), repeat. The property under
  * test is the advisory family's reason to exist: acting on every
  * verdict CONVERGES — no advice loop, no oscillation, no futile
  * maintenance. The per-arm halves are spec-pinned deterministically
  * (GraftApiSpec's churn+skew walk, TextIndexSpec's decision tables,
  * the r16 oscillation fixture); this suite asserts the COMPOSED loop
  * under schedules nobody hand-picked:
  *   - the loop reaches None within a small bounded cycle count
  *     (hysteresis + the skew floor + the mega-term veto together
  *     bound the grow chain — each acted-on grow at least doubles the
  *     fanout, and the 2^20 cap is unreachable at fixture scale);
  *   - no two CONSECUTIVE verdicts are identical — an acted-on
  *     verdict that reproduces itself verbatim means acting changed
  *     nothing, the exact futile-advice loop the family promises
  *     never to advise;
  *   - converged means STABLE: one more call still reads None;
  *   - CompactDeferred never appears at the default floor 0.
  */
class MaintenanceConvergenceFuzzSpec extends AnyFunSuite {
  lazy val spark = TestSpark.session
  import spark.implicits._

  private def tmp() = Files.createTempDirectory("graft-mconv-").toString

  test("acting on every one-call text maintenance verdict converges " +
      "to stable silence under random corpora, churn and targets") {
    for (seed <- Seq(11, 23, 37, 49, 58)) {
      val rnd = new scala.util.Random(seed)
      val dir = tmp()
      val vocab = (0 until 40 + rnd.nextInt(60)).map(i => s"cv${seed}t$i")
      def text() = (0 until 3 + rnd.nextInt(6))
        .map(_ => vocab(rnd.nextInt(vocab.size))).mkString(" ")
      var state = (0 until 30 + rnd.nextInt(40))
        .map(i => i.toLong -> text()).toMap
      def docsOf(m: Map[Long, String]) = m.toSeq.toDF("doc_id", "text")
      TextIndex.build(spark, docsOf(state), dir,
        termBuckets = Seq(2, 4, 8)(rnd.nextInt(3)))
      // churn: 0-3 delta waves of rewrites + deletes, so some seeds
      // enter the loop compact-owed, some sizing-only, some healthy
      for (_ <- 0 until rnd.nextInt(4)) {
        val rewrites = rnd.shuffle(state.keys.toSeq)
          .take(rnd.nextInt(1 + state.size / 2))
          .map(id => id -> text()).toMap
        val dead = rnd.shuffle((state -- rewrites.keys).keys.toSeq)
          .take(rnd.nextInt(1 + state.size / 4))
        TextIndex.applyDelta(spark, dir, docsOf(rewrites),
          dead.toDF("doc_id"))
        state = state ++ rewrites -- dead
      }
      val target = Seq(5L, 15L, 40L)(rnd.nextInt(3))
      var last: Option[Graft.Maintenance[_, _]] = None
      var cycles = 0
      var converged = false
      while (!converged && cycles < 8) {
        val v = Graft.textIndexMaintenance(spark, dir, target)
        v match {
          case None => converged = true
          case Some(c @ Graft.CompactFirst(_)) =>
            assert(!last.contains(c),
              s"seed $seed: identical compact verdict twice in a row " +
                s"— acting changed nothing: $c")
            TextIndex.compact(spark, dir)
          case Some(r @ Graft.Resize(h)) =>
            assert(!last.contains(r),
              s"seed $seed: identical resize verdict twice in a row " +
                s"— acting changed nothing: $r")
            // act exactly as the advice says: rebuild carrying the
            // floor (in place — reader continuity is not under test)
            TextIndex.build(spark, docsOf(state), dir,
              termBuckets = h.recommended.termBuckets,
              termBucketsFloor = h.recommended.termBucketsFloor)
          case Some(d: Graft.CompactDeferred) =>
            fail(s"seed $seed: deferred verdict at floor 0: $d")
        }
        last = v
        cycles += 1
      }
      assert(converged,
        s"seed $seed: maintenance loop did not converge in 8 cycles " +
          s"(last verdict $last)")
      // stable: silence is a fixed point, not a lucky read
      assert(Graft.textIndexMaintenance(spark, dir, target).isEmpty,
        s"seed $seed: converged verdict must stay silent")
    }
  }

  test("the ANN maintenance loop — acting on every verdict with the " +
      "documented fixed-point stop rule — terminates under random " +
      "clustered corpora, coincident duplicates and churn") {
    import graft.ops.AnnIndex
    // the text loop converges unconditionally (hash splits are
    // statically decidable); the ANN same-k arm is a rebalance BET,
    // whose act-once-compare-stop rule is now ENCODED in the engine
    // (retrainAdvice's fingerprint silence — spec-pinned
    // deterministically in AnnIndexSpec). This drives the WHOLE
    // protocol exactly as the advised calls spell it — compact wins,
    // retrains acted on with trained codebooks over the live corpus,
    // same-k acts carrying their verdict's fingerprint into build —
    // and requires it terminates in STABLE SILENCE: with the stop
    // encoded, a cron pasting the calls needs no state of its own,
    // and no verdict may ever repeat after being acted on
    for (seed <- Seq(7, 19, 31, 43)) {
      val rnd = new scala.util.Random(seed)
      val dir = tmp()
      val dims = 4
      val nClusters = 3 + rnd.nextInt(3)
      val dirs = (0 until nClusters).map(_ =>
        Seq.fill(dims)(rnd.nextDouble() + 0.1))
      // some seeds plant COINCIDENT duplicate groups — the veto's
      // territory; jittered members are the rebalance territory
      def member(c: Int, dup: Boolean) =
        if (dup) dirs(c)
        else dirs(c).map(x => x + (rnd.nextDouble() - 0.5) * 0.05)
      var nextId = 1L
      var state = Map.empty[Long, Seq[Double]]
      for (c <- 0 until nClusters) {
        val dupGroup = rnd.nextBoolean()
        for (_ <- 0 until 5 + rnd.nextInt(15)) {
          state += nextId -> member(c, dupGroup && rnd.nextBoolean())
          nextId += 1
        }
      }
      def frame(m: Map[Long, Seq[Double]]) =
        m.toSeq.toDF("vec_id", "e")
      val kInit = 2 + rnd.nextInt(3)
      AnnIndex.build(spark, frame(state),
        AnnIndex.trainCodebook(spark, frame(state), kInit, 5), dir)
      for (_ <- 0 until rnd.nextInt(3)) {
        val moved = rnd.shuffle(state.keys.toSeq)
          .take(rnd.nextInt(1 + state.size / 2))
          .map(id => id -> member(rnd.nextInt(nClusters), dup = false))
          .toMap
        val dead = rnd.shuffle((state -- moved.keys).keys.toSeq)
          .take(rnd.nextInt(1 + (state.size - 10).max(0) / 4))
        AnnIndex.applyDelta(spark, dir, frame(moved),
          dead.toDF("vec_id"))
        state = state ++ moved -- dead
      }
      val target = Seq(5L, 10L, 25L)(rnd.nextInt(3))
      var prevResize: Option[(Int, AnnIndex.LoadStats)] = None
      var outcome = ""
      var cycles = 0
      while (outcome.isEmpty && cycles < 8) {
        Graft.annIndexMaintenance(spark, dir, target) match {
          case None => outcome = "silent"
          case Some(Graft.CompactFirst(_)) =>
            AnnIndex.compact(spark, dir)
          case Some(Graft.Resize(h)) =>
            // the engine's encoded stop makes a repeated acted-on
            // verdict impossible — a repeat here means the
            // fingerprint was not honored
            val key = (h.recommended, h.stats)
            assert(!prevResize.contains(key),
              s"seed $seed: verdict repeated after being acted on: $key")
            prevResize = Some(key)
            AnnIndex.build(spark, frame(state),
              AnnIndex.trainCodebook(spark, frame(state),
                h.recommended, 5), dir,
              recordSameKAct = h.recommended == h.stats.centroids)
          case Some(d: Graft.CompactDeferred) =>
            fail(s"seed $seed: deferred verdict at floor 0: $d")
        }
        cycles += 1
      }
      assert(outcome == "silent",
        s"seed $seed: ann maintenance protocol did not reach silence " +
          s"in 8 cycles (last resize $prevResize)")
      // the terminal state is STABLE: silence stays silent
      assert(Graft.annIndexMaintenance(spark, dir, target).isEmpty,
        s"seed $seed: converged verdict must stay silent")
    }
  }
}
