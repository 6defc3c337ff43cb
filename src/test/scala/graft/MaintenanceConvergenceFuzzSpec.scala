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
            val rec = h.recommended
              .asInstanceOf[graft.ops.TextIndex.Rebuild]
            // act exactly as the advice says: rebuild carrying the
            // floor (in place — reader continuity is not under test)
            TextIndex.build(spark, docsOf(state), dir,
              termBuckets = rec.termBuckets,
              termBucketsFloor = rec.termBucketsFloor)
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
}
