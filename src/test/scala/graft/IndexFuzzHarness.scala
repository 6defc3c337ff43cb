package graft

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** ONE random maintenance-schedule driver for the three maintained
  * indexes' fuzz suites (TextIndexFuzzSpec, AnnIndexFuzzSpec,
  * NeardupIndexFuzzSpec): the seed loop, key→value corpus state,
  * upsert/delete/torn-retry/compact/torn-compact/rebuild/
  * empty-excursion schedule and the
  * check-after-every-step discipline live here once, so a fix to the
  * schedule logic (delete floor, torn-retry shape, mid-swap tear) can
  * never drift between suites — the [[SidecarTestOps]] rule applied
  * to the fuzz family.
  */
object IndexFuzzHarness {

  /** Run one schedule over `initial`. The caller has already built
    * its index from `initial`; `upsert`/`delete` apply ONE delta to
    * the index (the torn-retry step calls `upsert` twice with the
    * same map), `compact` folds tombstones, `tearMidSwap` fabricates
    * the mid-swap crash state a compact can die in (the torn-compact
    * step tears then re-runs `compact` as the documented recovery),
    * `rebuild` cuts the index fresh from the given corpus IN PLACE
    * (the delete-data-first replacement — generations reset under
    * live tombstone history, the maintenance op a schedule must not
    * be able to poison; the callback is free to draw FRESH build
    * parameters per invocation — a new fanout and floor, a new
    * codebook — because the parameter TRANSITION is exactly what the
    * delete-data-first staging sweep exists to protect, and a
    * schedule that always rebuilds at the original parameters never
    * crosses it; the caller tracks the latest values so `check` can
    * assert the stored meta follows the LATEST rebuild), and
    * `check(state, step)` asserts the index
    * against the caller's oracle — invoked after build and after
    * every step. `deleteFloor` is the minimum live corpus the oracle
    * needs: a delete step never takes the state below it (floor
    * counted AFTER the removal, so the stated slack really holds).
    */
  def run[V](rnd: scala.util.Random, initial: Map[Long, V],
      freshValue: () => V,
      upsert: Map[Long, V] => Unit,
      delete: Seq[Long] => Unit,
      compact: () => Unit,
      tearMidSwap: () => Unit,
      rebuild: Map[Long, V] => Unit,
      deleteFloor: Int,
      check: (Map[Long, V], String) => Unit): Unit = {
    var state = initial
    var nextId = initial.keys.foldLeft(0L)(math.max) + 1L
    check(state, "build")
    for (step <- 0 until 5 + rnd.nextInt(4)) {
      rnd.nextInt(7) match {
        case 0 => // upsert delta: some new docs, some rewrites
          val news = (0 until 1 + rnd.nextInt(3)).map { _ =>
            val id = nextId; nextId += 1; id -> freshValue()
          }
          val rewrites = rnd.shuffle(state.keys.toSeq)
            .take(rnd.nextInt(2)).map(id => id -> freshValue())
          val up = (news ++ rewrites).toMap
          upsert(up)
          state = state ++ up
        case 1 => // delete delta, never taking state below the floor
          val dead = rnd.shuffle(state.keys.toSeq)
            .take(1 + rnd.nextInt(2))
          if (state.size - dead.size >= deleteFloor) {
            delete(dead)
            state = state -- dead
          }
        case 2 => // torn-delta retry: the SAME delta applied twice
          val id = nextId; nextId += 1
          val up = Map(id -> freshValue())
          upsert(up)
          upsert(up)
          state = state ++ up
        case 3 =>
          compact()
        case 4 => // torn compaction: a compact dies mid-swap (between
          // its two renames), and the re-run must heal the parked
          // data before serving — the one maintenance crash shape the
          // designed spec states pin but a random schedule can reach
          // INTERLEAVED with deltas and prior compactions
          tearMidSwap()
          compact()
        case 5 => // in-place rebuild from the current corpus: the
          // delete-data-first replacement over whatever generations,
          // tombstones and staging leftovers the schedule piled up —
          // surviving state from the old index (a tombstone outranking
          // the rebuilt gen-0 rows, a stale trash dir) must be
          // impossible by construction
          rebuild(state)
        case 6 => // empty excursion: delete EVERYTHING, compact the
          // fully-deleted index (a partitioned rewrite of zero rows
          // leaves a data dir with no partitions — the empty-layout
          // state that bricked every later read before readOrEmpty),
          // then restore the same corpus through the ordinary delta
          // path. The oracle floor is respected because the state the
          // post-step check sees is the restored one; the transition
          // itself is what this step exists to cross — compact reads
          // the emptied layout, the restoring upsert's currentGen
          // reads it again, and any resurrected row or poisoned
          // generation fails the restored-state check.
          delete(state.keys.toSeq)
          compact()
          upsert(state)
      }
      check(state, s"step $step")
    }
  }

  /** Fabricate the crash state compact's two-rename window can leave
    * on ONE of its swapped sub-dirs (a single crash point tears a
    * single swap — for a multi-dir compact like TextIndex's the torn
    * dir is chosen at random): live data parked in
    * `<sub>._compact_trash`, the target gone, and a stale
    * `<sub>._compact_tmp` left behind that the retry must discard.
    * Shared by all three index fuzz suites so the torn shape can
    * never drift from the swap discipline it simulates.
    */
  def tearCompactSwap(spark: SparkSession, rnd: scala.util.Random,
      swapped: Seq[String]): Unit = {
    val sub = swapped(rnd.nextInt(swapped.size))
    val target = new Path(sub)
    val fs = target.getFileSystem(spark.sessionState.newHadoopConf())
    // the PRODUCTION staging names (ops.CompactStaging) — a literal
    // here could drift from the swap it simulates and tear nothing
    val trash = new Path(graft.ops.CompactStaging.trash(sub))
    fs.delete(trash, true)
    require(fs.rename(target, trash), s"tear: rename of $target failed")
    fs.mkdirs(new Path(graft.ops.CompactStaging.tmp(sub)))
  }
}
