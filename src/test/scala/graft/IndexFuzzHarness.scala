package graft

/** ONE random maintenance-schedule driver for the three maintained
  * indexes' fuzz suites (TextIndexFuzzSpec, AnnIndexFuzzSpec,
  * NeardupIndexFuzzSpec): the seed loop, key→value corpus state,
  * upsert/delete/torn-retry/compact schedule and the
  * check-after-every-step discipline live here once, so a fix to the
  * schedule logic (delete floor, torn-retry shape) can never drift
  * between suites — the [[SidecarTestOps]] rule applied to the fuzz
  * family.
  */
object IndexFuzzHarness {

  /** Run one schedule over `initial`. The caller has already built
    * its index from `initial`; `upsert`/`delete` apply ONE delta to
    * the index (the torn-retry step calls `upsert` twice with the
    * same map), `compact` folds tombstones, and `check(state, step)`
    * asserts the index against the caller's oracle — invoked after
    * build and after every step. `deleteFloor` is the minimum live
    * corpus the oracle needs: a delete step never takes the state
    * below it (floor counted AFTER the removal, so the stated slack
    * really holds).
    */
  def run[V](rnd: scala.util.Random, initial: Map[Long, V],
      freshValue: () => V,
      upsert: Map[Long, V] => Unit,
      delete: Seq[Long] => Unit,
      compact: () => Unit,
      deleteFloor: Int,
      check: (Map[Long, V], String) => Unit): Unit = {
    var state = initial
    var nextId = initial.keys.foldLeft(0L)(math.max) + 1L
    check(state, "build")
    for (step <- 0 until 5 + rnd.nextInt(4)) {
      rnd.nextInt(4) match {
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
      }
      check(state, s"step $step")
    }
  }
}
