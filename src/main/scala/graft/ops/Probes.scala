package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.broadcast

/** Guarded broadcast for probe-side frames (benchmark gram sets,
  * held-out splits, stored band indexes): the q74/q102/q104 plans are
  * built on "the probe side is tiny by construction", but a LIBRARY
  * caller can hand any frame to the facade — an unconditional
  * `broadcast()` hint on a big one is a driver OOM, not a slow plan.
  * The guard counts the probe side up to a row cap: at or under the
  * cap it applies the broadcast hint (the intended plan); past it the
  * frame is returned unhinted so the planner falls back to a shuffled
  * hash join keyed on the same column — a working plan at any size.
  *
  * Cost: one bounded count job (`limit(cap+1)` — never a full scan of
  * an oversized probe). Callers reusing the probe side should persist
  * it first so the count and the join share one materialization.
  */
object Probes {

  /** Default row cap: ~1M probe rows ≈ tens of MB for gram/bucket
    * rows — comfortably inside executor broadcast budgets while far
    * above every by-construction-small probe.
    */
  val DefaultMaxRows: Long = 1000000L

  /** `maxRows <= 0` disables the broadcast outright (Spark's
    * `autoBroadcastJoinThreshold = -1` convention) — no count job,
    * the frame joins unhinted.
    */
  def broadcastIfSmall(df: DataFrame,
      maxRows: Long = DefaultMaxRows): DataFrame =
    if (maxRows <= 0) df
    else {
      val probe = math.min(maxRows + 1, Int.MaxValue.toLong).toInt
      if (df.limit(probe).count() <= maxRows) broadcast(df) else df
    }
}
