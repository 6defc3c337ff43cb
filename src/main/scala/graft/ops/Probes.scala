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
  *
  * The guard evaluates the probe frame TWICE (the bounded count, then
  * the join): the frame must be deterministic across evaluations, or
  * persisted by the caller, for the guard decision to be consistent
  * with the rows actually joined. Same contract as `Graft.bm25`'s
  * corpus argument. In per-micro-batch use (EventTimeOps.nearDupGate)
  * the count job recurs each batch — persist the index frame there.
  */
object Probes {

  /** Default row cap: ~1M probe rows ≈ tens of MB for gram/bucket
    * rows — comfortably inside executor broadcast budgets while far
    * above every by-construction-small probe.
    */
  val DefaultMaxRows: Long = 1000000L

  /** Typed empty frame — the ONE spelling behind every
    * "this state is legitimately empty, serve it typed" fallback
    * ([[IndexCompaction.readOrEmpty]]'s empty-layout reads,
    * `CurrentTable.emptyTable`'s zero-bucket reads), so the two
    * cannot drift.
    */
  def emptyFrame(spark: org.apache.spark.sql.SparkSession,
      schema: org.apache.spark.sql.types.StructType): DataFrame =
    spark.createDataFrame(
      java.util.Collections.emptyList[org.apache.spark.sql.Row](),
      schema)

  /** `maxRows <= 0` disables the broadcast outright (Spark's
    * `autoBroadcastJoinThreshold = -1` convention) — no count job,
    * the frame joins unhinted.
    */
  def broadcastIfSmall(df: DataFrame,
      maxRows: Long = DefaultMaxRows): DataFrame =
    if (maxRows <= 0) df
    // `limit(n)` takes an Int, so a cap at or past Int.MaxValue cannot
    // be enforced by a bounded probe anyway — treat it as the explicit
    // "always broadcast" escape hatch rather than reaching the same
    // outcome through maxRows+1 overflow (limit(0).count()==0)
    else if (maxRows >= Int.MaxValue.toLong) broadcast(df)
    else {
      val probe = (maxRows + 1).toInt
      if (df.limit(probe).count() <= maxRows) broadcast(df) else df
    }
}
