package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}

/** Streaming materialization of a CDC change feed into current-state
  * rows — the standard downstream of the sink this engine writes:
  * keep the LATEST version of each primary key, emit an upsert (or
  * tombstone) whenever it changes.
  *
  * Built on Spark 4's `transformWithState` (the arbitrary-state API
  * that supersedes flatMapGroupsWithState): per-key `ValueState`
  * backed by the RocksDB state store — disk-backed, incrementally
  * checkpointed — so a billion-key table materializes without
  * executor memory pressure. State holds one row per key EVER seen
  * (tombstones included, so a stale replay of a deleted key cannot
  * resurrect it); pass a TTL to bound churn-heavy workloads instead,
  * trading that guarantee for state ∝ recently-active keys.
  *
  * Ordering: offsets guard the merge (a late replay with a smaller
  * offset cannot overwrite a newer row), so the operator is correct
  * under the pipeline's at-least-once replay window.
  */
object Materialize {

  /** One change event: primary key, op, monotone source offset
    * (binlog pos / lsn / scn / ts), intra-offset tiebreaker (mongo's
    * `_txn_op_index` — several ops of one transaction share a
    * millisecond offset), payload JSON.
    */
  case class ChangeRow(pk: Long, op: String, offset: Long, txn: Long,
      payload: String)

  /** Current state of one key. `deleted` marks a tombstone (the key's
    * latest event was a delete). `txn` (last field: appended to the
    * state schema) persists the intra-offset tiebreaker — without it a
    * cross-batch replay of a same-offset LOWER-txn event would pass an
    * offset-only guard and resurrect a tombstoned row.
    */
  case class CurrentRow(pk: Long, offset: Long, payload: String,
      deleted: Boolean, txn: Long)

  private val DeleteOps = Set("DELETE", "d")

  final class KeepLatestProcessor(ttl: TTLConfig)
      extends StatefulProcessor[Long, ChangeRow, CurrentRow] {
    @transient private var latest: ValueState[CurrentRow] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      latest = getHandle.getValueState[CurrentRow]("latest",
        Encoders.product[CurrentRow], ttl)

    override def handleInputRows(key: Long, rows: Iterator[ChangeRow],
        timers: TimerValues): Iterator[CurrentRow] = {
      var cur = if (latest.exists()) Option(latest.get()) else None
      var changed = false
      // batch order is not event order: sort this key's slice by
      // (offset, txn) — tying on the op STRING would apply a delete
      // before its same-offset update and resurrect the row. The merge
      // guard compares the same (offset, txn) pair against STATE, so
      // the protection also holds across batches.
      for (r <- rows.toArray.sortBy(r => (r.offset, r.txn))) {
        if (cur.forall(c => c.offset < r.offset ||
            (c.offset == r.offset && c.txn <= r.txn))) {
          cur = Some(CurrentRow(r.pk, r.offset, r.payload,
            DeleteOps.contains(r.op), r.txn))
          changed = true
        }
      }
      if (changed) { cur.foreach(latest.update); cur.iterator }
      else Iterator.empty
    }
  }

  /** changes → per-key current rows, emitted on change (Update mode).
    * Requires the RocksDB state store provider
    * (`spark.sql.streaming.stateStore.providerClass`).
    */
  def keepLatest(changes: Dataset[ChangeRow],
      ttl: TTLConfig = TTLConfig.NONE): Dataset[CurrentRow] = {
    import changes.sparkSession.implicits._
    changes.groupByKey(_.pk)
      .transformWithState(new KeepLatestProcessor(ttl),
        if (ttl == TTLConfig.NONE) TimeMode.None()
        else TimeMode.ProcessingTime(),
        OutputMode.Update())
  }

  /** One SCD Type-2 version row. Upsert key downstream is
    * (pk, validFrom, fromTxn): a version is emitted OPEN
    * (validTo = None, current = true) when its change arrives and
    * re-emitted CLOSED (validTo = Some(nextOffset), current = false)
    * when the next change supersedes it — the incremental twin of the
    * batch q73 `lead()` window. `deleted` marks the version created
    * by a DELETE (the key is absent from validFrom on).
    */
  case class Scd2Row(pk: Long, payload: String, validFrom: Long,
      fromTxn: Long, validTo: Option[Long], deleted: Boolean,
      current: Boolean)

  /** Streaming SCD Type-2: every change opens a new version and
    * closes the previous one. State = the open version per key (same
    * CurrentRow as keepLatest — offset + txn guard the merge), so
    * state is O(keys), never O(versions): history lives in the sink,
    * only the open edge lives in the store.
    *
    * Replay semantics: the guard here is STRICT (offset, txn) — an
    * exact duplicate of the event already in state must be a no-op
    * (re-applying it would close a version with its own offset); a
    * genuinely newer event always supersedes. Out-of-order arrivals
    * older than the open version are dropped, not spliced — under
    * the pipeline's per-key ordered delivery (J3) that only happens
    * on at-least-once replay, where dropping is the correct dedup.
    */
  final class Scd2Processor(ttl: TTLConfig)
      extends StatefulProcessor[Long, ChangeRow, Scd2Row] {
    @transient private var open: ValueState[CurrentRow] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      open = getHandle.getValueState[CurrentRow]("open",
        Encoders.product[CurrentRow], ttl)

    override def handleInputRows(key: Long, rows: Iterator[ChangeRow],
        timers: TimerValues): Iterator[Scd2Row] = {
      var cur = if (open.exists()) Option(open.get()) else None
      val out = scala.collection.mutable.ArrayBuffer.empty[Scd2Row]
      for (r <- rows.toArray.sortBy(r => (r.offset, r.txn))) {
        if (cur.forall(c => c.offset < r.offset ||
            (c.offset == r.offset && c.txn < r.txn))) {
          // close the version this change supersedes
          cur.foreach { c =>
            out += Scd2Row(c.pk, c.payload, c.offset, c.txn,
              Some(r.offset), c.deleted, current = false)
          }
          cur = Some(CurrentRow(r.pk, r.offset, r.payload,
            DeleteOps.contains(r.op), r.txn))
          out += Scd2Row(r.pk, r.payload, r.offset, r.txn, None,
            DeleteOps.contains(r.op), current = true)
        }
      }
      if (out.nonEmpty) cur.foreach(open.update)
      out.iterator
    }
  }

  /** changes → version-history rows (Update mode; sink upserts by
    * (pk, validFrom, fromTxn)). Same RocksDB requirement as
    * keepLatest.
    */
  def scd2(changes: Dataset[ChangeRow],
      ttl: TTLConfig = TTLConfig.NONE): Dataset[Scd2Row] = {
    import changes.sparkSession.implicits._
    changes.groupByKey(_.pk)
      .transformWithState(new Scd2Processor(ttl),
        if (ttl == TTLConfig.NONE) TimeMode.None()
        else TimeMode.ProcessingTime(),
        OutputMode.Update())
  }

  /** One measured change event for incremental AGGREGATE-view
    * maintenance: key, the group it aggregates under, op, the same
    * (offset, txn) replay guard as [[ChangeRow]], and the after-image
    * measure. DELETEs need no value — the operator retracts from its
    * own state, not from the (before-image-less) event.
    */
  case class MeasureChange(pk: Long, group: String, op: String,
      offset: Long, txn: Long, value: Double)

  /** A retraction-style aggregate delta: fold `dCount`/`dSum` into
    * the running (count, sum) of `group`. An update that MOVES a key
    * across groups emits a retraction to the old group and an
    * addition to the new one.
    */
  case class AggDelta(group: String, dCount: Long, dSum: Double)

  /** [[AggDeltaProcessor]]'s per-key state: the key's live (group,
    * value) contribution plus the (offset, txn) replay guard. Public
    * (not `private`): Spark's generated encoder projections access
    * the class reflectively from generated code, and a private class
    * forces a per-row interpreted fallback.
    */
  case class MeasureState(group: String, value: Double,
      deleted: Boolean, offset: Long, txn: Long)

  /** The incremental-view-maintenance kernel: per-key state holds the
    * key's live (group, value); each accepted change emits the NET
    * aggregate effect — retract the old contribution, add the new —
    * so a downstream fold maintains per-group (count, sum) without
    * EVER rescanning the table. This is what replaces "re-aggregate
    * 100 TB nightly" with "fold the day's deltas": cost ∝ changes,
    * state ∝ keys (RocksDB-backed, like [[keepLatest]]).
    *
    * Replay guard is the strict (offset, txn) rule shared with
    * [[Scd2Processor]] — an at-least-once redelivery is a no-op, so
    * the emitted delta stream is effectively-once even though the
    * feed is not. Deletes retract from STATE (the engine's UPDATE
    * envelope carries no before image; state is the before image).
    */
  final class AggDeltaProcessor(ttl: TTLConfig)
      extends StatefulProcessor[Long, MeasureChange, AggDelta] {
    @transient private var cur: ValueState[MeasureState] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      cur = getHandle.getValueState[MeasureState]("cur",
        Encoders.product[MeasureState], ttl)

    override def handleInputRows(key: Long, rows: Iterator[MeasureChange],
        timers: TimerValues): Iterator[AggDelta] = {
      var c = if (cur.exists()) Option(cur.get()) else None
      val out = scala.collection.mutable.ArrayBuffer.empty[AggDelta]
      var changed = false
      for (r <- rows.toArray.sortBy(r => (r.offset, r.txn))) {
        if (c.forall(s => s.offset < r.offset ||
            (s.offset == r.offset && s.txn < r.txn))) {
          c.filterNot(_.deleted).foreach { s =>
            out += AggDelta(s.group, -1L, -s.value) // retract old
          }
          val del = DeleteOps.contains(r.op)
          if (!del) out += AggDelta(r.group, 1L, r.value) // add new
          // deleted keys stay in state as tombstones (the keepLatest
          // rationale: a stale replay must not resurrect them — here
          // it would double-retract)
          c = Some(MeasureState(r.group, r.value, del, r.offset, r.txn))
          changed = true
        }
      }
      if (changed) c.foreach(cur.update)
      out.iterator
    }
  }

  /** changes → net aggregate deltas (Update mode; RocksDB store).
    * Fold them with [[applyAggDeltas]] in a foreachBatch sink.
    */
  def aggDeltas(changes: Dataset[MeasureChange],
      ttl: TTLConfig = TTLConfig.NONE): Dataset[AggDelta] = {
    import changes.sparkSession.implicits._
    changes.groupByKey(_.pk)
      .transformWithState(new AggDeltaProcessor(ttl),
        if (ttl == TTLConfig.NONE) TimeMode.None()
        else TimeMode.ProcessingTime(),
        OutputMode.Update())
  }

  /** Fold a batch of deltas into the current per-group aggregate
    * table `(group, n, sum)` — one union + one aggregate, cost ∝
    * |current groups| + |delta|, with groups whose count drops to
    * zero removed (a group is its members; an empty one has no row,
    * matching what a from-scratch aggregate would produce).
    */
  def applyAggDeltas(current: org.apache.spark.sql.DataFrame,
      deltas: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    current.select(col("group"), col("n"), col("sum"))
      .unionByName(deltas.select(col("group"),
        col("dCount").cast("long").as("n"), col("dSum").as("sum")))
      .groupBy("group")
      .agg(sum("n").as("n"), sum("sum").as("sum"))
      .filter(col("n") > 0)
  }
}
