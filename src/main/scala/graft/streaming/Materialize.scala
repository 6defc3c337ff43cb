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
  * backed by the RocksDB state store, so state size scales with
  * LIVE keys — disk-backed, incrementally checkpointed — not with
  * history, and a billion-key table materializes without executor
  * memory pressure.
  *
  * Ordering: offsets guard the merge (a late replay with a smaller
  * offset cannot overwrite a newer row), so the operator is correct
  * under the pipeline's at-least-once replay window.
  */
object Materialize {

  /** One change event: primary key, op, monotone source offset
    * (binlog pos / lsn / scn / ts), payload JSON.
    */
  case class ChangeRow(pk: Long, op: String, offset: Long, payload: String)

  /** Current state of one key. `deleted` marks a tombstone (the key's
    * latest event was a delete).
    */
  case class CurrentRow(pk: Long, offset: Long, payload: String,
      deleted: Boolean)

  private val DeleteOps = Set("DELETE", "d")

  final class KeepLatestProcessor
      extends StatefulProcessor[Long, ChangeRow, CurrentRow] {
    @transient private var latest: ValueState[CurrentRow] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      latest = getHandle.getValueState[CurrentRow]("latest",
        Encoders.product[CurrentRow], TTLConfig.NONE)

    override def handleInputRows(key: Long, rows: Iterator[ChangeRow],
        timers: TimerValues): Iterator[CurrentRow] = {
      var cur = if (latest.exists()) Option(latest.get()) else None
      var changed = false
      // batch order is not event order: sort this key's slice by offset
      for (r <- rows.toArray.sortBy(r => (r.offset, r.op))) {
        if (cur.forall(_.offset <= r.offset)) {
          cur = Some(CurrentRow(r.pk, r.offset, r.payload,
            DeleteOps.contains(r.op)))
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
  def keepLatest(changes: Dataset[ChangeRow]): Dataset[CurrentRow] = {
    import changes.sparkSession.implicits._
    changes.groupByKey(_.pk)
      .transformWithState(new KeepLatestProcessor,
        TimeMode.None(), OutputMode.Update())
  }
}
