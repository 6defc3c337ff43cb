package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-travel reads over the append-only CDC sink: reconstruct a
  * table's row state AS OF any timestamp from its change log — the
  * lakehouse capability the sink's layout (every change row kept,
  * delete before-images included, `dt=` bucketed by event time) was
  * designed to support but nothing exposed as an operator until now.
  *
  * Semantics: keep each key's LATEST change at or before the cutoff
  * (latest by true source offset — `_ts` alone interleaves
  * same-millisecond transaction rows; snapshot READ rows carry null
  * offsets and sort before any real position, exactly their "state
  * before every change" meaning), then drop keys whose latest change
  * is a DELETE. This is the batch twin of
  * [[graft.streaming.Materialize.keepLatest]] with a cutoff — asOf
  * at `Long.MaxValue` IS the current state.
  *
  * Scale shape: the `dt=` filter prunes partitions BEFORE the scan
  * (dt derives from `_ts`, so no bucket past the cutoff's date can
  * hold a qualifying row — the same pruning a day-partitioned 100 TB
  * lake lives by); the only shuffle is one hash partition by key for
  * the per-key latest (and with [[ZoneMaps]] maintained on `_ts` via
  * `sink.zonemap.columns`, the file census inside surviving buckets
  * prunes further).
  */
object TimeTravel {

  /** Default per-key recency order for a sink table of `sourceType` —
    * the true source offset from [[graft.ops.EnvelopeDecoder
    * .keptMetadata]]'s kept columns, `_ts` first as the coarse clock:
    * mysql refines by (binlog file, pos), mongodb by the intra-txn
    * index; pg/oracle keep only `_ts` (their `_lsn`/`_scn` live in
    * the offset store, not the rows).
    */
  def defaultOrder(sourceType: String): Seq[Column] =
    col("_ts") +: (sourceType match {
      case "mysql" => Seq(col("_binlog_file_internal"),
        col("_binlog_pos_internal"))
      case "mongodb" => Seq(col("_txn_op_index").cast("long"))
      case _ => Seq.empty
    })

  /** The tombstone predicate shared by every keep-latest consumer:
    * a change row whose `_op` marks a delete (mysql/pg/oracle spell
    * it `DELETE`, Debezium-compact envelopes `d`).
    */
  def isTombstone: Column = col("_op").isin("DELETE", "d")

  /** Each key's LATEST change row at or before `tsMs` — tombstones
    * INCLUDED (one row per key that ever changed; a deleted key's row
    * is its DELETE). This is the merge kernel for maintained state
    * ([[graft.streaming.CurrentTable]] folds with tombstones retained
    * so a re-folded OLDER change can never outrank a stored delete);
    * [[asOf]] is this plus the tombstone drop.
    */
  def latest(changeLog: DataFrame, pk: Seq[String], tsMs: Long,
      order: Seq[Column]): DataFrame = {
    require(pk.nonEmpty, "latest: no key columns")
    val w = Window.partitionBy(pk.map(col): _*)
      .orderBy(order.map(_.desc_nulls_last): _*)
    changeLog
      .filter(col("_ts") <= tsMs)
      .withColumn("_tt_rn", row_number().over(w))
      .filter(col("_tt_rn") === 1)
      .drop("_tt_rn")
  }

  /** The state of `changeLog` as of `tsMs` (inclusive): one row per
    * live key, payload exactly as the latest qualifying change wrote
    * it (metadata columns retained — callers drop what they don't
    * want). `order` columns break same-`_ts` ties ascending; nulls
    * sort FIRST (snapshot rows precede any real offset).
    */
  def asOf(changeLog: DataFrame, pk: Seq[String], tsMs: Long,
      order: Seq[Column]): DataFrame =
    latest(changeLog, pk, tsMs, order).filter(!isTombstone)

  /** [[asOf]] straight off a sink table directory, with the `dt=`
    * cutoff filter applied FIRST so partition pruning keeps buckets
    * past the cutoff date out of the scan entirely.
    */
  def asOfDir(spark: SparkSession, tableDir: String, pk: Seq[String],
      tsMs: Long, sourceType: String = "mysql"): DataFrame = {
    val all = spark.read.parquet(tableDir)
    // the cutoff date is computed by the SAME expression that bucketed
    // the writes (EnvelopeDecoder.dtColumn — session-timezone
    // date_format), so the prune can never disagree with the layout.
    // Long.MaxValue (currentState) skips the filter: millis→micros
    // would overflow, and "no cutoff" needs no prune anyway.
    val pruned =
      if (tsMs == Long.MaxValue) all
      else all.filter(col("dt").cast("string") <=
        date_format(timestamp_millis(lit(tsMs)), "yyyy-MM-dd"))
    asOf(pruned, pk, tsMs, defaultOrder(sourceType))
  }

  /** Current state = as of the end of time. */
  def currentState(spark: SparkSession, tableDir: String,
      pk: Seq[String], sourceType: String = "mysql"): DataFrame =
    asOfDir(spark, tableDir, pk, Long.MaxValue, sourceType)
}
