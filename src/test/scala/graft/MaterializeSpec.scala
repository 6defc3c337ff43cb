package graft

import java.nio.file.Files

import scala.collection.JavaConverters._

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.Materialize

/** transformWithState keep-latest materializer: upserts, tombstones,
  * offset-guarded merges across multiple micro-batches, and stale
  * replays that must not win.
  */
class MaterializeSpec extends AnyFunSuite {
  lazy val spark: SparkSession = TestSpark.session

  private val RocksDb =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"

  private def ev(pk: Long, op: String, off: Long, p: String,
      txn: Long = 0): String =
    s"""{"pk":$pk,"op":"$op","offset":$off,"txn":$txn,"payload":"$p"}"""

  test("materializes latest row per key across batches; stale offsets lose") {
    val in = Files.createTempDirectory("mat-in-")
    // batch files replay one per trigger (maxFilesPerTrigger=1)
    Files.write(in.resolve("00.jsonl"), Seq(
      ev(1, "c", 10, "v1"), ev(2, "c", 11, "v1")).asJava)
    Files.write(in.resolve("01.jsonl"), Seq(
      ev(1, "u", 20, "v2"), // newer: wins
      ev(2, "u", 5, "stale"), // OLDER than state: must not win
      ev(3, "c", 30, "v1")).asJava)
    Files.write(in.resolve("02.jsonl"), Seq(
      ev(3, "d", 40, "gone"), // tombstone
      // same-offset tx: update (txn 1) then delete (txn 2) — the
      // delete must win regardless of op-string ordering
      ev(4, "c", 50, "v1"),
      ev(4, "u", 60, "v2", txn = 1),
      ev(4, "d", 60, "bye", txn = 2)).asJava)
    Files.write(in.resolve("03.jsonl"), Seq(
      // CROSS-BATCH stale replay of the same-offset lower-txn update:
      // state already holds (60, txn 2) delete — an offset-only guard
      // would let this through and resurrect the row
      ev(4, "u", 60, "zombie", txn = 1)).asJava)

    val prev = spark.conf.getOption(
      "spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass", RocksDb)
    try {
      import org.apache.spark.sql.functions.{col, from_json}
      import spark.implicits._
      // graft-cdc source: name-ordered segments (FileStreamSource
      // orders by mtime, which ties for files written back-to-back)
      val changes = spark.readStream.format("graft-cdc")
        .option("path", in.toString).option("maxFilesPerTrigger", 1)
        .load()
        .select(from_json(col("value"), org.apache.spark.sql.types.StructType
          .fromDDL("pk LONG, op STRING, offset LONG, txn LONG, payload STRING"))
          .as("c"))
        .select("c.*")
        .as[Materialize.ChangeRow]
      Materialize.keepLatest(changes)
        .writeStream.format("memory").queryName("mat_out")
        .outputMode("update")
        .option("checkpointLocation",
          Files.createTempDirectory("mat-ck-").toString)
        .trigger(Trigger.AvailableNow()).start().awaitTermination()
      // memory sink in update mode appends each emission; the LAST
      // emission per key is the current state
      val rows = spark.table("mat_out").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getString(2),
          r.getBoolean(3)))
      val current = rows.groupBy(_._1).map { case (k, vs) =>
        k -> vs.maxBy(_._2)
      }
      assert(current(1L) == (1L, 20L, "v2", false))
      assert(current(2L) == (2L, 11L, "v1", false)) // stale update lost
      assert(current(3L) == (3L, 40L, "gone", true)) // tombstoned
      assert(current(4L) == (4L, 60L, "bye", true)) // same-offset tie
      // the stale offset-5 update must never have been emitted
      assert(!rows.exists(r => r._1 == 2L && r._2 == 5L))
      // the cross-batch same-offset lower-txn replay must not have
      // resurrected the tombstone
      assert(!rows.exists(_._3 == "zombie"))
    } finally {
      prev match {
        case Some(p) =>
          spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None =>
          spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("scd2 builds version history incrementally across batches") {
    val in = Files.createTempDirectory("scd2-in-")
    Files.write(in.resolve("00.jsonl"), Seq(
      ev(1, "c", 10, "v1"), ev(2, "c", 11, "v1")).asJava)
    Files.write(in.resolve("01.jsonl"), Seq(
      ev(1, "u", 20, "v2"),
      ev(2, "u", 5, "stale"), // older than open version: dropped
      ev(1, "u", 20, "v2")).asJava) // exact duplicate: no-op
    Files.write(in.resolve("02.jsonl"), Seq(
      ev(1, "d", 30, "gone"), // delete opens a tombstone version
      // same-offset transaction: two versions at offset 40
      ev(2, "u", 40, "v2", txn = 1),
      ev(2, "u", 40, "v3", txn = 2)).asJava)

    val prev = spark.conf.getOption(
      "spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass", RocksDb)
    try {
      import org.apache.spark.sql.functions.{col, from_json}
      import spark.implicits._
      val changes = spark.readStream.format("graft-cdc")
        .option("path", in.toString).option("maxFilesPerTrigger", 1)
        .load()
        .select(from_json(col("value"), org.apache.spark.sql.types.StructType
          .fromDDL("pk LONG, op STRING, offset LONG, txn LONG, payload STRING"))
          .as("c"))
        .select("c.*")
        .as[Materialize.ChangeRow]
      Materialize.scd2(changes)
        .writeStream.format("memory").queryName("scd2_out")
        .outputMode("update")
        .option("checkpointLocation",
          Files.createTempDirectory("scd2-ck-").toString)
        .trigger(Trigger.AvailableNow()).start().awaitTermination()
      // update-mode memory sink appends every emission; the sink
      // contract is upsert by (pk, validFrom, fromTxn) — for equal
      // keys the CLOSED re-emission supersedes the OPEN one
      val all = spark.table("scd2_out").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
          r.getLong(3), if (r.isNullAt(4)) None else Some(r.getLong(4)),
          r.getBoolean(5), r.getBoolean(6)))
      val hist = all.groupBy(v => (v._1, v._3, v._4)).map { case (_, vs) =>
        vs.find(!_._7).getOrElse(vs.head) // closed wins over open
      }.toSeq.sortBy(v => (v._1, v._3, v._4))
      // key 1: v1 [10,20) → v2 [20,30) → tombstone [30,∞)
      assert(hist.filter(_._1 == 1L) == Seq(
        (1L, "v1", 10L, 0L, Some(20L), false, false),
        (1L, "v2", 20L, 0L, Some(30L), false, false),
        (1L, "gone", 30L, 0L, None, true, true)))
      // key 2: stale offset-5 never spliced; same-offset txns chain
      assert(hist.filter(_._1 == 2L) == Seq(
        (2L, "v1", 11L, 0L, Some(40L), false, false),
        (2L, "v2", 40L, 1L, Some(40L), false, false),
        (2L, "v3", 40L, 2L, None, false, true)))
      assert(!all.exists(_._2 == "stale"))
      // exactly one OPEN version per live key
      assert(hist.count(_._7) == 2)
    } finally {
      prev match {
        case Some(p) =>
          spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None =>
          spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("streaming scd2 equals the batch lead() derivation (q73 shape)") {
    // 20 keys × 1-4 in-order versions with deterministic offsets —
    // the change log both derivations consume
    val log = for {
      pk <- 1L to 20L
      v <- 0L until (pk % 4 + 1)
    } yield (pk, if (v == pk % 4 && pk % 5 == 0) "d" else "u",
      100 * pk + 10 * v, s"p$pk-$v")
    val in = Files.createTempDirectory("scd2p-in-")
    // split into 3 arrival batches to exercise cross-batch closes
    log.grouped((log.size + 2) / 3).zipWithIndex.foreach { case (g, i) =>
      Files.write(in.resolve(f"$i%02d.jsonl"),
        g.map { case (pk, op, off, p) => ev(pk, op, off, p) }.asJava)
    }

    val prev = spark.conf.getOption(
      "spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass", RocksDb)
    try {
      import org.apache.spark.sql.functions.{col, from_json, lead}
      import org.apache.spark.sql.expressions.Window
      import spark.implicits._
      val changes = spark.readStream.format("graft-cdc")
        .option("path", in.toString).option("maxFilesPerTrigger", 1)
        .load()
        .select(from_json(col("value"), org.apache.spark.sql.types.StructType
          .fromDDL("pk LONG, op STRING, offset LONG, txn LONG, payload STRING"))
          .as("c"))
        .select("c.*")
        .as[Materialize.ChangeRow]
      Materialize.scd2(changes)
        .writeStream.format("memory").queryName("scd2_parity")
        .outputMode("update")
        .option("checkpointLocation",
          Files.createTempDirectory("scd2p-ck-").toString)
        .trigger(Trigger.AvailableNow()).start().awaitTermination()
      val streaming = spark.table("scd2_parity").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
          if (r.isNullAt(4)) None else Some(r.getLong(4)), r.getBoolean(5),
          r.getBoolean(6)))
        .groupBy(v => (v._1, v._3)).map { case (_, vs) =>
          vs.find(!_._6).getOrElse(vs.head) // closed supersedes open
        }.toSet

      // batch: ONE lead() window over the same log — the q73 shape
      val w = Window.partitionBy("pk").orderBy("offset")
      val batch = log.toDF("pk", "op", "offset", "payload")
        .withColumn("valid_to", lead(col("offset"), 1).over(w))
        .collect().map { r =>
          val vt = if (r.isNullAt(4)) None else Some(r.getLong(4))
          (r.getLong(0), r.getString(3), r.getLong(2), vt,
            r.getString(1) == "d", vt.isEmpty)
        }.toSet
      assert(streaming == batch,
        s"streaming-only: ${streaming -- batch}\nbatch-only: ${batch -- streaming}")
    } finally {
      prev match {
        case Some(p) =>
          spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None =>
          spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  private def mev(pk: Long, g: String, op: String, off: Long, v: Double,
      txn: Long = 0): String =
    s"""{"pk":$pk,"group":"$g","op":"$op","offset":$off,"txn":$txn,"value":$v}"""

  test("incremental aggregate view: folded deltas equal a recompute " +
      "under group moves, deletes, and replays") {
    val in = Files.createTempDirectory("agg-in-")
    Files.write(in.resolve("00.jsonl"), Seq(
      mev(1, "a", "c", 10, 10.0),
      mev(2, "a", "c", 11, 5.0),
      mev(3, "b", "c", 12, 7.0)).asJava)
    Files.write(in.resolve("01.jsonl"), Seq(
      mev(2, "b", "u", 20, 6.0), // MOVES a→b: retract a, add b
      mev(2, "b", "u", 20, 6.0), // in-batch exact duplicate: no-op
      mev(3, "b", "d", 21, 0.0), // delete retracts from state
      mev(1, "a", "u", 22, 12.0)).asJava) // in-place update: -10 +12
    Files.write(in.resolve("02.jsonl"), Seq(
      mev(2, "b", "u", 20, 6.0), // CROSS-BATCH replay: no-op
      mev(4, "c", "d", 30, 0.0), // delete of an unseen key: no-op
      mev(5, "c", "c", 31, 3.0), // insert → delete → re-insert,
      mev(5, "c", "d", 32, 0.0), // one batch: nets to the re-insert
      mev(5, "c", "c", 33, 4.0)).asJava)

    val prev = spark.conf.getOption(
      "spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass", RocksDb)
    try {
      import org.apache.spark.sql.functions.{col, from_json}
      import spark.implicits._
      val changes = spark.readStream.format("graft-cdc")
        .option("path", in.toString).option("maxFilesPerTrigger", 1)
        .load()
        .select(from_json(col("value"), org.apache.spark.sql.Encoders
          .product[Materialize.MeasureChange].schema).as("c"))
        .select("c.*")
        .as[Materialize.MeasureChange]
      // the production shape: per batch, fold the deltas into the
      // maintained aggregate table — the table is never recomputed
      var view = Map.empty[String, (Long, Double)]
      Materialize.aggDeltas(changes)
        .writeStream
        .foreachBatch { (batch: org.apache.spark.sql.Dataset[
            Materialize.AggDelta], _: Long) =>
          val cur = view.toSeq.map { case (g, (n, s)) => (g, n, s) }
            .toDF("group", "n", "sum")
          view = Materialize.applyAggDeltas(cur, batch.toDF()).collect()
            .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2)))
            .toMap
        }
        .outputMode("update")
        .option("checkpointLocation",
          Files.createTempDirectory("agg-ck-").toString)
        .trigger(Trigger.AvailableNow()).start().awaitTermination()
      // recompute truth: live keys are 1(a,12), 2(b,6), 5(c,4)
      assert(view == Map(
        "a" -> (1L, 12.0), "b" -> (1L, 6.0), "c" -> (1L, 4.0)))
    } finally {
      prev match {
        case Some(p) =>
          spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None =>
          spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }
}
