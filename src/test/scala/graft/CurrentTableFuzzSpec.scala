package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.TimeTravel
import graft.streaming.{Compaction, CurrentTable}

/** Property-style fuzz of the current-table fold: random changelogs
  * (create/update/delete over a small key space, spread across files
  * and `dt=` partitions) driven through RANDOM maintenance schedules —
  * scoped and unscoped syncs, partition compactions with and without
  * the cursor-swap hook, cursor expiry sweeps, mid-schedule bucket
  * rescales, and crashes between the per-partition cursor sidecar
  * writes (a sidecar vanishing after the bucket swaps committed) —
  * must always converge to the TimeTravel reconstruction of the same
  * changelog. This is the
  * invariant everything else rests on: no interleaving of maintenance
  * can lose a change, duplicate a key, or resurrect a deleted one.
  */
class CurrentTableFuzzSpec extends AnyFunSuite {
  lazy val spark = TestSpark.session
  import spark.implicits._

  private val order = Seq(col("_ts"), col("_binlog_pos_internal"))

  private def appendFile(sink: String, dt: String,
      rows: Seq[(Long, String, String, Long, Long)]): Unit =
    rows.toDF("id", "name", "_op", "_ts", "_binlog_pos_internal")
      .withColumn("_binlog_file_internal", lit("f1"))
      .withColumn("dt", lit(dt))
      .coalesce(1)
      .write.mode("append").partitionBy("dt").parquet(sink)

  private def liveState(cur: String): Set[(Long, String)] =
    CurrentTable.read(spark, cur)
      .select("id", "name").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet

  private def oracle(sink: String): Set[(Long, String)] =
    TimeTravel.asOf(spark.read.parquet(sink), Seq("id"), Long.MaxValue,
        TimeTravel.defaultOrder("mysql"))
      .select("id", "name").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet

  /** The rollup must equal a direct aggregate over the live state and
    * the index probe must equal the exact filter — at ANY point in
    * the schedule (a rescale may have left them stale-keyed: the
    * rollup still merges correctly across buckets, the index detects
    * the modulus and full-scans).
    */
  private def assertDerived(cur: String, rnd: scala.util.Random,
      seed: Int, step: Int,
      ixHandle: graft.ops.BucketIndex.IndexReader = null): Unit = {
    val live = CurrentTable.read(spark, cur)
    val direct = live.agg(count(lit(1)).as("n"), sum("_ts").as("sum_ts"),
        min("name").as("lo"), max("name").as("hi"),
        graft.functions.KmvSketch.kmvDistinct(spark,
          graft.functions.KmvSketch.md5Hash60(col("name")), 4).as("dn"))
      .collect()(0)
    val rolled = graft.ops.RollupTable.read(spark, cur, "fz")
      .select("n", "sum_ts", "lo", "hi", "dn").collect()
    // exact Row equality INCLUDING the all-keys-deleted state: the
    // global count coalesces to 0 over empty partials, sum/min/max
    // are NULL in both, and countd merges to 0.0 in both
    assert(rolled.length == 1 && rolled(0) == direct,
      s"seed $seed step $step: rollup ${rolled.toSeq} != $direct")
    // probe one live value and one that never existed
    val names = live.select("name").collect().map(_.getString(0))
    val probes = (if (names.isEmpty) Nil
      else Seq(names(rnd.nextInt(names.length)))) :+ "never-written"
    for (p <- probes) {
      val viaIndex = graft.ops.BucketIndex.lookupBy(spark, cur, "name",
          Seq(p).toDF("name"))
        .select("id").collect().map(_.getLong(0)).toSet
      val viaScan = live.filter(col("name") === p)
        .select("id").collect().map(_.getLong(0)).toSet
      assert(viaIndex == viaScan,
        s"seed $seed step $step: index diverged on '$p'")
      // the PREPARED index handle, held through the whole schedule,
      // must see every fold/rescale/crash-heal through its two
      // signature reads and match the one-shot probe exactly
      if (ixHandle != null) {
        val viaHandle = ixHandle.lookup(Seq(p).toDF("name"))
          .select("id").collect().map(_.getLong(0)).toSet
        assert(viaHandle == viaScan,
          s"seed $seed step $step: index READER diverged on '$p'")
      }
    }
    // sidecar-disk invariants, at any point in any schedule:
    // (1) every manifest pointer resolves to a non-empty grp= dir —
    //     the (dir, grp)-granular GC may never delete a referenced
    //     pair (that is reader-visible data loss);
    // (2) disk holds at most current + immediately-previous
    //     generations of group dirs (≤ 2 × groups) — the unbounded
    //     dead-pair accumulation whole-dir GC allowed may not return,
    //     however many publishes a schedule chains between asserts
    val ixDir = new java.io.File(s"$cur/_index/name")
    val metaLines = scala.io.Source
      .fromFile(s"$cur/_index/name/_meta.txt").getLines().toVector
    val groupCount = metaLines.find(_.startsWith("groups="))
      .get.stripPrefix("groups=").toInt
    val pointers = metaLines.filter(_.matches("g\\d+=.*"))
      .map { l => val Array(g, d) = l.split("=", 2); (g.drop(1), d) }
    for ((g, d) <- pointers) {
      val gd = new java.io.File(ixDir, s"$d/grp=$g")
      assert(gd.isDirectory &&
        gd.listFiles().exists(_.getName.endsWith(".parquet")),
        s"seed $seed step $step: dangling index pointer g$g=$d")
    }
    val onDiskPairs = Option(ixDir.listFiles()).getOrElse(Array.empty)
      .filter(f => f.isDirectory && f.getName.startsWith("d_"))
      .flatMap(d => Option(d.listFiles()).getOrElse(Array.empty))
      .count(c => c.isDirectory && c.getName.startsWith("grp="))
    assert(onDiskPairs <= 2 * groupCount,
      s"seed $seed step $step: $onDiskPairs on-disk group dirs for " +
        s"$groupCount groups — dead pairs leaking")
    // the rollup sidecar shares the PointerDir layout (one data
    // pointer, GC keeps current + immediately-previous) and earns
    // the same two invariants at every step of every schedule
    val roDir = new java.io.File(s"$cur/_rollup/fz")
    val roLines = scala.jdk.CollectionConverters.ListHasAsScala(
      java.nio.file.Files.readAllLines(
        roDir.toPath.resolve("_meta.txt"))).asScala
    val roData = roLines.find(_.startsWith("data="))
      .get.stripPrefix("data=")
    if (roData.nonEmpty) {
      val dd = new java.io.File(roDir, roData)
      assert(dd.isDirectory &&
        dd.listFiles().exists(_.getName.endsWith(".parquet")),
        s"seed $seed step $step: dangling rollup pointer data=$roData")
    }
    val roGens = Option(roDir.listFiles()).getOrElse(Array.empty)
      .count(f => f.isDirectory && f.getName.startsWith("d_"))
    assert(roGens <= 2,
      s"seed $seed step $step: $roGens rollup data dirs on disk — " +
        "dead generations leaking")
  }

  test("random changelogs under random maintenance schedules always " +
      "converge to the TimeTravel oracle") {
    for (seed <- 1 to 5) {
      val rnd = new scala.util.Random(seed)
      val sink = Files.createTempDirectory(s"graft-ctf-$seed-")
        .resolve("sink").toString
      val cur = Files.createTempDirectory(s"graft-ctf-cur-$seed-").toString
      val keySpace = 1 + rnd.nextInt(20)
      val dts = Seq("2024-01-01", "2024-01-02", "2024-01-03")
      var pos = 0L
      var handle: CurrentTable.Reader = null
      var ixHandle: graft.ops.BucketIndex.IndexReader = null
      val steps = 6 + rnd.nextInt(6)
      for (step <- 0 until steps) {
        // one batch: 1-3 files of 1-8 events each, each file in one
        // random partition (the pipeline's steady-state write shape)
        val batchDts = scala.collection.mutable.Set[String]()
        for (_ <- 0 to rnd.nextInt(2)) {
          val dt = dts(rnd.nextInt(dts.length))
          batchDts += dt
          val rows = (0 to rnd.nextInt(7)).map { _ =>
            pos += 1
            val id = 1L + rnd.nextInt(keySpace)
            val op = rnd.nextInt(4) match {
              case 0 => "DELETE"
              case _ => "UPDATE"
            }
            (id, s"v$pos", op, 1000L + pos, pos)
          }
          appendFile(sink, dt, rows)
        }
        // maintenance roulette, mirroring the pipeline's order:
        // sync (scoped or full) → maybe compact (with or without the
        // cursor swap) → maybe sweep the cursor
        val scope =
          if (rnd.nextBoolean()) Some(batchDts.toSeq.map(d => s"dt=$d"))
          else None
        CurrentTable.sync(spark, sink, cur, Seq("id"),
          buckets = 1 + rnd.nextInt(8), orderOverride = Some(order),
          scope = if (step == 0) None else scope)
        // a maintained ROLLUP and a secondary bloom INDEX ride the
        // whole schedule from the first fold: every sync must keep
        // both equal to a direct recompute/filter over the live state
        // no matter what maintenance (rescales, fabricated crashes,
        // compaction re-folds, vanished sidecars) happened in between
        if (step == 0) {
          graft.ops.RollupTable.attach(spark, cur, "fz",
            graft.ops.RollupTable.Spec(Nil, Seq(
              graft.ops.RollupTable.Agg("count", "*", "n"),
              graft.ops.RollupTable.Agg("sum", "_ts", "sum_ts"),
              graft.ops.RollupTable.Agg("min", "name", "lo"),
              graft.ops.RollupTable.Agg("max", "name", "hi"),
              // tiny k so schedules cross the exact/estimator boundary
              graft.ops.RollupTable.Agg("countd", "name", "dn", k = 4))))
          // random group count: tiny tables auto-size to ONE group,
          // which would leave the grouped manifest's incremental
          // carry/rebuild/GC paths unexercised by every schedule
          graft.ops.BucketIndex.attach(spark, cur, "name",
            numGroups = 1 + rnd.nextInt(4))
          ixHandle = graft.ops.BucketIndex.reader(spark, cur, "name")
        } else if (rnd.nextInt(2) == 0) {
          assertDerived(cur, rnd, seed, step, ixHandle)
        }
        // ONE prepared Reader lives through the whole schedule: every
        // fold/prune/rescale/crash-heal it survives must be visible
        // through its root-signature revalidation — probed right
        // after the sync, when any fabricated crash state from the
        // previous step has been rolled forward
        if (handle == null)
          handle = CurrentTable.reader(spark, cur, Seq("id"))
        else if (rnd.nextInt(2) == 0) {
          val ids = (0 to rnd.nextInt(4))
            .map(_ => 1L + rnd.nextInt(keySpace * 2)).distinct
          val viaReader = handle.lookup(ids.toDF("id"))
            .select("id", "name").collect()
            .map(r => (r.getLong(0), r.getString(1))).toSet
          val viaLookup = CurrentTable.lookup(spark, cur, Seq("id"),
              ids.toDF("id"))
            .select("id", "name").collect()
            .map(r => (r.getLong(0), r.getString(1))).toSet
          assert(viaReader == viaLookup,
            s"seed $seed step $step: prepared reader diverged on $ids")
        }
        if (rnd.nextInt(3) == 0) {
          val dt = dts(rnd.nextInt(dts.length))
          val dtDir = s"$sink/dt=$dt"
          if (new java.io.File(dtDir).exists()) {
            Compaction.compactPartitions(spark, sink, Seq(dt),
              1 + rnd.nextInt(20), order)
            if (rnd.nextBoolean()) {
              // the pipeline's swap hook — everything under the
              // partition was synced just above
              val added = new java.io.File(dtDir).listFiles()
                .filter(_.getName.endsWith(".parquet")).map(_.toString)
              CurrentTable.onSinkRewrite(spark, sink, cur,
                Seq(dtDir), added.toSeq)
            } // else: blind re-fold next sync — tombstones defend
          }
        }
        if (rnd.nextInt(4) == 0)
          // horizon BELOW every live partition: must never drop a
          // live entry (the live-partition sweep is retention's job,
          // exercised separately with deleted partitions)
          CurrentTable.pruneCursorExpired(spark, cur, "2024-01-01")
        if (rnd.nextInt(5) == 0)
          // re-bucket mid-schedule: the modulus flip must be invisible
          // to everything that follows — later scoped syncs, lookups,
          // compaction re-folds all run against the new layout
          CurrentTable.rescale(spark, cur, Seq("id"), 1 + rnd.nextInt(8))
        if (rnd.nextInt(6) == 0) {
          // a rescale that CRASHED mid-swap: fabricate exactly what it
          // leaves — a complete staged layout at a new modulus (a full
          // twin sync of the same sink yields it, census included in
          // its root), the marker, and a random number of buckets
          // already swapped in. The next maintenance entry anywhere in
          // the schedule must roll it forward, and everything after
          // runs against the completed layout. (The staged state may
          // be AHEAD of the live table — scoped syncs can trail the
          // sink — which matches a rescale racing a catch-up: the
          // cursor re-folds anything unrecorded and keep-latest +
          // retained tombstones converge.)
          val newNb = 1 + rnd.nextInt(8)
          val twin = Files.createTempDirectory(
            s"graft-ctf-twin-$seed-").toString
          CurrentTable.sync(spark, sink, twin, Seq("id"),
            buckets = newNb, orderOverride = Some(order))
          val stageDir = new java.io.File(s"$cur/._ct_stage_rescale")
          org.apache.hadoop.fs.FileUtil.fullyDelete(stageDir)
          assert(stageDir.mkdirs())
          for (d <- new java.io.File(twin).listFiles()
              if d.getName.startsWith("kb="))
            assert(d.renameTo(new java.io.File(stageDir, d.getName)))
          for (i <- 0 until newNb) {
            val d = new java.io.File(stageDir, s"kb=$i")
            if (!d.exists()) assert(d.mkdirs())
          }
          val censusLine = scala.io.Source
            .fromFile(s"$twin/_synced.txt").getLines().toVector
            .filter(_.startsWith("#tomb"))
          graft.streaming.AtomicFiles.write(s"$cur/_rescale.txt",
            (newNb.toString +: censusLine).mkString("\n"),
            spark.sparkContext.hadoopConfiguration)
          // partial swap: 0..all staged buckets already went live
          val staged = stageDir.listFiles()
            .filter(_.getName.startsWith("kb=")).toSeq
          for (d <- rnd.shuffle(staged)
              .take(rnd.nextInt(staged.length + 1))) {
            org.apache.hadoop.fs.FileUtil.fullyDelete(
              new java.io.File(s"$cur/${d.getName}"))
            assert(d.renameTo(new java.io.File(s"$cur/${d.getName}")))
          }
        }
        if (rnd.nextInt(4) == 0) {
          // crash between sidecar writes: the buckets committed but a
          // random partition's cursor sidecar never landed — its
          // files re-fold on a later sync covering that partition,
          // and keep-latest + retained tombstones converge
          val sidecars = Option(new java.io.File(s"$cur/_cursor")
            .listFiles()).getOrElse(Array.empty)
            .filter(_.getName.endsWith(".txt"))
          if (sidecars.nonEmpty)
            assert(sidecars(rnd.nextInt(sidecars.length)).delete())
        }
      }
      // final full sync, then the invariant
      CurrentTable.sync(spark, sink, cur, Seq("id"),
        orderOverride = Some(order))
      assert(liveState(cur) == oracle(sink),
        s"seed $seed diverged from the oracle")
      // the derived artifacts converged with the table
      assertDerived(cur, rnd, seed, -1, ixHandle)
      ixHandle.close()
      // raw table: exactly one row per key ever seen, tombstones for
      // exactly the keys whose latest change is a DELETE
      val raw = spark.read.parquet(cur)
      val perKey = raw.groupBy("id").count()
        .filter(col("count") > 1).count()
      assert(perKey == 0, s"seed $seed: duplicate keys in buckets")
      val deadKeys = raw
        .filter(TimeTravel.isTombstone).select("id")
        .collect().map(_.getLong(0)).toSet
      val oracleDead = TimeTravel.latest(spark.read.parquet(sink),
          Seq("id"), Long.MaxValue, TimeTravel.defaultOrder("mysql"))
        .filter(TimeTravel.isTombstone).select("id")
        .collect().map(_.getLong(0)).toSet
      assert(deadKeys == oracleDead,
        s"seed $seed: tombstone set diverged")
      // bucket-pruned point lookups agree with the state for a random
      // probe (including absent and deleted keys): a hash/layout
      // disagreement between lookup's plan and sync's write would slip
      // past the full-state compare above — the probe reads through
      // the pruned path the state compare never exercises
      val probeIds = (0 to rnd.nextInt(5))
        .map(_ => 1L + rnd.nextInt(keySpace * 2)).distinct
      val looked = CurrentTable.lookup(spark, cur, Seq("id"),
          probeIds.toDF("id"))
        .select("id", "name").collect()
        .map(r => (r.getLong(0), r.getString(1))).toSet
      assert(looked == liveState(cur).filter(kv => probeIds.contains(kv._1)),
        s"seed $seed: lookup diverged from state on probe $probeIds")
      // EMPTY EXCURSION (round 19): delete every live key, prune the
      // tombstones to the ZERO-BUCKET layout (empty buckets drop at
      // swap — the designed state that used to brick every read),
      // and every serving surface must keep working: plain read, the
      // prepared table handle held since step 0, a bloom-index
      // handle PREPARED ON THE EMPTY TABLE (the rootSchema path),
      // rollup/index recompute equality — then a repopulating wave
      // must converge back to the oracle. Runs AFTER the raw
      // tombstone-set check above, which pruning legitimately
      // invalidates; the final full sync already folded everything,
      // so the full-horizon prune cannot enable a re-fold
      // resurrection
      val liveIds = liveState(cur).map(_._1).toSeq.sorted
      if (liveIds.nonEmpty) {
        appendFile(sink, dts.head, liveIds.map { id =>
          pos += 1; (id, s"v$pos", "DELETE", 1000L + pos, pos)
        })
        CurrentTable.sync(spark, sink, cur, Seq("id"),
          orderOverride = Some(order))
      }
      CurrentTable.pruneTombstones(spark, cur, Long.MaxValue)
      assert(CurrentTable.read(spark, cur).isEmpty,
        s"seed $seed: emptied table must read zero rows")
      assert(handle.lookup(Seq(1L).toDF("id")).isEmpty,
        s"seed $seed: prepared handle must serve the emptied table")
      val ixEmpty = graft.ops.BucketIndex.reader(spark, cur, "name")
      assertDerived(cur, rnd, seed, -2, ixEmpty)
      val back = (0 to rnd.nextInt(3)).map { _ =>
        pos += 1
        (1L + rnd.nextInt(keySpace), s"v$pos", "UPDATE", 1000L + pos, pos)
      }
      appendFile(sink, dts.last, back)
      CurrentTable.sync(spark, sink, cur, Seq("id"),
        orderOverride = Some(order))
      assert(liveState(cur) == oracle(sink),
        s"seed $seed diverged after the empty excursion")
      assertDerived(cur, rnd, seed, -3, ixEmpty)
      ixEmpty.close()
    }
  }
}
