package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.scalatest.funsuite.AnyFunSuite

/** Regression guards on physical plan SHAPE — the scale properties
  * COVERAGE.md/SCALE.md claim (broadcast stars, pushdown + pruning,
  * map-side sketch partials) asserted against the executed plan, so a
  * refactor that silently degrades a plan fails the build, not the
  * next benchmark.
  */
class PlanAssertionsSpec extends AnyFunSuite {
  lazy val spark: SparkSession = TestSpark.session
  val sf = "/root/testdata/sf0.001"

  /** Final (post-AQE) physical plan string. */
  private def planOf(df: DataFrame): String = {
    df.collect() // force execution so AQE finalizes the plan
    df.queryExecution.executedPlan.toString
  }

  test("q06 star join broadcasts every dimension, no sort-merge join") {
    val plan = planOf(SparkEntry.queries("q06_region_revenue")(spark, sf))
    assert("BroadcastHashJoin".r.findAllIn(plan).size >= 4, plan.take(800))
    assert(!plan.contains("SortMergeJoin"), plan.take(800))
  }

  test("q02 filter reaches the parquet scan and columns are pruned") {
    val df = SparkEntry.queries("q02_filter_project")(spark, sf)
    df.collect()
    val scans = df.queryExecution.executedPlan.collectLeaves().map(_.toString)
    val lineitemScan = scans.find(_.contains("lineitem")).get
    assert(lineitemScan.contains("PushedFilters: ["), lineitemScan.take(400))
    assert("PushedFilters: \\[[^\\]]".r.findFirstIn(lineitemScan).isDefined,
      s"no filter pushed: ${lineitemScan.take(400)}")
    // projection pruning: the scan must not read the full 16-col schema
    assert(!lineitemScan.contains("l_comment"), lineitemScan.take(400))
  }

  test("q60 KMV aggregate runs with map-side partials") {
    val plan = planOf(SparkEntry.queries("q60_kmv_distinct")(spark, sf))
    // partial + final object-hash aggregate pair around the shuffle
    assert("ObjectHashAggregate".r.findAllIn(plan).size >= 2, plan.take(800))
  }

  test("q43 cosine near-dup joins on LSH buckets — no cartesian product") {
    val plan = planOf(SparkEntry.queries("q43_cosine_neardup")(spark, sf))
    assert(!plan.contains("CartesianProduct"), plan.take(800))
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan.take(800))
  }

  test("q66 salted join fans hot keys out over (key, salt)") {
    val plan = planOf(SparkEntry.queries("q66_skew_salted_topk")(spark, sf))
    // right side replicated via explode, join key includes the salt
    assert(plan.contains("_salt"), plan.take(800))
    assert(plan.contains("explode"), plan.take(800))
  }

  test("q71 as-of join compiles to zero join operators") {
    // the union + window carry-forward IS the join: any Join node
    // would mean a per-row range probe sneaked back in
    val plan = planOf(SparkEntry.queries("q71_asof_join")(spark, sf))
    assert(!plan.contains("Join"), plan.take(800))
    assert(plan.contains("Window"), plan.take(800))
  }

  test("q72 range join is a bucketed equi-join, not a nested loop") {
    val plan = planOf(SparkEntry.queries("q72_range_join")(spark, sf))
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan.take(800))
    assert(!plan.contains("CartesianProduct"), plan.take(800))
    // the interval→bucket fan-out must stay in the plan: without it an
    // equi-join on user_id alone would pass the negative checks while
    // degrading to O(events × intervals) per user
    assert(plan.contains("explode"), plan.take(800))
  }

  test("q74 decontamination broadcasts the benchmark n-gram set") {
    // the corpus side must never shuffle on the gram: the benchmark
    // set is the small side by construction (test suites are MBs)
    val plan = planOf(SparkEntry.queries("q74_decontaminate")(spark, sf))
    assert(plan.contains("BroadcastHashJoin"), plan.take(800))
    assert(!plan.contains("CartesianProduct"), plan.take(800))
  }

  test("q76 quantization broadcasts the 64-entry dim stats") {
    // quantization must be a projection over a broadcast of the tiny
    // per-dimension stats array — a shuffle here would move the corpus
    val plan = planOf(SparkEntry.queries("q76_quantize_embed")(spark, sf))
    assert(plan.contains("BroadcastNestedLoopJoin")
      || plan.contains("BroadcastHashJoin"), plan.take(800))
    assert(!plan.contains("CartesianProduct"), plan.take(800))
  }

  test("q37 minhash signatures are map-only (no hash-partition shuffle)") {
    val plan = planOf(SparkEntry.queries("q37_minhash_sig")(spark, sf))
    // the trailing total ORDER BY adds a range exchange; anything
    // hashpartitioned would mean an accidental aggregation/join
    assert(!plan.contains("hashpartitioning"), plan.take(800))
  }

  test("native kernels run inside codegen stages (starred plan nodes)") {
    // every graft expression ships doGenCode; a regression to
    // CodegenFallback would silently interpret the hot path. AQE
    // plan strings mark whole-stage-codegen nodes with `*(n)`. The
    // minhash projection only became codegen-eligible when the
    // shingle HOF was replaced by the native n-gram kernel — this
    // assertion pins that win.
    def starred(q: String, kernel: String): Unit = {
      val plan = planOf(SparkEntry.queries(q)(spark, sf))
      val lines = plan.split("\n").filter(_.contains(kernel))
      assert(lines.nonEmpty, s"$q: no $kernel in plan\n${plan.take(600)}")
      assert(lines.exists(_.contains("*(")),
        s"$q: $kernel evaluated outside codegen:\n${lines.mkString("\n")}")
    }
    starred("q42_knn_bruteforce", "dotproduct")
    starred("q37_minhash_sig", "minhashsig")
    starred("q37_minhash_sig", "ngrams")
  }

  test("q93 bloom prune: fact side never sort-merge joins; bitset has map-side partials") {
    val plan = planOf(SparkEntry.queries("q93_bloom_prune")(spark, sf))
    // the 4 KB bitset and the key set both broadcast — shuffling
    // lineitem for either would defeat the runtime-filter shape
    assert(!plan.contains("SortMergeJoin"), plan.take(800))
    assert("ObjectHashAggregate".r.findAllIn(plan).size >= 2, plan.take(800))
  }

  test("q96 domain cap: bounded-heap aggregate with map-side partials, no window") {
    val plan = planOf(SparkEntry.queries("q96_domain_cap")(spark, sf))
    // a Window here would sort every hot domain's rows in one task;
    // the TopKAgg partial/final pair ships ≤cap rows per key per task
    assert(!plan.contains("Window"), plan.take(800))
    assert("ObjectHashAggregate".r.findAllIn(plan).size >= 2, plan.take(800))
  }

  test("q97 PQ coding broadcasts the codebook — corpus never shuffles to rank centroids") {
    val plan = planOf(SparkEntry.queries("q97_pq_codes")(spark, sf))
    assert(plan.contains("BroadcastHashJoin"), plan.take(800))
    assert(!plan.contains("SortMergeJoin"), plan.take(800))
    assert(!plan.contains("CartesianProduct"), plan.take(800))
  }

  test("q99 span scrub: first-occurrence is an aggregate, not a corpus-wide window") {
    val plan = planOf(SparkEntry.queries("q99_span_scrub")(spark, sf))
    // a Window over PARTITION BY chunk would sort the whole exploded
    // corpus; the min-struct aggregate shuffles only distinct chunks
    assert(!plan.contains("Window"), plan.take(800))
    assert(!plan.contains("CartesianProduct"), plan.take(800))
  }

  test("q100 chunk windows are map-only (no hash-partition shuffle)") {
    // the training-set producer must stay embarrassingly parallel:
    // the only exchange allowed is the trailing ORDER BY's range part
    val plan = planOf(SparkEntry.queries("q100_chunk_windows")(spark, sf))
    assert(!plan.contains("hashpartitioning"), plan.take(800))
  }

  test("q101 packing window is keyed, never a single-partition sort") {
    // the packing kernel's window must partition on its keys — a
    // SinglePartition exchange here would serialize the whole corpus
    // through one task (PackingSpec separately asserts the sharded
    // path keys on (source, shard))
    val plan = planOf(SparkEntry.queries("q101_pack_bins")(spark, sf))
    assert(plan.contains("hashpartitioning(source"), plan.take(800))
    assert(!plan.contains("SinglePartition"), plan.take(800))
  }

  test("q102 incremental near-dup probes buckets — no cartesian, new side broadcast") {
    val plan = planOf(SparkEntry.queries("q102_incremental_neardup")(spark, sf))
    assert(!plan.contains("CartesianProduct"), plan.take(800))
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan.take(800))
    assert(plan.contains("BroadcastHashJoin"), plan.take(800))
  }

  test("q104 semantic decontamination broadcasts the held-out split") {
    val plan = planOf(SparkEntry.queries("q104_semantic_decontaminate")(spark, sf))
    assert(plan.contains("BroadcastHashJoin"), plan.take(800))
    assert(!plan.contains("CartesianProduct"), plan.take(800))
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan.take(800))
  }

  test("q109 ADC scan reads PQ codes only — no vector or file IO at query time") {
    // with the code index and LUT pre-built (as a deployment stores
    // them), the ranking plan must be cache-scan + broadcast + top-k:
    // any parquet scan or embedding column here means the 64×
    // compression wasn't actually cashed in
    val df = graft.queries.VectorQueries.pqAdcPlanProbe(spark, sf)
    // the plan string embeds each cached input's BUILD plan under its
    // InMemoryRelation node (where a parquet scan is legitimate —
    // that's index-build time); the query-time operators are
    // everything above the first cache boundary
    val queryTime = planOf(df).split("\n")
      .takeWhile(!_.contains("InMemoryRelation")).mkString("\n")
    assert(queryTime.contains("InMemoryTableScan"), queryTime)
    assert(queryTime.contains("c0"), queryTime) // the code columns
    assert(!queryTime.toLowerCase.contains("parquet"), queryTime)
    assert(!queryTime.contains("embedding"), queryTime)
    assert(!queryTime.contains("SortMergeJoin"), queryTime)
  }

  test("q111 BM25: distributed top-k, stats broadcast, corpus never shuffles wide") {
    val plan = planOf(SparkEntry.queries("q111_bm25_retrieval")(spark, sf))
    // the final ranking must be TakeOrderedAndProject (map-side
    // partial top-k), never a global sort of the scored corpus
    assert(plan.contains("TakeOrderedAndProject"), plan.take(800))
    // the one-row stats frame joins by broadcast, not a shuffle
    assert(!plan.contains("SortMergeJoin"), plan.take(800))
    assert(!plan.contains("CartesianProduct"), plan.take(800))
  }

  test("q112 BPE apply: the per-word symbol table broadcasts onto the corpus pass") {
    val plan = planOf(SparkEntry.queries("q112_bpe_apply")(spark, sf))
    assert(plan.contains("BroadcastHashJoin"), plan.take(800))
    assert(!plan.contains("SortMergeJoin"), plan.take(800))
    assert(!plan.contains("CartesianProduct"), plan.take(800))
  }

  test("q95 heavy hitters: the estimate filter precedes the exact aggregation") {
    val df = SparkEntry.queries("q95_cms_heavy_hitters")(spark, sf)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    // the grid probe (least over element_at) must appear in a Filter,
    // pruning rows before the groupBy's exchange
    assert(plan.contains("least("), plan.take(800))
    assert("ObjectHashAggregate".r.findAllIn(plan).size >= 2, plan.take(800))
  }

  test("current-table lookup: probe keys broadcast onto the bucket " +
      "scan — the table side never shuffles") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val work = java.nio.file.Files
      .createTempDirectory("graft-plan-ct-").toString
    spark.range(2000)
      .select(col("id"), concat(lit("v"), col("id")).as("name"),
        lit("UPDATE").as("_op"), (lit(1000L) + col("id")).as("_ts"),
        lit("f1").as("_binlog_file_internal"),
        col("id").as("_binlog_pos_internal"),
        lit("2024-01-01").as("dt"))
      .write.mode("append").partitionBy("dt").parquet(s"$work/sink")
    graft.streaming.CurrentTable.sync(spark, s"$work/sink",
      s"$work/cur", Seq("id"), buckets = 16)
    val got = graft.streaming.CurrentTable.lookup(spark, s"$work/cur",
      Seq("id"), Seq(7L, 1234L).toDF("id"))
    val plan = planOf(got)
    // driver-small probe set broadcasts; the bucket read is joined
    // in place — a shuffle of the table side would defeat the point
    assert(plan.contains("BroadcastHashJoin") &&
      plan.contains("LeftSemi"), plan.take(800))
    assert(!plan.contains("SortMergeJoin"), plan.take(800))
  }

  test("rollup read: one scan of the tiny partials and one aggregate " +
      "exchange — never a join, never a table scan; lookupBy " +
      "broadcasts the probe onto the candidate buckets") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val work = java.nio.file.Files
      .createTempDirectory("graft-plan-ru-").toString
    spark.range(2000)
      .select(col("id"), concat(lit("v"), col("id") % 10).as("name"),
        lit("UPDATE").as("_op"), (lit(1000L) + col("id")).as("_ts"),
        lit("f1").as("_binlog_file_internal"),
        col("id").as("_binlog_pos_internal"),
        lit("2024-01-01").as("dt"))
      .write.mode("append").partitionBy("dt").parquet(s"$work/sink")
    graft.streaming.CurrentTable.sync(spark, s"$work/sink",
      s"$work/cur", Seq("id"), buckets = 16)
    graft.ops.RollupTable.attach(spark, s"$work/cur", "by_name",
      graft.ops.RollupTable.Spec(Seq("name"), Seq(
        graft.ops.RollupTable.Agg("count", "*", "n"))))
    val rplan = planOf(graft.ops.RollupTable.read(spark, s"$work/cur",
      "by_name")).split("== Initial Plan ==").head
    // serving cost is O(buckets x groups): exactly one parquet scan
    // (the partials), no join, and the scan path points at _rollup —
    // a table-dir scan here would mean the read is secretly a recompute
    assert("Scan parquet".r.findAllIn(rplan).size == 1, rplan.take(1200))
    assert(!rplan.contains("Join"), rplan.take(800))
    assert(rplan.contains("_rollup"), rplan.take(1200))

    graft.ops.BucketIndex.attach(spark, s"$work/cur", "name")
    val probed = graft.ops.BucketIndex.lookupBy(spark, s"$work/cur",
      "name", Seq("v7").toDF("name"))
    val iplan = planOf(probed).split("== Initial Plan ==").head
    assert(iplan.contains("BroadcastHashJoin") &&
      iplan.contains("LeftSemi"), iplan.take(800))
    assert(!iplan.contains("SortMergeJoin"), iplan.take(800))

    // candidate selection is CLUSTER-SIDE: the frame lookupBy
    // collects carries bucket ids ONLY — bloom words must never
    // transit the driver, however large the sidecar grows. The probe
    // hashes broadcast onto the sidecar scan (shard-equi semi-join,
    // bloom test as the residual); nothing shuffles.
    val cand = graft.ops.BucketIndex.candidateFrameFor(spark,
      s"$work/cur", "name", Seq("v7").toDF("name"))
    assert(cand.schema.fields.map(f =>
        (f.name, f.dataType.simpleString)).toSeq == Seq(("kb", "int")),
      cand.schema.treeString)
    val cplan = planOf(cand).split("== Initial Plan ==").head
    assert(cplan.contains("BroadcastHashJoin") &&
      cplan.contains("LeftSemi"), cplan.take(1200))
    assert(cplan.contains("_index"), cplan.take(1200))
    assert(!cplan.contains("SortMergeJoin") &&
      !cplan.contains("Exchange hashpartitioning"), cplan.take(1200))
  }

  test("readEvolved: one pk shuffle over the fork union, no join at " +
      "all — the cross-fork merge moves #keys x #forks rows once") {
    import org.apache.spark.sql.functions._
    val work = java.nio.file.Files
      .createTempDirectory("graft-plan-re-").toString
    // two evolution forks of db.ev, each with its own current table
    // (the q126 shape, minus the oracle ceremony)
    for ((v, withExtra) <- Seq(("base", false), ("v20240701", true))) {
      val dir = if (v == "base") s"$work/p_db__ev"
        else s"$work/p_db__ev_$v"
      val rows = spark.range(500)
        .select(col("id"), concat(lit(v), col("id")).as("name"),
          lit("UPDATE").as("_op"), (lit(1000L) + col("id")).as("_ts"),
          lit("f1").as("_binlog_file_internal"),
          col("id").as("_binlog_pos_internal"),
          lit("2024-01-01").as("dt"))
      val shaped = if (withExtra) rows.withColumn("extra", col("id") * 2)
        else rows
      shaped.write.mode("append").partitionBy("dt").parquet(dir)
      graft.streaming.CurrentTable.sync(spark, dir, s"${dir}__current",
        Seq("id"), buckets = 4)
    }
    val df = graft.streaming.CurrentTable.readEvolved(spark, work,
      "p", "db", "ev", Seq("id"))
    // AQE's toString repeats nodes under "== Initial Plan ==" — count
    // only the final section or every Exchange double-counts
    val plan = planOf(df).split("== Initial Plan ==").head
    // the q126 oracle pins VALUES; this pins the 100x SHAPE: exactly
    // one hash shuffle (the keep-latest window over pk), the two
    // forks unioned by name, and never a join/cartesian — the input
    // is <= one row per key per fork, not the changelogs
    assert("Exchange hashpartitioning".r.findAllIn(plan).size == 1,
      plan.take(1200))
    assert(plan.contains("Union"), plan.take(800))
    assert("Scan parquet".r.findAllIn(plan).size == 2, plan.take(1200))
    assert(!plan.contains("Join") && !plan.contains("Cartesian"),
      plan.take(800))

    // lookupEvolved on the same forks: per-fork broadcast semi-joins
    // onto bucket-pruned scans feeding the ONE keep-latest shuffle —
    // never a sort-merge join, never a shuffle of the probe side
    import spark.implicits._
    val probed = graft.streaming.CurrentTable.lookupEvolved(spark,
      work, "p", "db", "ev", Seq("id"), Seq(7L, 123L).toDF("id"))
    val lplan = planOf(probed).split("== Initial Plan ==").head
    assert("BroadcastHashJoin".r.findAllIn(lplan).size == 2 &&
      lplan.contains("LeftSemi"), lplan.take(1200))
    assert(!lplan.contains("SortMergeJoin"), lplan.take(800))
    assert("Exchange hashpartitioning".r.findAllIn(lplan).size == 1,
      lplan.take(1200))
  }
}
