package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Packing

/** The shard-aware packing kernel (q101 / q108 stage 7): single-shard
  * output must equal a local reference pack exactly, and sharded
  * packing must change NOTHING statistically — tokens conserved
  * exactly, bin count within the provable [unsharded, unsharded +
  * shards - 1] per-source envelope (each shard adds at most one
  * partially-filled tail bin), per-shard window size bounded by the
  * token budget. This is the spec backing SCALE.md's claim that a
  * dominant source packs per (source, shard) "which changes nothing
  * statistically".
  */
class PackingSpec extends AnyFunSuite {
  lazy val spark: SparkSession = TestSpark.session

  private val Ctx = 128

  /** Skewed fixture: one source dominates (the straggler scenario
    * the sharding exists for), two small ones.
    */
  private def fixture: Seq[(String, Long, Int)] = {
    val big = (0 until 200).map(i => ("big", i.toLong, 50 + (i * 37) % 100))
    val s2 = (0 until 20).map(i => ("s2", 1000L + i, 30 + (i * 13) % 40))
    val s3 = (0 until 5).map(i => ("s3", 2000L + i, 10 + i))
    big ++ s2 ++ s3
  }

  private def df = {
    import spark.implicits._
    fixture.toDF("source", "doc_id", "n_tok")
  }

  /** Local reference: prefix-sum in doc_id order within each key. */
  private def refPack(rows: Seq[(String, Long, Int)],
      key: ((String, Long, Int)) => (String, Int))
      : Map[(String, Long), (Long, Int)] =
    rows.groupBy(key).flatMap { case (_, g) =>
      g.sortBy(_._2).foldLeft((0L, List.empty[((String, Long), (Long, Int))])) {
        case ((off, acc), (src, id, n)) =>
          (off + n, ((src, id), (off, (off / Ctx).toInt)) :: acc)
      }._2
    }

  test("single-shard packing equals the local reference pack") {
    val got = Packing.packBins(df, Ctx).collect()
      .map(r => ((r.getString(0), r.getLong(1)),
        (r.getLong(4), r.getLong(5).toInt))).toMap
    val want = refPack(fixture, t => (t._1, 0))
    assert(got == want)
  }

  test("sharded packing conserves tokens and keeps fill statistics") {
    val budget = 2000L
    val packed = Packing.packBins(df, Ctx, budget).collect()
    val byDoc = packed.map(r => ((r.getString(0), r.getLong(1)),
      (r.getLong(3).toInt, r.getLong(4), r.getLong(5).toInt))).toMap
    assert(byDoc.size == fixture.size, "every doc packs exactly once")

    val totals = fixture.groupBy(_._1).view.mapValues(_.map(_._3.toLong).sum)
    for ((src, tot) <- totals) {
      val rows = packed.filter(_.getString(0) == src)
      // exact token conservation through the bin accounting
      assert(rows.map(_.getInt(2).toLong).sum == tot, src)
      // shard domain = ceil(total / budget); hashed assignment may
      // leave a residue empty on tiny fixtures, never exceed it
      val expShards = ((tot - 1) / budget + 1).toInt
      val shards = rows.map(_.getLong(3).toInt).distinct.sorted
      assert(shards.nonEmpty && shards.length <= expShards &&
        shards.forall(sh => sh >= 0 && sh < expShards),
        s"$src: shards $shards, domain $expShards")
      // fill statistics: each shard's cut stream has ceil(tok/ctx)
      // bins (count from token totals — a doc longer than ctx spans
      // bins no doc STARTS in, so occupied-bin rows undercount), and
      // Σ ceil(tok_sh/ctx) ∈ [ceil(tot/ctx), ceil(tot/ctx) + shards
      // - 1]: at most one extra partially-filled tail bin per shard,
      // nothing else about the fill distribution changes
      val perShard = rows.groupBy(_.getLong(3)).values
        .map(_.map(_.getInt(2).toLong).sum).toSeq
      val binsSharded = perShard.map(t => (t - 1) / Ctx + 1).sum
      val binsUnsharded = (tot - 1) / Ctx + 1
      assert(binsSharded >= binsUnsharded &&
        binsSharded <= binsUnsharded + perShard.size - 1,
        s"$src: $binsSharded bins vs unsharded $binsUnsharded" +
          s" + ${perShard.size - 1} tail slack")
      // the window-size bound the sharding exists for: no shard's
      // token total strays past 2× the budget on this fixture
      assert(perShard.forall(_ <= 2 * budget),
        s"$src: shard token totals $perShard exceed bound")
    }

    // within every (source, shard): start_tok is the exact prefix sum
    // in doc_id order — same reference rule, shard-local
    val shardOf = packed.map(r =>
      ((r.getString(0), r.getLong(1)), r.getLong(3).toInt)).toMap
    val want = refPack(fixture, t => (t._1, shardOf((t._1, t._2))))
    val gotOffsets = packed.map(r => ((r.getString(0), r.getLong(1)),
      (r.getLong(4), r.getLong(5).toInt))).toMap
    assert(gotOffsets == want)
  }

  test("sharded window partitions on (source, shard), never a single partition") {
    val packed = Packing.packBins(df, Ctx, 2000L)
    packed.collect()
    val plan = packed.queryExecution.executedPlan.toString
    assert("hashpartitioning\\([^)]*source[^)]*shard".r
      .findFirstIn(plan).isDefined, plan.take(800))
    assert(!plan.contains("SinglePartition"), plan.take(800))
  }

  test("property: conservation, shard formula, and tail-bin envelope on random corpora") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    for (_ <- 1 to 4) {
      val rows = (0 until 300).map { i =>
        ("s" + rnd.nextInt(3), i.toLong * 7 + rnd.nextInt(7),
          1 + rnd.nextInt(300))
      }.distinctBy(r => (r._1, r._2))
      val budget = 200L + rnd.nextInt(5000)
      val packed = Packing
        .packBins(rows.toDF("source", "doc_id", "n_tok"), Ctx, budget)
        .collect()
      for ((src, g) <- rows.groupBy(_._1)) {
        val tot = g.map(_._3.toLong).sum
        val mine = packed.filter(_.getString(0) == src)
        assert(mine.map(_.getInt(2).toLong).sum == tot)
        val expShards = ((tot - 1) / budget + 1).toInt
        val occupied = mine.map(_.getLong(3)).distinct
        assert(occupied.nonEmpty && occupied.length <= expShards &&
          occupied.forall(sh => sh >= 0 && sh < expShards),
          s"$src budget=$budget occupied=${occupied.sorted.toSeq}")
        val perShard = mine.groupBy(_.getLong(3)).values
          .map(_.map(_.getInt(2).toLong).sum).toSeq
        val bins = perShard.map(t => (t - 1) / Ctx + 1).sum
        val lo = (tot - 1) / Ctx + 1
        assert(bins >= lo && bins <= lo + perShard.size - 1,
          s"$src budget=$budget bins=$bins lo=$lo shards=${perShard.size}")
      }
    }
  }

  test("deterministic: two invocations produce identical assignments") {
    val a = Packing.packBins(df, Ctx, 2000L).collect().toSeq
      .map(_.toSeq).sortBy(_.toString)
    val b = Packing.packBins(df, Ctx, 2000L).collect().toSeq
      .map(_.toSeq).sortBy(_.toString)
    assert(a == b)
  }
}
