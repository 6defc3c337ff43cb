package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.AnnIndex

/** The durable maintained ANN (IVF) index: build → delta (update /
  * delete / insert) → search → compact, with the invariant that a
  * search after ANY sequence of deltas equals a search over an index
  * built from scratch on the post-delta corpus with the SAME frozen
  * codebook — incremental maintenance must be observationally
  * identical to recompute, that is the whole contract.
  */
class AnnIndexSpec extends AnyFunSuite {
  lazy val spark = TestSpark.session
  import spark.implicits._

  private def vecs(rows: (Long, Seq[Double])*): DataFrame =
    rows.toSeq.toDF("vec_id", "e")

  // 4-dim corpus with two obvious clusters: ids 1-3 near the x axis,
  // ids 4-6 near the y axis; the two codebook seeds (ids 1 and 4)
  // land one per cluster
  private val base = Seq(
    1L -> Seq(1.0, 0.05, 0.0, 0.0),
    2L -> Seq(0.9, 0.10, 0.0, 0.0),
    3L -> Seq(1.0, -0.05, 0.1, 0.0),
    4L -> Seq(0.05, 1.0, 0.0, 0.0),
    5L -> Seq(-0.05, 0.9, 0.1, 0.0),
    6L -> Seq(0.10, 1.0, 0.0, 0.1))

  private def queries(rows: (Long, Seq[Double])*): DataFrame =
    rows.toSeq.toDF("qid", "qe")

  private def searchSet(dir: String, q: DataFrame, nprobe: Int,
      k: Int): Set[(Long, Long, Int)] =
    AnnIndex.search(spark, dir, q, nprobe, k)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(3))).toSet

  /** From-scratch index over `corpus` with the persisted codebook of
    * `refDir` — the recompute side of the maintenance invariant.
    */
  private def scratchSearch(refDir: String, corpus: DataFrame,
      q: DataFrame, nprobe: Int, k: Int): Set[(Long, Long, Int)] = {
    val dir = Files.createTempDirectory("graft-ann-scratch-").toString
    AnnIndex.build(spark, corpus, AnnIndex.codebook(spark, refDir), dir)
    searchSet(dir, q, nprobe, k)
  }

  test("search hits the nearest cluster; maintained index == " +
      "from-scratch rebuild after update/delete/insert deltas") {
    val dir = Files.createTempDirectory("graft-ann-").toString
    val cb = AnnIndex.seedCentroids(spark, vecs(base: _*), 2)
    AnnIndex.build(spark, vecs(base: _*), cb, dir)

    // an x-axis query probing 1 centroid must surface only cluster-1
    // vectors, nearest first
    val qx = queries(100L -> Seq(1.0, 0.0, 0.0, 0.0))
    val hits = AnnIndex.search(spark, dir, qx, 1, 3)
      .orderBy("rn").collect().map(_.getLong(1)).toSeq
    assert(hits.toSet.subsetOf(Set(1L, 2L, 3L)))
    assert(hits.head == 1L) // (1, .05) is the closest to the x axis

    // delta 1: update vec 2 (moves to the y cluster), delete vec 5,
    // insert vec 7 (x cluster)
    val up1 = vecs(
      2L -> Seq(0.0, 1.0, 0.05, 0.0),
      7L -> Seq(0.95, 0.0, 0.05, 0.0))
    val del1 = Seq(5L).toDF("vec_id")
    assert(AnnIndex.applyDelta(spark, dir, up1, del1) == 1L)
    val after1 = Seq(
      base(0), base(2), base(3), base(5),
      2L -> Seq(0.0, 1.0, 0.05, 0.0),
      7L -> Seq(0.95, 0.0, 0.05, 0.0))
    val q2 = queries(
      100L -> Seq(1.0, 0.0, 0.0, 0.0),
      101L -> Seq(0.0, 1.0, 0.0, 0.0))
    assert(searchSet(dir, q2, 2, 4) ==
      scratchSearch(dir, vecs(after1: _*), q2, 2, 4))
    // the updated vector is found in its NEW cluster, the deleted one
    // never surfaces
    val yHits = AnnIndex.search(spark, dir,
        queries(101L -> Seq(0.0, 1.0, 0.0, 0.0)), 1, 6)
      .collect().map(_.getLong(1)).toSet
    assert(yHits.contains(2L) && !yHits.contains(5L))

    // delta 2: re-insert vec 5 back in the x cluster, delete vec 7
    assert(AnnIndex.applyDelta(spark, dir,
      vecs(5L -> Seq(1.0, 0.1, 0.0, 0.0)), Seq(7L).toDF("vec_id")) == 2L)
    val after2 = Seq(
      base(0), base(2), base(3), base(5),
      2L -> Seq(0.0, 1.0, 0.05, 0.0),
      5L -> Seq(1.0, 0.1, 0.0, 0.0))
    assert(searchSet(dir, q2, 2, 4) ==
      scratchSearch(dir, vecs(after2: _*), q2, 2, 4))

    // compact folds tombstones away without changing search results
    val before = searchSet(dir, q2, 2, 6)
    AnnIndex.compact(spark, dir)
    assert(searchSet(dir, q2, 2, 6) == before)
    assert(spark.read.parquet(s"$dir/tombstones").count() == 0)
    assert(spark.read.parquet(s"$dir/postings").count() == after2.size)

    // post-compact deltas keep composing
    AnnIndex.applyDelta(spark, dir, vecs(), Seq(1L).toDF("vec_id"))
    assert(searchSet(dir, q2, 2, 6) ==
      scratchSearch(dir, vecs(after2.filter(_._1 != 1L): _*), q2, 2, 6))
  }

  test("a torn delta retried at the next generation converges to the " +
      "same live set (at-least-once applies)") {
    val dir = Files.createTempDirectory("graft-ann-").toString
    AnnIndex.build(spark, vecs(base: _*),
      AnnIndex.seedCentroids(spark, vecs(base: _*), 2), dir)
    val upserts = vecs(2L -> Seq(0.0, 0.0, 1.0, 0.0))
    val deletes = Seq(6L).toDF("vec_id")
    // half-applied delta: tombstones landed, postings did not —
    // simulated by a tombstone-only delta carrying the SAME touched set
    AnnIndex.applyDelta(spark, dir, vecs(), // no postings
      upserts.select("vec_id").union(deletes))
    // the retry applies the full delta at the next generation
    AnnIndex.applyDelta(spark, dir, upserts, deletes)
    val expected = Seq(base(0), base(2), base(3), base(4),
      2L -> Seq(0.0, 0.0, 1.0, 0.0))
    val q = queries(100L -> Seq(0.0, 0.0, 1.0, 0.0))
    assert(searchSet(dir, q, 2, 6) ==
      scratchSearch(dir, vecs(expected: _*), q, 2, 6))
    // the live set itself matches vector-for-vector
    assert(AnnIndex.live(spark, dir).select("vec_id").as[Long]
      .collect().toSet == expected.map(_._1).toSet)
  }

  test("trainCodebook refines the seeds deterministically and " +
      "separates the obvious clusters") {
    val v = vecs(base: _*)
    val t1 = AnnIndex.trainCodebook(spark, v, 2, 3)
      .collect().map(r => r.getInt(0) -> r.getSeq[Double](1)).toMap
    val t2 = AnnIndex.trainCodebook(spark, v, 2, 3)
      .collect().map(r => r.getInt(0) -> r.getSeq[Double](1)).toMap
    assert(t1 == t2, "training is not deterministic")
    assert(t1.size == 2)
    // the two trained centroids land one per cluster: one dominated
    // by the x component, one by the y component
    val byAxis = t1.values.toSeq.map(c => c(0) > c(1))
    assert(byAxis.count(identity) == 1, s"centroids collapsed: $t1")
    // an index built on the trained codebook clusters the fixture
    // cleanly: every x-cluster vector shares centroid with vec 1
    val dir = Files.createTempDirectory("graft-ann-train-").toString
    AnnIndex.build(spark, v, AnnIndex.trainCodebook(spark, v, 2, 3), dir)
    val cids = AnnIndex.live(spark, dir)
      .select("vec_id", "cid").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(Set(1L, 2L, 3L).map(cids) == Set(cids(1L)))
    assert(Set(4L, 5L, 6L).map(cids) == Set(cids(4L)))
    assert(cids(1L) != cids(4L))
  }

  test("filtered (hybrid) search ranks within the filtered set — " +
      "attribute columns ride the postings through build and delta") {
    val dir = Files.createTempDirectory("graft-ann-hybrid-").toString
    val tagged = base.zipWithIndex.map { case ((id, e), i) =>
      (id, e, if (i % 2 == 0) "en" else "de")
    }.toDF("vec_id", "e", "lang")
    AnnIndex.build(spark, tagged,
      AnnIndex.seedCentroids(spark, tagged.select("vec_id", "e"), 2), dir)
    // delta carries the same attribute column
    AnnIndex.applyDelta(spark, dir,
      Seq((7L, Seq(0.9, 0.05, 0.0, 0.0), "en")).toDF("vec_id", "e", "lang"),
      Seq.empty[Long].toDF("vec_id"))

    val q = queries(100L -> Seq(1.0, 0.0, 0.0, 0.0))
    // unfiltered search sees everything (both langs)
    val all = AnnIndex.search(spark, dir, q, 2, 10)
      .collect().map(_.getLong(1)).toSet
    assert(all == Set(1L, 2L, 3L, 4L, 5L, 6L, 7L))
    // filtered: top-k OF THE FILTERED SET, never fewer-than-k fallout
    val en = AnnIndex.searchWhere(spark, dir, q, 2, 3, col("lang") === "en")
      .orderBy("rn").collect().map(_.getLong(1)).toSeq
    assert(en.toSet.subsetOf(Set(1L, 3L, 5L, 7L)) && en.size == 3,
      s"hybrid search leaked across the filter: $en")
    // the filtered top-k equals brute-force cosine over the en subset
    val enIds = Set(1L, 3L, 5L, 7L)
    val vecs = tagged.collect().map(r =>
        r.getLong(0) -> r.getSeq[Double](1)).toMap +
      (7L -> Seq(0.9, 0.05, 0.0, 0.0))
    def cos(a: Seq[Double], b: Seq[Double]) = {
      val d = a.zip(b).map { case (x, y) => x * y }.sum
      d / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
    }
    val brute = enIds.toSeq
      .sortBy(id => (-cos(vecs(id), Seq(1.0, 0.0, 0.0, 0.0)), id)).take(3)
    assert(en == brute, s"got $en want $brute")
  }

  test("loadStats measures the posting layout and retrainAdvice fires " +
      "on growth/skew, recommends fewer centroids on shrink, and is " +
      "silent in the band") {
    val dir = Files.createTempDirectory("graft-ann-load-").toString
    val cb = AnnIndex.seedCentroids(spark, vecs(base: _*), 2)
    AnnIndex.build(spark, vecs(base: _*), cb, dir)
    val st0 = AnnIndex.loadStats(spark, dir)
    assert(st0.centroids == 2 && st0.postingRows == 6L)
    // two occupied cells (the exact split depends on the seeds);
    // p99 over 2 cells is the max
    assert(st0.p99Rows == st0.maxRows && st0.maxRows <= 4L, st0.toString)
    // ~3 rows/centroid against a target of 4: inside the band
    assert(AnnIndex.retrainAdvice(st0, 4).isEmpty)
    // the corpus grows 10x INTO THE X CLUSTER (growth + skew): the
    // p99 partition trips the 2x band; the recommendation covers the
    // corpus at the target and never shrinks below the current k
    val grown = (100L until 160L)
      .map(i => i -> Seq(1.0, i / 1000.0, 0.0, 0.0))
    AnnIndex.applyDelta(spark, dir, vecs(grown: _*), vecs())
    val st1 = AnnIndex.loadStats(spark, dir)
    assert(st1.postingRows == 66L && st1.p99Rows >= 62L, st1.toString)
    assert(AnnIndex.retrainAdvice(st1, 4) == Some(17),
      "66 rows / 4-per-centroid target -> retrain at ~17 centroids")
    // skew alone (p99 over the band, corpus/target ≈ current k): the
    // advice is "retrain AT the current k to rebalance" — k-means
    // splits a dense region where re-hashing a hot key could not
    // (p99 63 ≥ 2×30; 66 rows / 30-per-centroid rounds to k=2)
    assert(AnnIndex.retrainAdvice(st1, 30) == Some(2), st1.toString)
    // shrink: a huge target means half the centroids would do
    assert(AnnIndex.retrainAdvice(st1, 1000) == Some(1))
    // raw postings measure SCAN cost: superseded generations count
    // until compact collapses them — the runbook's compact-first rule
    AnnIndex.applyDelta(spark, dir,
      vecs((100L until 160L).map(i =>
        i -> Seq(1.0, i / 1000.0, 0.0, 0.0)): _*), vecs())
    assert(AnnIndex.loadStats(spark, dir).postingRows == 126L)
    AnnIndex.compact(spark, dir)
    assert(AnnIndex.loadStats(spark, dir).postingRows == 66L)
    require(AnnIndex.retrainAdvice(st0, 4).isEmpty) // stats are pure
    // the 2^20 cap applies at RETURN, never in the band decision: a
    // corpus too big for its current k (ideal 5M > k=3M, evenly
    // loaded) is in band — a capped ideal would pass the shrink test
    // and advise DOWN a corpus that needs to grow
    val big = AnnIndex.LoadStats(3000000, 50000000L, 16.7, 17L, 20L)
    assert(AnnIndex.retrainAdvice(big, 10).isEmpty, big.toString)
    val huge = AnnIndex.LoadStats(4, 100000000L, 2.5e7, 25000000L,
      25000000L)
    assert(AnnIndex.retrainAdvice(huge, 10) == Some(1 << 20))
    // delete EVERYTHING then compact — the shrunken-corpus state the
    // advisory exists to measure must read as zero rows, not crash
    // schema inference on a partition-less postings dir
    AnnIndex.applyDelta(spark, dir, vecs(),
      AnnIndex.live(spark, dir).select("vec_id"))
    AnnIndex.compact(spark, dir)
    val stEmpty = AnnIndex.loadStats(spark, dir)
    assert(stEmpty.postingRows == 0L && stEmpty.maxRows == 0L)
    assert(AnnIndex.retrainAdvice(stEmpty, 4).isEmpty)
  }

  test("a same-k retrain verdict rebalances a DRIFTED corpus to " +
      "silence, and is a measurable fixed point on an UNCHANGED one " +
      "— the documented stop rule") {
    import graft.api.Graft
    // (a) drift pays: two balanced clusters trained at k=2, then the
    // even half MOVES into a second subcluster of the X region. The
    // frozen codebook assigns all 20 live vectors to one cell (p99
    // 20 >= 2x target 10, ideal = 2 = k): the same-k "retrain to
    // rebalance" verdict — and acting on it with the CURRENT corpus
    // splits the two subclusters back to 10/10 and silence
    val dir = Files.createTempDirectory("graft-ann-samek-").toString
    val odds = (1L to 19L by 2).map(i => i -> Seq(1.0, 0.005 * i, 0.0, 0.0))
    val evens = (2L to 20L by 2).map(i => i -> Seq(0.005 * i, 1.0, 0.0, 0.0))
    val cb0 = AnnIndex.trainCodebook(spark, vecs((odds ++ evens): _*), 2, 10)
    AnnIndex.build(spark, vecs((odds ++ evens): _*), cb0, dir)
    assert(Graft.annIndexMaintenance(spark, dir, 10).isEmpty)
    val moved = (2L to 20L by 2)
      .map(i => i -> Seq(1.0, 0.5 + 0.005 * i, 0.0, 0.0))
    AnnIndex.applyDelta(spark, dir, vecs(moved: _*), vecs())
    // the churn delta also owes a compact (10 dead + 10 tombstones vs
    // 20 live) — the one call correctly verdicts that FIRST; run it
    // so this test isolates the sizing axis
    assert(Graft.annIndexMaintenance(spark, dir, 10)
      .exists(_.isInstanceOf[Graft.CompactFirst]))
    AnnIndex.compact(spark, dir)
    val drifted = Graft.annIndexMaintenance(spark, dir, 10) match {
      case Some(Graft.Resize(h)) => h
      case other => fail(s"drifted corpus must verdict resize: $other")
    }
    assert(drifted.recommended == 2 && drifted.stats.p99Rows == 20L,
      s"same-k rebalance verdict expected: $drifted")
    val live = vecs((odds ++ moved): _*)
    AnnIndex.build(spark, live,
      AnnIndex.trainCodebook(spark, live, 2, 10), dir)
    assert(Graft.annIndexMaintenance(spark, dir, 10).isEmpty,
      "acting on the same-k verdict over a drifted corpus must " +
        "rebalance to silence")

    // (b) COINCIDENT domination is vetoed STATICALLY: 25 identical
    // vectors (one indivisible dense cell — every codebook assigns
    // identical points identically) + three tight satellites. p99 25
    // >= 2x target and ideal = 4 = k would fire same-k, but
    // 2 * p99TopVectorRows (50) >= p99Rows (25) — the mega-term
    // analog — so the advisory is silent instead of sending a cron
    // to retrain forever
    val dir2 = Files.createTempDirectory("graft-ann-fixed-").toString
    val dense = (Seq(4L) ++ (101L to 124L))
      .map(i => i -> Seq(1.0, 0.0, 0.0, 0.0))
    val sats = (Seq(1L) ++ (16L to 19L)).map(i =>
        i -> Seq(0.0, 1.0, 0.0, 0.0)) ++
      (Seq(2L) ++ (20L to 23L)).map(i => i -> Seq(0.0, 0.0, 1.0, 0.0)) ++
      (Seq(3L) ++ (24L to 27L)).map(i => i -> Seq(0.0, 0.0, 0.0, 1.0))
    val corpus = vecs((dense ++ sats): _*)
    AnnIndex.build(spark, corpus,
      AnnIndex.trainCodebook(spark, corpus, 4, 10), dir2)
    // the veto pass is GATED on the same-k trigger: measured with the
    // target, the coincident group is seen; bare loadStats stays the
    // single cid-only census pass (p99TopVectorRows reads 0)
    val stC = AnnIndex.loadStats(spark, dir2, coincidenceTarget = 10)
    assert(stC.p99Rows == 25L && stC.p99TopVectorRows == 25L, stC.toString)
    assert(AnnIndex.loadStats(spark, dir2).p99TopVectorRows == 0L,
      "bare loadStats must not pay the wide-column pass")
    assert(Graft.annIndexMaintenance(spark, dir2, 10).isEmpty,
      "coincident-dominated same-k must be vetoed, not advised forever")
    // ...but a CAPACITY grow is still advised through coincident load
    // (more centroids do help the rest of the corpus): same stats at
    // a target small enough that ideal > k
    assert(AnnIndex.retrainAdvice(stC, 5) == Some(8),
      "the veto must not silence capacity grows")
    // the veto BINDS to the target it was measured at: the same stats
    // consulted at the matching target veto, at any other same-k
    // target they fire (no stale-basis veto; the safe direction)
    assert(AnnIndex.retrainAdvice(stC, 10).isEmpty,
      "measured-at-10, decided-at-10 must veto")
    assert(AnnIndex.retrainAdvice(stC, 9) == Some(4),
      "measured-at-10, decided-at-9 must not veto on a stale basis")

    // (c) NEAR-coincident load is past the static veto (splittable in
    // principle, p99TopVectorRows = 1) but a converged k-means
    // reproduces itself — the residual fixed point the cron STOP RULE
    // covers: act once, compare loadStats, stop on equality
    val dir3 = Files.createTempDirectory("graft-ann-fixed2-").toString
    val dense2 = (Seq(4L) ++ (101L to 124L)).zipWithIndex
      .map { case (id, i) => id -> Seq(1.0, 0.0001 * i, 0.0, 0.0) }
    val corpus2 = vecs((dense2 ++ sats): _*)
    AnnIndex.build(spark, corpus2,
      AnnIndex.trainCodebook(spark, corpus2, 4, 10), dir3)
    val v1 = Graft.annIndexMaintenance(spark, dir3, 10) match {
      case Some(Graft.Resize(h)) => h
      case other => fail(s"near-coincident equilibrium must fire: $other")
    }
    assert(v1.recommended == 4 && v1.stats.p99TopVectorRows == 1L,
      s"same-k past the veto expected: $v1")
    // the advised call spells the act-once flag — a verbatim consumer
    // records the rebuilt layout's fingerprint for free
    val fp1 = AnnIndex.fingerprintOf(v1.stats)
    assert(v1.call.contains("recordSameKAct = true"),
      s"the same-k advised call must spell the act flag: ${v1.call}")
    val before = AnnIndex.loadStats(spark, dir3)
    // a FINGERPRINT-LESS rebuild (an operator's hand-rolled act): the
    // deterministic k-means reproduces the stats and the verdict
    // repeats — nothing remembered, nothing suppressed
    AnnIndex.build(spark, corpus2,
      AnnIndex.trainCodebook(spark, corpus2, 4, 10), dir3)
    val after = AnnIndex.loadStats(spark, dir3)
    assert(after == before,
      s"unchanged corpus must be a retrain fixed point: $before vs $after")
    assert(Graft.annIndexMaintenance(spark, dir3, 10)
      .exists(_.isInstanceOf[Graft.Resize[_, _]]),
      "a fingerprint-less rebuild keeps the repeating verdict")
    // acting AS ADVISED — the act flag through build — encodes the
    // stop: the reproduced layout reads SILENT next window. From this
    // backlog-free start the recorded layout fingerprint equals the
    // verdict's measured one (the fixed point reproduces itself).
    AnnIndex.build(spark, corpus2,
      AnnIndex.trainCodebook(spark, corpus2, 4, 10), dir3,
      recordSameKAct = true)
    assert(AnnIndex.loadStats(spark, dir3).actedFingerprint
      .contains(fp1))
    assert(Graft.annIndexMaintenance(spark, dir3, 10).isEmpty,
      "the ACTED fixed point must read silent — act-once-compare-stop")
    // ...and the silence self-clears on real change: one new posting
    // moves the row counts, the fingerprint mismatches, and the
    // same-k arm is live again (fresh evidence, fresh verdict)
    AnnIndex.applyDelta(spark, dir3,
      vecs(999L -> Seq(1.0, 0.00005, 0.0, 0.0)), vecs())
    assert(Graft.annIndexMaintenance(spark, dir3, 10)
      .exists(_.isInstanceOf[Graft.Resize[_, _]]),
      "churn past the acted fingerprint must re-arm the verdict")

    // (c2) the FIRST-ACT guarantee over BACKLOG: re-upsert three live
    // satellites with unchanged values — the live set is identical,
    // but superseded postings pile up (raw 44 vs live 41, under the
    // compact threshold, so the one-call still measures sizing) and
    // the pre-act stats are raw-inflated. ONE act as advised must
    // reach silence: the recorded fingerprint is the layout the
    // rebuild WROTE (raw reset to live), which pre-act stats could
    // never match — recording those instead would charge the cron
    // one extra provably-futile retrain before stopping.
    AnnIndex.applyDelta(spark, dir3,
      vecs((16L to 18L).map(i => i -> Seq(0.0, 1.0, 0.0, 0.0)): _*),
      vecs())
    val v2 = Graft.annIndexMaintenance(spark, dir3, 10) match {
      case Some(Graft.Resize(h)) => h
      case other => fail(s"backlogged same-k must still fire: $other")
    }
    assert(v2.recommended == v2.stats.centroids &&
      v2.stats.postingRows > 41L,
      s"fixture must be a same-k verdict over backlog: $v2")
    val live3 = vecs(((dense2 :+
      (999L -> Seq(1.0, 0.00005, 0.0, 0.0))) ++ sats): _*)
    AnnIndex.build(spark, live3,
      AnnIndex.trainCodebook(spark, live3, 4, 10), dir3,
      recordSameKAct = true)
    assert(Graft.annIndexMaintenance(spark, dir3, 10).isEmpty,
      "one act over a BACKLOGGED index must reach silence — the " +
        "recorded fingerprint is the written layout, not pre-act stats")
    // ...and DELETE-ONLY churn re-arms the stop: a tombstone-only
    // delta moves none of the four posting aggregates, so the
    // tombstone component of the fingerprint is what keeps a
    // shrinking live set from staying silenced on a stale basis —
    // a same-k retrain of the smaller live set is NOT futile
    AnnIndex.applyDelta(spark, dir3, vecs(),
      vecs(27L -> Seq(0.0, 0.0, 0.0, 1.0)).select("vec_id"))
    assert(Graft.annIndexMaintenance(spark, dir3, 10)
      .exists(_.isInstanceOf[Graft.Resize[_, _]]),
      "delete-only churn past the acted fingerprint must re-arm")

    // (d) the veto's COST GUARD: with more than VetoTieCells cells
    // tied at the p99 count, the wide-column pass is skipped
    // (p99TopVectorRows = 0) and advice falls back to firing — the
    // safe direction, bounded by the stop rule — instead of reading
    // dozens of vector partitions at maintenance cadence. 9 hot
    // cells of 10 COINCIDENT vectors each + 11 singletons at k=20:
    // without the cap the least-dominated tied cell would veto
    val dir4 = Files.createTempDirectory("graft-ann-tiecap-").toString
    val dims = (0 until 20).map(c =>
      Seq.tabulate(4)(d => if (d == c % 4) 1.0 else 0.05 * (c / 4 + 1)))
    val seeds20 = (1L to 20L).map(i => i -> dims((i - 1).toInt))
    val hotDups = (0 until 9).flatMap(c => (0 until 9).map(j =>
      (100L + c * 10 + j) -> dims(c)))
    val corpus4 = vecs((seeds20 ++ hotDups): _*)
    AnnIndex.build(spark, corpus4,
      AnnIndex.seedCentroids(spark, corpus4, 20), dir4)
    val st4 = AnnIndex.loadStats(spark, dir4, coincidenceTarget = 5)
    assert(st4.p99Rows == 10L && st4.p99TopVectorRows == 0L,
      s"9 tied hot cells > VetoTieCells must skip the veto pass: $st4")
    // p99 10 >= 2x5, ideal = round(101/5) = 20 = k: same-k fires
    // (the un-vetoed fallback), one acted-on retrain then stop rule
    assert(AnnIndex.retrainAdvice(st4, 5) == Some(20), st4.toString)

    // (e) the veto counts LIVE coincidence, never backlog: one vector
    // re-upserted 4 times with an UNCHANGED embedding leaves 4 dead
    // generations hashing identically — a raw count would read 5
    // coincident rows in the 7-row p99 cell (2x5 >= 7: vetoed
    // forever), while the concentrated churn (backlog 8 < live 27)
    // stays under the global compact threshold so nothing ever
    // clears it. Measured over the live set the top group is 1, the
    // same-k rebalance fires, and acting on it sheds the backlog
    val dir5 = Files.createTempDirectory("graft-ann-livetop-").toString
    val dirsB = (0 until 10).map(c =>
      Seq.tabulate(4)(d => if (d == c % 4) 1.0 else 0.05 * (c / 4 + 1)))
    def jB(c: Int, i: Int) = dirsB(c).updated((c + 1) % 4,
      dirsB(c)((c + 1) % 4) + 0.001 * (i % 7 + 1))
    val seeds10 = (1L to 10L).map(i => i -> dirsB((i - 1).toInt))
    val extras = Seq(11L -> jB(0, 1), 12L -> jB(0, 2)) ++
      (20L to 24L).map(i => i -> jB(1, i.toInt)) ++
      (25L to 29L).map(i => i -> jB(2, i.toInt)) ++
      (30L to 34L).map(i => i -> jB(3, i.toInt))
    val corpus5 = vecs((seeds10 ++ extras): _*)
    AnnIndex.build(spark, corpus5,
      AnnIndex.seedCentroids(spark, corpus5, 10), dir5)
    for (_ <- 0 until 4)
      AnnIndex.applyDelta(spark, dir5, vecs(12L -> jB(0, 2)), vecs())
    assert(Graft.annIndexCompactHealth(spark, dir5).isEmpty,
      "the concentrated churn must stay under the compact threshold " +
        "for this fixture to mean anything")
    Graft.annIndexMaintenance(spark, dir5, 3) match {
      case Some(Graft.Resize(h)) =>
        assert(h.recommended == 10 && h.stats.p99Rows == 7L &&
          h.stats.p99TopVectorRows == 1L,
          s"dead generations must not read as coincidence: $h")
      case other => fail(s"backlogged hot cell must still advise the " +
        s"rebalance a raw-count veto would silence: $other")
    }
  }

  test("search plan broadcasts queries/probes and never goes cartesian") {
    val dir = Files.createTempDirectory("graft-ann-").toString
    AnnIndex.build(spark, vecs(base: _*),
      AnnIndex.seedCentroids(spark, vecs(base: _*), 2), dir)
    val plan = AnnIndex.search(spark, dir,
        queries(100L -> Seq(1.0, 0.0, 0.0, 0.0)), 1, 3)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"),
      s"cartesian in search plan:\n$plan")
    assert(plan.contains("BroadcastHashJoin") ||
      plan.contains("BroadcastNestedLoopJoin"),
      s"no broadcast join in search plan:\n$plan")
  }

  test("an in-place rebuild replaces everything: surviving tombstones " +
      "cannot kill rebuilt gen-0 postings, and compact staging dirs " +
      "are swept so a later compact cannot heal old-assignment " +
      "postings back under the new codebook") {
    val dir = Files.createTempDirectory("graft-ann-rb-").toString
    val cb = AnnIndex.seedCentroids(spark, vecs(base: _*), 2)
    AnnIndex.build(spark, vecs(base: _*), cb, dir)
    // a gen-1 tombstone for vec 1, then staging junk a crashed
    // compact could leave behind
    AnnIndex.applyDelta(spark, dir, vecs(), Seq(1L).toDF("vec_id"))
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sessionState.newHadoopConf())
    fs.mkdirs(new org.apache.hadoop.fs.Path(
      s"$dir/postings._compact_trash"))
    fs.mkdirs(new org.apache.hadoop.fs.Path(
      s"$dir/postings._compact_tmp"))
    // rebuild over a corpus that CONTAINS vec 1 — without the
    // delete-data-first sweep the old tombstone (gen 1) outranks the
    // rebuilt gen-0 posting and vec 1 silently vanishes from search
    AnnIndex.build(spark, vecs(base: _*), cb, dir)
    assert(AnnIndex.live(spark, dir).select("vec_id").collect()
      .map(_.getLong(0)).toSet == base.map(_._1).toSet,
      "a pre-rebuild tombstone leaked into the rebuilt index")
    for (stale <- Seq("postings._compact_trash", "postings._compact_tmp"))
      assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$dir/$stale")),
        s"$stale survived build")
    // and the next compact (whose heal step would restore a stale
    // trash) still serves the rebuilt corpus
    AnnIndex.compact(spark, dir)
    val hits = AnnIndex.search(spark, dir,
        queries(100L -> Seq(1.0, 0.0, 0.0, 0.0)), 1, 3)
      .orderBy("rn").collect().map(_.getLong(1)).toSeq
    assert(hits.head == 1L, s"rebuilt vec 1 must serve again: $hits")
  }

  test("compactStats counts the posting backlog exactly and the " +
      "advice fires at the family's 2x read-amplification threshold") {
    import graft.ops.IndexCompaction
    import graft.ops.IndexCompaction.CompactStats
    val dir = Files.createTempDirectory("graft-annc-").toString
    val cb = AnnIndex.seedCentroids(spark, vecs(base: _*), 2)
    AnnIndex.build(spark, vecs(base: _*), cb, dir)
    assert(AnnIndex.compactStats(spark, dir) == CompactStats(6, 6, 0))
    assert(IndexCompaction.compactAdvice(
      AnnIndex.compactStats(spark, dir)).isEmpty)
    // update vec 2: backlog 2 (1 dead posting + 1 tombstone) under
    // live 6, stays silent
    AnnIndex.applyDelta(spark, dir,
      vecs(2L -> Seq(0.8, 0.2, 0.0, 0.0)), vecs())
    val st1 = AnnIndex.compactStats(spark, dir)
    assert(st1 == CompactStats(7, 6, 1))
    assert(IndexCompaction.compactAdvice(st1).isEmpty,
      s"backlog 2 < live 6 must be silent: $st1")
    // delete vecs 3-5: backlog 8 (4 dead + 4 tombstones) >= live 3
    AnnIndex.applyDelta(spark, dir, vecs(),
      Seq(3L, 4L, 5L).toDF("vec_id"))
    val st2 = AnnIndex.compactStats(spark, dir)
    assert(st2 == CompactStats(7, 3, 4))
    assert(IndexCompaction.compactAdvice(st2).contains(8L))
    // acted on: silent until real churn re-accumulates
    AnnIndex.compact(spark, dir)
    val st3 = AnnIndex.compactStats(spark, dir)
    assert(st3 == CompactStats(3, 3, 0))
    assert(IndexCompaction.compactAdvice(st3).isEmpty)
  }
}
