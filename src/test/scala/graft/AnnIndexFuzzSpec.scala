package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.AnnIndex

/** Randomized delta/compact schedules for the maintained IVF index
  * under the shared [[IndexFuzzHarness]]: after every step, (1) the
  * index's live set must equal the expected key→vector state (the
  * generation/tombstone kill rule under torn retries and interleaved
  * compactions), and (2) a full-probe search (nprobe = centroids, so
  * IVF degenerates to exact scan) must return exactly the brute-force
  * cosine top-k over that state.
  */
class AnnIndexFuzzSpec extends AnyFunSuite {
  lazy val spark = TestSpark.session
  import spark.implicits._

  private def vec(rnd: scala.util.Random): Seq[Double] =
    Seq.fill(4)(math.rint(rnd.nextGaussian() * 100) / 100.0 + 0.01)

  private def df(state: Map[Long, Seq[Double]]): DataFrame =
    state.toSeq.toDF("vec_id", "e")

  private def cosine(a: Seq[Double], b: Seq[Double]): Double = {
    val d = a.zip(b).map { case (x, y) => x * y }.sum
    d / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
  }

  test("random delta/compact schedules keep the live set exact and " +
      "full-probe search equal to brute-force cosine top-k") {
    for (seed <- 1 to 3) {
      val rnd = new scala.util.Random(seed)
      val k = 2 + rnd.nextInt(3) // centroids
      val dir = Files.createTempDirectory(s"graft-annf-$seed-").toString
      val initial = (1L to (6 + rnd.nextInt(6)).toLong)
        .map(i => i -> vec(rnd)).toMap
      val cb = AnnIndex.seedCentroids(spark, df(initial), k)
      AnnIndex.build(spark, df(initial), cb, dir)
      IndexFuzzHarness.run[Seq[Double]](rnd, initial,
        freshValue = () => vec(rnd),
        upsert = up => AnnIndex.applyDelta(spark, dir, df(up),
          spark.emptyDataset[Long].toDF("vec_id")),
        delete = dead => AnnIndex.applyDelta(spark, dir,
          Seq.empty[(Long, Seq[Double])].toDF("vec_id", "e"),
          dead.toDF("vec_id")),
        compact = () => AnnIndex.compact(spark, dir),
        deleteFloor = 5, // top-3 candidates + the query vector + slack
        check = (state, step) => {
          // (1) the live set IS the expected state
          val got = AnnIndex.live(spark, dir)
            .select("vec_id", "e").collect()
            .map(r => r.getLong(0) -> r.getSeq[Double](1).toSeq).toMap
          assert(got == state, s"seed $seed $step: live set diverged")
          // (2) full-probe search == brute-force top-3 (ties to lower
          // id): distinct random vectors make exact score ties
          // vanishingly unlikely, and the 1e-9 rounding absorbs
          // float-order noise
          val q = state.head
          val want = state.toSeq.filter(_._1 != q._1)
            .map { case (id, e) =>
              (id, math.rint(cosine(q._2, e) * 1e9) / 1e9) }
            .sortBy { case (id, c) => (-c, id) }.take(3).map(_._1)
          val res = AnnIndex.search(spark, dir,
              Seq((q._1, q._2)).toDF("qid", "qe"), nprobe = k, k = 3)
            .orderBy("rn").select("vec_id").collect().map(_.getLong(0))
          assert(res.toSeq == want,
            s"seed $seed $step: search ${res.toSeq} != brute force $want")
        })
    }
  }
}
