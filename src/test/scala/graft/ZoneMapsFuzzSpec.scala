package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.ZoneMaps

/** Generative coverage for the zone-map skipping rules: for random
  * data, random file layouts (range-clustered, hash-scattered, or
  * skewed single-key files), random NULL stripes, and random query
  * ranges/points — the pruned read must equal the plain filtered
  * read. A wrong min/max comparison, NULL-stats rule, or bloom
  * position would surface here as a lost or phantom row; the unit
  * spec's hand-built layouts can't cover this input space.
  */
class ZoneMapsFuzzSpec extends AnyFunSuite {
  lazy val spark = TestSpark.session
  import spark.implicits._

  private val rnd = new scala.util.Random(0x5eed)

  test("pruned range/point reads equal plain filtered reads over " +
      "random data, layouts, and bounds") {
    for (trial <- 1 to 12) {
      val n = 50 + rnd.nextInt(400)
      val domain = 1 + rnd.nextInt(300)
      val nullEvery = 2 + rnd.nextInt(8)
      val rows = (0 until n).map { i =>
        val k = rnd.nextInt(domain).toLong
        (i.toLong, if (i % nullEvery == 0) None else Some(k))
      }
      val df = rows.toDF("id", "k")
      val parts = 1 + rnd.nextInt(8)
      val laid = rnd.nextInt(3) match {
        case 0 => df.repartitionByRange(parts, col("k")) // clustered
        case 1 => df.repartition(parts, col("k")) // hash-scattered
        case 2 => df.repartition(parts, col("id") % 3) // arbitrary
      }
      val dir = Files.createTempDirectory(s"graft-zmf-$trial-").toString
      val man = Files.createTempDirectory(s"graft-zmf-man-$trial-").toString
      laid.write.mode("overwrite").parquet(dir)
      ZoneMaps.build(spark, dir, man, Seq("k"), bloomColumns = Seq("k"))

      for (_ <- 1 to 6) {
        val a = rnd.nextInt(domain + 40) - 20L
        val b = a + rnd.nextInt(domain)
        val expect = rows.collect {
          case (_, Some(k)) if k >= a && k <= b => k
        }.sorted
        val got = ZoneMaps.prunedRead(spark, dir, man, "k", a, b)
          .select("k").as[Long].collect().toSeq.sorted
        assert(got == expect, s"trial $trial range [$a,$b]")

        val p = rnd.nextInt(domain + 40) - 20L
        val expectP = rows.count { case (_, Some(k)) => k == p
          case _ => false }
        assert(ZoneMaps.prunedLookup(spark, dir, man, "k", p).count()
          == expectP, s"trial $trial point $p")
      }
    }
  }
}
