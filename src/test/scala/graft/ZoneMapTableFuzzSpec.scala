package graft

import java.nio.file.Files

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{ZoneMapTable, ZoneMaps}

/** Generative coverage for the PLANNER-integrated zone maps: random
  * data, random layouts, random NULL stripes, and random predicate
  * TREES (comparisons, equality, In, null tests, unsupported shapes,
  * And/Or composition to depth 2) — `ZoneMapTable(...).filter(p)`
  * must return exactly the rows the plain parquet read does. This is
  * the soundness net for the Catalyst-filter → manifest-verdict
  * translation: an unsound verdict (a file skipped that held a
  * matching row) surfaces here as a lost row; the unit spec's
  * hand-built filters can't cover the predicate space.
  */
class ZoneMapTableFuzzSpec extends AnyFunSuite {
  lazy val spark = TestSpark.session
  import spark.implicits._

  private val rnd = new scala.util.Random(0x2afe)

  /** A random predicate tree over columns k (long, nullable) and
    * s (string). Leaves mix translatable and untranslatable shapes.
    */
  private def randomPred(depth: Int, domain: Int): Column = {
    def leaf(): Column = rnd.nextInt(9) match {
      case 0 =>
        val a = rnd.nextInt(domain + 20) - 10
        col("k").between(a, a + rnd.nextInt(domain))
      case 1 => col("k") === rnd.nextInt(domain + 10).toLong
      case 2 => col("k") > rnd.nextInt(domain).toLong
      case 3 => col("k") <= rnd.nextInt(domain).toLong
      case 4 => col("k").isin(
        Seq.fill(1 + rnd.nextInt(5))(rnd.nextInt(domain + 10).toLong): _*)
      case 5 => col("k").isNull
      case 6 => col("k").isNotNull
      case 7 =>
        val a = f"v${rnd.nextInt(domain)}%04d"
        col("s") >= a && col("s") < f"v${rnd.nextInt(domain)}%04d"
      case _ => col("s").endsWith(rnd.nextInt(10).toString) // unsupported
    }
    if (depth == 0) leaf()
    else rnd.nextInt(3) match {
      case 0 => randomPred(depth - 1, domain) && randomPred(depth - 1, domain)
      case 1 => randomPred(depth - 1, domain) || randomPred(depth - 1, domain)
      case _ => leaf()
    }
  }

  private def rowsOf(df: DataFrame): Set[Seq[Any]] =
    df.collect().map(_.toSeq).toSet

  test("ZoneMapTable answers random predicate trees exactly like the " +
      "plain read, over random data and layouts") {
    for (trial <- 1 to 8) {
      val n = 80 + rnd.nextInt(400)
      val domain = 20 + rnd.nextInt(200)
      val nullEvery = 2 + rnd.nextInt(9)
      val rows = (0 until n).map { i =>
        val k = rnd.nextInt(domain).toLong
        (i.toLong,
          if (i % nullEvery == 0) None else Some(k),
          f"v${rnd.nextInt(domain)}%04d")
      }
      val df = rows.toDF("id", "k", "s")
      val parts = 1 + rnd.nextInt(8)
      val laid = rnd.nextInt(3) match {
        case 0 => df.repartitionByRange(parts, col("k"))
        case 1 => df.repartition(parts, col("k"))
        case 2 => df.repartitionByRange(parts, col("s"))
      }
      val dir = Files.createTempDirectory(s"graft-zmtf-$trial-").toString
      val man = Files.createTempDirectory(s"graft-zmtf-m-$trial-").toString
      laid.write.mode("overwrite").parquet(dir)
      // bloom on k half the time — both equality paths must be sound
      ZoneMaps.build(spark, dir, man, Seq("k", "s"),
        bloomColumns = if (trial % 2 == 0) Seq("k") else Nil)
      val zm = ZoneMapTable(spark, dir, man)
      val plain = spark.read.parquet(dir)

      for (q <- 1 to 8) {
        val pred = randomPred(depth = 2, domain)
        val got = rowsOf(zm.filter(pred))
        val want = rowsOf(plain.filter(pred))
        assert(got == want,
          s"trial $trial query $q diverged for $pred: " +
            s"${got.size} vs ${want.size} rows " +
            s"(missing=${(want -- got).take(3)}, " +
            s"phantom=${(got -- want).take(3)})")
      }
    }
  }
}
