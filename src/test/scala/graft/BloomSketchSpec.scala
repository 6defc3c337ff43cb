package graft

import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.functions.{col, not}
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.BloomSketch

/** The Bloom bitset's load-bearing guarantees: zero false negatives
  * (what makes the q93 prune lossless), partition-order independence
  * (what makes it oracle-reproducible), bounded false positives at
  * the design load, and partial serde across the shuffle.
  */
class BloomSketchSpec extends AnyFunSuite {
  lazy val spark = TestSpark.session

  private def hashes(n: Int, seed: Long): Seq[Long] =
    (1 to n).map(i => ((i + seed) * 982451653L) & ((1L << 60) - 1))

  test("no false negatives, under any partitioning") {
    import spark.implicits._
    val keys = hashes(500, 0)
    for (parts <- Seq(1, 7)) {
      val grid = keys.toDF("v").repartition(parts)
        .agg(BloomSketch.bloom(spark, col("v"), 4096).as("g"))
      val missed = grid.crossJoin(keys.toDF("v"))
        .filter(not(BloomSketch.contains(spark, col("g"), col("v"))))
        .count()
      assert(missed == 0, s"false negatives with $parts partitions")
    }
  }

  test("bitset identical regardless of partitioning (pure bitwise OR)") {
    import spark.implicits._
    val keys = hashes(300, 17)
    val grids = Seq(1, 5).map { parts =>
      keys.toDF("v").repartition(parts)
        .agg(BloomSketch.bloom(spark, col("v"), 2048).as("g"))
        .collect()(0).getSeq[Long](0)
    }
    assert(grids(0) == grids(1))
  }

  test("false-positive rate stays near the design point") {
    import spark.implicits._
    // n=3000 keys in m=32768 bits, k=4: (1-e^{-kn/m})^4 ≈ 0.9% —
    // assert under 2× design so hash-quality regressions surface
    val inserted = hashes(3000, 1000000)
    val grid = inserted.toDF("v")
      .agg(BloomSketch.bloom(spark, col("v"), 32768).as("g"))
    val probes = hashes(30000, 9000000).filterNot(inserted.toSet)
    val fp = grid.crossJoin(probes.toDF("v"))
      .filter(BloomSketch.contains(spark, col("g"), col("v"))).count()
    assert(fp.toDouble / probes.size < 0.02, s"fp=$fp / ${probes.size}")
  }

  test("partial buffers round-trip through serialize/deserialize") {
    val agg = functions.BloomSketch(Literal(0L), 128)
    val buf = Array.fill(2)(scala.util.Random.nextLong())
    assert(agg.deserialize(agg.serialize(buf)).sameElements(buf))
  }
}
