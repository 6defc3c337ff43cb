package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.CmsSketch

/** Count-min sketch grid: cell sums match exact per-cell counts, the
  * estimate never undercounts, and the grid is identical across
  * partitionings (the merge/serialize path — cellwise sums are
  * order-independent).
  */
class CmsSketchSpec extends AnyFunSuite {
  lazy val spark: SparkSession = TestSpark.session

  private def keyed(n: Int, parts: Int) = {
    import spark.implicits._
    (1 to n).map(i => i % 97).toDF("k").repartition(parts)
      .select(col("k"),
        CmsSketch.cellIndex(0, col("k")).as("c0"),
        CmsSketch.cellIndex(1, col("k")).as("c1"))
  }

  private def grid(parts: Int): Seq[Long] = {
    val row = keyed(5000, parts)
      .agg(CmsSketch.sketch(spark, Seq(col("c0"), col("c1"))).as("sk"))
      .collect()(0)
    row.getSeq[Long](0)
  }

  test("grid total per depth row equals the input row count") {
    val g = grid(4)
    assert(g.length == CmsSketch.Depth * CmsSketch.Width)
    assert(g.take(CmsSketch.Width).sum == 5000L)
    assert(g.drop(CmsSketch.Width).sum == 5000L)
  }

  test("identical grid for 1 vs 32 partitions (merge path)") {
    assert(grid(1) == grid(32))
  }

  test("estimate = min over cells never undercounts any key") {
    val g = grid(8)
    val exact = (1 to 5000).groupBy(_ % 97).map { case (k, v) => k -> v.size }
    val cells = keyed(5000, 8).select("k", "c0", "c1").distinct()
      .collect().map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2))).toMap
    for ((k, ex) <- exact) {
      val (c0, c1) = cells(k)
      val est = math.min(g(c0.toInt), g(CmsSketch.Width + c1.toInt))
      assert(est >= ex, s"key $k: est $est < exact $ex")
    }
  }
}
