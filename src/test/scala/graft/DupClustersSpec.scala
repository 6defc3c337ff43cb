package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.DupClusters

/** Min-label connected components over duplicate pairs. */
class DupClustersSpec extends AnyFunSuite {
  lazy val spark: SparkSession = TestSpark.session

  test("chains, triangles, and singleton pairs get min labels") {
    import spark.implicits._
    val pairs = Seq(
      (2L, 1L), (2L, 3L), (3L, 4L), // chain 1-2-3-4 → cluster 1
      (10L, 11L), (11L, 10L),       // pair (+ reverse dup) → cluster 10
      (20L, 21L), (21L, 22L), (20L, 22L)) // triangle → cluster 20
      .toDF("d1", "d2")
    val got = DupClusters.clusters(pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 20L -> 20L, 21L -> 20L, 22L -> 20L))
  }

  test("long chain converges within iteration budget") {
    import spark.implicits._
    val pairs = (1L until 12L).map(i => (i, i + 1)).toDF("d1", "d2")
    val got = DupClusters.clusters(pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.values.toSet == Set(1L))
    assert(got.size == 12)
  }
}
