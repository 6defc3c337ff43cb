package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.KmvSketch

/** KMV distinct sketch: exact below k, estimator accuracy above k,
  * determinism across partitionings (the merge/serialize path), and
  * duplicate insensitivity.
  */
class KmvSketchSpec extends AnyFunSuite {
  lazy val spark: SparkSession = TestSpark.session

  private def hashed(n: Int, parts: Int) = {
    import spark.implicits._
    (1 to n).map(i => (i % 7, i)).toDF("g", "v")
      .repartition(parts)
      .select(col("g"),
        conv(substring(md5(col("v").cast("string")), 1, 15), 16, 10)
          .cast("long").as("hv"))
  }

  test("exact count when distinct values < k") {
    val out = hashed(100, 4)
      .groupBy("g").agg(KmvSketch.kmvDistinct(spark, col("hv"), 256).as("d"))
      .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
    // 100 values over 7 groups: 15 in groups 1-2, 14 in 0,3-6 — exact.
    assert(out(1) == 15.0 && out(0) == 14.0)
  }

  test("estimates within 2/sqrt(k) above k; duplicates ignored") {
    import spark.implicits._
    val base = hashed(20000, 8)
    val withDups = base.union(base) // sketch is set-based
    for (df <- Seq(base, withDups)) {
      val out = df.groupBy("g")
        .agg(KmvSketch.kmvDistinct(spark, col("hv"), 256).as("d"))
        .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
      for ((g, est) <- out) {
        val exact = 20000 / 7 + (if (g >= 1 && g <= 6) 1 else 0)
        assert(math.abs(est - exact) / exact < 2.0 / math.sqrt(256),
          s"group $g: est $est vs exact $exact")
      }
    }
  }

  test("identical result for 1 vs 32 partitions (merge path)") {
    def run(parts: Int) = hashed(5000, parts)
      .groupBy("g").agg(KmvSketch.kmvDistinct(spark, col("hv"), 64).as("d"))
      .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
    assert(run(1) == run(32))
  }

  test("merge refuses sketches built with a larger k — under-merging " +
      "would silently corrupt the estimate") {
    // materialize k=16 sketches, then merge claiming k=8
    val states = hashed(5000, 4)
      .groupBy("g").agg(KmvSketch.kmvState(spark, col("hv"), 16).as("s"))
    val e = intercept[Exception] {
      states.agg(KmvSketch.kmvMergeEstimate(spark, col("s"), 8)).collect()
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil
      else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(e).exists(_.contains("built with a larger k")),
      messages(e).mkString(" | "))
    // a SMALLER stored sketch is legal (an exact small set) — which
    // is exactly why the guard is ONE-directional: a state built with
    // k=8 merged under k=16 looks like this legal case (the 8th-16th
    // minimums simply were never stored) and silently underestimates;
    // only the over-k direction is structurally detectable. Changing
    // k means rebuilding the states (detach/re-attach a rollup).
    val ok = states.agg(
      KmvSketch.kmvMergeEstimate(spark, col("s"), 32).as("d"))
      .collect()(0).getDouble(0)
    assert(ok > 0)
  }
}
