package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.VectorExpressions

/** Native DotProduct expression: value correctness (vs the interpreted
  * HOF fold), null handling, length mismatch, codegen + interpreted
  * paths.
  */
class VectorExpressionsSpec extends AnyFunSuite {
  lazy val spark: SparkSession = TestSpark.session

  def dotDf = {
    import spark.implicits._
    Seq(
      (1L, Seq(1.0, 2.0, 3.0), Seq(4.0, 5.0, 6.0)),
      (2L, Seq(0.5, -0.5), Seq(2.0, 2.0)),
      (3L, Seq.empty[Double], Seq.empty[Double]))
      .toDF("id", "a", "b")
  }

  test("matches the interpreted fold exactly") {
    VectorExpressions.ensureRegistered(spark)
    val rows = dotDf
      .withColumn("native", VectorExpressions.dotProduct(spark, col("a"), col("b")))
      .withColumn("fold", aggregate(zip_with(col("a"), col("b"),
        (x, y) => x * y), lit(0.0), (acc, x) => acc + x))
      .select("id", "native", "fold").collect().sortBy(_.getLong(0))
    for (r <- rows) assert(r.getDouble(1) == r.getDouble(2), r)
    assert(rows(0).getDouble(1) == 32.0)
    assert(rows(2).getDouble(1) == 0.0)
  }

  test("null input yields null") {
    import spark.implicits._
    val df = Seq((Some(Seq(1.0)), Option.empty[Seq[Double]]))
      .toDF("a", "b")
      .withColumn("d", VectorExpressions.dotProduct(spark, col("a"), col("b")))
    assert(df.select("d").head.isNullAt(0))
  }

  test("length mismatch yields null, not a truncated prefix product") {
    import spark.implicits._
    val df = Seq((Seq(1.0, 2.0, 3.0), Seq(1.0, 2.0)))
      .toDF("a", "b")
      .withColumn("d", VectorExpressions.dotProduct(spark, col("a"), col("b")))
    assert(df.select("d").head.isNullAt(0))
  }

  test("interpreted path (codegen off) agrees") {
    VectorExpressions.ensureRegistered(spark)
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    try {
      val r = dotDf.withColumn("d",
        VectorExpressions.dotProduct(spark, col("a"), col("b")))
        .select("d").collect().map(_.getDouble(0)).sorted
      assert(r.toSeq == Seq(0.0, 0.0, 32.0))
    } finally {
      spark.conf.set("spark.sql.codegen.wholeStage", "true")
      spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
    }
  }

  test("property: int8 codec equals the HOF formulation, saturating out of range") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    import spark.implicits._
    // includes degenerate dims (mn == mx → code 0) and out-of-range
    // values (the kernel CLAMPS to [0,255] — standard saturating
    // quantization; in-contract corpus-learned stats never clamp, so
    // the oracle-checked queries are unaffected)
    val vecGen = Gen.nonEmptyListOf(Gen.oneOf(-1.5, 0.0, 0.25, 1.0, 7.125))
    val caseGen = for {
      e <- vecGen
      lo <- Gen.oneOf(-2.0, 0.0)
      hi <- Gen.oneOf(0.0, 2.0, 8.0)
    } yield (e, List.fill(e.size)(lo), List.fill(e.size)(math.max(lo, hi)))
    val prop = Prop.forAll(caseGen) { case (e, mns, mxs) =>
      val df = Seq((e, mns, mxs)).toDF("e", "mns", "mxs")
      val native = df.select(
        VectorExpressions.quantize(spark, col("e"), col("mns"), col("mxs"))
          .as("q"))
        .select(col("q"), VectorExpressions.dequantize(spark, col("q"),
          typedLit(mns), typedLit(mxs)).as("de"))
        .collect()(0)
      val hofQ = e.zip(mns.zip(mxs)).map { case (x, (mn, mx)) =>
        if (mx == mn) 0
        else math.max(0, math.min(255,
          math.floor((x - mn) * 255.0 / (mx - mn)).toInt))
      }
      val hofDe = hofQ.zip(mns.zip(mxs)).map { case (q, (mn, mx)) =>
        mn + (q + 0.5) * (mx - mn) / 255.0
      }
      native.getSeq[Int](0) == hofQ && native.getSeq[Double](1) == hofDe
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(20), prop)
    assert(res.passed, res.status.toString)
  }

  test("codec null elements and ragged stats yield null elements, not values") {
    VectorExpressions.ensureRegistered(spark)
    // null vector component → null code (never a fabricated -255)
    val q = spark.sql(
      """SELECT graft_quant(array(CAST(NULL AS DOUBLE), 4.0D),
        |  array(2.0D, 2.0D), array(4.0D, 4.0D)) AS q""".stripMargin)
      .collect()(0).getSeq[Any](0)
    assert(q == Seq(null, 255))
    // vector longer than the stats → trailing null elements, like the
    // out-of-bounds element_at the HOF formulation produced
    val r = spark.sql(
      """SELECT graft_quant(array(2.0D, 3.0D), array(2.0D), array(4.0D)) AS q""")
      .collect()(0).getSeq[Any](0)
    assert(r == Seq(0, null))
    // vector SHORTER than the stats (mixed-dimension frame) still codes
    val s = spark.sql(
      """SELECT graft_quant(array(3.0D), array(2.0D, 0.0D),
        |  array(4.0D, 1.0D)) AS q""".stripMargin)
      .collect()(0).getSeq[Any](0)
    assert(s == Seq(127))
  }
}
