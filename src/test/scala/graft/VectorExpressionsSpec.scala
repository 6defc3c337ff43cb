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
}
