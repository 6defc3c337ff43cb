package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.TextHashes

/** Native text-hash kernels, unit-level (q37/q65 exercise them e2e
  * against the DuckDB oracle): the one-pass MinHash signature must
  * equal an independent per-mix recomputation, and the empty/null
  * edges must mirror the oracle's `list_aggregate([], 'min')` = NULL.
  */
class TextHashesSpec extends AnyFunSuite {
  lazy val spark: SparkSession = TestSpark.session

  /** Independent reference: hex-string md5 prefix via BigInt, one mix
    * at a time (the kernel walks digest bytes and all mixes at once).
    */
  private def expectedSig(shingles: Seq[String]): Seq[Long] = {
    def h32(s: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(s.getBytes("UTF-8"))
        .map(b => f"$b%02x").mkString.take(8)
      java.lang.Long.parseLong(hex, 16)
    }
    (0 until TextHashes.MinHashK).map { k =>
      shingles.map(s =>
        (TextHashes.MixA(k) * h32(s) + TextHashes.MixB(k)) % TextHashes.MixP)
        .min
    }
  }

  test("one-pass signature matches per-mix recomputation") {
    import spark.implicits._
    val shingles = Seq("a b c", "b c d", "c d é", "d é f")
    val sig = Seq(shingles).toDF("sh")
      .select(TextHashes.minhashSig(spark, col("sh")).as("sig"))
      .collect()(0).getSeq[Long](0)
    assert(sig == expectedSig(shingles))
  }

  test("mix constants are in the no-overflow ranges") {
    assert(TextHashes.MixA.forall(a => a > 0 && a < (1L << 30) && a % 2 == 1))
    assert(TextHashes.MixB.forall(b => b >= 0 && b < TextHashes.MixP))
    assert(TextHashes.MixA.distinct.length == TextHashes.MinHashK)
  }

  test("empty shingle array yields null (oracle list min of [] parity)") {
    import spark.implicits._
    val out = Seq(Seq.empty[String]).toDF("sh")
      .select(TextHashes.minhashSig(spark, col("sh")).as("sig"))
      .collect()(0)
    assert(out.isNullAt(0))
  }

  test("null elements are skipped (oracle min-ignores-NULL parity)") {
    val out = spark.sql(
      "SELECT array('a b c', CAST(NULL AS STRING), 'b c d') AS sh")
      .select(TextHashes.minhashSig(spark, col("sh")).as("sig"))
      .collect()(0).getSeq[Long](0)
    assert(out == expectedSig(Seq("a b c", "b c d")))
    // all-null array behaves like empty
    val allNull = spark.sql("SELECT array(CAST(NULL AS STRING)) AS sh")
      .select(TextHashes.minhashSig(spark, col("sh")).as("sig"))
      .collect()(0)
    assert(allNull.isNullAt(0))
  }

  test("null input propagates") {
    val out = spark.sql("SELECT CAST(NULL AS ARRAY<STRING>) AS sh")
      .select(TextHashes.minhashSig(spark, col("sh")).as("sig"))
      .collect()(0)
    assert(out.isNullAt(0))
  }
}
