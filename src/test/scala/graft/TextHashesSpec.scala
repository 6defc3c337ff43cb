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

  test("property: native n-grams equal the HOF expression formulation") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    import spark.implicits._
    TextHashes.ensureRegistered(spark)
    // includes repeated tokens (distinct-order coverage), arrays
    // shorter than n (the empty guard), and NULL tokens (concat_ws
    // skip parity between the kernel and the HOF)
    val caseGen = for {
      toks <- Gen.listOf(Gen.frequency(
        8 -> Gen.oneOf("a", "b", "cc", "d", "a").map(Option(_)),
        1 -> Gen.const(Option.empty[String])))
      n <- Gen.choose(2, 4)
    } yield (toks, n)
    val prop = Prop.forAll(caseGen) { case (toks, n) =>
      val df = Seq(toks).toDF("t")
      val native = df.select(call_function("graft_ngrams", col("t"), lit(n)))
        .collect()(0).getSeq[String](0)
      val hof = df.select(array_distinct(
        when(size(col("t")) < n, array().cast("array<string>"))
          .otherwise(transform(sequence(lit(1), size(col("t")) - (n - 1)),
            i => concat_ws(" ",
              (0 until n).map(j => element_at(col("t"), i + j)): _*)))))
        .collect()(0).getSeq[String](0)
      native == hof
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(25), prop)
    assert(res.passed, res.status.toString)
  }

  test("property: rolling windows equal direct per-window polynomial hashes") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    // codepoints incl. beyond-BMP: the kernel rolls over CODEPOINTS,
    // not UTF-16 chars — an emoji must be one symbol, not two
    val cpGen = Gen.frequency(
      8 -> Gen.choose('a'.toInt, 'z'.toInt),
      2 -> Gen.oneOf(0xE9, 0x4E2D, 0x1F600))
    val caseGen = for {
      cps <- Gen.listOf(cpGen)
      k <- Gen.choose(1, 6)
    } yield (cps, k)
    def naive(cps: Seq[Int], k: Int): Seq[Long] =
      (0 to cps.length - k).map { i =>
        cps.slice(i, i + k).foldLeft(0L)(_ * TextHashes.Base + _)
      }
    val prop = Prop.forAll(caseGen) { case (cps, k) =>
      val s = org.apache.spark.unsafe.types.UTF8String.fromString(
        new String(cps.flatMap(Character.toChars(_).toSeq).toArray))
      val got = TextHashes.rollingWindows(s, k)
      (0 until got.numElements()).map(got.getLong) == naive(cps, k)
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), prop)
    assert(res.passed, res.status.toString)
  }

  test("property: window minima equal naive sliding minimum") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    val caseGen = for {
      hs <- Gen.listOf(Gen.choose(Long.MinValue / 2, Long.MaxValue / 2))
      w <- Gen.choose(1, 5)
    } yield (hs, w)
    val prop = Prop.forAll(caseGen) { case (hs, w) =>
      val got = TextHashes.windowMins(
        org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(hs.toArray), w)
      val want = hs.sliding(w).filter(_.size == w).map(_.min).toSeq
      (0 until got.numElements()).map(got.getLong) == want
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), prop)
    assert(res.passed, res.status.toString)
  }

  test("property: one-pass signature equals the reference for random shingles") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    import spark.implicits._
    val shingleGen = Gen.nonEmptyListOf(
      Gen.nonEmptyListOf(Gen.alphaNumChar).map(_.mkString))
    val prop = Prop.forAll(shingleGen) { shingles =>
      val sig = Seq(shingles).toDF("sh")
        .select(TextHashes.minhashSig(spark, col("sh")).as("sig"))
        .collect()(0).getSeq[Long](0)
      sig == expectedSig(shingles)
    }
    // Spark job per case — keep the count modest
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(20), prop)
    assert(res.passed, res.status.toString)
  }
}
