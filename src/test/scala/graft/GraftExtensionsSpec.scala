package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** The SQL-surface function catalog: every graft native function is
  * callable from plain SQL after install(), every shared builder
  * constructs a live expression, and the SparkSessionExtensions
  * injection path consumes the same builder list without error (a
  * second JVM-wide SparkSession can't be built in-suite, so the
  * injection is exercised against a fresh extensions container — the
  * builders are shared objects either way).
  */
class GraftExtensionsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.session

  test("install exposes every native function to plain SQL") {
    GraftExtensions.install(spark)
    // "every": each entry of the shared list resolves in the registry,
    // and the SQL calls below cover the whole list
    GraftExtensions.All.foreach { case (n, _) =>
      assert(spark.sessionState.functionRegistry
        .functionExists(FunctionIdentifier(n)), s"$n not in registry")
    }
    assert(GraftExtensions.All.size == 14) // one SQL call each below
    // int8 codec pair: code 0 for the min, roundtrip lands mid-cell
    val codec = spark.sql(
      """SELECT graft_quant(array(0.0D, 1.0D), array(0.0D, 0.0D),
        |                   array(2.0D, 2.0D)) AS q""".stripMargin)
      .collect()(0).getSeq[Int](0)
    assert(codec == Seq(0, 127))
    val deq = spark.sql(
      """SELECT graft_dequant(array(0, 255), array(0.0D, 0.0D),
        |                     array(2.0D, 2.0D)) AS d""".stripMargin)
      .collect()(0).getSeq[Double](0)
    assert(deq == Seq(0.5 * 2.0 / 255.0, 255.5 * 2.0 / 255.0))
    val grams = spark.sql(
      "SELECT graft_ngrams(array('a', 'b', 'c', 'b', 'c'), 2) AS g")
      .collect()(0).getSeq[String](0)
    assert(grams == Seq("a b", "b c", "c b")) // distinct, first-occurrence order
    val dot = spark.sql(
      "SELECT graft_dot(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d")
      .collect()(0).getDouble(0)
    assert(dot == 11.0)
    // rolling k-gram hashes then window minima over them
    val nWins = spark.sql(
      """SELECT size(graft_winmin(graft_rollhash('abcdefghij', 4), 3)) AS n""")
      .collect()(0).getInt(0)
    assert(nWins > 0)
    val sig = spark.sql(
      "SELECT graft_minhash(array('a b c', 'd e f')) AS s")
      .collect()(0).getSeq[Long](0)
    assert(sig.length == graft.functions.TextHashes.MinHashK)
    // aggregates: KMV distinct estimate and a CMS grid in GROUP BY SQL
    val kmv = spark.sql(
      """SELECT graft_kmv(CAST(conv(substring(md5(CAST(id AS STRING)), 1, 15),
        |  16, 10) AS BIGINT), 256) AS d
        |FROM range(100)""".stripMargin)
      .collect()(0).getDouble(0)
    assert(kmv == 100.0) // below k=256 the sketch is exact
    val grid = spark.sql(
      """SELECT graft_cms(CAST(conv(substring(md5(CAST(id AS STRING)), 1, 8),
        |  16, 10) AS BIGINT) % 64, 64) AS g
        |FROM range(50)""".stripMargin)
      .collect()(0).getSeq[Long](0)
    assert(grid.length == 64 && grid.sum == 50L)
    // bloom: every inserted key passes (no false negatives)
    val misses = spark.sql(
      """SELECT count(*) AS n
        |FROM (SELECT graft_bloom(id, 1024) AS g FROM range(100)) b,
        |     range(100) r
        |WHERE NOT graft_bloom_contains(b.g, r.id)""".stripMargin)
      .collect()(0).getLong(0)
    assert(misses == 0L)
    // KMV state/merge pair: materialized sketches re-merge to the
    // same exact count a single-pass sketch gives below k
    val merged = spark.sql(
      """SELECT graft_kmv_merge(s, 256) AS d FROM (
        |  SELECT graft_kmv_state(CAST(conv(substring(md5(CAST(id AS STRING)),
        |    1, 15), 16, 10) AS BIGINT), 256) AS s
        |  FROM range(100) GROUP BY id % 7)""".stripMargin)
      .collect()(0).getDouble(0)
    assert(merged == 100.0)
    // top-k heap: k survivors, ascending by (priority, id)
    val top = spark.sql(
      """SELECT graft_topk(md5(CAST(id AS STRING)), id, 5) AS t
        |FROM range(100)""".stripMargin)
      .collect()(0).getSeq[org.apache.spark.sql.Row](0)
    assert(top.length == 5)
    assert(top.map(_.getString(0)) == top.map(_.getString(0)).sorted)
  }

  test("every shared builder constructs an expression from literal args") {
    val sampleArgs = Map(
      "graft_dot" -> Seq(
        Literal.create(Seq(1.0, 2.0), ArrayType(DoubleType)),
        Literal.create(Seq(3.0, 4.0), ArrayType(DoubleType))),
      "graft_rollhash" -> Seq(Literal("abcdef"), Literal(3)),
      "graft_winmin" -> Seq(
        Literal.create(Seq(1L, 2L, 3L), ArrayType(LongType)), Literal(2)),
      "graft_minhash" -> Seq(
        Literal.create(Seq("a b"), ArrayType(StringType))),
      "graft_kmv" -> Seq(Literal(1L), Literal(256)),
      "graft_kmv_state" -> Seq(Literal(1L), Literal(256)),
      "graft_kmv_merge" -> Seq(
        Literal.create(Seq(1L, 2L), ArrayType(LongType)), Literal(256)),
      "graft_cms" -> Seq(Literal(1L), Literal(64)),
      "graft_bloom" -> Seq(Literal(1L), Literal(1024)),
      "graft_bloom_contains" -> Seq(
        Literal.create(Seq(0L, 3L), ArrayType(LongType)), Literal(1L)),
      "graft_topk" -> Seq(Literal("a"), Literal(1L), Literal(5)),
      "graft_ngrams" -> Seq(
        Literal.create(Seq("a", "b"), ArrayType(StringType)), Literal(2)),
      "graft_quant" -> Seq(
        Literal.create(Seq(1.0), ArrayType(DoubleType)),
        Literal.create(Seq(0.0), ArrayType(DoubleType)),
        Literal.create(Seq(2.0), ArrayType(DoubleType))),
      "graft_dequant" -> Seq(
        Literal.create(Seq(1), ArrayType(IntegerType)),
        Literal.create(Seq(0.0), ArrayType(DoubleType)),
        Literal.create(Seq(2.0), ArrayType(DoubleType))))
    GraftExtensions.All.foreach { case (n, b) =>
      val args = sampleArgs.getOrElse(n,
        fail(s"no sample args for $n — add them when adding a function"))
      assert(b(args) != null, s"$n builder returned null")
    }
    // the sketch aggregates demand a literal k at build time
    intercept[IllegalArgumentException] {
      GraftExtensions.All.toMap.apply("graft_kmv")(
        Seq(Literal(1L), Literal(1L) /* not an INT literal */ ))
    }
  }

  test("reinstall re-asserts ownership over a post-install foreign rebinding") {
    GraftExtensions.install(spark)
    val reg = spark.sessionState.functionRegistry
    val name = graft.functions.VectorExpressions.Builders.head._1
    // a foreign same-name rebinding AFTER our install: ensure() cannot
    // distinguish it from our own binding and must NOT touch it...
    reg.createOrReplaceTempFunction(name,
      _ => Literal(42), "scala_udf")
    GraftExtensions.install(spark)
    assert(spark.sql(s"SELECT $name(array(1.0D), array(3.0D)) AS d")
      .collect()(0).get(0) == 42)
    // ...reinstall() is the explicit escape hatch that re-binds ours
    GraftExtensions.reinstall(spark)
    assert(spark.sql(s"SELECT $name(array(1.0D), array(3.0D)) AS d")
      .collect()(0).getDouble(0) == 3.0)
  }

  test("the extensions injection path accepts the full builder list") {
    // exercises identifier + ExpressionInfo construction and list
    // assembly the way SparkSession.builder does before session
    // construction (injectFunction only records the tuples; the
    // builders themselves are proven live by the spec above)
    new GraftExtensions().apply(new SparkSessionExtensions)
  }
}
