package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.TopKAgg

/** TopKAgg — the bounded-heap per-key top-k aggregate — must emit
  * exactly what the window formulation (`row_number() <= k` over
  * ORDER BY (priority, id)) emits, for every group, in order. The
  * window IS the oracle here (and q96's DuckDB oracle); the aggregate
  * is the scale path.
  */
class TopKAggSpec extends AnyFunSuite {
  lazy val spark = TestSpark.session
  import spark.implicits._

  private def windowTop(df: org.apache.spark.sql.DataFrame, k: Int) = {
    val w = Window.partitionBy("g").orderBy(col("pr"), col("id"))
    df.withColumn("rk", row_number().over(w)).filter(col("rk") <= k)
      .select("g", "pr", "id").orderBy("g", "pr", "id")
      .collect().toSeq
  }

  private def heapTop(df: org.apache.spark.sql.DataFrame, k: Int) =
    df.groupBy("g")
      .agg(TopKAgg.topk(spark, col("pr"), col("id"), k).as("top"))
      .select(col("g"), explode(col("top")).as("s"))
      .select(col("g"), col("s.pr").as("pr"), col("s.id").as("id"))
      .orderBy("g", "pr", "id")
      .collect().toSeq

  test("matches the window formulation across partitions (merge path)") {
    // 8 partitions forces real partial-heap merges across tasks
    val df = spark.range(0, 1000, 1, 8)
      .select((col("id") % 7).as("g"),
        md5(col("id").cast("string")).as("pr"), col("id"))
    assert(heapTop(df, 13) == windowTop(df, 13))
  }

  test("groups smaller than k keep every row") {
    val df = Seq((1L, "b", 10L), (1L, "a", 11L), (2L, "z", 12L))
      .toDF("g", "pr", "id")
    assert(heapTop(df, 50) == windowTop(df, 50))
    assert(heapTop(df, 50).size == 3)
  }

  test("duplicate priorities break ties by id, exactly once each") {
    val df = Seq((1L, "same", 5L), (1L, "same", 3L), (1L, "same", 4L),
      (1L, "same", 9L)).toDF("g", "pr", "id")
    val got = heapTop(df, 2)
    assert(got.map(r => (r.getString(1), r.getLong(2))) ==
      Seq(("same", 3L), ("same", 4L)))
  }

  test("fully duplicate (priority, id) rows keep their multiplicity") {
    // row_number() ranks duplicate rows separately; the heap must
    // count them, not set-collapse them
    val df = Seq((1L, "a", 1L), (1L, "a", 1L), (1L, "a", 1L),
      (1L, "b", 2L), (1L, "c", 3L)).toDF("g", "pr", "id")
    assert(heapTop(df, 2) == windowTop(df, 2))
    assert(heapTop(df, 2).map(r => (r.getString(1), r.getLong(2))) ==
      Seq(("a", 1L), ("a", 1L)))
    assert(heapTop(df, 4) == windowTop(df, 4))
  }

  test("null priority and null id rows are skipped, not ranked") {
    val df = Seq((1L, Some("a"), Some(1L)), (1L, None, Some(2L)),
      (1L, Some("b"), None)).toDF("g", "pr", "id")
    val got = heapTop(df, 10)
    assert(got.map(_.getLong(2)) == Seq(1L))
  }

  test("serialization roundtrip preserves the heap and multiplicities") {
    val agg = TopKAgg(
      org.apache.spark.sql.catalyst.expressions.Literal("x"),
      org.apache.spark.sql.catalyst.expressions.Literal(1L), 3)
    val buf = agg.createAggregationBuffer()
    Seq(("c", 3L), ("a", 1L), ("a", 1L), ("b", 2L), ("d", 4L)).foreach {
      case (p, i) => buf.add((p.getBytes("UTF-8"), i), 1, 3)
    }
    val back = agg.deserialize(agg.serialize(buf))
    assert(back.m.toSeq.map { case ((b, i), n) =>
      (new String(b, "UTF-8"), i, n)
    } == Seq(("a", 1L, 2), ("b", 2L, 1)))
  }

  test("property: heap equals window for random data, k, and duplicates") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    // pure-buffer property (no Spark jobs per case): feeding rows
    // through two buffers merged in a random split order must equal
    // the sorted-take of the full multiset — the window semantics
    val rowGen = for {
      p <- Gen.oneOf("a", "b", "aa", "ab", "é", "z", "")
      i <- Gen.choose(0L, 5L)
    } yield (p, i)
    val caseGen = for {
      rows <- Gen.listOf(rowGen)
      k <- Gen.choose(1, 8)
      split <- Gen.choose(0, math.max(rows.size, 1))
    } yield (rows, k, split)
    val prop = Prop.forAll(caseGen) { case (rows, k, split) =>
      val agg = TopKAgg(
        org.apache.spark.sql.catalyst.expressions.Literal("x"),
        org.apache.spark.sql.catalyst.expressions.Literal(1L), k)
      val (l, r) = rows.splitAt(split)
      def load(part: Seq[(String, Long)]) = {
        val b = agg.createAggregationBuffer()
        part.foreach { case (p, i) => b.add((p.getBytes("UTF-8"), i), 1, k) }
        b
      }
      val merged = agg.merge(load(l), agg.deserialize(agg.serialize(load(r))))
      val got = merged.m.toSeq.flatMap { case ((b, i), n) =>
        Seq.fill(n)((new String(b, "UTF-8"), i))
      }
      // oracle must sort in the aggregate's declared order — UTF-8
      // binary bytes — not Java String order (they diverge on
      // supplementary chars, see the dedicated test below)
      val want = rows.sortWith { (a, b) =>
        TopKAgg.KeyOrd.compare(
          (a._1.getBytes("UTF-8"), a._2), (b._1.getBytes("UTF-8"), b._2)) < 0
      }.take(k)
      got == want
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(300), prop)
    assert(res.passed, res.status.toString)
  }

  test("binary UTF-8 priority order, not Java String order") {
    // U+1F600 (surrogate pair in UTF-16) sorts AFTER U+E000 in UTF-8
    // binary / code-point order, but BEFORE it in Java String order —
    // the heap must agree with ORDER BY, i.e. with the window
    val df = Seq((1L, "😀", 1L), (1L, "", 2L))
      .toDF("g", "pr", "id")
    assert(heapTop(df, 1) == windowTop(df, 1))
    assert(heapTop(df, 1).map(_.getLong(2)) == Seq(2L))
  }
}
