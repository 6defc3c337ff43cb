package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.queries.TextQueries

/** Production-depth BPE training: the q107 merge loop is unrolled 3
  * steps for the oracle, but the SCALE.md claim is that a 50k-merge
  * run is the same loop. This spec backs that claim at depth 50:
  *
  *  1. every merge (pair, count) matches a pure-Scala reference BPE
  *     (greedy-leftmost fuse, count-desc/pair-asc argmax) step for
  *     step — the two-replace-pass regex trick stays exact at depth;
  *  2. storage is bounded: after the loop every vocabulary frame the
  *     loop persisted has been unpersisted (persisted-RDD set delta
  *     returns to zero), so cached copies cannot accumulate with
  *     merge count;
  *  3. the loop self-terminates when the vocabulary fully fuses
  *     (asking for more merges than exist stops early, no crash).
  */
class BpeDeepMergeSpec extends AnyFunSuite {
  lazy val spark: SparkSession = TestSpark.session

  /** Deterministic vocabulary: 60 distinct pseudo-random words.
    * Each merge step mints exactly one new symbol type and the final
    * state has one distinct symbol per distinct word, so ≥60 merge
    * steps exist — depth 50 can never exhaust it.
    */
  private def vocab: Seq[(String, Long)] = {
    val rnd = new scala.util.Random(42)
    val letters = "abcdefgh"
    (0 until 60).map { _ =>
      val len = 8 + rnd.nextInt(5)
      val w = Seq.fill(len)(letters(rnd.nextInt(letters.length))).mkString
      (w, 1L + rnd.nextInt(9))
    }.distinct
  }

  /** Reference BPE on a (word → freq) map: symbols as vectors, pair
    * counts weighted by freq, argmax by (count desc, "a b" asc —
    * ASCII, so Java order equals the engine's UTF-8 binary order),
    * greedy leftmost non-overlapping fuse.
    */
  private def refBpe(words: Seq[(String, Long)],
      steps: Int): Seq[(String, Long)] = {
    def fuse(s: Vector[String], p: (String, String)): Vector[String] = {
      val out = Vector.newBuilder[String]
      var i = 0
      while (i < s.length) {
        if (i < s.length - 1 && s(i) == p._1 && s(i + 1) == p._2) {
          out += s(i) + s(i + 1); i += 2
        } else { out += s(i); i += 1 }
      }
      out.result()
    }
    var syms = words.map { case (w, f) => (w.map(_.toString).toVector, f) }
    val out = scala.collection.mutable.ArrayBuffer.empty[(String, Long)]
    var step = 0
    while (step < steps) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      for ((s, f) <- syms; i <- 0 until s.length - 1)
        counts((s(i), s(i + 1))) = counts.getOrElse((s(i), s(i + 1)), 0L) + f
      if (counts.isEmpty) step = steps
      else {
        val (pair, c) = counts.toSeq.minBy { case ((a, b), n) =>
          (-n, a + " " + b)
        }
        syms = syms.map { case (s, f) => (fuse(s, pair), f) }
        out += ((pair._1 + " " + pair._2, c))
        step += 1
      }
    }
    out.toSeq
  }

  private def wordsDf(v: Seq[(String, Long)]) = {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    v.toDF("word", "freq")
      .select(concat(lit(" "),
        regexp_replace(col("word"), "(.)", "$1 ")).as("s"), col("freq"))
  }

  test("50 merges match the reference BPE and leak no cached frames") {
    val v = vocab
    assert(v.size == 60, "fixture words must be distinct")
    val expected = refBpe(v, 50)
    assert(expected.size == 50, "vocabulary must support depth 50")
    val before = spark.sparkContext.getPersistentRDDs.keySet
    val got = TextQueries.bpeMerges(wordsDf(v), 50)
    val after = spark.sparkContext.getPersistentRDDs.keySet
    assert((after -- before).isEmpty,
      s"merge loop leaked persisted RDDs: ${after -- before}")
    assert(got.size == 50)
    assert(got.map(m => (m._2, m._4)) == expected,
      "distributed merges diverged from reference BPE")
  }

  test("loop stops early when the vocabulary fully fuses") {
    val tiny = Seq(("ab", 3L), ("ba", 2L))
    // 'ab' and 'ba' fully fuse after at most 2 merges each → ≤2 steps
    val got = TextQueries.bpeMerges(wordsDf(tiny), 100)
    assert(got.size < 100 && got.nonEmpty)
    assert(got.map(_._1) == (1 to got.size))
  }
}
