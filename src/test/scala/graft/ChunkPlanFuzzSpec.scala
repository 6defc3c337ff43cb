package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.JdbcSnapshot.ChunkPlan

/** Generative coverage for the resumable-snapshot range math
  * (`JdbcSnapshot.ChunkPlan.range`) — the one place BigInt arithmetic
  * guards Long extremes. The partition contract, for ANY bounds
  * (including Long.MinValue / Long.MaxValue) and any chunk count:
  * the non-empty ranges, in order, tile [lo, hi] exactly — first
  * starts at lo, last ends at hi, consecutive ranges adjoin, nothing
  * overlaps, nothing is skipped. Each key is snapshotted once: a gap
  * loses rows, an overlap duplicates them, and both are invisible at
  * test scale unless the math is checked directly.
  */
class ChunkPlanFuzzSpec extends AnyFunSuite {
  import org.scalacheck.{Gen, Prop, Test => SCTest}

  private def passes(p: Prop, min: Int = 500): Unit =
    assert(SCTest.check(SCTest.Parameters.default
      .withMinSuccessfulTests(min), p).passed)

  private val bounds: Gen[(Long, Long)] = for {
    lo <- Gen.oneOf(Gen.chooseNum(Long.MinValue, Long.MaxValue),
      Gen.chooseNum(-2000L, 2000L),
      Gen.oneOf(Long.MinValue, Long.MaxValue - 5, -1L, 0L, 1L))
    hi <- Gen.oneOf(Gen.chooseNum(lo, Long.MaxValue),
      Gen.chooseNum(lo, (BigInt(lo) + 4000)
        .min(BigInt(Long.MaxValue)).toLong),
      Gen.const(Long.MaxValue))
  } yield (lo, hi)

  test("ranges tile [lo, hi] exactly: no gap, no overlap, ends exact") {
    passes(Prop.forAll(bounds, Gen.chooseNum(1, 64)) {
      case ((lo, hi), chunks) =>
        val p = ChunkPlan("k", "c", chunks, lo, hi)
        val rs = (0 until chunks).map(p.range).filter { case (a, b) => a <= b }
        val first = rs.head._1 == lo
        val last = rs.last._2 == hi
        val adjoin = rs.sliding(2).forall {
          case Seq((_, b1), (a2, _)) => BigInt(a2) == BigInt(b1) + 1
          case _ => true
        }
        val ordered = rs.forall { case (a, b) => a <= b }
        first && last && adjoin && ordered
    })
  }

  test("a key at Long.MaxValue lands in exactly one chunk") {
    passes(Prop.forAll(Gen.chooseNum(1, 64),
      Gen.chooseNum(Long.MaxValue - 100000, Long.MaxValue)) { (chunks, lo) =>
      val p = ChunkPlan("k", "c", chunks, lo, Long.MaxValue)
      val containing = (0 until chunks).map(p.range)
        .count { case (a, b) => a <= Long.MaxValue && Long.MaxValue <= b }
      containing == 1
    }, min = 200)
  }

  test("empty trailing chunks (span < chunks) are empty, never re-read") {
    passes(Prop.forAll(Gen.chooseNum(-100L, 100L), Gen.chooseNum(2, 64)) {
      (lo, chunks) =>
        // span 1..chunks-1 so at least one trailing chunk is empty
        val span = 1 + math.abs(lo % (chunks - 1)).toInt
        val p = ChunkPlan("k", "c", chunks, lo, lo + span - 1)
        val rs = (0 until chunks).map(p.range)
        val nonEmpty = rs.filter { case (a, b) => a <= b }
        val keys = nonEmpty.flatMap { case (a, b) => a to b }
        keys == (lo until lo + span) // each key exactly once, in order
    }, min = 200)
  }
}
