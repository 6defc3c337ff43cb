package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.IndexCompaction
import graft.ops.IndexCompaction.CompactStats

/** The pure when-to-compact decision over measured backlog stats —
  * the decision-table discipline of TextIndexSpec's rebuild-advice
  * table applied to the compact advisory all three maintained indexes
  * share. The measured (per-index) halves live in TextIndexSpec /
  * AnnIndexSpec / NeardupIndexSpec; the one-call surface in
  * GraftApiSpec.
  */
class IndexCompactionSpec extends AnyFunSuite {

  test("compactAdvice decision table: fires when the backlog reaches " +
      "the live rows (reads pay >=2x post-compact), never when there " +
      "is nothing to reclaim") {
    // fresh index: nothing dead, nothing to do — however small
    assert(IndexCompaction.compactAdvice(CompactStats(10, 10, 0)).isEmpty)
    assert(IndexCompaction.compactAdvice(CompactStats(0, 0, 0)).isEmpty)
    // backlog below live: the as-laid-out scan pays <2x, stay silent
    assert(IndexCompaction.compactAdvice(CompactStats(10, 6, 1)).isEmpty,
      "backlog 5 < live 6 must be silent")
    // backlog == live: scan = 2x post-compact, the family threshold
    assert(IndexCompaction.compactAdvice(CompactStats(10, 5, 0))
      .contains(5L), "backlog 5 >= live 5 must advise")
    // tombstones alone cross the threshold too — they are read and
    // folded per query even when no data row is dead yet
    assert(IndexCompaction.compactAdvice(CompactStats(10, 6, 6))
      .contains(10L), "backlog 4 dead + 6 tombs >= live 6")
    // a fully-deleted index: live 0, only backlog — compact reclaims
    // everything, advise
    assert(IndexCompaction.compactAdvice(CompactStats(6, 0, 3))
      .contains(9L))
    // an EMPTY index with only tombstones (built empty, deletes
    // recorded): still reclaimable — the tombstone table is scanned
    // and folded by every read
    assert(IndexCompaction.compactAdvice(CompactStats(0, 0, 3))
      .contains(3L))
  }

  test("minReclaimable gates the absolute payoff without touching " +
      "the relative threshold") {
    // the relative 2x threshold fires on a tiny index...
    assert(IndexCompaction.compactAdvice(CompactStats(10, 4, 0))
      .contains(6L))
    // ...but a fleet floor above the backlog silences it
    assert(IndexCompaction.compactAdvice(CompactStats(10, 4, 0),
      minReclaimable = 7L).isEmpty)
    // at the floor exactly, it still fires (>=, like the 2x rule)
    assert(IndexCompaction.compactAdvice(CompactStats(10, 4, 0),
      minReclaimable = 6L).contains(6L))
    // the floor never turns a below-2x backlog INTO advice
    assert(IndexCompaction.compactAdvice(CompactStats(10, 6, 1),
      minReclaimable = 1L).isEmpty)
  }

  test("CompactStats derived fields") {
    val st = CompactStats(rawRows = 10, liveRows = 6, tombstoneRows = 2)
    assert(st.deadRows == 4L)
    assert(st.reclaimableRows == 6L)
    assert(st.deadFraction == 0.4)
    assert(CompactStats(0, 0, 0).deadFraction == 0.0)
  }
}
