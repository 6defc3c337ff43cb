package graft.ops

/** The compact swap's staging names for a swapped data dir — ONE
  * definition shared by the three maintained indexes' compact swaps
  * ([[TextIndex.compact]], [[AnnIndex.compact]],
  * [[NeardupIndex.compact]]), the build sweeps that must clear them,
  * and the fuzz tear that fabricates the mid-swap crash state. The
  * sweep↔swap pairing is load-bearing: a build sweep whose literals
  * drifted from its compact's staging names would silently re-arm
  * the exact time bomb the delete-data-first ordering defuses (a
  * stale trash healed back over a fresh index's data), with nothing
  * failing until the torn state actually occurred. Specs pin the
  * literal on-disk names independently, so a rename here fails them
  * loudly instead of silently renaming the protocol.
  */
private[graft] object CompactStaging {
  def tmp(base: String): String = base + "._compact_tmp"
  def trash(base: String): String = base + "._compact_trash"

  /** Both staging dirs of `base` — the sweep set. */
  def all(base: String): Seq[String] = Seq(trash(base), tmp(base))
}
