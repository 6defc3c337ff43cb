package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Concatenate-then-cut sequence packing (GPT-style): documents are
  * laid out in `doc_id` order and cut into fixed `ctx`-token context
  * windows; a document belongs to the bin its first token lands in.
  *
  * Packing is an ordered scan by construction, so the running sum is
  * a window — and a window partition is ONE task's sort. Per-source
  * packing therefore straggles when one source dominates the corpus
  * (a crawl-scale reality: one domain can be half the lake). The
  * scale path packs per `(source, shard)` instead: shard count is
  * derived from each source's token total against a `shardTokens`
  * budget, so a window partition holds ~`shardTokens` worth of rows
  * IN EXPECTATION regardless of source skew (hashed assignment makes
  * the bound statistical, not structural — a multinomial tail can
  * load one shard a small factor past the budget; size the budget
  * with that headroom), and every shard packs independently in
  * parallel. Statistically nothing changes — each
  * shard is an arbitrary deterministic subset packed by the same
  * rule, token totals are conserved exactly, and the only artifact is
  * at most one partially-filled tail bin per shard instead of one per
  * source (PackingSpec pins both properties).
  *
  * Cost shape: one narrow per-source aggregate (token totals,
  * broadcast back) + one window keyed `(source, shard)` + whatever
  * narrow per-bin aggregate the caller runs. With the default
  * `shardTokens = Long.MaxValue` the plan is the single-shard
  * original: no totals aggregate, no join, shard pinned to 0.
  */
object Packing {

  /** Assign pack bins to a `(source, doc_id, n_tok)` frame.
    *
    * Shard assignment hashes the doc id (shared md5-prefix recipe,
    * [[graft.functions.KmvSketch.md5Hash60]]) before the modulo: raw
    * `doc_id % n` residues break the per-shard token bound whenever
    * ids share a stride (snowflake ids, pre-sampled subsets) — at
    * gcd(stride, n) = n every row lands in shard 0 and the straggler
    * returns silently. The hash destroys stride structure while
    * staying deterministic and oracle-reproducible.
    *
    * Returns the input columns plus:
    *  - `shard`     — the packing shard within the source (0 when
    *    `shardTokens = Long.MaxValue`);
    *  - `start_tok` — the document's first-token offset within its
    *    `(source, shard)` stream;
    *  - `bin`       — `start_tok div ctx`, integral division (`div`,
    *    not `/`: Column `/` is double division, exact only below
    *    2^53 — a 100 TB source crosses that in tokens).
    *
    * `shard` and `bin` stay LONG: a source past 2^31·ctx tokens has
    * more than Int.MaxValue bins (4.4e12 tokens at ctx 2048 — well
    * inside the documented regime), and an int cast there would wrap
    * silently. Callers wanting ints must cast at their own edge,
    * where their scale bound is known.
    *
    * Bins are LOCAL to a `(source, shard)`: a downstream group-by
    * must key on `(source, shard, bin)` when sharding is active.
    */
  def packBins(docs: DataFrame, ctx: Int,
      shardTokens: Long = Long.MaxValue): DataFrame = {
    require(ctx > 0, s"ctx must be positive, got $ctx")
    require(shardTokens > 0, s"shardTokens must be positive, got $shardTokens")
    val sharded =
      if (shardTokens == Long.MaxValue) docs.withColumn("shard", lit(0L))
      else {
        // nShards = ceil(total / shardTokens) in exact integer
        // arithmetic ((t-1) div s + 1 — the t+s-1 form can overflow)
        val totals = docs.groupBy("source")
          .agg(sum("n_tok").as("_tot"))
          .select(col("source"),
            (expr(s"(_tot - 1) div ${shardTokens}L") + 1).as("_nsh"))
        docs.join(broadcast(totals), "source")
          .withColumn("shard",
            pmod(graft.functions.KmvSketch.md5Hash60(col("doc_id")),
              col("_nsh")))
          .drop("_nsh")
      }
    val w = Window.partitionBy("source", "shard").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    sharded
      .withColumn("start_tok",
        coalesce(sum("n_tok").over(w), lit(0L)))
      .withColumn("bin", expr(s"start_tok div $ctx"))
  }
}
