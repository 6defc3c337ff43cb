package graft.examples

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.api.Graft

/** The facade, end to end, on a CALLER-supplied frame — the runnable
  * form of README's "using the library" walkthrough (executed by
  * GraftExampleSpec, so the documented chain can never drift from
  * the code): near-dup candidates → duplicate clusters → drop
  * non-canonical members → benchmark decontamination → token counts
  * → sequence packing. Returns the packed frame; callers typically
  * finish with `Graft.writeBucketed(packed, ...)` keyed however the
  * training loader joins (the spec does exactly that).
  *
  * Every step delegates to the same kernels the oracle-checked
  * queries run (q37/q38 banding, q59 clustering, q74
  * decontamination, q101/q110 packing), so the chain inherits their
  * scale shapes: banding shuffles (band, bucket) pairs, clustering
  * is bounded-round label propagation, the benchmark gram set
  * broadcasts only while provably small, packing windows per
  * (source, shard) under the token budget.
  */
object CorpusPipeline {

  /** @param docs      `(doc_id BIGINT, source STRING, text STRING)`
    * @param benchmark `(doc_id BIGINT, text STRING)` — the held-out
    *                  eval suite to decontaminate against
    * @param ctx       pack window (tokens)
    * @param gramN     contamination n-gram width
    * @param shardTokens per-(source, shard) token budget for packing
    * @return `(source, doc_id, n_tok, shard, start_tok, bin)`
    */
  def cleanAndPack(spark: SparkSession, docs: DataFrame,
      benchmark: DataFrame, ctx: Int, gramN: Int = 8,
      shardTokens: Long = Long.MaxValue): DataFrame = {
    // 1. near-duplicate candidate pairs (MinHash → LSH band buckets)
    val candidates = Graft.nearDupCandidates(spark, docs)
    // 2. collapse candidates to clusters; keep each cluster's
    //    canonical (minimum) member, drop the rest
    val dupDoomed = Graft.dupClusters(candidates)
      .filter(col("doc_id") =!= col("cluster")).select("doc_id")
    val deduped = docs.join(dupDoomed, Seq("doc_id"), "left_anti")
    // 3. drop training docs sharing any gramN-gram with the benchmark
    val contaminated = Graft.decontaminate(deduped, benchmark, gramN)
      .filter(col("contaminated")).select("doc_id")
    val clean = deduped.join(contaminated, Seq("doc_id"), "left_anti")
    // 4. token counts (the library's shared tokenization rule — NOT a
    //    local re-spelling, which would drift on padding/case) →
    //    budget-sharded packing
    val counted = clean.select(col("source"), col("doc_id"),
      size(graft.queries.TextQueries.toks(col("text")))
        .cast("long").as("n_tok"))
    Graft.packBins(counted, ctx, shardTokens)
  }
}
