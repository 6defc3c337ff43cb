package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components over near-duplicate pairs: groups LSH/Jaccard
  * pair output into duplicate clusters labeled by their minimum
  * member id (the canonical document a dedup pass keeps).
  *
  * Distributed min-label propagation: each iteration joins labels
  * across edges and keeps the per-node minimum; converges in
  * O(component diameter) iterations — near-dup clusters are shallow
  * (diameter ≤ 3 in practice), so this is a handful of shuffles, each
  * keyed by node id. No driver-side graph state: scales to pair sets
  * that don't fit one machine.
  */
object DupClusters {

  /** @param pairs two columns (d1, d2), one row per duplicate pair
    * @return (doc_id, cluster) for every doc appearing in a pair
    */
  def clusters(pairs: DataFrame, maxIter: Int = 20): DataFrame = {
    val d1 = pairs.columns(0)
    val d2 = pairs.columns(1)
    // localCheckpoint (not persist): iterative plans nest the prior
    // iteration's plan — lineage grows exponentially and the driver
    // OOMs building plan strings by ~iteration 10. Checkpointing
    // truncates the logical plan each round. LAZY (eager = false):
    // the labelSum action below materializes the checkpoint AND
    // computes the convergence aggregate in the SAME job — an eager
    // checkpoint cost one extra driver-scheduled job per round, which
    // at small scale was most of the operator's wall time (it runs
    // inside q59/q67/q89/q102/q108). labelSum scans every partition,
    // so the lazy-checkpoint caveat (an action that skips partitions
    // loses them) cannot bite.
    val edges = pairs.select(col(d1).as("a"), col(d2).as("b"))
      .union(pairs.select(col(d2).as("a"), col(d1).as("b")))
      .distinct()
      .localCheckpoint(false)
    var labels = edges.select(col("a").as("id")).distinct()
      .withColumn("label", col("id"))
      .localCheckpoint(false)
    // Labels only ever DECREASE (per-node min over a fixed edge set),
    // so "no node changed" ⟺ "the label sum is unchanged" — a cheap
    // scan-aggregate on the already-checkpointed frame instead of a
    // self-join per iteration (one less shuffle per round; the join
    // version dominated first-run cost via extra codegen + stages).
    // decimal(38,0): an id-sum over billions of 64-bit ids must not
    // wrap, or a wrap collision could mask a real change.
    def labelSum(df: DataFrame): java.math.BigDecimal = Option(df
      .agg(sum(col("label").cast("decimal(38,0)"))).collect()(0)
      .getDecimal(0)).getOrElse(java.math.BigDecimal.ZERO) // empty → 0
    var prevSum = labelSum(labels)
    var iter = 0
    var converged = false
    while (!converged && iter < maxIter) {
      // neighbor labels ∪ own label → per-node min
      val next = edges
        .join(labels.withColumnRenamed("id", "b_id"),
          col("b") === col("b_id"))
        .select(col("a").as("id"), col("label"))
        .union(labels)
        .groupBy("id").agg(min("label").as("label"))
        .localCheckpoint(false)
      val nextSum = labelSum(next) // materializes the checkpoint too
      labels = next
      converged = nextSum.compareTo(prevSum) == 0
      prevSum = nextSum
      iter += 1
    }
    labels.select(col("id").as("doc_id"), col("label").as("cluster"))
  }
}
