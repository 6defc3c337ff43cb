package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Salted equi-join for skewed keys.
  *
  * AQE's skew-join handles skew at shuffle time for sort-merge joins;
  * salting is the plan-level alternative when one side has a few
  * pathological hot keys (the classic 100 TB failure mode: one key =
  * one straggler task). The left (large, skewed) side gets a random
  * salt in [0, n); the right side is replicated n ways with an
  * exploded salt column; the join key becomes (key, salt), spreading
  * each hot key over n tasks.
  *
  * Replication multiplies the right side n× — use for large-left /
  * modest-right joins, and keep n near the ratio of hottest-key count
  * to average-key count.
  */
object SkewJoin {

  /** Valid joinTypes: inner / left / left_semi / left_anti. Right and
    * full outer are rejected — an unmatched right row fails the
    * (key, salt) join once per salt and would be emitted n times.
    */
  def saltedJoin(left: DataFrame, right: DataFrame, key: String,
      saltBuckets: Int, joinType: String = "inner"): DataFrame = {
    require(saltBuckets > 0, "saltBuckets must be positive")
    val jt = joinType.toLowerCase.replace("outer", "").replace("_", "")
      .trim
    require(Set("inner", "left", "leftsemi", "leftanti", "semi", "anti")
      .contains(jt),
      s"saltedJoin does not support '$joinType': replicated right-side " +
        "rows would duplicate unmatched outer results")
    val salted = left.withColumn("_salt",
      (rand(seed = 42) * saltBuckets).cast("int"))
    val replicated = right.withColumn("_salt",
      explode(sequence(lit(0), lit(saltBuckets - 1))))
    salted.join(replicated, Seq(key, "_salt"), joinType)
      .drop("_salt")
  }
}
