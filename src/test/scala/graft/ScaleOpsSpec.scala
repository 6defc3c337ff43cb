package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.SkewJoin

/** Scale-engineering operators: salted skew join equivalence, and
  * bucketed co-located joins that avoid the shuffle entirely.
  */
class ScaleOpsSpec extends AnyFunSuite {
  lazy val spark: SparkSession = TestSpark.session

  test("salted join returns exactly the plain join's rows under skew") {
    import spark.implicits._
    // one hot key (99% of rows) + long tail
    val left = ((1 to 2000).map(_ => (1L, "hot")) ++
      (2 to 50).map(k => (k.toLong, s"t$k"))).toDF("k", "lv")
    val right = (1 to 50).map(k => (k.toLong, s"r$k")).toDF("k", "rv")
    val plain = left.join(right, Seq("k")).groupBy("k").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val salted = SkewJoin.saltedJoin(left, right, "k", saltBuckets = 8)
      .groupBy("k").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(salted == plain)
    assert(salted(1L) == 2000L)
  }

  test("salted left join preserves unmatched left rows") {
    import spark.implicits._
    val left = Seq((1L, "a"), (99L, "nomatch")).toDF("k", "lv")
    val right = Seq((1L, "r")).toDF("k", "rv")
    val rows = SkewJoin.saltedJoin(left, right, "k", 4, "left")
      .collect()
    assert(rows.length == 2)
    assert(rows.find(_.getLong(0) == 99L).get.isNullAt(2)) // rv is null
  }

  test("bucketed tables co-locate the join: no shuffle exchange") {
    // warehouse.dir is a static conf — tables land in the default
    // ./spark-warehouse and are dropped afterwards
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    val dir = "/root/testdata/sf0.001"
    spark.read.parquet(s"$dir/orders.parquet")
      .write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .saveAsTable("b_orders")
    spark.read.parquet(s"$dir/lineitem.parquet")
      .withColumnRenamed("l_orderkey", "o_orderkey")
      .write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .saveAsTable("b_lineitem")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("b_orders")
        .join(spark.table("b_lineitem"), "o_orderkey")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join should not shuffle:\n$plan")
      assert(joined.count() > 0)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_lineitem")
    }
  }
}
