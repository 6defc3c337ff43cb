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

  test("AQE splits the skewed partition of a sort-merge join (skew=true)") {
    // SCALE.md's "salting or AQE skew-join" claim, demonstrated: one
    // key carrying ~99% of a forced sort-merge join triggers the
    // runtime skew split once the thresholds see it. Thresholds are
    // test-sized; the mechanism is identical at TB scale.
    val confs = Seq(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "1.0",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "16KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "8KB",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false")
    val prev = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val left = spark.range(200000).select(
        when(col("id") % 100 =!= 0, lit(7L)).otherwise(col("id")).as("k"),
        concat(lit("pad-pad-pad-pad-pad-"), col("id")).as("lv"))
      val right = spark.range(1000).select(col("id").as("k"),
        col("id").as("rv"))
      val j = left.join(right, "k")
      // execute THIS plan so its AQE finalizes (a write or .rdd action
      // plans a separate query execution and leaves this one
      // unfinalized)
      j.collect()
      val plan = j.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin(skew=true)"), plan.take(1200))
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("z-order layout bounds per-file extents on BOTH dimensions") {
    import spark.implicits._
    val rnd = new scala.util.Random(3)
    val data = (0 until 40000)
      .map(_ => (rnd.nextInt(256), rnd.nextInt(256))).toDF("x", "y")
    val tmp = Files.createTempDirectory("graft-zorder-")
    // baseline: single-dimension sort — tight in x, spans ALL of y
    data.repartitionByRange(16, col("x")).sortWithinPartitions("x")
      .write.mode("overwrite").parquet(s"$tmp/base")
    graft.ops.ZOrder.layout(data, col("x"), col("y"), 8, 16)
      .write.mode("overwrite").parquet(s"$tmp/z")
    def extents(path: String): (Double, Double) = {
      val r = spark.read.parquet(path)
        .groupBy(input_file_name().as("f"))
        .agg((max("x") - min("x")).as("ex"), (max("y") - min("y")).as("ey"))
        .agg(avg("ex"), avg("ey")).collect()(0)
      (r.getDouble(0), r.getDouble(1))
    }
    val (bx, by) = extents(s"$tmp/base")
    val (zx, zy) = extents(s"$tmp/z")
    // zone maps prune on a predicate only while that dimension's
    // per-file extent is small: the z-order layout's WORST dimension
    // must be far tighter than the single-sort's worst (which spans
    // the full 255-wide y domain in every file)
    assert(by > 200, s"baseline should span y: ($bx, $by)")
    assert(math.max(zx, zy) < 0.6 * math.max(bx, by),
      s"z extents ($zx, $zy) vs baseline ($bx, $by)")
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
