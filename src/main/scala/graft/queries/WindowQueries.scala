package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Second window/aggregate wave: navigation functions, ranking
  * variants, pivot, ordered string aggregation, exact percentiles,
  * correlated-subquery shapes, conditional aggregation, grouping
  * sets (via the SQL surface).
  */
object WindowQueries {

  val defs: Seq[QueryDef] = Seq(

    // Navigation window functions over each customer's order history.
    QueryDef(
      "q50_window_navigation",
      """SELECT o_custkey, o_orderkey,
        | lag(o_orderkey) OVER w AS prev_order,
        | lead(o_orderkey) OVER w AS next_order,
        | first_value(o_orderkey) OVER w AS first_order,
        | round(o_totalprice - lag(o_totalprice) OVER w, 2) AS price_delta
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
        |ORDER BY o_custkey, o_orderkey""".stripMargin) { (spark, dir) =>
      val w = Window.partitionBy("o_custkey")
        .orderBy(col("o_orderdate"), col("o_orderkey"))
      Tables(spark, dir).orders.select(
        col("o_custkey"), col("o_orderkey"),
        lag("o_orderkey", 1).over(w).as("prev_order"),
        lead("o_orderkey", 1).over(w).as("next_order"),
        first("o_orderkey").over(w).as("first_order"),
        round(col("o_totalprice") - lag("o_totalprice", 1).over(w), 2)
          .as("price_delta"))
        .orderBy("o_custkey", "o_orderkey")
    },

    // Ranking variants per brand over part prices.
    QueryDef(
      "q51_rank_variants",
      """SELECT p_brand, p_partkey,
        | CAST(rank() OVER w AS INTEGER) AS rnk,
        | CAST(dense_rank() OVER w AS INTEGER) AS drnk,
        | round(percent_rank() OVER w, 6) AS prnk,
        | round(cume_dist() OVER w, 6) AS cdist,
        | CAST(ntile(4) OVER w AS INTEGER) AS quartile
        |FROM part
        |WINDOW w AS (PARTITION BY p_brand ORDER BY p_retailprice, p_partkey)
        |ORDER BY p_brand, p_partkey""".stripMargin) { (spark, dir) =>
      val w = Window.partitionBy("p_brand")
        .orderBy(col("p_retailprice"), col("p_partkey"))
      Tables(spark, dir).part.select(
        col("p_brand"), col("p_partkey"),
        rank().over(w).as("rnk"),
        dense_rank().over(w).as("drnk"),
        round(percent_rank().over(w), 6).as("prnk"),
        round(cume_dist().over(w), 6).as("cdist"),
        ntile(4).over(w).as("quartile"))
        .orderBy("p_brand", "p_partkey")
    },

    // Pivot: order status columns per priority (Spark .pivot; the
    // oracle spells the same contract as conditional counts).
    QueryDef(
      "q52_pivot",
      """SELECT o_orderpriority,
        | count(*) FILTER (WHERE o_orderstatus = 'F') AS F,
        | count(*) FILTER (WHERE o_orderstatus = 'O') AS O,
        | count(*) FILTER (WHERE o_orderstatus = 'P') AS P
        |FROM orders GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin) { (spark, dir) =>
      Tables(spark, dir).orders
        .groupBy("o_orderpriority")
        .pivot("o_orderstatus", Seq("F", "O", "P"))
        .agg(count(lit(1)))
        .select(col("o_orderpriority"),
          coalesce(col("F"), lit(0L)).as("F"),
          coalesce(col("O"), lit(0L)).as("O"),
          coalesce(col("P"), lit(0L)).as("P"))
        .orderBy("o_orderpriority")
    },

    // Unpivot (wide → long reshape, the inverse of q52): part's two
    // numeric measures melt into (measure, value) rows. Spark's
    // native unpivot operator; the oracle spells the same contract as
    // a UNION ALL (engine-neutral SQL for the identical row set).
    // Map-only — the reshape is a projection + generate, no shuffle
    // except the final ORDER BY.
    QueryDef(
      "q79_unpivot",
      """SELECT p_partkey, measure, value FROM (
        |  SELECT p_partkey, 'p_retailprice' AS measure,
        |    p_retailprice::DOUBLE AS value FROM part
        |  UNION ALL
        |  SELECT p_partkey, 'p_size', p_size::DOUBLE FROM part)
        |ORDER BY p_partkey, measure""".stripMargin) { (spark, dir) =>
      Tables(spark, dir).part
        .select(col("p_partkey"),
          col("p_retailprice").cast("double"),
          col("p_size").cast("double"))
        .unpivot(Array(col("p_partkey")), "measure", "value")
        .orderBy("p_partkey", "measure")
    },

    // Ordered string aggregation (collect_list → deterministic via
    // sort_array; DuckDB string_agg with ORDER BY).
    QueryDef(
      "q53_string_agg",
      """SELECT n_name,
        | string_agg(s_name, ',' ORDER BY s_name) AS suppliers,
        | count(*) AS n
        |FROM supplier JOIN nation ON s_nationkey = n_nationkey
        |GROUP BY n_name ORDER BY n_name""".stripMargin) { (spark, dir) =>
      val t = Tables(spark, dir)
      t.supplier
        .join(broadcast(t.nation), col("s_nationkey") === col("n_nationkey"))
        .groupBy("n_name")
        .agg(
          concat_ws(",", sort_array(collect_list(col("s_name")))).as("suppliers"),
          count(lit(1)).as("n"))
        .orderBy("n_name")
    },

    // Exact interpolated percentiles (Spark `percentile` ==
    // DuckDB `quantile_cont` on doubles).
    QueryDef(
      "q54_percentiles",
      """SELECT o_orderstatus,
        | round(quantile_cont(o_totalprice, 0.5), 4) AS median_price,
        | round(quantile_cont(o_totalprice, 0.9), 4) AS p90_price,
        | round(min(o_totalprice), 2) AS min_price,
        | round(max(o_totalprice), 2) AS max_price
        |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin) {
      (spark, dir) =>
        Tables(spark, dir).orders
          .groupBy("o_orderstatus")
          .agg(
            round(percentile(col("o_totalprice"), lit(0.5)), 4).as("median_price"),
            round(percentile(col("o_totalprice"), lit(0.9)), 4).as("p90_price"),
            round(min("o_totalprice"), 2).as("min_price"),
            round(max("o_totalprice"), 2).as("max_price"))
          .orderBy("o_orderstatus")
    },

    // Correlated-subquery shape (TPC-H Q17): small-quantity lineitems
    // vs their part's average. Spark: per-part aggregate joined back.
    QueryDef(
      "q55_correlated_subquery",
      """SELECT round(sum(l_extendedprice) / 7.0, 2) AS avg_yearly, count(*) AS n
        |FROM lineitem l1
        |WHERE l_quantity < 0.3 * (
        |  SELECT avg(l_quantity) FROM lineitem l2
        |  WHERE l2.l_partkey = l1.l_partkey)""".stripMargin) { (spark, dir) =>
      val li = Tables(spark, dir).lineitem
      val perPart = li.groupBy(col("l_partkey").as("pk"))
        .agg(avg("l_quantity").as("avg_qty"))
      li.join(perPart, col("l_partkey") === col("pk"))
        .filter(col("l_quantity") < lit(0.3) * col("avg_qty"))
        .agg(round(sum("l_extendedprice") / 7.0, 2).as("avg_yearly"),
          count(lit(1)).as("n"))
    },

    // IN-subquery: orders of the 100 biggest spenders.
    QueryDef(
      "q56_in_subquery",
      """SELECT o_custkey, count(*) AS n_orders,
        | round(sum(o_totalprice), 2) AS total
        |FROM orders
        |WHERE o_custkey IN (
        |  SELECT c FROM (
        |    SELECT o_custkey AS c, sum(o_totalprice) AS s FROM orders
        |    GROUP BY o_custkey ORDER BY s DESC, c LIMIT 100))
        |GROUP BY o_custkey ORDER BY o_custkey""".stripMargin) { (spark, dir) =>
      val o = Tables(spark, dir).orders
      val top = o.groupBy(col("o_custkey").as("c"))
        .agg(sum("o_totalprice").as("s"))
        .orderBy(col("s").desc, col("c")).limit(100)
        .select("c")
      o.join(broadcast(top), col("o_custkey") === col("c"), "left_semi")
        .groupBy("o_custkey")
        .agg(count(lit(1)).as("n_orders"),
          round(sum("o_totalprice"), 2).as("total"))
        .orderBy("o_custkey")
    },

    // Conditional aggregation: FILTER-style sums per order year.
    // Money aggregates go through EXACT integer cents (prices are
    // 2dp; round(x·100) is exact): a double sum is order-dependent
    // across engines, and at sf0.001 the open-order average landed
    // on a TRUE decimal half (…73175) that binary can't hold — the
    // engines' round() disagreed by the 4th decimal. So the average
    // is rounded in INTEGER space: half-up of sc·100/n is
    // (200·sc + n) div (2·n), exact in both engines, then one
    // identical /10000.0. The urgent sum needs no such care — cents
    // / 100 has exactly 2 decimals, never a rounding boundary.
    QueryDef(
      "q57_conditional_agg",
      """SELECT CAST(year(o_orderdate) AS INTEGER) AS o_year,
        | count(*) FILTER (WHERE o_orderstatus = 'F') AS n_f,
        | round(coalesce(CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
        |     FILTER (WHERE o_orderpriority = '1-URGENT') AS BIGINT),
        |   0) / 100.0, 2) AS urgent_total,
        | (CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
        |     FILTER (WHERE o_orderstatus = 'O') AS BIGINT) * 200
        |   + count(*) FILTER (WHERE o_orderstatus = 'O'))
        |  // (2 * count(*) FILTER (WHERE o_orderstatus = 'O')) / 10000.0
        |  AS avg_open
        |FROM orders GROUP BY 1 ORDER BY o_year""".stripMargin) { (spark, dir) =>
      val cents = round(col("o_totalprice") * 100).cast("long")
      Tables(spark, dir).orders
        .groupBy(year(col("o_orderdate")).as("o_year"))
        .agg(
          count(when(col("o_orderstatus") === "F", 1)).as("n_f"),
          round(coalesce(sum(when(col("o_orderpriority") === "1-URGENT",
            cents)), lit(0L)) / 100.0, 2).as("urgent_total"),
          sum(when(col("o_orderstatus") === "O", cents)).as("sc"),
          count(when(col("o_orderstatus") === "O", 1)).as("no"))
        .select(col("o_year"), col("n_f"), col("urgent_total"),
          // explicit zero-group guard: the bare `div` only avoided an
          // ANSI divide-by-zero because sc is NULL exactly when no = 0
          // (the two FILTER predicates share o_orderstatus = 'O');
          // guard the invariant instead of relying on that coupling
          (when(col("no") === 0, lit(null))
            .otherwise(expr("(sc * 200 + no) div (no * 2)"))
            / 10000.0).as("avg_open"))
        .orderBy("o_year")
    },

    // GROUPING SETS through the engine's SQL surface.
    QueryDef(
      "q58_grouping_sets",
      """SELECT coalesce(l_returnflag, 'ALL') AS flag,
        | coalesce(l_linestatus, 'ALL') AS status,
        | count(*) AS n
        |FROM lineitem
        |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        |ORDER BY flag, status""".stripMargin) { (spark, dir) =>
      Tables(spark, dir).lineitem.createOrReplaceTempView("graft_lineitem")
      spark.sql(
        """SELECT coalesce(l_returnflag, 'ALL') AS flag,
          | coalesce(l_linestatus, 'ALL') AS status,
          | count(*) AS n
          |FROM graft_lineitem
          |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
          |ORDER BY flag, status""".stripMargin)
    },

    // Approximate-percentile error contract (the q12 pattern for
    // quantiles): percentile_approx is a single-pass mergeable
    // rank sketch — partials cross the shuffle, never the raw
    // values, vs exact percentile materializing every group's
    // values. Its guarantee (rank error ≤ N/accuracy = 1% here) is
    // checkable even though the sketch itself is engine-specific:
    // the approx p50 must land between the exact p45 and p55 (a 5×
    // margin over the guaranteed bound), so the oracle asserts the
    // bound as a constant-TRUE column and the engine computes the
    // real comparison — any contract violation hash-mismatches.
    QueryDef(
      "q94_percentile_contract",
      """SELECT o_orderstatus,
        | round(quantile_cont(o_totalprice, 0.5), 4) AS exact_p50,
        | round(quantile_cont(o_totalprice, 0.45), 4) AS lo_p45,
        | round(quantile_cont(o_totalprice, 0.55), 4) AS hi_p55,
        | TRUE AS approx_in_bound
        |FROM orders GROUP BY o_orderstatus
        |ORDER BY o_orderstatus""".stripMargin) { (spark, dir) =>
      Tables(spark, dir).orders
        .groupBy("o_orderstatus")
        .agg(
          percentile(col("o_totalprice"), lit(0.5)).as("x50"),
          percentile(col("o_totalprice"), lit(0.45)).as("x45"),
          percentile(col("o_totalprice"), lit(0.55)).as("x55"),
          percentile_approx(col("o_totalprice"), lit(0.5), lit(100))
            .as("a50"))
        .select(col("o_orderstatus"),
          round(col("x50"), 4).as("exact_p50"),
          round(col("x45"), 4).as("lo_p45"),
          round(col("x55"), 4).as("hi_p55"),
          (col("a50") >= col("x45") && col("a50") <= col("x55"))
            .as("approx_in_bound"))
        .orderBy("o_orderstatus")
    },
  )
}
