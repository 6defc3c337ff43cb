package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Core relational surface (SURVEY.md §2.6): scans, filters,
  * projections, joins of every flavor, aggregates, windows, sorts,
  * set ops. Each query is declarative DataFrame code — Catalyst gets
  * full visibility for pushdown/pruning/join planning; small
  * dimensions are broadcast explicitly.
  *
  * Determinism: total ORDER BY everywhere, doubles rounded (2 for
  * money, 4 for ratios), aggregates aliased identically to the oracle.
  */
object RelationalQueries {

  /** TPC-H Q1-style pricing summary (flagship; SURVEY §7.2 slice 0). */
  def pricingSummary(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables(spark, dir).lineitem
    li.filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        round(sum("l_quantity"), 2).as("sum_qty"),
        round(sum("l_extendedprice"), 2).as("sum_base_price"),
        round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2)
          .as("sum_disc_price"),
        round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))
          * (lit(1.0) + col("l_tax"))), 2).as("sum_charge"),
        round(avg("l_quantity"), 4).as("avg_qty"),
        round(avg("l_extendedprice"), 4).as("avg_price"),
        round(avg("l_discount"), 4).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")
  }

  val defs: Seq[QueryDef] = Seq(
    QueryDef(
      "q01_pricing_summary",
      """SELECT l_returnflag, l_linestatus,
        | round(sum(l_quantity), 2) AS sum_qty,
        | round(sum(l_extendedprice), 2) AS sum_base_price,
        | round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS sum_disc_price,
        | round(sum(l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax)), 2) AS sum_charge,
        | round(avg(l_quantity), 4) AS avg_qty,
        | round(avg(l_extendedprice), 4) AS avg_price,
        | round(avg(l_discount), 4) AS avg_disc,
        | count(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin)(pricingSummary),

    // Projection + predicate — both must reach the parquet scan
    // (PushedFilters in .explain), reading 4 of 11 columns.
    QueryDef(
      "q02_filter_project",
      """SELECT l_orderkey, l_linenumber, l_extendedprice, l_discount
        |FROM lineitem
        |WHERE l_extendedprice > 95000.0 AND l_discount < 0.03
        |ORDER BY l_orderkey, l_linenumber""".stripMargin) { (spark, dir) =>
      Tables(spark, dir).lineitem
        .select("l_orderkey", "l_linenumber", "l_extendedprice", "l_discount")
        .filter(col("l_extendedprice") > 95000.0 && col("l_discount") < 0.03)
        .orderBy("l_orderkey", "l_linenumber")
    },

    // Fact-fact-dim join + agg + top-k. orders⋈lineitem shuffles on
    // the join key; customer joins on the aggregated (small) side.
    QueryDef(
      "q03_top_revenue_customers",
      """SELECT c_custkey, c_name,
        | round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS revenue
        |FROM customer
        |JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON o_orderkey = l_orderkey
        |GROUP BY c_custkey, c_name
        |ORDER BY revenue DESC, c_custkey
        |LIMIT 10""".stripMargin) { (spark, dir) =>
      val t = Tables(spark, dir)
      t.customer
        .join(t.orders, col("c_custkey") === col("o_custkey"))
        .join(t.lineitem, col("o_orderkey") === col("l_orderkey"))
        .groupBy("c_custkey", "c_name")
        .agg(round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2)
          .as("revenue"))
        .orderBy(col("revenue").desc, col("c_custkey"))
        .limit(10)
    },

    // Semi join (EXISTS): orders with any heavy lineitem.
    QueryDef(
      "q04_semi_join",
      """SELECT o_orderpriority, count(*) AS n_orders
        |FROM orders
        |WHERE EXISTS (SELECT 1 FROM lineitem
        |              WHERE l_orderkey = o_orderkey AND l_quantity > 45.0)
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin) { (spark, dir) =>
      val t = Tables(spark, dir)
      t.orders
        .join(t.lineitem.filter(col("l_quantity") > 45.0),
          col("o_orderkey") === col("l_orderkey"), "left_semi")
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n_orders"))
        .orderBy("o_orderpriority")
    },

    // Anti join (NOT EXISTS): customers with no 1995 orders.
    QueryDef(
      "q05_anti_join",
      """SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders
        |   WHERE o_custkey = c_custkey
        |     AND o_orderdate < TIMESTAMP '1996-01-01 00:00:00')
        |ORDER BY c_custkey""".stripMargin) { (spark, dir) =>
      val t = Tables(spark, dir)
      t.customer
        .join(
          t.orders.filter(col("o_orderdate") < lit("1996-01-01").cast("timestamp")),
          col("c_custkey") === col("o_custkey"), "left_anti")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    },

    // 5-way star join; nation/region are broadcast (tiny dims) so the
    // only shuffles are the two fact joins + final agg.
    QueryDef(
      "q06_region_revenue",
      """SELECT r_name, n_name,
        | round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS revenue,
        | count(*) AS n_items
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name, n_name
        |ORDER BY r_name, n_name""".stripMargin) { (spark, dir) =>
      val t = Tables(spark, dir)
      t.lineitem
        .join(t.orders, col("l_orderkey") === col("o_orderkey"))
        .join(t.customer, col("o_custkey") === col("c_custkey"))
        .join(broadcast(t.nation), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(t.region), col("n_regionkey") === col("r_regionkey"))
        .groupBy("r_name", "n_name")
        .agg(
          round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2)
            .as("revenue"),
          count(lit(1)).as("n_items"))
        .orderBy("r_name", "n_name")
    },

    // Single-agg selective filter (TPC-H Q6 shape) — pure scan+reduce,
    // no shuffle beyond the final partial-agg merge.
    QueryDef(
      "q07_forecast_revenue",
      """SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue,
        | count(*) AS n
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
        |  AND l_discount BETWEEN 0.03 AND 0.07 AND l_quantity < 24.0""".stripMargin) {
      (spark, dir) =>
        Tables(spark, dir).lineitem
          .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp")
            && col("l_shipdate") < lit("1997-01-01").cast("timestamp")
            && col("l_discount").between(0.03, 0.07) && col("l_quantity") < 24.0)
          .agg(round(sum(col("l_extendedprice") * col("l_discount")), 2).as("revenue"),
            count(lit(1)).as("n"))
    },

    // Left outer join preserving customers with no orders.
    QueryDef(
      "q08_outer_join",
      """SELECT c_custkey, count(o_orderkey) AS n_orders,
        | round(coalesce(sum(o_totalprice), 0.0), 2) AS total_spent
        |FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        |GROUP BY c_custkey
        |ORDER BY c_custkey""".stripMargin) { (spark, dir) =>
      val t = Tables(spark, dir)
      t.customer
        .join(t.orders, col("c_custkey") === col("o_custkey"), "left")
        .groupBy("c_custkey")
        .agg(count(col("o_orderkey")).as("n_orders"),
          round(coalesce(sum("o_totalprice"), lit(0.0)), 2).as("total_spent"))
        .orderBy("c_custkey")
    },

    // Ranking window: top-3 orders per customer.
    QueryDef(
      "q09_window_topk",
      """SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |   CAST(row_number() OVER (PARTITION BY o_custkey
        |        ORDER BY o_totalprice DESC, o_orderkey) AS INTEGER) AS rn
        |  FROM orders)
        |WHERE rn <= 3
        |ORDER BY o_custkey, rn""".stripMargin) { (spark, dir) =>
      val w = Window.partitionBy("o_custkey")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      Tables(spark, dir).orders
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rn")
        .orderBy("o_custkey", "rn")
    },

    // Analytic frame: running per-customer spend in date order.
    QueryDef(
      "q10_window_running_sum",
      """SELECT o_custkey, o_orderkey,
        | round(sum(o_totalprice) OVER (PARTITION BY o_custkey
        |   ORDER BY o_orderdate, o_orderkey
        |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_spent
        |FROM orders
        |ORDER BY o_custkey, o_orderkey""".stripMargin) { (spark, dir) =>
      val w = Window.partitionBy("o_custkey")
        .orderBy(col("o_orderdate"), col("o_orderkey"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables(spark, dir).orders
        .select(col("o_custkey"), col("o_orderkey"),
          round(sum("o_totalprice").over(w), 2).as("running_spent"))
        .orderBy("o_custkey", "o_orderkey")
    },

    // Exact distinct aggregation (the approx variant is q-approx,
    // rows-only, since HLL estimates differ engine to engine).
    QueryDef(
      "q11_distinct_agg",
      """SELECT l_returnflag,
        | count(DISTINCT l_partkey) AS nd_parts,
        | count(DISTINCT l_suppkey) AS nd_supps,
        | count(*) AS n
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin) {
      (spark, dir) =>
        Tables(spark, dir).lineitem
          .groupBy("l_returnflag")
          .agg(countDistinct(col("l_partkey")).as("nd_parts"),
            countDistinct(col("l_suppkey")).as("nd_supps"),
            count(lit(1)).as("n"))
          .orderBy("l_returnflag")
    },

    // approx_count_distinct: the HLL estimate itself is
    // implementation-specific (no cross-engine value to hash), so the
    // checkable contract is the ERROR BOUND — emit the exact count and
    // a within-5% flag (rsd 0.02 ⇒ generous), both deterministic: the
    // oracle re-derives the exact count and expects the flag true, so
    // an estimator drifting out of bound fails the hash compare.
    QueryDef(
      "q12_approx_distinct",
      """SELECT l_returnflag,
        | count(DISTINCT l_partkey) AS exact_parts,
        | true AS within_bound
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin) {
      (spark, dir) =>
        // two-level: distinct (flag, partkey) pairs first (partial agg
        // dedupes map-side), then count + HLL over the dedup'd keys —
        // HLL is duplicate-insensitive so the estimate is identical,
        // and the shuffle carries distinct pairs instead of an Expand
        // ×2 of the full fact table
        Tables(spark, dir).lineitem
          .select("l_returnflag", "l_partkey").distinct()
          .groupBy("l_returnflag")
          // count(col), not count(1): a NULL partkey would form a
          // distinct group but count(DISTINCT) — the oracle — skips it
          .agg(approx_count_distinct(col("l_partkey"), 0.02).as("approx_parts"),
            count(col("l_partkey")).as("exact_parts"))
          .select(col("l_returnflag"), col("exact_parts"),
            (abs(col("approx_parts") - col("exact_parts")) * lit(1.0)
              / col("exact_parts") <= 0.05).as("within_bound"))
          .orderBy("l_returnflag")
    },

    // Deterministic approximate distinct: KMV sketch (custom
    // TypedImperativeAggregate with map-side partials — ships ≤k longs
    // per task per group across the shuffle, vs every distinct hash
    // for the window formulation the oracle uses). Same estimator,
    // independent algorithms: Spark keeps a bounded k-min set; DuckDB
    // ranks all distinct hashes and picks the k-th.
    QueryDef(
      "q60_kmv_distinct",
      """WITH h AS (
        | SELECT DISTINCT l_returnflag,
        |  ('0x'||substr(md5(CAST(l_partkey AS VARCHAR)),1,15))::BIGINT AS hv
        | FROM lineitem),
        |r AS (
        | SELECT l_returnflag, hv,
        |  row_number() OVER (PARTITION BY l_returnflag ORDER BY hv) AS rn,
        |  count(*) OVER (PARTITION BY l_returnflag) AS cnt
        | FROM h)
        |SELECT l_returnflag,
        | CASE WHEN cnt < 256 THEN CAST(cnt AS DOUBLE)
        |      ELSE 255 * 1152921504606846976.0 / hv END AS kmv_parts
        |FROM r WHERE rn = least(256, cnt)
        |ORDER BY l_returnflag""".stripMargin) { (spark, dir) =>
      Tables(spark, dir).lineitem
        .groupBy("l_returnflag")
        .agg(graft.functions.KmvSketch.kmvDistinct(spark,
          graft.functions.KmvSketch.md5Hash60(col("l_partkey")), 256)
          .as("kmv_parts"))
        .orderBy("l_returnflag")
    },

    // Set ops over aligned schemas.
    QueryDef(
      "q13_union",
      """SELECT nationkey FROM (
        | SELECT c_nationkey AS nationkey FROM customer
        | UNION
        | SELECT s_nationkey AS nationkey FROM supplier)
        |ORDER BY nationkey""".stripMargin) { (spark, dir) =>
      val t = Tables(spark, dir)
      t.customer.select(col("c_nationkey").as("nationkey"))
        .union(t.supplier.select(col("s_nationkey").as("nationkey")))
        .distinct()
        .orderBy("nationkey")
    },

    QueryDef(
      "q14_intersect",
      """SELECT c_nationkey AS nationkey FROM customer
        |INTERSECT
        |SELECT s_nationkey AS nationkey FROM supplier
        |ORDER BY nationkey""".stripMargin) { (spark, dir) =>
      val t = Tables(spark, dir)
      t.customer.select(col("c_nationkey").as("nationkey"))
        .intersect(t.supplier.select(col("s_nationkey").as("nationkey")))
        .orderBy("nationkey")
    },

    // EXCEPT: orders that shipped no lineitems.
    QueryDef(
      "q15_except",
      """SELECT o_orderkey FROM orders
        |EXCEPT
        |SELECT l_orderkey AS o_orderkey FROM lineitem
        |ORDER BY o_orderkey""".stripMargin) { (spark, dir) =>
      val t = Tables(spark, dir)
      t.orders.select("o_orderkey")
        .except(t.lineitem.select(col("l_orderkey").as("o_orderkey")))
        .orderBy("o_orderkey")
    },

    // Statistical aggregates: stddev/variance/correlation/covariance
    // per group. All are sum-of-products partials (count, Σx, Σx²,
    // Σxy) — map-side combinable, one narrow shuffle. Partial-merge
    // float order differs from DuckDB's sequential fold at ~1e-15
    // relative; values are O(1e4) so round(4) absorbs it (same
    // contract as q63's avg).
    QueryDef(
      "q85_stats_agg",
      """SELECT l_returnflag,
        | CAST(count(*) AS BIGINT) AS n,
        | round(stddev_samp(l_quantity), 4) AS sd_qty,
        | round(var_samp(l_quantity), 4) AS var_qty,
        | round(corr(l_quantity, l_extendedprice), 4) AS corr_qty_price,
        | round(covar_samp(l_quantity, l_extendedprice), 4) AS cov_qty_price,
        | round(stddev_samp(l_extendedprice), 4) AS sd_price
        |FROM lineitem GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin) { (spark, dir) =>
      Tables(spark, dir).lineitem
        .groupBy("l_returnflag")
        .agg(count(lit(1)).as("n"),
          round(stddev_samp(col("l_quantity")), 4).as("sd_qty"),
          round(var_samp(col("l_quantity")), 4).as("var_qty"),
          round(corr(col("l_quantity"), col("l_extendedprice")), 4)
            .as("corr_qty_price"),
          round(covar_samp(col("l_quantity"), col("l_extendedprice")), 4)
            .as("cov_qty_price"),
          round(stddev_samp(col("l_extendedprice")), 4).as("sd_price"))
        .orderBy("l_returnflag")
    },

    // Ratio-to-report: each nation's share of its region's revenue —
    // a windowed aggregate over an aggregate (no self-join; the
    // share denominator is a partition-sum window over the already
    // grouped frame, so the second pass shuffles nation-sized data,
    // not lineitem).
    QueryDef(
      "q86_share_of_total",
      """WITH nr AS (
        |  SELECT r.r_name AS region, n.n_name AS nation,
        |    sum(l.l_extendedprice * (1.0 - l.l_discount)) AS revenue
        |  FROM lineitem l
        |  JOIN orders o ON l.l_orderkey = o.o_orderkey
        |  JOIN customer c ON o.o_custkey = c.c_custkey
        |  JOIN nation n ON c.c_nationkey = n.n_nationkey
        |  JOIN region r ON n.n_regionkey = r.r_regionkey
        |  GROUP BY 1, 2)
        |SELECT region, nation, round(revenue, 2) AS revenue,
        | round(revenue / sum(revenue) OVER (PARTITION BY region), 6)
        |   AS region_share
        |FROM nr ORDER BY region, nation""".stripMargin) { (spark, dir) =>
      val t = Tables(spark, dir)
      val nr = t.lineitem
        .join(t.orders, col("l_orderkey") === col("o_orderkey"))
        .join(t.customer, col("o_custkey") === col("c_custkey"))
        .join(broadcast(t.nation), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(t.region), col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("r_name").as("region"), col("n_name").as("nation"))
        .agg(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .as("revenue"))
      nr.select(col("region"), col("nation"),
          round(col("revenue"), 2).as("revenue"),
          round(col("revenue")
            / sum(col("revenue")).over(Window.partitionBy("region")), 6)
            .as("region_share"))
        .orderBy("region", "nation")
    },

    // Join-cardinality estimation from KMV sketches — optimizer-style
    // statistics at sketch cost: per-side distinct-key estimates, a
    // union estimate from the merged sketch, and the common-key count
    // by inclusion-exclusion, next to the exact values. At scale the
    // three sketches cost one pass each with ≤k-long partials (the
    // q60 shuffle argument), vs full distinct sets for the exact
    // numbers — this is how a planner sizes a join WITHOUT running
    // it. KMV is a pure function of the key set, so the oracle's
    // rank-the-hashes formulation reproduces every estimate exactly.
    QueryDef(
      "q92_join_cardinality",
      """WITH lh AS (SELECT DISTINCT
        |   ('0x'||substr(md5(CAST(l_orderkey AS VARCHAR)),1,15))::BIGINT AS hv
        | FROM lineitem),
        |oh AS (SELECT DISTINCT
        |   ('0x'||substr(md5(CAST(o_orderkey AS VARCHAR)),1,15))::BIGINT AS hv
        | FROM orders),
        |uh AS (SELECT hv FROM lh UNION SELECT hv FROM oh),
        |lk AS (SELECT hv, row_number() OVER (ORDER BY hv) AS rn,
        |         count(*) OVER () AS cnt FROM lh),
        |ok AS (SELECT hv, row_number() OVER (ORDER BY hv) AS rn,
        |         count(*) OVER () AS cnt FROM oh),
        |uk AS (SELECT hv, row_number() OVER (ORDER BY hv) AS rn,
        |         count(*) OVER () AS cnt FROM uh),
        |le AS (SELECT CASE WHEN cnt < 256 THEN CAST(cnt AS DOUBLE)
        |         ELSE 255 * 1152921504606846976.0 / hv END AS e
        |       FROM lk WHERE rn = least(256, cnt)),
        |oe AS (SELECT CASE WHEN cnt < 256 THEN CAST(cnt AS DOUBLE)
        |         ELSE 255 * 1152921504606846976.0 / hv END AS e
        |       FROM ok WHERE rn = least(256, cnt)),
        |ue AS (SELECT CASE WHEN cnt < 256 THEN CAST(cnt AS DOUBLE)
        |         ELSE 255 * 1152921504606846976.0 / hv END AS e
        |       FROM uk WHERE rn = least(256, cnt))
        |SELECT round(le.e, 2) AS est_left_keys,
        | round(oe.e, 2) AS est_right_keys,
        | round(ue.e, 2) AS est_union_keys,
        | round(le.e + oe.e - ue.e, 2) AS est_common_keys,
        | CAST((SELECT count(*) FROM lh) AS BIGINT) AS exact_left,
        | CAST((SELECT count(*) FROM oh) AS BIGINT) AS exact_right,
        | CAST((SELECT count(*) FROM lh) + (SELECT count(*) FROM oh)
        |   - (SELECT count(*) FROM uh) AS BIGINT) AS exact_common
        |FROM le, oe, ue
        |ORDER BY est_left_keys""".stripMargin) { (spark, dir) =>
      import graft.functions.KmvSketch
      val t = Tables(spark, dir)
      // persisted: each side feeds its own aggregation AND the union
      // pass — without the persist lineitem is scanned and md5'd twice
      val lh = t.lineitem
        .select(KmvSketch.md5Hash60(col("l_orderkey")).as("hv")).persist()
      val oh = t.orders
        .select(KmvSketch.md5Hash60(col("o_orderkey")).as("hv")).persist()
      val uh = lh.unionByName(oh)
      // one aggregation per side: the sketch estimate and the exact
      // distinct share the scan instead of re-reading the fact table
      def both(df: DataFrame, e: String, x: String): DataFrame =
        df.agg(KmvSketch.kmvDistinct(spark, col("hv"), 256).as(e),
          countDistinct(col("hv")).as(x))
      both(lh, "el", "xl").crossJoin(both(oh, "er", "xr"))
        .crossJoin(both(uh, "eu", "xu"))
        .select(round(col("el"), 2).as("est_left_keys"),
          round(col("er"), 2).as("est_right_keys"),
          round(col("eu"), 2).as("est_union_keys"),
          round(col("el") + col("er") - col("eu"), 2).as("est_common_keys"),
          col("xl").as("exact_left"), col("xr").as("exact_right"),
          (col("xl") + col("xr") - col("xu")).as("exact_common"))
        .orderBy("est_left_keys")
    },

    // Bloom-filter semi-join pruning (the runtime-filter /
    // decontamination shape): build a 32 Ki-bit bitset over the
    // benchmark keys (urgent orders), broadcast it (4 KB — an order
    // of magnitude under the key set itself), and probe every fact
    // row scan-side BEFORE any join. No false negatives by
    // construction, so the exact verify on survivors is lossless;
    // the query keeps all rows to audit the false-positive rate the
    // pruning would trade for that 4 KB. At 100 TB the bloom_pass
    // filter drops non-candidate rows at the scan and only survivors
    // reach the (broadcast) exact join — shuffle-free end to end.
    // The oracle reproduces the bitset exactly as its set of set
    // positions: k=4 double-hashed probes
    // (v % m + i*(1 + (v//m) % (m-1))) % m over the shared 60-bit
    // md5 hash.
    QueryDef(
      "q93_bloom_prune",
      """WITH b AS (SELECT DISTINCT o_orderkey AS k FROM orders
        |           WHERE o_orderpriority = '1-URGENT'),
        |pos AS (SELECT DISTINCT
        |    (v % 32768 + i * (1 + (v // 32768) % 32767)) % 32768 AS p
        |  FROM (SELECT ('0x'||substr(md5(CAST(k AS VARCHAR)),1,15))::BIGINT
        |          AS v FROM b),
        |       generate_series(0, 3) AS t(i)),
        |kv AS (SELECT l_orderkey,
        |   ('0x'||substr(md5(CAST(l_orderkey AS VARCHAR)),1,15))::BIGINT AS v
        | FROM (SELECT DISTINCT l_orderkey FROM lineitem)),
        |hits AS (SELECT l_orderkey, count(*) AS nhit
        |  FROM (SELECT l_orderkey, i,
        |          (v % 32768 + i * (1 + (v // 32768) % (32767))) % 32768 AS p
        |        FROM kv, generate_series(0, 3) AS t(i)) q
        |  JOIN pos USING (p) GROUP BY 1),
        |kf AS (SELECT kv.l_orderkey,
        |    coalesce(h.nhit, 0) = 4 AS bloom_pass,
        |    kv.l_orderkey IN (SELECT k FROM b) AS is_match
        |  FROM kv LEFT JOIN hits h ON kv.l_orderkey = h.l_orderkey)
        |SELECT l_returnflag,
        | CAST(count(*) AS BIGINT) AS n_rows,
        | CAST(count(*) FILTER (WHERE bloom_pass) AS BIGINT) AS n_bloom_pass,
        | CAST(count(*) FILTER (WHERE is_match) AS BIGINT) AS n_match,
        | CAST(count(*) FILTER (WHERE bloom_pass AND NOT is_match) AS BIGINT)
        |   AS n_false_pos,
        | round(count(*) FILTER (WHERE bloom_pass AND NOT is_match) * 1.0
        |   / greatest(count(*) FILTER (WHERE NOT is_match), 1), 4) AS fp_rate
        |FROM lineitem JOIN kf USING (l_orderkey)
        |GROUP BY 1 ORDER BY 1""".stripMargin) { (spark, dir) =>
      import graft.functions.{BloomSketch, KmvSketch}
      val m = 32768
      val t = Tables(spark, dir)
      val bench = t.orders.filter(col("o_orderpriority") === "1-URGENT")
        .select(col("o_orderkey").as("k")).distinct()
      val grid = bench.select(KmvSketch.md5Hash60(col("k")).as("v"))
        .agg(BloomSketch.bloom(spark, col("v"), m).as("g"))
      t.lineitem
        .select(col("l_orderkey"), col("l_returnflag"),
          KmvSketch.md5Hash60(col("l_orderkey")).as("v"))
        .crossJoin(broadcast(grid)) // one 4 KB row
        .withColumn("bloom_pass",
          BloomSketch.contains(spark, col("g"), col("v")))
        .join(broadcast(bench), col("l_orderkey") === col("k"), "left")
        .withColumn("is_match", col("k").isNotNull)
        .groupBy("l_returnflag")
        .agg(count(lit(1)).as("n_rows"),
          count(when(col("bloom_pass"), 1)).as("n_bloom_pass"),
          count(when(col("is_match"), 1)).as("n_match"),
          count(when(col("bloom_pass") && !col("is_match"), 1))
            .as("n_false_pos"))
        .select(col("l_returnflag"), col("n_rows"), col("n_bloom_pass"),
          col("n_match"), col("n_false_pos"),
          round(col("n_false_pos") * lit(1.0)
            / greatest(col("n_rows") - col("n_match"), lit(1)), 4)
            .as("fp_rate"))
        .orderBy("l_returnflag")
    },

    // Snapshot diff — the lake-maintenance op behind incremental
    // processing audits and CDC reconciliation: two snapshots of a
    // keyed table (here deterministically derived from events:
    // snapshot B drops the %5==0 keys, gains the %5==4 keys A lacks,
    // and modifies value on %3==0), classified per key into added /
    // removed / changed / unchanged by one full-outer join. Shape at
    // scale: both snapshots shuffle ONCE on the key — inherent to a
    // diff — and with bucketed snapshot tables (the ScaleOpsSpec
    // layout) even that shuffle disappears; the classification is a
    // projection and the rollup is ∝ 4 rows. The `changed` compare
    // here is one column; a production diff compares a row hash
    // computed scan-side, never the row itself across the shuffle.
    QueryDef(
      "q105_snapshot_diff",
      """WITH a AS (SELECT event_id, value FROM events WHERE event_id % 5 <> 4),
        |b AS (SELECT event_id,
        |        CASE WHEN event_id % 3 = 0 THEN value + 1.0 ELSE value END
        |          AS value
        |      FROM events WHERE event_id % 5 <> 0),
        |j AS (SELECT coalesce(a.event_id, b.event_id) AS event_id,
        |        a.value AS va, b.value AS vb,
        |        a.event_id IS NULL AS no_a, b.event_id IS NULL AS no_b
        |      FROM a FULL OUTER JOIN b ON a.event_id = b.event_id),
        |t AS (SELECT event_id,
        |        CASE WHEN no_a THEN 'added'
        |             WHEN no_b THEN 'removed'
        |             WHEN va <> vb THEN 'changed'
        |             ELSE 'unchanged' END AS change_type
        |      FROM j)
        |SELECT change_type, CAST(count(*) AS BIGINT) AS n,
        | CAST(min(event_id) AS BIGINT) AS min_id,
        | CAST(max(event_id) AS BIGINT) AS max_id
        |FROM t GROUP BY 1 ORDER BY change_type""".stripMargin) { (spark, dir) =>
      val ev = Tables(spark, dir).events.select(col("event_id"), col("value"))
      // explicit presence flags, NOT value nullity: a key present on
      // both sides with a NULL value is 'unchanged'/'changed', never
      // 'added'/'removed' — the oracle classifies by key nullity and
      // a real lake diff must too (NULL values are routine in CDC)
      val a = ev.filter(col("event_id") % 5 =!= 4)
        .select(col("event_id"), col("value").as("va"),
          lit(true).as("in_a"))
      val b = ev.filter(col("event_id") % 5 =!= 0)
        .select(col("event_id"),
          when(col("event_id") % 3 === 0, col("value") + 1.0)
            .otherwise(col("value")).as("vb"),
          lit(true).as("in_b"))
      a.join(b, Seq("event_id"), "full_outer")
        .withColumn("change_type",
          when(col("in_a").isNull, "added")
            .when(col("in_b").isNull, "removed")
            .when(col("va") =!= col("vb"), "changed")
            .otherwise("unchanged"))
        .groupBy("change_type")
        .agg(count(lit(1)).as("n"),
          min("event_id").as("min_id"), max("event_id").as("max_id"))
        .orderBy("change_type")
    },
  )
}
