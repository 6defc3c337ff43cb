package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Scalar-function and advanced-aggregate surface (SURVEY.md §2.6):
  * string/date/math scalars, CASE, HAVING, ROLLUP, scalar subquery,
  * JSON extraction, event-time tumbling windows, keep-latest dedup,
  * gap-based sessionization. All stay inside whole-stage codegen (no
  * UDFs), so the plans are a single scan + exchange per aggregate.
  */
object ScalarQueries {

  val defs: Seq[QueryDef] = Seq(

    // String scalar set. DuckDB regexp_replace needs the 'g' flag to
    // match Spark's replace-all semantics.
    QueryDef(
      "q16_string_funcs",
      """SELECT p_partkey,
        | upper(p_brand) AS brand_u,
        | lower(p_type) AS type_l,
        | substr(p_name, 1, 8) AS name_prefix,
        | CAST(length(p_name) AS INTEGER) AS name_len,
        | concat_ws('|', p_brand, p_type) AS brand_type,
        | regexp_replace(p_name, '[aeiou]', '', 'g') AS name_novowels,
        | CAST(strpos(p_name, 'a') AS INTEGER) AS first_a
        |FROM part ORDER BY p_partkey""".stripMargin) { (spark, dir) =>
      Tables(spark, dir).part.select(
        col("p_partkey"),
        upper(col("p_brand")).as("brand_u"),
        lower(col("p_type")).as("type_l"),
        substring(col("p_name"), 1, 8).as("name_prefix"),
        length(col("p_name")).as("name_len"),
        concat_ws("|", col("p_brand"), col("p_type")).as("brand_type"),
        regexp_replace(col("p_name"), "[aeiou]", "").as("name_novowels"),
        instr(col("p_name"), "a").as("first_a"))
        .orderBy("p_partkey")
    },

    // Date/time scalar set. Spark dayofweek is 1=Sunday, DuckDB 0=Sunday.
    QueryDef(
      "q17_date_funcs",
      """SELECT o_orderkey,
        | CAST(year(o_orderdate) AS INTEGER) AS o_year,
        | CAST(month(o_orderdate) AS INTEGER) AS o_month,
        | CAST(quarter(o_orderdate) AS INTEGER) AS o_quarter,
        | CAST(dayofweek(o_orderdate) AS INTEGER) AS o_dow,
        | strftime(o_orderdate, '%Y-%m') AS o_ym,
        | strftime(o_orderdate + INTERVAL 30 DAY, '%Y-%m-%d') AS plus30,
        | CAST(datediff('day', DATE '1995-01-01', o_orderdate) AS INTEGER) AS days_since
        |FROM orders ORDER BY o_orderkey""".stripMargin) { (spark, dir) =>
      Tables(spark, dir).orders.select(
        col("o_orderkey"),
        year(col("o_orderdate")).as("o_year"),
        month(col("o_orderdate")).as("o_month"),
        quarter(col("o_orderdate")).as("o_quarter"),
        (dayofweek(col("o_orderdate")) - 1).as("o_dow"),
        date_format(col("o_orderdate"), "yyyy-MM").as("o_ym"),
        date_format(date_add(col("o_orderdate"), 30), "yyyy-MM-dd").as("plus30"),
        datediff(col("o_orderdate"), lit("1995-01-01").cast("date")).as("days_since"))
        .orderBy("o_orderkey")
    },

    // Math scalars + CASE banding feeding an aggregate.
    QueryDef(
      "q18_math_case",
      """SELECT disc_band, count(*) AS n,
        | round(avg(sqrt(l_extendedprice)), 4) AS avg_sqrt_price,
        | round(sum(ln(l_quantity)), 4) AS sum_ln_qty,
        | CAST(sum(CAST(floor(l_tax * 100.0) AS BIGINT)) AS BIGINT) AS sum_tax_pct
        |FROM (SELECT *,
        |  CASE WHEN l_discount < 0.03 THEN 'low'
        |       WHEN l_discount < 0.07 THEN 'mid'
        |       ELSE 'high' END AS disc_band
        |  FROM lineitem)
        |GROUP BY disc_band ORDER BY disc_band""".stripMargin) { (spark, dir) =>
      Tables(spark, dir).lineitem
        .withColumn("disc_band",
          when(col("l_discount") < 0.03, "low")
            .when(col("l_discount") < 0.07, "mid")
            .otherwise("high"))
        .groupBy("disc_band")
        .agg(
          count(lit(1)).as("n"),
          round(avg(sqrt(col("l_extendedprice"))), 4).as("avg_sqrt_price"),
          round(sum(log(col("l_quantity"))), 4).as("sum_ln_qty"),
          sum(floor(col("l_tax") * 100.0)).as("sum_tax_pct"))
        .orderBy("disc_band")
    },

    // HAVING over a group-by.
    QueryDef(
      "q19_having",
      """SELECT p_brand, count(*) AS n, round(avg(p_retailprice), 2) AS avg_price
        |FROM part GROUP BY p_brand
        |HAVING count(*) >= 5
        |ORDER BY p_brand""".stripMargin) { (spark, dir) =>
      Tables(spark, dir).part
        .groupBy("p_brand")
        .agg(count(lit(1)).as("n"), round(avg("p_retailprice"), 2).as("avg_price"))
        .filter(col("n") >= 5)
        .orderBy("p_brand")
    },

    // ROLLUP with subtotal rows surfaced via coalesce.
    QueryDef(
      "q20_rollup",
      """SELECT coalesce(l_returnflag, 'ALL') AS flag,
        | coalesce(l_linestatus, 'ALL') AS status,
        | count(*) AS n, round(sum(l_quantity), 2) AS sum_qty
        |FROM lineitem
        |GROUP BY ROLLUP(l_returnflag, l_linestatus)
        |ORDER BY flag, status""".stripMargin) { (spark, dir) =>
      Tables(spark, dir).lineitem
        .rollup("l_returnflag", "l_linestatus")
        .agg(count(lit(1)).as("n"), round(sum("l_quantity"), 2).as("sum_qty"))
        .select(
          coalesce(col("l_returnflag"), lit("ALL")).as("flag"),
          coalesce(col("l_linestatus"), lit("ALL")).as("status"),
          col("n"), col("sum_qty"))
        .orderBy("flag", "status")
    },

    // Scalar subquery: parts above the average retail price. The
    // single-row aggregate is broadcast, not collected.
    QueryDef(
      "q21_scalar_subquery",
      """SELECT p_partkey, p_retailprice FROM part
        |WHERE p_retailprice > (SELECT avg(p_retailprice) FROM part)
        |ORDER BY p_partkey""".stripMargin) { (spark, dir) =>
      val part = Tables(spark, dir).part
      val avgPrice = part.agg(avg("p_retailprice").as("avg_price"))
      part.crossJoin(broadcast(avgPrice))
        .filter(col("p_retailprice") > col("avg_price"))
        .select("p_partkey", "p_retailprice")
        .orderBy("p_partkey")
    },

    // JSON extraction from the events payload column (T1-T4 analog:
    // schemaless payload → typed column, SURVEY §2.2).
    QueryDef(
      "q22_json_extract",
      """SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) AS k,
        | count(*) AS n, round(sum(value), 2) AS sum_value
        |FROM events
        |GROUP BY k ORDER BY k""".stripMargin) { (spark, dir) =>
      Tables(spark, dir).events
        .select(get_json_object(col("props"), "$.k").cast("long").as("k"),
          col("value"))
        .groupBy("k")
        .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("sum_value"))
        .orderBy("k")
    },

    // Event-time tumbling window (1 h) — the batch shape of the
    // streaming `window()` aggregation (SURVEY §2.6 streaming).
    QueryDef(
      "q23_time_window",
      """SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
        | event_type, count(*) AS n, round(sum(value), 2) AS sum_value
        |FROM events
        |GROUP BY 1, 2 ORDER BY window_start, event_type""".stripMargin) {
      (spark, dir) =>
        Tables(spark, dir).events
          .groupBy(window(col("ts"), "1 hour"), col("event_type"))
          .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("sum_value"))
          .select(
            date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss").as("window_start"),
            col("event_type"), col("n"), col("sum_value"))
          .orderBy("window_start", "event_type")
    },

    // Keep-latest exact dedup (extension op: exact dedup with a
    // deterministic keep rule, unlike dropDuplicates).
    QueryDef(
      "q24_dedup_latest",
      """SELECT user_id, event_type, event_id AS last_event_id,
        | strftime(ts, '%Y-%m-%d %H:%M:%S.%f') AS last_ts
        |FROM (SELECT *, row_number() OVER (PARTITION BY user_id, event_type
        |        ORDER BY ts DESC, event_id DESC) AS rn FROM events)
        |WHERE rn = 1
        |ORDER BY user_id, event_type""".stripMargin) { (spark, dir) =>
      val w = Window.partitionBy("user_id", "event_type")
        .orderBy(col("ts").desc, col("event_id").desc)
      Tables(spark, dir).events
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("user_id"), col("event_type"),
          col("event_id").as("last_event_id"),
          date_format(col("ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("last_ts"))
        .orderBy("user_id", "event_type")
    },

    // Gap-based sessionization (30-min inactivity) via lag().
    QueryDef(
      "q25_sessionize",
      """SELECT user_id, count(*) AS n_events,
        | CAST(sum(is_new) AS BIGINT) AS n_sessions
        |FROM (
        |  SELECT user_id,
        |   CASE WHEN CAST(floor(epoch(ts)) AS BIGINT)
        |          - lag(CAST(floor(epoch(ts)) AS BIGINT)) OVER
        |            (PARTITION BY user_id ORDER BY ts, event_id) > 1800
        |        OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
        |           IS NULL
        |        THEN 1 ELSE 0 END AS is_new
        |  FROM events)
        |GROUP BY user_id ORDER BY user_id""".stripMargin) { (spark, dir) =>
      val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      Tables(spark, dir).events
        .withColumn("sec", unix_timestamp(col("ts")))
        .withColumn("prev_sec", lag(col("sec"), 1).over(w))
        .withColumn("is_new",
          when(col("prev_sec").isNull || col("sec") - col("prev_sec") > 1800, 1)
            .otherwise(0))
        .groupBy("user_id")
        .agg(count(lit(1)).as("n_events"), sum("is_new").as("n_sessions"))
        .orderBy("user_id")
    },

    // Salted skew join (graft.ops.SkewJoin), oracle-checked: events is
    // deliberately skewed on event_type (5 hot keys for the whole
    // table — at 100 TB each key would be one straggler task), the
    // per-type stats dim is tiny. The salt spreads every hot key over
    // 8 (key, salt) tasks; salt values never affect the RESULT (they
    // only partition work), so the oracle is the plain unsalted join.
    QueryDef(
      "q66_skew_salted_topk",
      """WITH t AS (SELECT event_type, avg(value) AS type_avg
        |           FROM events GROUP BY 1),
        |a AS (SELECT e.event_type, e.user_id,
        |        count(*) AS n_events, sum(e.value) AS tv,
        |        min(t.type_avg) AS type_avg
        |      FROM events e JOIN t USING (event_type)
        |      GROUP BY 1, 2)
        |SELECT event_type, user_id,
        | CAST(n_events AS BIGINT) AS n_events,
        | round(tv, 2) AS total_value,
        | round(tv / (n_events * type_avg), 4) AS lift,
        | CAST(rn AS INTEGER) AS rn
        |FROM (SELECT *, row_number() OVER (PARTITION BY event_type
        |        ORDER BY tv DESC, user_id) AS rn FROM a)
        |WHERE rn <= 3 ORDER BY event_type, rn""".stripMargin) { (spark, dir) =>
      val ev = Tables(spark, dir).events
        .select(col("event_type"), col("user_id"), col("value"))
      val typeStats = ev.groupBy("event_type")
        .agg(avg("value").as("type_avg"))
      val joined = graft.ops.SkewJoin.saltedJoin(ev, typeStats,
        "event_type", saltBuckets = 8)
      val agg = joined.groupBy("event_type", "user_id")
        .agg(count(lit(1)).as("n_events"), sum("value").as("tv"),
          min("type_avg").as("type_avg"))
      val w = Window.partitionBy("event_type")
        .orderBy(col("tv").desc, col("user_id"))
      agg.withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3)
        .select(col("event_type"), col("user_id"), col("n_events"),
          round(col("tv"), 2).as("total_value"),
          round(col("tv") / (col("n_events") * col("type_avg")), 4).as("lift"),
          col("rn"))
        .orderBy("event_type", "rn")
    },

    // As-of (point-in-time) join — the brief's canonical "operator
    // Spark lacks": every event enriched with the user's most recent
    // purchase value at-or-before its timestamp. Implemented the way
    // that scales: tag both sides, UNION, one window carry-forward
    // (`last(ignoreNulls)`) per user — a single shuffle on user_id,
    // no per-row range probe and no row explosion, vs a naive
    // range-join that is O(events × purchases) per user. The oracle is
    // DuckDB's NATIVE `ASOF LEFT JOIN` — a fully independent
    // implementation of the same semantics. Same-timestamp purchases
    // are visible to same-timestamp events (right side sorts first),
    // matching ASOF's `>=`.
    QueryDef(
      "q71_asof_join",
      """WITH p AS (SELECT user_id, ts, max(value) AS pval
        |           FROM events WHERE event_type = 'purchase'
        |           GROUP BY 1, 2)
        |SELECT e.event_id, e.user_id, e.event_type,
        |  strftime(e.ts, '%Y-%m-%d %H:%M:%S.%f') AS ts_str,
        |  p.pval AS asof_purchase
        |FROM events e ASOF LEFT JOIN p
        |  ON e.user_id = p.user_id AND e.ts >= p.ts
        |ORDER BY e.event_id""".stripMargin) { (spark, dir) =>
      val ev = Tables(spark, dir).events
        .select(col("event_id"), col("user_id"), col("event_type"),
          col("ts"), col("value"))
      // right side unique per (user, ts) so the as-of pick is
      // well-defined in both implementations
      val purch = ev.filter(col("event_type") === "purchase")
        .groupBy("user_id", "ts").agg(max("value").as("pval"))
      val left = ev.select(col("user_id"), col("ts"), col("event_id"),
        col("event_type"), lit(null).cast("double").as("pval"),
        lit(1).as("side"))
      val right = purch.select(col("user_id"), col("ts"),
        lit(null).cast("long").as("event_id"),
        lit(null).cast("string").as("event_type"), col("pval"),
        lit(0).as("side"))
      val w = Window.partitionBy("user_id").orderBy(col("ts"), col("side"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      left.unionByName(right)
        .withColumn("asof_purchase", last(col("pval"), ignoreNulls = true).over(w))
        .filter(col("side") === 1)
        .select(col("event_id"), col("user_id"), col("event_type"),
          date_format(col("ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("ts_str"),
          col("asof_purchase"))
        .orderBy("event_id")
    },

    // Range (interval-containment) join — the other operator the brief
    // names: how many of the user's ±1 h purchase windows contain each
    // event. Naive range joins are O(events × intervals) per user
    // (a BroadcastNestedLoopJoin in Spark); the scale shape is
    // BUCKET-THEN-REFINE: intervals explode into the 1 h epoch buckets
    // they cover (≤ 3 each), events key by their bucket, the join is a
    // plain equi-join on (user, bucket), and the exact containment
    // check runs only on bucket-mates. All interval arithmetic in
    // integer microseconds — no FP at the boundaries. The oracle is
    // DuckDB's native inequality join over the same intervals.
    QueryDef(
      "q72_range_join",
      """WITH e AS (SELECT event_id, user_id, epoch_us(ts) AS eus
        |           FROM events),
        |p AS (SELECT user_id, epoch_us(ts) AS pus FROM events
        |      WHERE event_type = 'purchase'),
        |m AS (SELECT e.event_id, count(*) AS n
        |      FROM e JOIN p ON e.user_id = p.user_id
        |        AND e.eus BETWEEN p.pus - 3600000000 AND p.pus + 3600000000
        |      GROUP BY 1)
        |SELECT e.event_id, e.user_id,
        |  CAST(coalesce(m.n, 0) AS BIGINT) AS n_covering
        |FROM e LEFT JOIN m ON e.event_id = m.event_id
        |ORDER BY e.event_id""".stripMargin) { (spark, dir) =>
      val HourUs = 3600000000L
      // feeds three join sides (events, intervals, final probe) —
      // persist so the scan + projection runs once
      val ev = Tables(spark, dir).events
        .select(col("event_id"), col("user_id"), col("event_type"),
          expr("unix_micros(ts)").as("eus"))
        .persist()
      val intervals = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), (col("eus") - HourUs).as("lo"),
          (col("eus") + HourUs).as("hi"))
      // each 2 h interval covers 2-3 one-hour buckets
      val rightB = intervals.withColumn("bucket",
        explode(sequence(expr(s"lo div $HourUs"), expr(s"hi div $HourUs"))))
      val leftB = ev.withColumn("bucket", expr(s"eus div $HourUs"))
      val counts = leftB.join(rightB, Seq("user_id", "bucket"))
        .filter(col("eus") >= col("lo") && col("eus") <= col("hi"))
        .groupBy("event_id").agg(count(lit(1)).as("n"))
      ev.join(counts, Seq("event_id"), "left")
        .select(col("event_id"), col("user_id"),
          coalesce(col("n"), lit(0L)).as("n_covering"))
        .orderBy("event_id")
    },

    // SCD Type-2 history materialization — the history-table twin of
    // streaming.Materialize's type-1 current-state view: every change
    // becomes a version row with a [valid_from, valid_to) interval,
    // closed by the NEXT version's timestamp (lead), open (null) for
    // the current version. One window per key — single shuffle on the
    // primary key, the standard way a CDC lake derives point-in-time
    // queryable history from the append-only change log this engine's
    // sink writes.
    QueryDef(
      "q73_scd2_history",
      """SELECT event_id, user_id,
        | strftime(ts, '%Y-%m-%d %H:%M:%S.%f') AS valid_from,
        | strftime(lead(ts) OVER (PARTITION BY user_id
        |   ORDER BY ts, event_id), '%Y-%m-%d %H:%M:%S.%f') AS valid_to,
        | (lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
        |   IS NULL) AS is_current
        |FROM events ORDER BY event_id""".stripMargin) { (spark, dir) =>
      val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      val fmt = "yyyy-MM-dd HH:mm:ss.SSSSSS"
      Tables(spark, dir).events
        .withColumn("next_ts", lead(col("ts"), 1).over(w))
        .select(col("event_id"), col("user_id"),
          date_format(col("ts"), fmt).as("valid_from"),
          date_format(col("next_ts"), fmt).as("valid_to"),
          col("next_ts").isNull.as("is_current"))
        .orderBy("event_id")
    },

    // Sequential funnel (view → click → purchase): per user, the
    // earliest timestamp of each step where every step must strictly
    // follow the previous one — the MATCH_RECOGNIZE-lite shape of
    // product analytics. Three chained conditional-min aggregates;
    // each join keys on user_id, so all three shuffles share one
    // partitioning (co-located, no re-shuffle at scale). NULL
    // propagation does the sequencing: a user with no view can't
    // match a click-after-view (comparison vs NULL filters out), so
    // later steps stay NULL without explicit branching.
    QueryDef(
      "q80_funnel",
      """WITH s1 AS (SELECT user_id,
        |   min(ts) FILTER (WHERE event_type = 'view') AS t1
        | FROM events GROUP BY 1),
        |s2 AS (SELECT e.user_id,
        |   min(e.ts) FILTER (WHERE e.event_type = 'click' AND e.ts > s1.t1)
        |     AS t2
        | FROM events e JOIN s1 ON e.user_id = s1.user_id GROUP BY 1),
        |s3 AS (SELECT e.user_id,
        |   min(e.ts) FILTER (WHERE e.event_type = 'purchase' AND e.ts > s2.t2)
        |     AS t3
        | FROM events e JOIN s2 ON e.user_id = s2.user_id GROUP BY 1)
        |SELECT s1.user_id,
        | strftime(s1.t1, '%Y-%m-%d %H:%M:%S.%f') AS view_ts,
        | strftime(s2.t2, '%Y-%m-%d %H:%M:%S.%f') AS click_ts,
        | strftime(s3.t3, '%Y-%m-%d %H:%M:%S.%f') AS purchase_ts,
        | s3.t3 IS NOT NULL AS completed
        |FROM s1 JOIN s2 ON s1.user_id = s2.user_id
        |JOIN s3 ON s1.user_id = s3.user_id
        |ORDER BY s1.user_id""".stripMargin) { (spark, dir) =>
      val fmt = "yyyy-MM-dd HH:mm:ss.SSSSSS"
      val ev = Tables(spark, dir).events
        .select(col("user_id"), col("event_type"), col("ts"))
      val s1 = ev.groupBy("user_id")
        .agg(min(when(col("event_type") === "view", col("ts"))).as("t1"))
      val s2 = ev.join(s1, "user_id").groupBy("user_id")
        .agg(min(when(col("event_type") === "click" && col("ts") > col("t1"),
          col("ts"))).as("t2"))
      val s3 = ev.join(s2, "user_id").groupBy("user_id")
        .agg(min(when(col("event_type") === "purchase" && col("ts") > col("t2"),
          col("ts"))).as("t3"))
      s1.join(s2, "user_id").join(s3, "user_id")
        .select(col("user_id"),
          date_format(col("t1"), fmt).as("view_ts"),
          date_format(col("t2"), fmt).as("click_ts"),
          date_format(col("t3"), fmt).as("purchase_ts"),
          col("t3").isNotNull.as("completed"))
        .orderBy("user_id")
    },

    // Z-order (Morton) clustering — the lakehouse multi-dimensional
    // layout op: interleave the bits of two query dimensions
    // (user, hour) into one code; files written in code order are
    // tight in BOTH dimensions, so min/max zone maps prune scans on
    // either predicate. At scale the write path is
    // repartitionByRange(zcode) + sortWithinPartitions; this query
    // reports the per-bucket zone-map tightness that makes the
    // pruning argument measurable. Bit arithmetic only — exact in
    // both engines, interleave expression generated from one set of
    // constants.
    QueryDef(
      "q81_zorder_cluster", {
        val inter = (0 until 8).map(i =>
          s"(((x >> $i) & 1) << ${2 * i}) + (((y >> $i) & 1) << ${2 * i + 1})")
          .mkString(" + ")
        s"""WITH b AS (SELECT user_id % 256 AS x,
           |   (epoch_us(ts) // 3600000000) % 256 AS y FROM events),
           |z AS (SELECT x, y, $inter AS z FROM b)
           |SELECT z // 16 AS bucket, CAST(count(*) AS BIGINT) AS n,
           | min(x) AS x_min, max(x) AS x_max,
           | min(y) AS y_min, max(y) AS y_max
           |FROM z GROUP BY 1 ORDER BY bucket""".stripMargin
      }) { (spark, dir) =>
      val staged = Tables(spark, dir).events
        .select((col("user_id") % 256).as("x"),
          (expr("unix_micros(ts) div 3600000000") % 256).as("y"))
      // the shared write-path kernel (ops.ZOrder) — the audit must
      // measure the same interleave the layout writes
      staged.withColumn("z",
          graft.ops.ZOrder.zcode(col("x"), col("y"), 8))
        .groupBy(expr("z div 16").as("bucket"))
        .agg(count(lit(1)).as("n"),
          min("x").as("x_min"), max("x").as("x_max"),
          min("y").as("y_min"), max("y").as("y_max"))
        .orderBy("bucket")
    },

    // Count-min sketch frequency estimation (graft.functions
    // .CmsSketch, a custom TypedImperativeAggregate): depth-2 ×
    // width-64 counter grid; a key's estimate is the min over its
    // cells — ≥ exact always, overshooting only on collisions. The
    // grid is a cellwise sum (order-independent), so the oracle
    // rebuilds the identical sketch from the same md5 cell recipe and
    // the comparison is exact — the deterministic counterpart of
    // count_min_sketch(). Scale: map-side partials reduce each task
    // to one 2×64 long grid; only grids cross the shuffle, and the
    // probe side broadcasts the single-row sketch.
    QueryDef(
      "q82_cms_freq", {
        val w = graft.functions.CmsSketch.Width
        s"""WITH h AS (SELECT user_id,
           |   ('0x'||substr(md5('0:'||CAST(user_id AS VARCHAR)),1,8))::BIGINT
           |     % $w AS c0,
           |   ('0x'||substr(md5('1:'||CAST(user_id AS VARCHAR)),1,8))::BIGINT
           |     % $w AS c1
           | FROM events),
           |cell0 AS (SELECT c0, count(*) AS n0 FROM h GROUP BY 1),
           |cell1 AS (SELECT c1, count(*) AS n1 FROM h GROUP BY 1),
           |u AS (SELECT user_id, min(c0) AS c0, min(c1) AS c1,
           |        count(*) AS exact FROM h GROUP BY 1)
           |SELECT u.user_id, CAST(u.exact AS BIGINT) AS exact,
           | CAST(least(cell0.n0, cell1.n1) AS BIGINT) AS cms_est,
           | CAST(least(cell0.n0, cell1.n1) - u.exact AS BIGINT) AS overcount,
           | least(cell0.n0, cell1.n1) >= u.exact AS never_undercounts
           |FROM u JOIN cell0 ON u.c0 = cell0.c0
           |JOIN cell1 ON u.c1 = cell1.c1
           |ORDER BY u.user_id""".stripMargin
      }) { (spark, dir) =>
      import graft.functions.CmsSketch
      val w = CmsSketch.Width
      // cell indices computed ONCE in codegen'd column expressions,
      // shared by the sketch build and the probe side — persist the
      // diamond so events is scanned (and md5'd) once, not per branch
      val h = Tables(spark, dir).events.select(col("user_id"),
        CmsSketch.cellIndex(0, col("user_id")).as("c0"),
        CmsSketch.cellIndex(1, col("user_id")).as("c1"))
        .persist()
      val sk = h.agg(
        CmsSketch.sketch(spark, Seq(col("c0"), col("c1"))).as("sk"))
      val est = CmsSketch.estimate(col("sk"), Seq(col("c0"), col("c1")), w)
      h.groupBy("user_id")
        .agg(min("c0").as("c0"), min("c1").as("c1"),
          count(lit(1)).as("exact"))
        .crossJoin(broadcast(sk))
        .select(col("user_id"), col("exact"), est.as("cms_est"),
          (est - col("exact")).as("overcount"),
          (est >= col("exact")).as("never_undercounts"))
        .orderBy("user_id")
    },

    // Sliding (HOP) window aggregate — 2 h windows every 1 h, the
    // overlapping-window batch shape of the streaming
    // `window(ts, '2 hours', '1 hour')`. Each event lands in exactly
    // duration/slide = 2 windows; the oracle spells that fan-out
    // explicitly (each event unnested into its 2 covering window
    // starts). Map-side explode ×2 then one narrow aggregate —
    // overlap factor is a constant, never a shuffle blowup.
    QueryDef(
      "q83_hop_window",
      """WITH f AS (SELECT event_type, value, ts,
        |   unnest(generate_series(0, 1)) AS i FROM events)
        |SELECT strftime(date_trunc('hour', ts) - i * INTERVAL 1 HOUR,
        |   '%Y-%m-%d %H:%M:%S') AS window_start,
        | event_type, count(*) AS n, round(sum(value), 2) AS sum_value
        |FROM f
        |GROUP BY 1, 2 ORDER BY window_start, event_type""".stripMargin) {
      (spark, dir) =>
        Tables(spark, dir).events
          .groupBy(window(col("ts"), "2 hours", "1 hour"), col("event_type"))
          .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("sum_value"))
          .select(
            date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss")
              .as("window_start"),
            col("event_type"), col("n"), col("sum_value"))
          .orderBy("window_start", "event_type")
    },

    // Native session_window (30-min gap) in batch — the declarative
    // twin of q25's lag()-based sessionization, verifying Spark's
    // built-in session semantics (end = last event + gap) against an
    // island-detection oracle (running is-new sum → session id →
    // per-session bounds). One shuffle on user_id.
    QueryDef(
      "q84_session_window",
      """WITH m AS (SELECT user_id, ts, event_id,
        |   CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER
        |          (PARTITION BY user_id ORDER BY ts, event_id) > 1800000000
        |        OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
        |           IS NULL
        |        THEN 1 ELSE 0 END AS is_new
        | FROM events),
        |s AS (SELECT user_id, ts,
        |   sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |     ROWS UNBOUNDED PRECEDING) AS sid
        | FROM m)
        |SELECT user_id,
        | strftime(min(ts), '%Y-%m-%d %H:%M:%S.%f') AS session_start,
        | strftime(max(ts) + INTERVAL 30 MINUTE, '%Y-%m-%d %H:%M:%S.%f')
        |   AS session_end,
        | count(*) AS n_events
        |FROM s GROUP BY user_id, sid
        |ORDER BY user_id, session_start""".stripMargin) { (spark, dir) =>
      val fmt = "yyyy-MM-dd HH:mm:ss.SSSSSS"
      Tables(spark, dir).events
        .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
        .agg(count(lit(1)).as("n_events"))
        .select(col("user_id"),
          date_format(col("session_window.start"), fmt).as("session_start"),
          date_format(col("session_window.end"), fmt).as("session_end"),
          col("n_events"))
        .orderBy("user_id", "session_start")
    },

    // Time-series gap filling (sparse → dense): hourly event counts
    // with missing hours zero-filled from a generated dense hour
    // grid. The grid is bounds × types — generated from a one-row
    // aggregate, thousands of rows regardless of corpus size, so the
    // dense spine BROADCASTS and the fill is one left join keyed by
    // (type, hour). The standard pre-step before window/forecast ops
    // that can't tolerate missing buckets.
    QueryDef(
      "q87_gapfill",
      """WITH e AS (SELECT event_type,
        |   epoch_us(ts) // 3600000000 AS h FROM events),
        |c AS (SELECT event_type, h, count(*) AS n FROM e GROUP BY 1, 2),
        |b AS (SELECT min(h) AS mn, max(h) AS mx FROM e),
        |hours AS (SELECT unnest(generate_series(b.mn, b.mx)) AS h FROM b),
        |ty AS (SELECT DISTINCT event_type FROM e)
        |SELECT ty.event_type,
        | strftime(make_timestamp(hours.h * 3600000000),
        |   '%Y-%m-%d %H:%M:%S') AS hour,
        | CAST(coalesce(c.n, 0) AS BIGINT) AS n
        |FROM ty CROSS JOIN hours
        |LEFT JOIN c ON c.event_type = ty.event_type AND c.h = hours.h
        |ORDER BY ty.event_type, hour""".stripMargin) { (spark, dir) =>
      val ev = Tables(spark, dir).events
        .select(col("event_type"),
          expr("unix_micros(ts) div 3600000000").as("h"))
      val counts = ev.groupBy("event_type", "h").agg(count(lit(1)).as("n"))
      val hours = ev.agg(min("h").as("mn"), max("h").as("mx"))
        .select(explode(sequence(col("mn"), col("mx"))).as("h"))
      val types = ev.select("event_type").distinct()
      types.crossJoin(hours)
        .join(counts, Seq("event_type", "h"), "left")
        .select(col("event_type"),
          date_format(timestamp_seconds(col("h") * 3600),
            "yyyy-MM-dd HH:mm:ss").as("hour"),
          coalesce(col("n"), lit(0L)).as("n"))
        .orderBy("event_type", "hour")
    },

    // RANGE-frame moving window: 3-day moving revenue per event type
    // where the frame is defined on the DAY VALUE, not row offsets —
    // a day with no events contributes nothing AND days outside the
    // value range drop out even when adjacent as rows (the rows-frame
    // q10 cannot express this). One shuffle on event_type over the
    // already day-aggregated frame.
    QueryDef(
      "q88_range_frame",
      """WITH d AS (SELECT event_type,
        |   epoch_us(ts) // 86400000000 AS day, sum(value) AS rev
        | FROM events GROUP BY 1, 2)
        |SELECT event_type,
        | strftime(make_timestamp(day * 86400000000), '%Y-%m-%d') AS day,
        | round(rev, 2) AS revenue,
        | round(sum(rev) OVER (PARTITION BY event_type ORDER BY day
        |   RANGE BETWEEN 2 PRECEDING AND CURRENT ROW), 2) AS rev_3d
        |FROM d ORDER BY event_type, day""".stripMargin) { (spark, dir) =>
      val d = Tables(spark, dir).events
        .select(col("event_type"),
          expr("unix_micros(ts) div 86400000000").as("day"), col("value"))
        .groupBy("event_type", "day").agg(sum("value").as("rev"))
      val w = Window.partitionBy("event_type").orderBy(col("day"))
        .rangeBetween(-2, 0)
      d.select(col("event_type"),
          date_format(timestamp_seconds(col("day") * 86400), "yyyy-MM-dd")
            .as("day"),
          round(col("rev"), 2).as("revenue"),
          round(sum(col("rev")).over(w), 2).as("rev_3d"))
        .orderBy("event_type", "day")
    },

    // Sketch-pruned heavy hitters (the two-pass MapReduce shape):
    // pass 1 reduces every task to one 2×1024 count-min grid (16 KB
    // partials cross the shuffle, never keys); pass 2 re-scans and
    // drops rows whose key's grid estimate is under the threshold
    // BEFORE the exact groupBy, so only candidate keys' rows shuffle.
    // The prune is provably lossless — CMS never undercounts — so
    // the result equals the oracle's plain GROUP BY ... HAVING, and
    // the exact HAVING removes the sketch's false candidates. This
    // complements q82 (per-key estimate audit, narrow grid forcing
    // collisions): here the grid is wide because it is doing real
    // pruning work, not demonstrating overcounts.
    QueryDef(
      "q95_cms_heavy_hitters",
      """SELECT user_id, CAST(count(*) AS BIGINT) AS n
        |FROM events GROUP BY user_id HAVING count(*) >= 80
        |ORDER BY user_id""".stripMargin) { (spark, dir) =>
      import graft.functions.CmsSketch
      val w = 1024
      val thresh = 80
      // cell indices computed once, shared by build and probe passes
      val h = Tables(spark, dir).events.select(col("user_id"),
        CmsSketch.cellIndex(0, col("user_id"), w).as("c0"),
        CmsSketch.cellIndex(1, col("user_id"), w).as("c1"))
        .persist()
      val sk = h.agg(
        CmsSketch.sketch(spark, Seq(col("c0"), col("c1")), w).as("sk"))
      val est = CmsSketch.estimate(col("sk"), Seq(col("c0"), col("c1")), w)
      h.crossJoin(broadcast(sk))
        .filter(est >= thresh) // CMS ≥ exact: lossless candidate prune
        .groupBy("user_id").agg(count(lit(1)).as("n"))
        .filter(col("n") >= thresh)
        .orderBy("user_id")
    },

    // Key-skew profiler — the diagnostic that DECIDES the q66 salt
    // fan-out: per-key frequencies (one narrow aggregate, shuffle ∝
    // distinct keys, never rows), then one-row distribution stats —
    // max/mean ratio, interpolated p50/p99 of the key-count
    // distribution, and the salt bucket count ceil(max/mean) a salted
    // join would provision. At 100 TB this is the cheap pre-pass over
    // a join key that picks broadcast vs salt vs plain shuffle before
    // committing to a plan. Exact arithmetic: counts are longs, the
    // mean is one IEEE division of exact longs, identical both
    // engines.
    QueryDef(
      "q98_key_skew",
      """WITH k AS (SELECT user_id, count(*) AS cnt FROM events GROUP BY 1)
        |SELECT CAST(count(*) AS BIGINT) AS n_keys,
        | CAST(max(cnt) AS BIGINT) AS max_cnt,
        | round(avg(cnt), 4) AS mean_cnt,
        | round(quantile_cont(cnt, 0.5), 4) AS p50_cnt,
        | round(quantile_cont(cnt, 0.99), 4) AS p99_cnt,
        | round(max(cnt) / avg(cnt), 4) AS skew_ratio,
        | CAST(ceil(max(cnt) / avg(cnt)) AS INTEGER) AS salt_buckets
        |FROM k""".stripMargin) { (spark, dir) =>
      val k = Tables(spark, dir).events
        .groupBy("user_id").agg(count(lit(1)).as("cnt"))
      k.agg(
        count(lit(1)).as("n_keys"),
        max("cnt").as("max_cnt"),
        round(avg("cnt"), 4).as("mean_cnt"),
        round(percentile(col("cnt"), lit(0.5)), 4).as("p50_cnt"),
        round(percentile(col("cnt"), lit(0.99)), 4).as("p99_cnt"),
        round(max(col("cnt")) / avg(col("cnt")), 4).as("skew_ratio"),
        ceil(max(col("cnt")) / avg(col("cnt"))).cast("int").as("salt_buckets"))
    },

    // File-level zone maps (ops.ZoneMaps) — the q81 layout argument
    // made OPERATIONAL: lineitem staged into a range-clustered
    // multi-file layout, a min/max manifest built over it, and the
    // scan answered through ZoneMaps.prunedRead, which consults the
    // manifest and reads ONLY files whose [min, max] overlaps the
    // predicate (plus re-applies the predicate exactly). The oracle
    // is the plain filtered aggregate — file skipping must be
    // invisible in the ANSWER (rows survive iff they match, whatever
    // files they live in); the files-actually-skipped mechanics are
    // ZoneMapsSpec's job. At 100 TB the manifest is one small parquet
    // scan instead of millions of footer opens.
    QueryDef.statefulQ(
      "q115_zonemap_pruned_scan",
      """SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n,
        | round(sum(l_quantity), 2) AS sum_qty,
        | round(sum(l_extendedprice), 2) AS sum_price
        |FROM lineitem WHERE l_orderkey BETWEEN 1000 AND 2999
        |GROUP BY 1 ORDER BY l_returnflag""".stripMargin) { (spark, dir) =>
      val work = QueryDef.tempWorkDir("graft-zm-q115-")
      Tables(spark, dir).lineitem
        .repartitionByRange(16, col("l_orderkey"))
        .write.mode("overwrite").parquet(s"$work/data")
      graft.ops.ZoneMaps.build(spark, s"$work/data", s"$work/manifest",
        Seq("l_orderkey"))
      graft.ops.ZoneMaps.prunedRead(spark, s"$work/data", s"$work/manifest",
          "l_orderkey", 1000L, 2999L)
        .groupBy("l_returnflag")
        .agg(count(lit(1)).as("n"),
          round(sum("l_quantity"), 2).as("sum_qty"),
          round(sum("l_extendedprice"), 2).as("sum_price"))
        .orderBy("l_returnflag")
    },

    // The full layout stack composed: events staged through
    // ops.ZOrder.layout on (user bucket, hour bucket), a two-column
    // zone-map manifest built over the written files, and a
    // TWO-DIMENSIONAL range scan answered via prunedReadAll — the
    // conjunction skips any file either range rules out, which is
    // exactly what z-ordering (files tight in BOTH dimensions) makes
    // effective. The oracle is the plain doubly-filtered aggregate:
    // layout + manifest + skipping must be invisible in the answer.
    QueryDef.statefulQ(
      "q116_zoned_layout_scan",
      """WITH b AS (SELECT user_id % 256 AS u,
        |   (epoch_us(ts) // 3600000000) % 256 AS h,
        |   event_type, value FROM events)
        |SELECT event_type, CAST(count(*) AS BIGINT) AS n,
        | round(sum(value), 2) AS sum_value
        |FROM b WHERE u BETWEEN 0 AND 63 AND h BETWEEN 0 AND 63
        |GROUP BY 1 ORDER BY event_type""".stripMargin) { (spark, dir) =>
      val staged = Tables(spark, dir).events
        .select((col("user_id") % 256).as("u"),
          (expr("unix_micros(ts) div 3600000000") % 256).as("h"),
          col("event_type"), col("value"))
      val work = QueryDef.tempWorkDir("graft-zm-q116-")
      graft.ops.ZOrder.layout(staged, col("u"), col("h"), bits = 8,
          partitions = 16)
        .write.mode("overwrite").parquet(s"$work/data")
      graft.ops.ZoneMaps.build(spark, s"$work/data", s"$work/manifest",
        Seq("u", "h"))
      graft.ops.ZoneMaps.prunedReadAll(spark, s"$work/data",
          s"$work/manifest",
          Seq(("u", 0L, 63L), ("h", 0L, 63L)))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("sum_value"))
        .orderBy("event_type")
    },

    // Time travel (ops.TimeTravel.asOf): the events stream treated as
    // a change log keyed by user — reconstruct each user's LATEST
    // event as of 2024-01-15 (ties by event_id, the kernel's
    // offset-order argument) and aggregate the frozen state. The
    // oracle derives the same snapshot with a plain ranked window —
    // asOf is that window plus the cutoff and tombstone rules, so
    // hash equality pins the kernel's keep-latest semantics to SQL.
    // (Delete/dt-prune behavior rides the pipeline fixtures in
    // TimeTravelSpec; events carry no deletes.)
    QueryDef(
      "q117_asof_snapshot",
      """WITH ranked AS (SELECT user_id, event_type, value,
        |   row_number() OVER (PARTITION BY user_id
        |     ORDER BY ts DESC, event_id DESC) AS rn
        | FROM events WHERE ts <= TIMESTAMP '2024-01-15 00:00:00')
        |SELECT event_type, CAST(count(*) AS BIGINT) AS n_users,
        | round(sum(value), 2) AS sum_value
        |FROM ranked WHERE rn = 1
        |GROUP BY 1 ORDER BY event_type""".stripMargin) { (spark, dir) =>
      // microseconds, not millis: the fixture's ts is μs-precision,
      // and a millisecond _ts would tie rows the oracle's full-μs
      // ORDER BY still distinguishes
      val cutoffUs = java.time.LocalDateTime.of(2024, 1, 15, 0, 0)
        .toInstant(java.time.ZoneOffset.UTC).toEpochMilli * 1000L
      val log = Tables(spark, dir).events
        .select(col("user_id"), col("event_type"), col("value"),
          col("event_id"),
          unix_micros(col("ts")).as("_ts"), lit("UPDATE").as("_op"))
      graft.ops.TimeTravel.asOf(log, Seq("user_id"), cutoffUs,
          Seq(col("_ts"), col("event_id")))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n_users"),
          round(sum("value"), 2).as("sum_value"))
        .orderBy("event_type")
    },

    // Bloom point lookup (ops.ZoneMaps bloom grids): lineitem staged
    // into a HASH-scattered layout — every file's [min, max] spans
    // nearly the whole orderkey domain, so range zone maps prune
    // nothing and only the per-file Bloom grid can skip — then one
    // order's line items are fetched via prunedLookup. The oracle is
    // the plain equality filter: Bloom membership has no false
    // negatives and the equality is re-applied, so file skipping must
    // be invisible in the answer.
    QueryDef.statefulQ(
      "q118_bloom_point_lookup",
      """SELECT l_linenumber, l_partkey, round(l_extendedprice, 2) AS price
        |FROM lineitem WHERE l_orderkey = 1024
        |ORDER BY l_linenumber""".stripMargin) { (spark, dir) =>
      val work = QueryDef.tempWorkDir("graft-zm-q118-")
      Tables(spark, dir).lineitem
        .repartition(16, col("l_orderkey"))
        .write.mode("overwrite").parquet(s"$work/data")
      graft.ops.ZoneMaps.build(spark, s"$work/data", s"$work/manifest",
        Seq("l_orderkey"), bloomColumns = Seq("l_orderkey"))
      graft.ops.ZoneMaps.prunedLookup(spark, s"$work/data",
          s"$work/manifest", "l_orderkey", 1024L)
        .select(col("l_linenumber"), col("l_partkey"),
          round(col("l_extendedprice"), 2).as("price"))
        .orderBy("l_linenumber")
    },

    // Planner-integrated zone maps (ops.ZoneMapTable): the same
    // manifest as q115, but consulted by CATALYST — the query is a
    // plain DataFrame filter + aggregate over ZoneMapTable(...), and
    // the custom FileIndex prunes files from the pushed-down data
    // filters at listFiles time, with zero caller cooperation (no
    // prunedRead call anywhere). The predicate mixes an indexed
    // range (prunes), an unindexed equality (proves nothing, runs
    // row-level), and the partition-discovery path — all of which
    // must be invisible in the answer vs the plain SQL oracle.
    QueryDef.statefulQ(
      "q119_zonemap_table_scan",
      """SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n,
        | round(sum(l_quantity), 2) AS sum_qty,
        | round(sum(l_extendedprice), 2) AS sum_price
        |FROM lineitem
        |WHERE l_orderkey BETWEEN 500 AND 2499 AND l_linenumber = 1
        |GROUP BY 1 ORDER BY l_returnflag""".stripMargin) { (spark, dir) =>
      val work = QueryDef.tempWorkDir("graft-zm-q119-")
      Tables(spark, dir).lineitem
        .repartitionByRange(16, col("l_orderkey"))
        .write.mode("overwrite").parquet(s"$work/data")
      graft.ops.ZoneMaps.build(spark, s"$work/data", s"$work/manifest",
        Seq("l_orderkey"))
      graft.ops.ZoneMapTable(spark, s"$work/data", s"$work/manifest")
        .filter(col("l_orderkey").between(500, 2499) &&
          col("l_linenumber") === 1)
        .groupBy("l_returnflag")
        .agg(count(lit(1)).as("n"),
          round(sum("l_quantity"), 2).as("sum_qty"),
          round(sum("l_extendedprice"), 2).as("sum_price"))
        .orderBy("l_returnflag")
    },

    // Evolved-table union (ops.EvolvedRead): lineitem split into a
    // "base era" physical table (3 columns) and its dated schema fork
    // (adds l_extendedprice) under the sink naming convention, then
    // read back as ONE logical table — schemas aligned by name, the
    // added column null-filled backward, `_table_version` carrying
    // lineage. The oracle derives the same union from lineitem
    // directly with a CASE-era split, so hash equality pins the
    // discovery + alignment semantics (decoy dirs that must NOT be
    // absorbed ride in EvolvedReadSpec).
    QueryDef.statefulQ(
      "q120_evolved_union",
      """WITH eras AS (SELECT
        |   CASE WHEN l_orderkey <= 700 THEN 'base'
        |        ELSE 'v20240401' END AS _table_version,
        |   l_quantity,
        |   CASE WHEN l_orderkey <= 700 THEN NULL
        |        ELSE l_extendedprice END AS price
        | FROM lineitem)
        |SELECT _table_version, CAST(count(*) AS BIGINT) AS n,
        | round(sum(l_quantity), 2) AS sum_qty,
        | CAST(count(price) AS BIGINT) AS n_price,
        | round(coalesce(sum(price), 0), 2) AS sum_price
        |FROM eras GROUP BY 1 ORDER BY _table_version""".stripMargin) {
      (spark, dir) =>
      val work = QueryDef.tempWorkDir("graft-evo-q120-")
      val li = Tables(spark, dir).lineitem
      li.filter(col("l_orderkey") <= 700)
        .select("l_orderkey", "l_linenumber", "l_quantity")
        .write.mode("overwrite").parquet(s"$work/q120_db__li")
      li.filter(col("l_orderkey") > 700)
        .select("l_orderkey", "l_linenumber", "l_quantity",
          "l_extendedprice")
        .write.mode("overwrite").parquet(s"$work/q120_db__li_v20240401")
      graft.ops.EvolvedRead.readAll(spark, work, "q120", "db", "li")
        .groupBy("_table_version")
        .agg(count(lit(1)).as("n"),
          round(sum("l_quantity"), 2).as("sum_qty"),
          count(col("l_extendedprice")).as("n_price"),
          round(coalesce(sum("l_extendedprice"), lit(0)), 2)
            .as("sum_price"))
        .orderBy("_table_version")
    },

    // Copy-on-write current-state table (streaming.CurrentTable): the
    // events stream as a user-keyed changelog, materialized in TWO
    // incremental syncs (the second fold touches only the buckets its
    // keys hash into), then the frozen state aggregated. The oracle
    // is q117's ranked window with no cutoff — keep-latest per user —
    // so hash equality pins the whole sync discipline: bucket
    // assignment, per-bucket merge, delta-only folding, cursor.
    QueryDef.statefulQ(
      "q124_current_table",
      """WITH ranked AS (SELECT user_id, event_type, value,
        |   row_number() OVER (PARTITION BY user_id
        |     ORDER BY ts DESC, event_id DESC) AS rn
        | FROM events)
        |SELECT event_type, CAST(count(*) AS BIGINT) AS n_users,
        | round(sum(value), 2) AS sum_value
        |FROM ranked WHERE rn = 1
        |GROUP BY 1 ORDER BY event_type""".stripMargin) { (spark, dir) =>
      val work = QueryDef.tempWorkDir("graft-ct-q124-")
      val midUs = java.time.LocalDateTime.of(2024, 1, 15, 0, 0)
        .toInstant(java.time.ZoneOffset.UTC).toEpochMilli * 1000L
      val log = Tables(spark, dir).events
        .select(col("user_id"), col("event_type"), col("value"),
          col("event_id"),
          unix_micros(col("ts")).as("_ts"), lit("UPDATE").as("_op"),
          when(unix_micros(col("ts")) <= midUs, "h1").otherwise("h2")
            .as("dt"))
      val order = Some(Seq(col("_ts"), col("event_id")))
      log.filter(col("dt") === "h1")
        .write.mode("append").partitionBy("dt").parquet(s"$work/sink")
      graft.streaming.CurrentTable.sync(spark, s"$work/sink",
        s"$work/cur", Seq("user_id"), buckets = 8,
        orderOverride = order)
      log.filter(col("dt") === "h2")
        .write.mode("append").partitionBy("dt").parquet(s"$work/sink")
      graft.streaming.CurrentTable.sync(spark, s"$work/sink",
        s"$work/cur", Seq("user_id"), orderOverride = order)
      graft.streaming.CurrentTable.read(spark, s"$work/cur")
        .groupBy("event_type")
        .agg(count(lit(1)).as("n_users"),
          round(sum("value"), 2).as("sum_value"))
        .orderBy("event_type")
    },

    // The current table's delete semantics under a sink rewrite: every
    // 'purchase' event is that user's DELETE, the first half of the
    // changelog is COMPACTED (files renamed) between the two syncs, so
    // the second sync re-folds h1's already-folded changes. The oracle
    // keeps users whose LATEST event is not a purchase — hash equality
    // therefore pins the resurrection defense: a user deleted in h2
    // must stay dead when their older h1 changes re-fold, which only
    // holds because tombstones are retained in the buckets and win the
    // keep-latest rematch.
    QueryDef.statefulQ(
      "q125_current_tombstones",
      """WITH ranked AS (SELECT user_id, event_type, value,
        |   row_number() OVER (PARTITION BY user_id
        |     ORDER BY ts DESC, event_id DESC) AS rn
        | FROM events)
        |SELECT event_type, CAST(count(*) AS BIGINT) AS n_users,
        | round(sum(value), 2) AS sum_value
        |FROM ranked WHERE rn = 1 AND event_type <> 'purchase'
        |GROUP BY 1 ORDER BY event_type""".stripMargin) { (spark, dir) =>
      val work = QueryDef.tempWorkDir("graft-ct-q125-")
      val midUs = java.time.LocalDateTime.of(2024, 1, 15, 0, 0)
        .toInstant(java.time.ZoneOffset.UTC).toEpochMilli * 1000L
      val log = Tables(spark, dir).events
        .select(col("user_id"), col("event_type"), col("value"),
          col("event_id"),
          unix_micros(col("ts")).as("_ts"),
          when(col("event_type") === "purchase", "DELETE")
            .otherwise("UPDATE").as("_op"),
          when(unix_micros(col("ts")) <= midUs, "h1").otherwise("h2")
            .as("dt"))
      val orderCols = Seq(col("_ts"), col("event_id"))
      log.filter(col("dt") === "h1")
        .write.mode("append").partitionBy("dt").parquet(s"$work/sink")
      graft.streaming.CurrentTable.sync(spark, s"$work/sink",
        s"$work/cur", Seq("user_id"), buckets = 8,
        orderOverride = Some(orderCols))
      // the rewrite: h1's files come back under new names, so the
      // second sync sees them as fresh and re-folds every h1 change
      graft.streaming.Compaction.compactPartitions(spark, s"$work/sink",
        Seq("h1"), 1000000L, orderCols)
      log.filter(col("dt") === "h2")
        .write.mode("append").partitionBy("dt").parquet(s"$work/sink")
      graft.streaming.CurrentTable.sync(spark, s"$work/sink",
        s"$work/cur", Seq("user_id"), orderOverride = Some(orderCols))
      graft.streaming.CurrentTable.read(spark, s"$work/cur")
        .groupBy("event_type")
        .agg(count(lit(1)).as("n_users"),
          round(sum("value"), 2).as("sum_value"))
        .orderBy("event_type")
    },

    // Maintained current state ACROSS schema-evolution forks
    // (CurrentTable.readEvolved): the events changelog splits at a
    // structural change — the base era's physical table lacks `value`,
    // the dated fork adds it — each era's pipeline maintains its OWN
    // current table, and readEvolved presents them as one logical
    // current table: schemas aligned by name (q120's rules),
    // keep-latest per key ACROSS forks, fork tombstones suppressing
    // base-era rows. The oracle is the global ranked-window
    // keep-latest over the whole log with the era split re-derived in
    // SQL — hash equality pins the cross-fork merge: a user whose
    // latest change predates the fork shows the base-era row (null
    // value), one who changed after shows the fork row, one whose
    // latest is a delete (purchase) in EITHER era stays dead.
    QueryDef.statefulQ(
      "q126_evolved_current",
      """WITH ranked AS (SELECT user_id, event_type, value,
        |   epoch_us(ts) AS tsu,
        |   row_number() OVER (PARTITION BY user_id
        |     ORDER BY ts DESC, event_id DESC) AS rn
        | FROM events),
        |cur AS (SELECT
        |   CASE WHEN tsu <= 1705276800000000 THEN 'base'
        |        ELSE 'v20240701' END AS _table_version,
        |   event_type,
        |   CASE WHEN tsu <= 1705276800000000 THEN NULL
        |        ELSE value END AS value
        | FROM ranked WHERE rn = 1 AND event_type <> 'purchase')
        |SELECT _table_version, event_type,
        | CAST(count(*) AS BIGINT) AS n_users,
        | round(coalesce(sum(value), 0), 2) AS sum_value
        |FROM cur GROUP BY 1, 2
        |ORDER BY _table_version, event_type""".stripMargin) {
      (spark, dir) =>
      val work = QueryDef.tempWorkDir("graft-ct-q126-")
      val midUs = 1705276800000000L // 2024-01-15T00:00:00Z in micros
      val log = Tables(spark, dir).events
        .select(col("user_id"), col("event_type"), col("value"),
          col("event_id"),
          unix_micros(col("ts")).as("_ts"),
          when(col("event_type") === "purchase", "DELETE")
            .otherwise("UPDATE").as("_op"),
          lit("all").as("dt"))
      val orderCols = Some(Seq(col("_ts"), col("event_id")))
      val base = s"$work/q126_db__ev"
      val fork = s"$work/q126_db__ev_v20240701"
      // base era: pre-fork changes, pre-evolution schema (no value)
      log.filter(col("_ts") <= midUs).drop("value")
        .write.mode("append").partitionBy("dt").parquet(base)
      // fork era: post-fork changes with the added column
      log.filter(col("_ts") > midUs)
        .write.mode("append").partitionBy("dt").parquet(fork)
      for (d <- Seq(base, fork))
        graft.streaming.CurrentTable.sync(spark, d, s"${d}__current",
          Seq("user_id"), buckets = 8, orderOverride = orderCols)
      graft.streaming.CurrentTable.readEvolved(spark, work, "q126",
          "db", "ev", Seq("user_id"), orderOverride = orderCols)
        .groupBy("_table_version", "event_type")
        .agg(count(lit(1)).as("n_users"),
          round(coalesce(sum("value"), lit(0)), 2).as("sum_value"))
        .orderBy("_table_version", "event_type")
    },

    // Cross-fork POINT lookups (CurrentTable.lookupEvolved): the same
    // two-fork evolved table as q126, probed for the 7 smallest
    // user_ids through each fork's own bucket layout — raw per-fork
    // hits (tombstones included) merged keep-latest so a post-fork
    // delete (purchase) kills the probed key, THEN filtered. The
    // oracle is the global ranked-window keep-latest restricted to
    // the same probe set — row-level hash equality pins that the
    // bucket-pruned probe path returns exactly what a full evolved
    // read would for those keys: base-era users surface with a null
    // (-1-coalesced) value, post-fork changers with the fork row,
    // latest-is-purchase users not at all.
    QueryDef.statefulQ(
      "q127_evolved_lookup",
      """WITH ranked AS (SELECT user_id, event_type, value,
        |   epoch_us(ts) AS tsu,
        |   row_number() OVER (PARTITION BY user_id
        |     ORDER BY ts DESC, event_id DESC) AS rn
        | FROM events),
        |probe AS (SELECT DISTINCT user_id FROM events
        |          ORDER BY user_id LIMIT 7)
        |SELECT user_id,
        | CASE WHEN tsu <= 1705276800000000 THEN 'base'
        |      ELSE 'v20240701' END AS _table_version,
        | event_type,
        | CASE WHEN tsu <= 1705276800000000 THEN -1.0
        |      ELSE coalesce(round(value, 2), -1.0) END AS value
        |FROM ranked WHERE rn = 1 AND event_type <> 'purchase'
        | AND user_id IN (SELECT user_id FROM probe)
        |ORDER BY user_id""".stripMargin) { (spark, dir) =>
      val work = QueryDef.tempWorkDir("graft-ct-q127-")
      val midUs = 1705276800000000L // 2024-01-15T00:00:00Z in micros
      val log = Tables(spark, dir).events
        .select(col("user_id"), col("event_type"), col("value"),
          col("event_id"),
          unix_micros(col("ts")).as("_ts"),
          when(col("event_type") === "purchase", "DELETE")
            .otherwise("UPDATE").as("_op"),
          lit("all").as("dt"))
      val orderCols = Some(Seq(col("_ts"), col("event_id")))
      val base = s"$work/q127_db__ev"
      val fork = s"$work/q127_db__ev_v20240701"
      log.filter(col("_ts") <= midUs).drop("value")
        .write.mode("append").partitionBy("dt").parquet(base)
      log.filter(col("_ts") > midUs)
        .write.mode("append").partitionBy("dt").parquet(fork)
      for (d <- Seq(base, fork))
        graft.streaming.CurrentTable.sync(spark, d, s"${d}__current",
          Seq("user_id"), buckets = 8, orderOverride = orderCols)
      val probe = Tables(spark, dir).events
        .select("user_id").distinct().orderBy("user_id").limit(7)
      graft.streaming.CurrentTable.lookupEvolved(spark, work, "q127",
          "db", "ev", Seq("user_id"), probe, orderOverride = orderCols)
        .select(col("user_id"), col("_table_version"), col("event_type"),
          coalesce(round(col("value"), 2), lit(-1.0)).as("value"))
        .orderBy("user_id")
    },

    // Mid-life RESCALE (CurrentTable.rescale): the q125 lifecycle —
    // tombstones included — with the bucket modulus flipped 4→9
    // between the two syncs. Every row re-hashes into a new bucket,
    // the tombstone census follows its tombstone, and the SECOND sync
    // folds its delta incrementally into the rescaled layout (the
    // cursor tracks sink files, which never moved). The oracle is the
    // ROW-LEVEL global keep-latest — a single drifted key (folded
    // under the old modulus, doubled across layouts, or resurrected
    // past its migrated tombstone) breaks the hash, not just an
    // aggregate.
    QueryDef.statefulQ(
      "q128_current_rescale",
      """WITH ranked AS (SELECT user_id, event_type, value,
        |   row_number() OVER (PARTITION BY user_id
        |     ORDER BY ts DESC, event_id DESC) AS rn
        | FROM events)
        |SELECT user_id, event_type, round(value, 2) AS value
        |FROM ranked WHERE rn = 1 AND event_type <> 'purchase'
        |ORDER BY user_id""".stripMargin) { (spark, dir) =>
      val work = QueryDef.tempWorkDir("graft-ct-q128-")
      val midUs = 1705276800000000L // 2024-01-15T00:00:00Z in micros
      val log = Tables(spark, dir).events
        .select(col("user_id"), col("event_type"), col("value"),
          col("event_id"),
          unix_micros(col("ts")).as("_ts"),
          when(col("event_type") === "purchase", "DELETE")
            .otherwise("UPDATE").as("_op"),
          when(unix_micros(col("ts")) <= midUs, "h1").otherwise("h2")
            .as("dt"))
      val orderCols = Some(Seq(col("_ts"), col("event_id")))
      log.filter(col("dt") === "h1")
        .write.mode("append").partitionBy("dt").parquet(s"$work/sink")
      graft.streaming.CurrentTable.sync(spark, s"$work/sink",
        s"$work/cur", Seq("user_id"), buckets = 4,
        orderOverride = orderCols)
      graft.streaming.CurrentTable.rescale(spark, s"$work/cur",
        Seq("user_id"), newBuckets = 9)
      log.filter(col("dt") === "h2")
        .write.mode("append").partitionBy("dt").parquet(s"$work/sink")
      graft.streaming.CurrentTable.sync(spark, s"$work/sink",
        s"$work/cur", Seq("user_id"), orderOverride = orderCols)
      graft.streaming.CurrentTable.read(spark, s"$work/cur")
        .select(col("user_id"), col("event_type"),
          round(col("value"), 2).as("value"))
        .orderBy("user_id")
    },

    // Incrementally-maintained ROLLUP (ops.RollupTable): a grouped
    // aggregate over the current state, stored as per-bucket partial
    // aggregates and kept fresh by each sync recomputing ONLY the
    // buckets it rewrote — the materialized dashboard table refreshed
    // for delta cost, never a corpus rescan. The lifecycle: first
    // sync, ATTACH (the one full-build pass), second sync maintains
    // the partials incrementally — with purchases as DELETEs, so the
    // rollup's tombstone exclusion and the delete-kills-key rule are
    // both in the hash. The oracle aggregates the ranked-window
    // keep-latest directly; equality pins attach + incremental
    // maintain + cross-bucket partial merge end to end.
    QueryDef.statefulQ(
      "q129_rollup_table",
      """WITH ranked AS (SELECT user_id, event_type, value,
        |   row_number() OVER (PARTITION BY user_id
        |     ORDER BY ts DESC, event_id DESC) AS rn
        | FROM events)
        |SELECT event_type, CAST(count(*) AS BIGINT) AS n_users,
        | round(sum(value), 2) AS sum_value,
        | round(min(value), 2) AS min_value,
        | round(max(value), 2) AS max_value
        |FROM ranked WHERE rn = 1 AND event_type <> 'purchase'
        |GROUP BY 1 ORDER BY event_type""".stripMargin) { (spark, dir) =>
      val work = QueryDef.tempWorkDir("graft-ct-q129-")
      val midUs = 1705276800000000L // 2024-01-15T00:00:00Z in micros
      val log = Tables(spark, dir).events
        .select(col("user_id"), col("event_type"), col("value"),
          col("event_id"),
          unix_micros(col("ts")).as("_ts"),
          when(col("event_type") === "purchase", "DELETE")
            .otherwise("UPDATE").as("_op"),
          when(unix_micros(col("ts")) <= midUs, "h1").otherwise("h2")
            .as("dt"))
      val orderCols = Some(Seq(col("_ts"), col("event_id")))
      log.filter(col("dt") === "h1")
        .write.mode("append").partitionBy("dt").parquet(s"$work/sink")
      graft.streaming.CurrentTable.sync(spark, s"$work/sink",
        s"$work/cur", Seq("user_id"), buckets = 8,
        orderOverride = orderCols)
      graft.ops.RollupTable.attach(spark, s"$work/cur", "by_type",
        graft.ops.RollupTable.Spec(Seq("event_type"), Seq(
          graft.ops.RollupTable.Agg("count", "*", "n_users"),
          graft.ops.RollupTable.Agg("sum", "value", "sum_value"),
          graft.ops.RollupTable.Agg("min", "value", "min_value"),
          graft.ops.RollupTable.Agg("max", "value", "max_value"))))
      log.filter(col("dt") === "h2")
        .write.mode("append").partitionBy("dt").parquet(s"$work/sink")
      graft.streaming.CurrentTable.sync(spark, s"$work/sink",
        s"$work/cur", Seq("user_id"), orderOverride = orderCols)
      graft.ops.RollupTable.read(spark, s"$work/cur", "by_type")
        .select(col("event_type"), col("n_users"),
          round(col("sum_value"), 2).as("sum_value"),
          round(col("min_value"), 2).as("min_value"),
          round(col("max_value"), 2).as("max_value"))
        .orderBy("event_type")
    },

    // Secondary bloom index (ops.BucketIndex): point lookups on a
    // NON-key column of the maintained current table — the layout
    // prunes by primary key only, so without the index every such
    // probe scans all buckets. Per-bucket blooms over the column's
    // live values, attached after the first sync and MAINTAINED by
    // the second (the incremental re-bloom path is in the hash), then
    // probed with the 5 smallest event_ids of the final state. The
    // oracle filters the ranked-window keep-latest with the same IN
    // list derived in SQL — equality pins no-false-negative bloom
    // candidates + the exact post-filter + tombstone exclusion, with
    // deletes in the log.
    QueryDef.statefulQ(
      "q130_secondary_index",
      """WITH ranked AS (SELECT user_id, event_type, value, event_id,
        |   row_number() OVER (PARTITION BY user_id
        |     ORDER BY ts DESC, event_id DESC) AS rn
        | FROM events),
        |cur AS (SELECT user_id, event_type, value, event_id
        | FROM ranked WHERE rn = 1 AND event_type <> 'purchase')
        |SELECT user_id, event_id, event_type, round(value, 2) AS value
        |FROM cur
        |WHERE event_id IN (SELECT event_id FROM cur
        |                   ORDER BY event_id LIMIT 5)
        |ORDER BY user_id""".stripMargin) { (spark, dir) =>
      val work = QueryDef.tempWorkDir("graft-ct-q130-")
      val midUs = 1705276800000000L // 2024-01-15T00:00:00Z in micros
      val log = Tables(spark, dir).events
        .select(col("user_id"), col("event_type"), col("value"),
          col("event_id"),
          unix_micros(col("ts")).as("_ts"),
          when(col("event_type") === "purchase", "DELETE")
            .otherwise("UPDATE").as("_op"),
          when(unix_micros(col("ts")) <= midUs, "h1").otherwise("h2")
            .as("dt"))
      val orderCols = Some(Seq(col("_ts"), col("event_id")))
      log.filter(col("dt") === "h1")
        .write.mode("append").partitionBy("dt").parquet(s"$work/sink")
      graft.streaming.CurrentTable.sync(spark, s"$work/sink",
        s"$work/cur", Seq("user_id"), buckets = 8,
        orderOverride = orderCols)
      graft.ops.BucketIndex.attach(spark, s"$work/cur", "event_id")
      log.filter(col("dt") === "h2")
        .write.mode("append").partitionBy("dt").parquet(s"$work/sink")
      graft.streaming.CurrentTable.sync(spark, s"$work/sink",
        s"$work/cur", Seq("user_id"), orderOverride = orderCols)
      val probe = graft.streaming.CurrentTable.read(spark, s"$work/cur")
        .select("event_id").orderBy("event_id").limit(5)
      graft.ops.BucketIndex.lookupBy(spark, s"$work/cur", "event_id",
        probe)
        .select(col("user_id"), col("event_id"), col("event_type"),
          round(col("value"), 2).as("value"))
        .orderBy("user_id")
    },

    // Distinct-count ROLLUP measure (RollupTable op "countd"): the
    // one aggregate no exact partial can maintain — distinct does not
    // decompose across key buckets for non-key columns — held as a
    // materialized KMV min-hash sketch per bucket; merging bucket
    // sketches is EXACTLY the whole-table sketch (the global k
    // smallest hashes survive in some bucket's k smallest). Two
    // measures pin both regimes: distinct users (cardinality >> k=256
    // → the estimator) and distinct event types (< k → exact count),
    // both maintained through a delta sync with deletes. The oracle
    // re-derives the q60 estimator in SQL over the ranked-window
    // keep-latest state — hash equality means the sketch a sync
    // maintained per bucket merged to the estimator an independent
    // engine computes from scratch.
    QueryDef.statefulQ(
      "q131_rollup_countd",
      """WITH ranked AS (SELECT user_id, event_type,
        |   row_number() OVER (PARTITION BY user_id
        |     ORDER BY ts DESC, event_id DESC) AS rn
        | FROM events),
        |cur AS (SELECT user_id, event_type FROM ranked
        |        WHERE rn = 1 AND event_type <> 'purchase'),
        |hu AS (SELECT DISTINCT
        |   ('0x'||substr(md5(CAST(user_id AS VARCHAR)),1,15))::BIGINT AS hv
        | FROM cur),
        |ru AS (SELECT hv, row_number() OVER (ORDER BY hv) AS rn,
        |   count(*) OVER () AS cnt FROM hu),
        |eu AS (SELECT CASE WHEN cnt < 256 THEN CAST(cnt AS DOUBLE)
        |   ELSE 255 * 1152921504606846976.0 / hv END AS d_users
        | FROM ru WHERE rn = least(256, cnt)),
        |ht AS (SELECT DISTINCT
        |   ('0x'||substr(md5(event_type),1,15))::BIGINT AS hv
        | FROM cur),
        |rt AS (SELECT hv, row_number() OVER (ORDER BY hv) AS rn,
        |   count(*) OVER () AS cnt FROM ht),
        |et AS (SELECT CASE WHEN cnt < 256 THEN CAST(cnt AS DOUBLE)
        |   ELSE 255 * 1152921504606846976.0 / hv END AS d_types
        | FROM rt WHERE rn = least(256, cnt))
        |SELECT d_users, d_types FROM eu, et""".stripMargin) { (spark, dir) =>
      val work = QueryDef.tempWorkDir("graft-ct-q131-")
      val midUs = 1705276800000000L // 2024-01-15T00:00:00Z in micros
      val log = Tables(spark, dir).events
        .select(col("user_id"), col("event_type"), col("event_id"),
          unix_micros(col("ts")).as("_ts"),
          when(col("event_type") === "purchase", "DELETE")
            .otherwise("UPDATE").as("_op"),
          when(unix_micros(col("ts")) <= midUs, "h1").otherwise("h2")
            .as("dt"))
      val orderCols = Some(Seq(col("_ts"), col("event_id")))
      log.filter(col("dt") === "h1")
        .write.mode("append").partitionBy("dt").parquet(s"$work/sink")
      graft.streaming.CurrentTable.sync(spark, s"$work/sink",
        s"$work/cur", Seq("user_id"), buckets = 8,
        orderOverride = orderCols)
      graft.ops.RollupTable.attach(spark, s"$work/cur", "d",
        graft.ops.RollupTable.Spec(Nil, Seq(
          graft.ops.RollupTable.Agg("countd", "user_id", "d_users"),
          graft.ops.RollupTable.Agg("countd", "event_type", "d_types"))))
      log.filter(col("dt") === "h2")
        .write.mode("append").partitionBy("dt").parquet(s"$work/sink")
      graft.streaming.CurrentTable.sync(spark, s"$work/sink",
        s"$work/cur", Seq("user_id"), orderOverride = orderCols)
      graft.ops.RollupTable.read(spark, s"$work/cur", "d")
        .select(col("d_users"), col("d_types"))
    },

    // The current table's EMPTY-STATE cycle (round 19): every key
    // deleted and the tombstones pruned leaves ZERO bucket dirs —
    // empty buckets are dropped at swap, a designed layout state —
    // and the `#schema` root line keeps that table servable (typed
    // empty reads) instead of bricked on parquet schema inference,
    // exactly the maintained indexes' readOrEmpty discipline. The
    // lifecycle: full corpus → delete ALL → prune to zero buckets →
    // READ the emptied table (its count rides the output as
    // `empty_rows`, so the oracle hash gates the emptiness itself) →
    // repopulate every user_id % 3 == 0 through the ordinary sync
    // path → serve. The oracle recomputes the repopulated state from
    // the events table; a resurrected row, a lost repopulation, or a
    // non-zero post-prune read breaks the hash.
    QueryDef.statefulQ(
      "q134_current_empty_cycle",
      """WITH ranked AS (SELECT user_id, event_type, value,
        |   row_number() OVER (PARTITION BY user_id
        |     ORDER BY ts DESC, event_id DESC) AS rn
        | FROM events)
        |SELECT event_type, CAST(count(*) AS BIGINT) AS n_users,
        | round(sum(value), 2) AS sum_value,
        | CAST(0 AS BIGINT) AS empty_rows
        |FROM ranked WHERE rn = 1 AND user_id % 3 = 0
        |GROUP BY 1 ORDER BY event_type""".stripMargin) { (spark, dir) =>
      val work = QueryDef.tempWorkDir("graft-ct-q134-")
      // seed ONLY the users the oracle reports (user_id % 3 = 0):
      // per-user keep-latest is independent across users, so the
      // other two thirds only ever inflated the h1 sync volume —
      // the q132 job-count finding's data-side twin. 4 buckets for
      // the third-sized corpus (8 was file overhead)
      val log = Tables(spark, dir).events
        .filter(col("user_id") % 3 === 0)
        .select(col("user_id"), col("event_type"), col("value"),
          col("event_id"), unix_micros(col("ts")).as("_ts"),
          lit("UPDATE").as("_op"), lit("h1").as("dt"))
      val order = Some(Seq(col("_ts"), col("event_id")))
      log.write.mode("append").partitionBy("dt").parquet(s"$work/sink")
      graft.streaming.CurrentTable.sync(spark, s"$work/sink",
        s"$work/cur", Seq("user_id"), buckets = 4,
        orderOverride = order)
      // each user's LATEST event row — the delete wave and the
      // repopulation both derive from it so the oracle can too
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("user_id")
        .orderBy(col("_ts").desc, col("event_id").desc)
      val latest = log.withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1).drop("rn")
      latest
        .withColumn("_op", lit("DELETE"))
        .withColumn("_ts", col("_ts") + lit(1000000000000L))
        .withColumn("dt", lit("h2"))
        .write.mode("append").partitionBy("dt").parquet(s"$work/sink")
      graft.streaming.CurrentTable.sync(spark, s"$work/sink",
        s"$work/cur", Seq("user_id"), orderOverride = order)
      graft.streaming.CurrentTable.pruneTombstones(spark, s"$work/cur",
        Long.MaxValue)
      // the emptied table must SERVE (zero rows), not crash — this
      // count rides the output, hash-gated against the oracle's 0
      val emptyRows = graft.streaming.CurrentTable
        .read(spark, s"$work/cur").count()
      latest
        .withColumn("_op", lit("CREATE"))
        .withColumn("_ts", col("_ts") + lit(2000000000000L))
        .withColumn("dt", lit("h3"))
        .write.mode("append").partitionBy("dt").parquet(s"$work/sink")
      graft.streaming.CurrentTable.sync(spark, s"$work/sink",
        s"$work/cur", Seq("user_id"), orderOverride = order)
      graft.streaming.CurrentTable.read(spark, s"$work/cur")
        .groupBy("event_type")
        .agg(count(lit(1)).as("n_users"),
          round(sum("value"), 2).as("sum_value"))
        .withColumn("empty_rows", lit(emptyRows))
        .orderBy("event_type")
    },
  )
}
