package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.ops.DdlClassifier

/** Batch-queryable versions of the reference's CDC operators
  * (SURVEY.md §2.2-§2.4), expressed over the events table so the
  * DuckDB oracle can check them. The streaming pipeline in
  * graft.streaming runs the same logic incrementally.
  */
object CdcQueries {

  /** DDL fixtures for q32 — one per branch of the classifier's
    * decision table (`mysql/DelayedStopSignalProcessFunction.java:166-201`).
    */
  val DdlFixtures: Seq[(Int, String)] = Seq(
    1 -> "ALTER TABLE t1 ADD COLUMN c INT",
    2 -> "ALTER TABLE t1 DROP COLUMN c",
    3 -> "ALTER TABLE t1 MODIFY COLUMN c BIGINT NOT NULL",
    4 -> "CREATE INDEX idx1 ON t1 (c)",
    5 -> "DROP INDEX idx1 ON t1",
    6 -> "ALTER TABLE t1 ADD INDEX idx2 (c)",
    7 -> "ALTER TABLE t1 DROP KEY idx2",
    8 -> "ALTER TABLE t1 ADD CONSTRAINT fk1 FOREIGN KEY (c) REFERENCES t2(id)",
    9 -> "ANALYZE TABLE t1",
    10 -> "OPTIMIZE TABLE t1",
    11 -> "REPAIR TABLE t1 QUICK",
    12 -> "TRUNCATE TABLE t1",
    13 -> "CREATE TABLE t9 (id INT PRIMARY KEY)",
    14 -> "DROP TABLE t9",
    15 -> "RENAME TABLE t1 TO t1_v20240401",
    16 -> "alter table t1 add column lower_case_check INT",
  )

  val defs: Seq[QueryDef] = Seq(

    // P2/T6 demux: route the multiplexed stream by its routing key and
    // strip metadata — per-route cardinality + id range.
    QueryDef(
      "q26_route_demux",
      """SELECT event_type AS route, count(*) AS n,
        | min(event_id) AS first_id, max(event_id) AS last_id
        |FROM events GROUP BY event_type ORDER BY route""".stripMargin) {
      (spark, dir) =>
        Tables(spark, dir).events
          .select(col("event_type").as("route"), col("event_id"))
          .groupBy("route")
          .agg(count(lit(1)).as("n"), min("event_id").as("first_id"),
            max("event_id").as("last_id"))
          .orderBy("route")
    },

    // P3-P6 offset store: per source, the offset of the last
    // non-snapshot record ("view" plays the READ role the reference
    // skips at BinlogOffsetStoreProcessFunction.java:33-40), formatted
    // like the reference's "{file},{pos}" write-back string.
    QueryDef(
      "q27_offset_store",
      """SELECT user_id,
        | concat(CAST(epoch_us(ts) AS VARCHAR), ',', CAST(event_id AS VARCHAR))
        |   AS last_offset
        |FROM (SELECT *, row_number() OVER (PARTITION BY user_id
        |        ORDER BY ts DESC, event_id DESC) AS rn
        |      FROM events WHERE event_type <> 'view')
        |WHERE rn = 1 ORDER BY user_id""".stripMargin) { (spark, dir) =>
      val w = Window.partitionBy("user_id")
        .orderBy(col("ts").desc, col("event_id").desc)
      Tables(spark, dir).events
        .filter(col("event_type") =!= "view")
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("user_id"),
          concat(unix_micros(col("ts")).cast("string"), lit(","),
            col("event_id").cast("string")).as("last_offset"))
        .orderBy("user_id")
    },

    // P7 status store: running record count + last event timestamp —
    // the job-status JSON the reference emits per checkpoint.
    QueryDef(
      "q28_status_store",
      """SELECT count(*) AS record_count,
        | strftime(max(ts), '%Y-%m-%d %H:%M:%S.%f') AS last_event_timestamp,
        | count(DISTINCT user_id) AS n_sources
        |FROM events""".stripMargin) { (spark, dir) =>
      Tables(spark, dir).events.agg(
        count(lit(1)).as("record_count"),
        date_format(max(col("ts")), "yyyy-MM-dd HH:mm:ss.SSSSSS")
          .as("last_event_timestamp"),
        countDistinct(col("user_id")).as("n_sources"))
    },

    // T7 sanitizer: '-' and '.' → '_' (utils/Sanitizer.java:4-8) over a
    // synthesized dotted name.
    QueryDef(
      "q29_sanitize_names",
      """SELECT p_partkey,
        | concat(replace(p_brand, '#', '-'), '.', p_type) AS raw_name,
        | translate(concat(replace(p_brand, '#', '-'), '.', p_type), '-.', '__')
        |   AS clean_name
        |FROM part ORDER BY p_partkey""".stripMargin) { (spark, dir) =>
      val raw = concat(regexp_replace(col("p_brand"), "#", "-"), lit("."),
        col("p_type"))
      Tables(spark, dir).part
        .select(col("p_partkey"), raw.as("raw_name"),
          translate(raw, "-.", "__").as("clean_name"))
        .orderBy("p_partkey")
    },

    // K1 date bucketing: dt=yyyy-MM-dd partition column derivation
    // (DateBucketAssigner.java:32-41) + per-bucket row counts.
    QueryDef(
      "q30_date_bucket",
      """SELECT strftime(ts, '%Y-%m-%d') AS dt, count(*) AS n,
        | round(sum(value), 2) AS sum_value
        |FROM events GROUP BY dt ORDER BY dt""".stripMargin) { (spark, dir) =>
      Tables(spark, dir).events
        .groupBy(date_format(col("ts"), "yyyy-MM-dd").as("dt"))
        .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("sum_value"))
        .orderBy("dt")
    },

    // T1/T5 Avro-JSON union convention round-trip: encode values as
    // {"long": v} / null and decode them back (§1.3 JSON encoding).
    QueryDef(
      "q31_union_type_decode",
      """SELECT event_id,
        | CAST(json_extract_string(payload, '$.long') AS BIGINT) AS decoded,
        | payload IS NULL AS was_null
        |FROM (SELECT event_id,
        |        CASE WHEN event_id % 7 = 0 THEN NULL
        |             ELSE concat('{"long": ', CAST(event_id * 2 AS VARCHAR), '}')
        |        END AS payload
        |      FROM events)
        |ORDER BY event_id""".stripMargin) { (spark, dir) =>
      Tables(spark, dir).events
        .select(col("event_id"),
          when(col("event_id") % 7 === 0, lit(null).cast("string"))
            .otherwise(concat(lit("{\"long\": "),
              (col("event_id") * 2).cast("string"), lit("}")))
            .as("payload"))
        .select(col("event_id"),
          get_json_object(col("payload"), "$.long").cast("long").as("decoded"),
          col("payload").isNull.as("was_null"))
        .orderBy("event_id")
    },

    // P1 DDL classifier over the fixture statements — the literal
    // decision table of the stop-signal gate, shared regexes with the
    // streaming implementation.
    QueryDef(
      "q32_ddl_classify",
      s"""SELECT ddl_id, CASE
         |  WHEN regexp_matches(ddl, '${DdlClassifier.NonStructural}')
         |   AND NOT regexp_matches(ddl, '${DdlClassifier.Structural}')
         |   THEN 'ignore'
         |  WHEN regexp_matches(ddl, '${DdlClassifier.TruncateWarn}')
         |   THEN 'stop-truncate-warn'
         |  ELSE 'stop' END AS action
         |FROM (VALUES
         |${DdlFixtures.map { case (i, s) => s"  ($i, '${s.replace("'", "''")}')" }
            .mkString(",\n")}
         |) AS t(ddl_id, ddl)
         |ORDER BY ddl_id""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      DdlFixtures.toDF("ddl_id", "ddl")
        .select(col("ddl_id"),
          when(col("ddl").rlike(DdlClassifier.NonStructural)
            && !col("ddl").rlike(DdlClassifier.Structural), "ignore")
            .when(col("ddl").rlike(DdlClassifier.TruncateWarn),
              "stop-truncate-warn")
            .otherwise("stop").as("action"))
        .orderBy("ddl_id")
    },

    // Auto-compacted sink, oracle-checked END TO END: the events table
    // serialized as a 4-batch envelope feed, replayed through the REAL
    // streaming pipeline with the auto-compactor firing behind every
    // committed batch (threshold 2 guarantees multiple hot-partition
    // rewrites during the run), then the compacted sink aggregated per
    // dt bucket. The oracle aggregates the source table directly —
    // hash equality proves the ingest + atomic partition rewrites
    // preserved every row and every dt assignment (a lost or
    // duplicated row in any crash-window path would break the counts;
    // a mis-bucketed one would break a group).
    QueryDef.statefulQ(
      "q122_compacted_sink",
      """SELECT strftime(ts, '%Y-%m-%d') AS dt,
        | CAST(count(*) AS BIGINT) AS n,
        | round(sum(value), 2) AS sum_value
        |FROM events WHERE ts < TIMESTAMP '2024-01-09 00:00:00'
        |GROUP BY dt ORDER BY dt""".stripMargin) { (spark, dir) =>
      val work = QueryDef.tempWorkDir("graft-ac-q122-")
      // an 8-day window keeps the partition count (and so the bench
      // cost of the ~2 mid-run compaction waves) bounded; the
      // lifecycle exercised is identical
      graft.Bench.envelopeLines(Tables(spark, dir).events
          .filter(col("ts") < lit("2024-01-09").cast("timestamp")), 1)
        .repartition(4).write.mode("overwrite").text(s"$work/feed")
      val p = new graft.streaming.CdcPipeline(spark,
        graft.streaming.CdcConfig("q122", graft.Bench.eventsRegistry(1),
          s"$work/sink",
          compactAfterFiles = 2, compactRowsPerFile = 100000))
      p.runAvailableNow(s"$work/feed", s"$work/ck") // one file per batch
      spark.read.parquet(s"$work/sink/q122_bench__events")
        .groupBy(col("dt").cast("string").as("dt"))
        .agg(count(lit(1)).as("n"),
          round(sum("value"), 2).as("sum_value"))
        .orderBy("dt")
    },
  )
}
