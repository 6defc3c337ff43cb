package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loader for the driver's TPC-H-ish test tables (TESTDATA.md).
  *
  * Each accessor is a fresh parquet scan so Catalyst sees a clean
  * relation per query (column pruning + filter pushdown apply per use).
  * At cluster scale these would be catalog tables; the parquet layout
  * is identical so the plans carry over.
  */
final case class Tables(spark: SparkSession, dir: String) {
  private def t(name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region: DataFrame     = t("region")
  def nation: DataFrame     = t("nation")
  def customer: DataFrame   = t("customer")
  def supplier: DataFrame   = t("supplier")
  def part: DataFrame       = t("part")
  def orders: DataFrame     = t("orders")
  def lineitem: DataFrame   = t("lineitem")
  /** events.parquet stores ts as INT64 TIMESTAMP(NANOS) which Spark's
    * parquet reader rejects ([PARQUET_TYPE_ILLEGAL]). Read it as raw
    * nanos (legacy conf) and surface a proper microsecond timestamp —
    * same truncation DuckDB applies when it reads NANOS as timestamp.
    */
  def events: DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // integer `div`, not `/`: epoch-nanos (~1.7e18) exceeds double's
    // 53-bit mantissa, so float division is off by ±1 microsecond.
    t("events").withColumn("ts", timestamp_micros(expr("ts div 1000")))
  }
  def documents: DataFrame  = t("documents")
  def embeddings: DataFrame = t("embeddings")
}
