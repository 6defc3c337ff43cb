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
  /** events.parquet has shipped with ts as either INT64
    * TIMESTAMP(NANOS) — which Spark's parquet reader rejects
    * ([PARQUET_TYPE_ILLEGAL]) unless read as raw nanos via the legacy
    * conf — or plain TIMESTAMP(MICROS). Dispatch on what the reader
    * surfaces: a LongType ts is nanos needing conversion, a
    * TimestampType ts is already correct. The nanos branch truncates to
    * micros, matching what DuckDB does when it reads NANOS.
    */
  def events: DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = t("events")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        // integer `div`, not `/`: epoch-nanos (~1.7e18) exceeds double's
        // 53-bit mantissa, so float division is off by ±1 microsecond.
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case org.apache.spark.sql.types.TimestampNTZType =>
        // isAdjustedToUTC=false surfaces as NTZ, which `unix_micros`
        // et al. reject. The session timezone is pinned to UTC, so this
        // cast attaches UTC without shifting the stored instant —
        // byte-identical to what the nanos branch produced.
        raw.withColumn("ts",
          col("ts").cast(org.apache.spark.sql.types.TimestampType))
      case _ => raw
    }
  }
  def documents: DataFrame  = t("documents")
  def embeddings: DataFrame = t("embeddings")
}
