package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

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
  def events: DataFrame     = t("events")
  def documents: DataFrame  = t("documents")
  def embeddings: DataFrame = t("embeddings")
}
