package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Shared secondary-index sidecar test plumbing — ONE manifest-pointer
  * parser and ONE count-dropping doctor for every suite that fabricates
  * on-disk sidecar states (BucketIndexSpec, CdcPipelineSpec), so the
  * fabricated pre-measurement shape can never drift between suites.
  */
object SidecarTestOps {

  /** The sidecar manifest's group pointers, `"g<N>" -> dirName`. */
  def pointersOf(cur: String, column: String): Map[String, String] =
    java.nio.file.Files.readAllLines(java.nio.file.Paths.get(
        s"$cur/_index/$column/_meta.txt")).toArray.map(_.toString)
      .filter(l => l.matches("g\\d+=.*"))
      .map { l => val Array(g, d) = l.split("=", 2); g -> d }.toMap

  /** Null `nrows` in the sidecar's bloom rows for every bucket except
    * `keepKb` — the on-disk shape of a sidecar published before the
    * per-publish counts existed (group dirs rewritten in place; the
    * manifest's pointers keep their paths).
    */
  def dropCounts(spark: SparkSession, cur: String, column: String,
      keepKb: Set[Int]): Unit =
    for ((g, d) <- pointersOf(cur, column).toSeq) {
      val gdir = s"$cur/_index/$column/$d/grp=${g.stripPrefix("g")}"
      val df = spark.read.parquet(gdir)
      val doctored = df.withColumn("nrows",
        when(col("kb").isin(keepKb.toSeq: _*), col("nrows"))
          .otherwise(lit(null).cast("long")))
      val rows = doctored.collect()
      spark.createDataFrame(
          java.util.Arrays.asList(rows: _*), doctored.schema)
        .repartition(1).write.mode("overwrite").parquet(gdir)
    }
}
