package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool: decompose the readEvolved floor measured by
  * `ScaleBench evolved` — where does the time go at fixed depth?
  * Assumes the experiment's 2M-key fixture already exists under
  * /tmp/graft-scale (run `ScaleBench evolved 2000` first).
  */
object ProfileEvolved {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val root = "/tmp/graft-scale/ev_root_2000_25"
    def time(label: String)(f: => Unit): Unit = {
      f // warm
      val t0 = System.nanoTime(); f
      println(f"[profile] $label: ${(System.nanoTime() - t0) / 1e9}%6.3fs")
    }
    def drain(df: org.apache.spark.sql.DataFrame): Unit =
      df.agg(count(lit(1))).write.format("noop").mode("overwrite").save()
    val base = s"$root/ev_db__t__current"
    val fork = s"$root/ev_db__t_v20240701__current"
    time("frame construction only (2 listings + checks)") {
      graft.streaming.CurrentTable.readEvolved(spark, root,
        "ev", "db", "t", Seq("id"))
    }
    time("raw scan base current (count)") {
      drain(spark.read.parquet(base))
    }
    time("raw scan both currents (count)") {
      drain(spark.read.parquet(base)
        .unionByName(spark.read.parquet(fork), allowMissingColumns = true))
    }
    time("union + keep-latest window (no readEvolved plumbing)") {
      val order = graft.ops.TimeTravel.defaultOrder("mysql")
      val u = spark.read.parquet(base).drop("kb")
        .withColumn("_table_version", lit("base"))
        .unionByName(spark.read.parquet(fork).drop("kb")
          .withColumn("_table_version", lit("v1")),
          allowMissingColumns = true)
      drain(graft.ops.TimeTravel.latest(u, Seq("id"), Long.MaxValue, order)
        .filter(!graft.ops.TimeTravel.isTombstone))
    }
    time("full readEvolved (drain)") {
      drain(graft.streaming.CurrentTable.readEvolved(spark, root,
        "ev", "db", "t", Seq("id")))
    }
    spark.stop()
  }
}
