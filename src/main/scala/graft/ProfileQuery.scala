package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: time individual SparkEntry queries in isolation.
  *
  * {{{
  * sbt "runMain graft.ProfileQuery q17_date_funcs q59_dup_clusters"
  * SPARK_GRAFT_EXPLAIN=1 sbt "runMain graft.ProfileQuery q17_date_funcs"
  * }}}
  *
  * Each query runs 3 times after a session warmup; the minimum is the
  * steady-state cost (what the Bench total is made of once JIT and FS
  * metadata are warm).
  */
object ProfileQuery {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.files.maxPartitionBytes", (512 * 1024).toString)
      .config("spark.sql.files.openCostInBytes", (64 * 1024).toString)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // SPARK_GRAFT_JOBS=1: per-Spark-job wall times, to see where a
    // multi-stage query (the q89/q108 funnel) actually spends time
    if (sys.env.contains("SPARK_GRAFT_JOBS")) {
      val starts = scala.collection.concurrent.TrieMap
        .empty[Int, (Long, String)]
      spark.sparkContext.addSparkListener(
        new org.apache.spark.scheduler.SparkListener {
          override def onJobStart(
              j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
            starts(j.jobId) = (System.nanoTime(),
              // the result stage's name carries the action's call
              // site ("collect at AnnIndex.scala:123") even when no
              // job description/callSite property is set
              Option(j.properties.getProperty("callSite.short"))
                .orElse(j.stageInfos.lastOption.map(_.name))
                .getOrElse("?"))
          override def onJobEnd(
              j: org.apache.spark.scheduler.SparkListenerJobEnd): Unit =
            starts.remove(j.jobId).foreach { case (t0, desc) =>
              println(f"[job] ${j.jobId}%3d ${(System.nanoTime() - t0) / 1e9}%7.3fs  $desc")
            }
        })
    }
    spark.range(1000).selectExpr("sum(id)").write
      .format("noop").mode("overwrite").save()

    val names = if (args.nonEmpty) args.toSeq else SparkEntry.queries.keys.toSeq.sorted
    for (name <- names) {
      val fn = SparkEntry.queries.getOrElse(name,
        sys.error(s"unknown query $name"))
      if (sys.env.contains("SPARK_GRAFT_EXPLAIN"))
        fn(spark, sfDir).explain("formatted")
      val times = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        val dt = (System.nanoTime() - t0) / 1e9
        spark.catalog.clearCache()
        dt
      }
      println(f"[profile] $name%-28s min=${times.min}%.3f runs=${times.map(t => f"$t%.2f").mkString(",")}")
    }
    spark.stop()
  }
}
