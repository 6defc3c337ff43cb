package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, InMemoryFileIndex, LogicalRelation}
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{ZoneMapAuto, ZoneMapPrunedIndex, ZoneMaps}

/** The opt-in optimizer rule: with ZoneMapAuto enabled, a PLAIN
  * spark.read.parquet over a dir carrying the sink's `._zonemaps`
  * sibling gets manifest file skipping transparently; answers stay
  * exact, ineligible relations stay untouched, and disable restores
  * plain listings. Always disabled again in finally — the session is
  * shared across suites.
  */
class ZoneMapAutoSpec extends AnyFunSuite {
  lazy val spark = TestSpark.session
  import spark.implicits._

  private def fixture(): String = {
    val dir = Files.createTempDirectory("graft-zma-").resolve("tbl").toString
    spark.range(1000).select(col("id").as("k"),
        (col("id") % 7).as("m"))
      .repartitionByRange(10, col("k"))
      .write.mode("overwrite").parquet(dir)
    ZoneMaps.build(spark, dir, s"$dir._zonemaps", Seq("k"))
    dir
  }

  private def locationOf(df: org.apache.spark.sql.DataFrame) =
    df.queryExecution.optimizedPlan.collect {
      case LogicalRelation(r: HadoopFsRelation, _, _, _, _) => r.location
    }.head

  test("enabled: plain reads over a manifest-carrying dir skip files " +
      "transparently; answers exact; disable restores plain listings") {
    val dir = fixture()
    ZoneMapAuto.enable(spark)
    ZoneMapAuto.enable(spark) // idempotent
    try {
      assert(spark.experimental.extraOptimizations
        .count(_.isInstanceOf[ZoneMapAuto.AutoRule]) == 1)
      // the counter must come from the SAME QueryExecution that runs —
      // every planned query wraps its own fresh index (so no .select
      // or .as after grabbing the location: both re-plan)
      val q = spark.read.parquet(dir)
        .filter(col("k").between(100, 199)).select("k")
      val loc = locationOf(q)
      assert(loc.isInstanceOf[ZoneMapPrunedIndex],
        s"relation not wrapped: ${loc.getClass}")
      assert(q.collect().map(_.getLong(0)).toSet == (100L to 199L).toSet)
      assert(loc.asInstanceOf[ZoneMapPrunedIndex].prunedFileCount.get() > 0)
      // an aggregate over an unsupported-shape filter stays exact
      assert(spark.read.parquet(dir)
        .filter(col("m") === 3 && col("k") < 700).count()
        == spark.range(1000).filter(col("id") % 7 === 3 &&
          col("id") < 700).count())
      // SQL over a temp view takes the same path
      spark.read.parquet(dir).createOrReplaceTempView("zma_t")
      assert(spark.sql("SELECT count(*) FROM zma_t WHERE k >= 900")
        .as[Long].head() == 100L)
    } finally ZoneMapAuto.disable(spark)
    // disabled: back to a plain listing, same answers
    val q2 = spark.read.parquet(dir).filter(col("k").between(100, 199))
    assert(locationOf(q2).isInstanceOf[InMemoryFileIndex] &&
      !locationOf(q2).isInstanceOf[ZoneMapPrunedIndex])
    assert(q2.count() == 100)
    assert(spark.experimental.extraOptimizations
      .count(_.isInstanceOf[ZoneMapAuto.AutoRule]) == 0)
  }

  test("a REAL pipeline-written sink (sink.zonemap.columns) is picked " +
      "up by the rule under its manifest naming convention") {
    import graft.model.{TableRegistry, TableSpec}
    import org.apache.spark.sql.types._
    val in = Files.createTempDirectory("graft-zma-cdc-")
    val out = Files.createTempDirectory("graft-zma-cdc-out-")
    val reg = TableRegistry(Seq(TableSpec("zdb", "items", StructType(Seq(
      StructField("id", IntegerType), StructField("qty", LongType))))))
    Files.write(in.resolve("00.jsonl"), (1 to 40).map(i =>
      s"""{"_op":"CREATE","_ts":${1700000000000L + i},"_db":"zdb",""" +
        s""""_tbl":"items","id":{"int":$i},"qty":{"long":${i * 2}},""" +
        """"_binlog_file":"b.1","_binlog_pos_end":"1"}""")
      .mkString("\n").getBytes)
    val p = new graft.streaming.CdcPipeline(spark,
      graft.streaming.CdcConfig("zma", reg, out.toString,
        zonemapColumns = Seq("id")))
    p.runAvailableNow(in.toString, Files.createTempDirectory("zma-ck")
      .resolve("ck").toString)
    val dir = s"$out/zma_zdb__items"
    ZoneMapAuto.enable(spark)
    try {
      val q = spark.read.parquet(dir).filter(col("id") === 7)
      assert(locationOf(q).isInstanceOf[ZoneMapPrunedIndex])
      assert(q.count() == 1)
    } finally ZoneMapAuto.disable(spark)
  }

  test("enabled: a dir WITHOUT a manifest sibling is left untouched") {
    val dir = Files.createTempDirectory("graft-zma-plain-")
      .resolve("tbl").toString
    spark.range(100).select(col("id").as("k"))
      .write.mode("overwrite").parquet(dir)
    ZoneMapAuto.enable(spark)
    try {
      val q = spark.read.parquet(dir).filter(col("k") < 50)
      assert(!locationOf(q).isInstanceOf[ZoneMapPrunedIndex])
      assert(q.count() == 50)
    } finally ZoneMapAuto.disable(spark)
  }
}
