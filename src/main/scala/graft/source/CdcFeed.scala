package graft.source

import org.apache.spark.sql.{DataFrame, SparkSession}

/** CDC feed abstraction (S1-S4). The pipeline only needs a streaming
  * DataFrame with one envelope JSON string per row in a `value`
  * column; where it comes from is the feed's concern:
  *
  *  - [[JsonLinesFeed]]: the harness form — a directory of JSON-lines
  *    files (SURVEY §2.1 S1 option c), one file per micro-batch when
  *    `maxFilesPerTrigger` is set.
  *  - a Kafka feed would be `readStream.format("kafka")... selectExpr
  *    ("CAST(value AS STRING) AS value")` — same contract, no pipeline
  *    change.
  *  - a live Debezium DSv2 `MicroBatchStream` source slots in the same
  *    way (documented extension point; SURVEY §4).
  */
trait CdcFeed {
  def lines(spark: SparkSession): DataFrame
}

final case class JsonLinesFeed(dir: String,
    maxFilesPerTrigger: Option[Int] = None) extends CdcFeed {
  override def lines(spark: SparkSession): DataFrame = {
    val reader = spark.readStream
    maxFilesPerTrigger.foreach(n => reader.option("maxFilesPerTrigger", n))
    reader.text(dir)
  }
}
