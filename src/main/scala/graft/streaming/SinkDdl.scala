package graft.streaming

import org.apache.spark.sql.types._

import graft.model.TableRegistry

/** The reference's planned "Auto-generate target `CREATE TABLE` SQL"
  * (`README.md:67`), trivial here because the registry already holds
  * `StructType`s: for every routed table (and each database's `_ddl`
  * side table), emit the Spark SQL statements that register the
  * written sink with a downstream catalog — an EXTERNAL parquet table
  * over the sink dir, `dt`-partitioned, columns = payload schema plus
  * exactly the metadata the sink writes for the source type
  * ([[graft.ops.EnvelopeDecoder.payload]]'s kept set).
  *
  * Each table maps to two statements: the `CREATE TABLE IF NOT
  * EXISTS` and the `MSCK REPAIR TABLE` that discovers the existing
  * `dt=` partitions (external partitioned tables see zero partitions
  * until repaired; re-run it — or `ALTER TABLE ADD PARTITION` from
  * the ingest — as new days land).
  */
object SinkDdl {

  private def columnList(fields: Seq[StructField]): String =
    (fields :+ StructField("dt", StringType))
      .map(f => s"`${f.name}` ${f.dataType.sql}").mkString(", ")

  /** `(table name → statements)` for every routed table + the per-db
    * DDL side tables. Table names are the sink-dir basenames
    * (`{source_id}_{db}__{table}`), so the catalog names match the
    * lake layout 1:1.
    */
  def createTableSql(config: CdcConfig): Map[String, Seq[String]] = {
    val sinkTables = config.registry.routed.values.toSeq.map { spec =>
      val dir = spec.sinkDir(config.sinkPath, config.sourceId)
      val name = dir.substring(dir.lastIndexOf('/') + 1)
      name -> (spec.schema.fields.toSeq ++
        graft.ops.EnvelopeDecoder.keptMetadata(config.sourceType), dir)
    }
    val ddlTables = config.registry.routed.values.map(_.db)
      .filter(_.nonEmpty).toSeq.distinct.map { db =>
        val spec = config.registry.ddlSpec(db)
        val dir = spec.sinkDir(config.sinkPath, config.sourceId)
        val name = dir.substring(dir.lastIndexOf('/') + 1)
        name -> (spec.schema.fields.toSeq, dir)
      }
    (sinkTables ++ ddlTables).map { case (name, (fields, dir)) =>
      name -> Seq(
        s"CREATE TABLE IF NOT EXISTS `$name` (${columnList(fields)}) " +
          s"USING PARQUET PARTITIONED BY (`dt`) LOCATION '$dir'",
        s"MSCK REPAIR TABLE `$name`")
    }.toMap
  }
}
