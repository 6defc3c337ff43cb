package graft.ops

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Read a LOGICAL table across its physical schema versions.
  *
  * The evolution runbook (reference `README.md:15`; [[DdlEvolution]])
  * forks a structurally-changed table into a dated sibling —
  * `users` keeps its history, `users_v20240401` accumulates the
  * post-DDL rows under the evolved schema. That keeps every sink file
  * schema-stable (the property the whole pipeline leans on), but it
  * hands consumers a table split across directories with DIFFERENT
  * schemas. This op is the consumer's other half: discover the
  * version dirs, align their schemas (new columns null-fill backward;
  * widened primitives widen the union), and present ONE DataFrame
  * with a `_table_version` lineage column.
  *
  * Scale: discovery is one directory listing; the union is planned as
  * one multi-scan (no shuffle — unionByName is a plan-level concat),
  * and each version whose dir carries a `._zonemaps` manifest is read
  * through [[ZoneMapTable]], so pushed filters still skip files per
  * version.
  */
object EvolvedRead {

  private val VersionSuffix = "_v(\\d{8})".r

  /** The physical dirs of `db.table` under the sink layout
    * (`{sinkRoot}/{sourceId}_{db}__{table}` and its `_vYYYYMMDD`
    * siblings — [[graft.model.TableSpec.sinkDir]]), oldest-first with
    * the base (undated) version first. Exact-name match only:
    * `users` never absorbs `users2` or `users_extra`.
    */
  def versionDirs(spark: SparkSession, sinkRoot: String, sourceId: String,
      db: String, table: String): Seq[(String, String)] = {
    val base =
      if (db.isEmpty) s"${sourceId}_$table" else s"${sourceId}_${db}__$table"
    val root = new Path(sinkRoot)
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(root)) return Nil
    fs.listStatus(root).toSeq.filter(_.isDirectory)
      .map(_.getPath.getName)
      .flatMap { n =>
        if (n == base) Some(("base", n))
        else if (n.startsWith(base)) n.substring(base.length) match {
          case VersionSuffix(d) => Some((s"v$d", n))
          case _ => None
        }
        else None
      }
      .sortBy { case (v, _) => if (v == "base") "" else v }
      .map { case (v, n) => (v, s"$sinkRoot/$n") }
  }

  /** One frame over every version of `db.table`: schemas aligned by
    * COLUMN NAME (columns a version lacks come back NULL there;
    * compatibly-widened primitives take the union type), plus
    * `_table_version` ("base" or "vYYYYMMDD"). Versions with a
    * zone-map manifest beside them are read through [[ZoneMapTable]]
    * so a filter over the union still skips files per version.
    * Throws on an unknown table (no version dir at all) — an empty
    * union has no schema to offer.
    */
  def readAll(spark: SparkSession, sinkRoot: String, sourceId: String,
      db: String, table: String): DataFrame = {
    val dirs = versionDirs(spark, sinkRoot, sourceId, db, table)
    require(dirs.nonEmpty,
      s"no sink table $db.$table (source $sourceId) under $sinkRoot")
    val fs = new Path(sinkRoot)
      .getFileSystem(spark.sessionState.newHadoopConf())
    dirs.map { case (v, dir) =>
      val manifest = s"$dir._zonemaps"
      val base =
        if (fs.exists(new Path(manifest))) ZoneMapTable(spark, dir, manifest)
        else spark.read.parquet(dir)
      base.withColumn("_table_version", lit(v))
    }.reduce(_.unionByName(_, allowMissingColumns = true))
  }

  /** [[readAll]] + [[TimeTravel.asOf]]: the current (or as-of) state
    * of the logical table across every schema version — the
    * "one key, one row, whatever schema era it last changed in"
    * read. `order` defaults per source type
    * ([[TimeTravel.defaultOrder]]).
    */
  def stateAll(spark: SparkSession, sinkRoot: String, sourceId: String,
      db: String, table: String, pk: Seq[String], tsMs: Long,
      sourceType: String = "mysql"): DataFrame =
    TimeTravel.asOf(readAll(spark, sinkRoot, sourceId, db, table),
      pk, tsMs, TimeTravel.defaultOrder(sourceType))
}
