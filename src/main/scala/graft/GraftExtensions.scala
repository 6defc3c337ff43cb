package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.{BloomSketch, CmsSketch, KmvSketch, TextHashes, TopKAgg, VectorExpressions}

/** Library integration point:
  * `--conf spark.sql.extensions=graft.GraftExtensions` injects every
  * graft native function (codegen'd dot product, text-hash kernels,
  * KMV and count-min sketch aggregates) into the session catalog at
  * session build — plain-SQL users (spark-sql shell, Thrift/JDBC)
  * get them with zero code. The query modules' in-code
  * `ensureRegistered` helpers install the SAME builder list as
  * session temp functions, so both surfaces can never drift.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.All.foreach { case (name, builder) =>
      ext.injectFunction((FunctionIdentifier(name),
        new ExpressionInfo("graft.GraftExtensions", name), builder))
    }
}

object GraftExtensions {
  /** name → expression builder: the single function registry,
    * assembled from the builders each module itself installs — not a
    * parallel copy that could drift.
    */
  val All: Seq[(String, Seq[Expression] => Expression)] =
    VectorExpressions.Builders ++
      TextHashes.Builders ++ BloomSketch.Builders ++
      Seq(KmvSketch.FnName -> (KmvSketch.fromExprs _),
        CmsSketch.FnName -> (CmsSketch.fromExprs _),
        TopKAgg.FnName -> (TopKAgg.fromExprs _))

  /** The same list installed as temp functions on a live session
    * (what the per-module ensureRegistered helpers do piecemeal).
    */
  def install(spark: SparkSession): Unit = ensure(spark, All)

  /** Idempotent temp-function install: register each builder only if
    * the name is not already bound. The per-call
    * `createOrReplaceTempFunction` the modules used before logged a
    * `WARN ... replaced a previously registered function` on every
    * re-install — dozens per Verify/Bench session, pure noise. The
    * builders are stable objects, so once a name is bound (here or by
    * the `spark.sql.extensions` catalog injection) re-binding is a
    * no-op with a warning attached; skip it instead.
    */
  def ensure(spark: SparkSession,
      builders: Seq[(String, Seq[Expression] => Expression)]): Unit = {
    val reg = spark.sessionState.functionRegistry
    builders.foreach { case (n, b) =>
      if (!reg.functionExists(FunctionIdentifier(n)))
        reg.createOrReplaceTempFunction(n, b, "scala_udf")
    }
  }
}
