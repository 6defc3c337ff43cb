package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native text-hash kernels for rolling-hash fingerprinting (q65).
  *
  * The higher-order-function formulation (transform over a staged
  * char array, k element_at calls per window) is interpreted — one
  * boxed lambda call per element — and measured 4.4 s steady-state at
  * sf0.1. These expressions do the same arithmetic as a primitive
  * loop behind a single static call per row (codegen emits one
  * invocation, no per-element interpretation): a true O(n) Rabin-Karp
  * rolling update instead of O(n·k) re-computation, and an O(n·w)
  * window minimum.
  *
  * Arithmetic is EXACT long math, no modulus — identical to the
  * HOF formulation and the DuckDB oracle.
  */
object TextHashes {

  val Base = 31L

  /** Polynomial hashes of every k-length codepoint window of s. */
  def rollingWindows(s: UTF8String, k: Int): ArrayData = {
    val cps = s.toString.codePoints().toArray
    val n = math.max(cps.length - k + 1, 0)
    val out = new Array[Long](n)
    if (n > 0) {
      var topPow = 1L
      var j = 1
      while (j < k) { topPow *= Base; j += 1 } // Base^(k-1)
      var h = 0L
      var i = 0
      while (i < k) { h = h * Base + cps(i); i += 1 }
      out(0) = h
      i = 1
      while (i < n) {
        h = (h - cps(i - 1) * topPow) * Base + cps(i + k - 1)
        out(i) = h
        i += 1
      }
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  /** Minimum of each w-length window of hs (the winnowing pass). */
  def windowMins(hs: ArrayData, w: Int): ArrayData = {
    val n0 = hs.numElements()
    val n = math.max(n0 - w + 1, 0)
    val out = new Array[Long](n)
    var i = 0
    while (i < n) {
      var m = hs.getLong(i)
      var j = 1
      while (j < w) {
        val v = hs.getLong(i + j)
        if (v < m) m = v
        j += 1
      }
      out(i) = m
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  case class RollingHash(left: Expression, right: Expression)
      extends BinaryExpression {
    // analysis-time rejection (AbstractDataType is private[sql], so
    // checkInputDataTypes instead of ExpectsInputTypes)
    override def checkInputDataTypes(): TypeCheckResult =
      if (left.dataType == StringType && right.dataType == IntegerType)
        TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        s"graft_rollhash expects (STRING, INT), got " +
          s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
    override def dataType: DataType = ArrayType(LongType, false)
    override def nullSafeEval(s: Any, k: Any): Any =
      rollingWindows(s.asInstanceOf[UTF8String], k.asInstanceOf[Int])
    override protected def doGenCode(ctx: CodegenContext,
        ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (s, k) =>
        s"${ev.value} = graft.functions.TextHashes.rollingWindows($s, $k);")
    override protected def withNewChildrenInternal(
        l: Expression, r: Expression): RollingHash = copy(l, r)
  }

  case class WindowMin(left: Expression, right: Expression)
      extends BinaryExpression {
    override def checkInputDataTypes(): TypeCheckResult =
      if (left.dataType.isInstanceOf[ArrayType] &&
          left.dataType.asInstanceOf[ArrayType].elementType == LongType &&
          right.dataType == IntegerType)
        TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        s"graft_winmin expects (ARRAY<BIGINT>, INT), got " +
          s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
    override def dataType: DataType = ArrayType(LongType, false)
    override def nullSafeEval(hs: Any, w: Any): Any =
      windowMins(hs.asInstanceOf[ArrayData], w.asInstanceOf[Int])
    override protected def doGenCode(ctx: CodegenContext,
        ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (hs, w) =>
        s"${ev.value} = graft.functions.TextHashes.windowMins($hs, $w);")
    override protected def withNewChildrenInternal(
        l: Expression, r: Expression): WindowMin = copy(l, r)
  }

  def ensureRegistered(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_rollhash", es => RollingHash(es.head, es(1)), "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_winmin", es => WindowMin(es.head, es(1)), "scala_udf")
  }

  def rollingHash(spark: SparkSession, s: Column, k: Int): Column = {
    ensureRegistered(spark)
    call_function("graft_rollhash", s, org.apache.spark.sql.functions.lit(k))
  }

  def windowMin(spark: SparkSession, hs: Column, w: Int): Column = {
    ensureRegistered(spark)
    call_function("graft_winmin", hs, org.apache.spark.sql.functions.lit(w))
  }
}
