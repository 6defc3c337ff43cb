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

  /** MinHash signature constants: k linear-congruential mixes of ONE
    * 32-bit hash per shingle (the first 8 md5 hex chars), replacing k
    * independent seeded md5 digests (8 digests/shingle made q37 the
    * slowest bench query). `h < 2^32`, `A_k` odd `< 2^30` so
    * `A_k·h + B_k < 2^63` — exact in BIGINT in both engines; `P` is
    * prime `> 2^32` so mixes permute the full hash domain. Constants
    * are derived from md5 seeds here and interpolated as literals into
    * the DuckDB oracle (shared-constants pattern — no drift possible).
    */
  val MinHashK = 8
  val MixP = 4294967311L
  private def seedLong(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    var v = 0L
    var i = 0
    while (i < 8) { v = (v << 8) | (d(i) & 0xffL); i += 1 }
    v & Long.MaxValue
  }
  val MixA: Array[Long] = Array.tabulate(MinHashK)(k =>
    (seedLong(s"graft-minhash-a:$k") % (1L << 29)) * 2 + 1)
  val MixB: Array[Long] = Array.tabulate(MinHashK)(k =>
    seedLong(s"graft-minhash-b:$k") % MixP)

  private val mdLocal = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** All k MinHash minima in one pass over the shingle array; null
    * elements are skipped and an empty/all-null array yields null —
    * both mirroring the oracle (`min` aggregates ignore NULL;
    * `list_aggregate([], 'min')` is NULL).
    */
  def minhashSigEval(sh: ArrayData): ArrayData = {
    val n = sh.numElements()
    val mins = Array.fill(MinHashK)(Long.MaxValue)
    var seen = false
    val md = mdLocal.get()
    var i = 0
    while (i < n) {
      val s = sh.getUTF8String(i)
      if (s != null) {
        seen = true
        md.reset()
        val dig = md.digest(s.getBytes)
        val h = ((dig(0) & 0xffL) << 24) | ((dig(1) & 0xffL) << 16) |
          ((dig(2) & 0xffL) << 8) | (dig(3) & 0xffL)
        var k = 0
        while (k < MinHashK) {
          val v = (MixA(k) * h + MixB(k)) % MixP
          if (v < mins(k)) mins(k) = v
          k += 1
        }
      }
      i += 1
    }
    if (!seen) null else UnsafeArrayData.fromPrimitiveArray(mins)
  }

  case class MinHashSig(child: Expression)
      extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
    override def checkInputDataTypes(): TypeCheckResult =
      child.dataType match {
        case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
        case other => TypeCheckResult.TypeCheckFailure(
          s"graft_minhash expects ARRAY<STRING>, got ${other.simpleString}")
      }
    override def nullable: Boolean = true
    override def dataType: DataType = ArrayType(LongType, false)
    override def nullSafeEval(sh: Any): Any =
      minhashSigEval(sh.asInstanceOf[ArrayData])
    override protected def doGenCode(ctx: CodegenContext,
        ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, sh => s"""
        ${ev.value} = graft.functions.TextHashes.minhashSigEval($sh);
        ${ev.isNull} = ${ev.value} == null;""")
    override protected def withNewChildInternal(c: Expression): MinHashSig =
      copy(c)
  }

  /** Distinct word n-grams of a token array in first-occurrence
    * order — the native one-pass form of
    * `array_distinct(transform(sequence(...), i -> concat_ws(...)))`,
    * whose lambda is interpreted per element (HOFs never codegen) and
    * re-evaluates element_at chains per gram. Fewer than n tokens ⇒
    * empty, null tokens skipped within a gram — both exactly matching
    * the expression formulation (cross-checked by property test).
    */
  private val GramSep = UTF8String.fromString(" ")

  def ngramsEval(toks: ArrayData, n: Int): ArrayData = {
    val len = toks.numElements()
    val seen = new java.util.LinkedHashSet[UTF8String]()
    if (n > 0 && len >= n) {
      val buf = new Array[UTF8String](n) // reused per gram; concatWs
      var i = 0                          // skips the null entries
      while (i <= len - n) {
        var j = 0
        while (j < n) { buf(j) = toks.getUTF8String(i + j); j += 1 }
        seen.add(UTF8String.concatWs(GramSep, buf: _*))
        i += 1
      }
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      seen.toArray.asInstanceOf[Array[Any]])
  }

  case class NGrams(left: Expression, right: Expression)
      extends BinaryExpression {
    override def checkInputDataTypes(): TypeCheckResult =
      if (left.dataType.isInstanceOf[ArrayType] &&
          left.dataType.asInstanceOf[ArrayType].elementType == StringType &&
          right.dataType == IntegerType)
        TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        s"graft_ngrams expects (ARRAY<STRING>, INT), got " +
          s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
    override def dataType: DataType = ArrayType(StringType, false)
    override def nullSafeEval(t: Any, n: Any): Any =
      ngramsEval(t.asInstanceOf[ArrayData], n.asInstanceOf[Int])
    override protected def doGenCode(ctx: CodegenContext,
        ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (t, n) =>
        s"${ev.value} = graft.functions.TextHashes.ngramsEval($t, $n);")
    override protected def withNewChildrenInternal(
        l: Expression, r: Expression): NGrams = copy(l, r)
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

  /** name → builder, shared between the temp-function path below and
    * GraftExtensions' catalog injection — the two surfaces can't drift.
    */
  val Builders: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "graft_rollhash" -> (es => RollingHash(es.head, es(1))),
    "graft_winmin" -> (es => WindowMin(es.head, es(1))),
    "graft_minhash" -> (es => MinHashSig(es.head)),
    "graft_ngrams" -> (es => NGrams(es.head, es(1))))

  def ensureRegistered(spark: SparkSession): Unit =
    graft.GraftExtensions.ensure(spark, Builders)

  def minhashSig(spark: SparkSession, sh: Column): Column = {
    ensureRegistered(spark)
    call_function("graft_minhash", sh)
  }

  def rollingHash(spark: SparkSession, s: Column, k: Int): Column = {
    ensureRegistered(spark)
    call_function("graft_rollhash", s, org.apache.spark.sql.functions.lit(k))
  }

  def windowMin(spark: SparkSession, hs: Column, w: Int): Column = {
    ensureRegistered(spark)
    call_function("graft_winmin", hs, org.apache.spark.sql.functions.lit(w))
  }

  def ngrams(spark: SparkSession, toks: Column, n: Int): Column = {
    ensureRegistered(spark)
    call_function("graft_ngrams", toks, org.apache.spark.sql.functions.lit(n))
  }
}
