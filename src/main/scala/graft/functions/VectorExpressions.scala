package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType}

/** Native dot product over two array<double> columns.
  *
  * The built-in route — `aggregate(zip_with(a, b, _*_), 0.0, _+_)` —
  * is a higher-order function: evaluated interpreted, one boxed
  * lambda call per element, plus an intermediate array per row.
  * On the all-pairs cosine query that was ~80 µs per pair; this
  * expression is a code-generated primitive loop (no allocation, no
  * boxing), an order of magnitude faster.
  *
  * Accumulation is sequential in element order — the same result as
  * the interpreted fold and DuckDB's list_dot_product, so oracle
  * comparisons are unaffected.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  /** Length mismatch → NULL (like the `aggregate(zip_with(...))`
    * formulation this replaces): a ragged embedding must surface as a
    * visible null, not a silently-truncated prefix dot product that
    * reorders nearest-neighbor results.
    */
  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var acc = 0.0
    var i = 0
    while (i < n) { acc += x.getDouble(i) * y.getDouble(i); i += 1 }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $acc += $a.getDouble($i) * $b.getDouble($i);
         |  }
         |  ${ev.value} = $acc;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

object VectorExpressions {
  val FnName = "graft_dot"

  /** Per-element int8 quantization codes: floor((x-mn)·255/(mx-mn))
    * per dimension, saturating-clamped to [0, 255] (standard codec
    * behavior for out-of-range values; in-contract inputs — stats
    * learned from the same corpus — never clamp, so oracle parity is
    * exact). Degenerate mx==mn dim → 0. Element-level nulls and
    * stats arrays SHORTER than the vector produce null ELEMENTS —
    * the same visible nulls the element_at/HOF formulation yields —
    * never fabricated codes; stats may be longer than the vector
    * (mixed-dimension frames), the row's own length governs. One
    * loop per row instead of an interpreted lambda + three
    * element_at chains per dimension.
    */
  def quantizeEval(e: ArrayData, mns: ArrayData, mxs: ArrayData): ArrayData = {
    val n = e.numElements()
    val sn = math.min(mns.numElements(), mxs.numElements())
    val out = new Array[Any](n)
    var i = 0
    while (i < n) {
      if (i < sn && !e.isNullAt(i) && !mns.isNullAt(i) && !mxs.isNullAt(i)) {
        val mn = mns.getDouble(i)
        val mx = mxs.getDouble(i)
        out(i) = if (mx == mn) 0
        else {
          val c = math.floor((e.getDouble(i) - mn) * 255.0 / (mx - mn))
          if (c < 0.0) 0 else if (c > 255.0) 255 else c.toInt
        }
      } // else: stays null
      i += 1
    }
    new GenericArrayData(out)
  }

  /** The reconstruction half of the same codec:
    * mn + (q+0.5)·(mx-mn)/255 per dimension; same null-element and
    * ragged-length semantics as [[quantizeEval]].
    */
  def dequantizeEval(q: ArrayData, mns: ArrayData, mxs: ArrayData): ArrayData = {
    val n = q.numElements()
    val sn = math.min(mns.numElements(), mxs.numElements())
    val out = new Array[Any](n)
    var i = 0
    while (i < n) {
      if (i < sn && !q.isNullAt(i) && !mns.isNullAt(i) && !mxs.isNullAt(i)) {
        val mn = mns.getDouble(i)
        val mx = mxs.getDouble(i)
        out(i) = mn + (q.getInt(i) + 0.5) * (mx - mn) / 255.0
      } // else: stays null
      i += 1
    }
    new GenericArrayData(out)
  }

  abstract class CodecExpression extends TernaryExpression {
    def firstElem: DataType
    override def checkInputDataTypes(): TypeCheckResult = {
      val ok = Seq(first, second, third).map(_.dataType).zip(
        Seq(firstElem, DoubleType, DoubleType)).forall {
        case (ArrayType(et, _), want) => et == want
        case _ => false
      }
      if (ok) TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects (ARRAY<${firstElem.simpleString}>, " +
          "ARRAY<DOUBLE>, ARRAY<DOUBLE>), got " +
          Seq(first, second, third).map(_.dataType.simpleString).mkString(", "))
    }
    override def nullable: Boolean = true
  }

  case class QuantizeInt8(first: Expression, second: Expression,
      third: Expression) extends CodecExpression {
    override def prettyName: String = QuantFnName
    override def firstElem: DataType = DoubleType
    override def dataType: DataType = ArrayType(IntegerType, containsNull = true)
    override def nullSafeEval(e: Any, mns: Any, mxs: Any): Any =
      quantizeEval(e.asInstanceOf[ArrayData], mns.asInstanceOf[ArrayData],
        mxs.asInstanceOf[ArrayData])
    override protected def doGenCode(ctx: CodegenContext,
        ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (e, mns, mxs) =>
        s"${ev.value} = graft.functions.VectorExpressions.quantizeEval($e, $mns, $mxs);")
    override protected def withNewChildrenInternal(a: Expression,
        b: Expression, c: Expression): QuantizeInt8 = copy(a, b, c)
  }

  case class DequantizeInt8(first: Expression, second: Expression,
      third: Expression) extends CodecExpression {
    override def prettyName: String = DequantFnName
    override def firstElem: DataType = IntegerType
    override def dataType: DataType = ArrayType(DoubleType, containsNull = true)
    override def nullSafeEval(q: Any, mns: Any, mxs: Any): Any =
      dequantizeEval(q.asInstanceOf[ArrayData], mns.asInstanceOf[ArrayData],
        mxs.asInstanceOf[ArrayData])
    override protected def doGenCode(ctx: CodegenContext,
        ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (q, mns, mxs) =>
        s"${ev.value} = graft.functions.VectorExpressions.dequantizeEval($q, $mns, $mxs);")
    override protected def withNewChildrenInternal(a: Expression,
        b: Expression, c: Expression): DequantizeInt8 = copy(a, b, c)
  }

  val QuantFnName = "graft_quant"
  val DequantFnName = "graft_dequant"

  /** The builders, shared between the temp-function path below and
    * GraftExtensions' catalog injection — the two surfaces can't drift.
    */
  val Builder: Seq[Expression] => Expression =
    exprs => DotProduct(exprs(0), exprs(1))
  val Builders: Seq[(String, Seq[Expression] => Expression)] = Seq(
    FnName -> Builder,
    QuantFnName -> (es => QuantizeInt8(es(0), es(1), es(2))),
    DequantFnName -> (es => DequantizeInt8(es(0), es(1), es(2))))

  /** Register once per session (idempotent), then build Columns via
    * call_function — the public Column API has no Expression
    * constructor in Spark 4.
    */
  def ensureRegistered(spark: SparkSession): Unit =
    graft.GraftExtensions.ensure(spark, Builders)

  def dotProduct(spark: SparkSession, a: Column, b: Column): Column = {
    ensureRegistered(spark)
    call_function(FnName, a, b)
  }

  def quantize(spark: SparkSession, e: Column, mns: Column,
      mxs: Column): Column = {
    ensureRegistered(spark)
    call_function(QuantFnName, e, mns, mxs)
  }

  def dequantize(spark: SparkSession, q: Column, mns: Column,
      mxs: Column): Column = {
    ensureRegistered(spark)
    call_function(DequantFnName, q, mns, mxs)
  }
}
