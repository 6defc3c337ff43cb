package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.functions.{call_function, concat, conv, lit, md5, substring}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Count-min sketch: a depth×width grid of counters; every row
  * increments one counter per depth row (indexed by an independent
  * hash), and a key's frequency estimate is the MIN over its cells —
  * always ≥ the true count, overshooting only on hash collisions.
  *
  * Determinism: unlike sampling sketches, the grid is a pure cellwise
  * SUM — commutative and associative — so the result is independent
  * of partitioning and merge order, and an independent engine (the
  * DuckDB oracle) reproduces it exactly from the same hash recipe.
  *
  * Scale design: a `TypedImperativeAggregate` → map-side partials;
  * each task reduces its rows to one depth×width long grid and only
  * grids cross the shuffle (d·w·8 bytes per task, vs shuffling every
  * key for an exact count). The cell INDICES are computed by the
  * codegen'd md5/conv column expressions and arrive here as child
  * values — the aggregate itself never hashes, so the hot path stays
  * inside whole-stage codegen.
  */
case class CmsSketch(
    indexChildren: Seq[Expression],
    width: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]] {

  require(width > 0, s"${CmsSketch.FnName}: width must be positive, got $width")

  private def depth = indexChildren.size

  override def checkInputDataTypes(): TypeCheckResult =
    if (indexChildren.forall(_.dataType == LongType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"${CmsSketch.FnName} expects BIGINT cell indices, got " +
        indexChildren.map(_.dataType.simpleString).mkString(", "))

  override def createAggregationBuffer(): Array[Long] =
    new Array[Long](depth * width)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    var j = 0
    while (j < depth) {
      val v = indexChildren(j).eval(input)
      if (v != null) {
        val idx = v.asInstanceOf[Long].toInt
        require(idx >= 0 && idx < width,
          s"cms cell index $idx out of [0, $width)")
        buf(j * width + idx) += 1L
      }
      j += 1
    }
    buf
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < buf.length) { buf(i) += other(i); i += 1 }
    buf
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 * buf.length)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(bytes.length / 8)(bb.getLong)
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def children: Seq[Expression] = indexChildren
  override def withNewMutableAggBufferOffset(o: Int): CmsSketch =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): CmsSketch =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): CmsSketch = copy(indexChildren = c)
}

object CmsSketch {
  val FnName = "graft_cms"

  /** Shared sketch geometry (also interpolated into the DuckDB
    * oracle): depth-2 × width-64 over ~150 keys forces some
    * collisions, so the ≥-exact overcount behavior is visible in the
    * fixture, not just in theory.
    */
  val Depth = 2
  val Width = 64

  /** `(cell..., width-literal)` → aggregate expression; shared by the
    * temp-function path and GraftExtensions' catalog injection.
    */
  def fromExprs(exprs: Seq[Expression]): Expression = {
    val w = exprs.last match {
      case Literal(v: Int, _) => v
      case other => throw new IllegalArgumentException(
        s"$FnName: width must be an INTEGER literal, got $other")
    }
    CmsSketch(exprs.dropRight(1), w).toAggregateExpression()
  }

  def ensureRegistered(spark: SparkSession): Unit =
    graft.GraftExtensions.ensure(spark, Seq(FnName -> (fromExprs _)))

  /** Cell index for depth row j: first 8 md5 hex chars of "j:key" as
    * a long, mod width. DuckDB mirror:
    * `('0x'||substr(md5('j:'||CAST(x AS VARCHAR)),1,8))::BIGINT % w`.
    */
  def cellIndex(j: Int, key: Column, w: Int = Width): Column =
    conv(substring(md5(concat(lit(s"$j:"), key.cast("string"))), 1, 8),
      16, 10).cast("long") % w

  /** The sketch grid (row-major depth×width long array) as an agg
    * Column over pre-computed cell-index columns.
    */
  def sketch(spark: SparkSession, cells: Seq[Column], w: Int = Width): Column = {
    ensureRegistered(spark)
    call_function(FnName, cells :+ lit(w): _*)
  }

  /** MIN-over-cells frequency estimate for a key's precomputed cell
    * indices — the row-major (depth, width) probe lives HERE next to
    * cellIndex, so build and probe can never disagree on the layout.
    * element_at is 1-based; depth row j starts at j·w.
    */
  def estimate(grid: Column, cells: Seq[Column], w: Int = Width): Column = {
    import org.apache.spark.sql.functions.{element_at, least}
    val probes = cells.zipWithIndex.map { case (c, j) =>
      element_at(grid, (c + j * w + 1).cast("int"))
    }
    probes.reduce(least(_, _))
  }
}
