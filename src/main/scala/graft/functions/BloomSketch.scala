package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions.{call_function, lit}
import org.apache.spark.sql.types.{ArrayType, BooleanType, DataType, IntegerType, LongType}

/** Bloom-filter build aggregate: an m-bit bitset (packed as m/64
  * longs) with K=4 bit positions per key derived by double hashing
  * from one 60-bit input hash. Membership ("might contain") is exact
  * for inserted keys — never a false negative — so a Bloom pass
  * before an exact join prunes a superset and the exact verify stays
  * correct; false positives only cost wasted verification.
  *
  * Scale rationale: the broadcast unit is m/8 BYTES regardless of key
  * count (32 Ki bits = 4 KB for ~3k keys at p≈1%), an order of
  * magnitude under broadcasting the key set itself — at 100 TB this
  * is the decontamination / runtime-filter shape: build once over the
  * benchmark side, broadcast the bitset, and the fact scan drops
  * non-candidate rows before any shuffle or join.
  *
  * Determinism: the bitset is a pure bitwise OR of per-key masks —
  * commutative/associative, so partitioning and merge order don't
  * matter — and the positions are md5-derived integer arithmetic,
  * reproducible in the DuckDB oracle as a distinct-position set
  * (a bitset IS its set of set positions):
  * `(v % m + i * (1 + (v // m) % (m-1))) % m` for i in 0..3.
  *
  * `TypedImperativeAggregate` → map-side partials: each task reduces
  * its rows to one bitset; only bitsets cross the shuffle.
  */
case class BloomSketch(
    hashChild: Expression,
    numBits: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]] {

  require(numBits > 0 && numBits % 64 == 0,
    s"numBits must be a positive multiple of 64, got $numBits")

  override def checkInputDataTypes(): TypeCheckResult =
    if (hashChild.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"${BloomSketch.FnName} expects a BIGINT hash, got " +
        hashChild.dataType.simpleString)

  override def createAggregationBuffer(): Array[Long] =
    new Array[Long](numBits / 64)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = hashChild.eval(input)
    if (v != null) BloomSketch.setBits(buf, v.asInstanceOf[Long], numBits)
    buf
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < buf.length) { buf(i) |= other(i); i += 1 }
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
  override def children: Seq[Expression] = Seq(hashChild)
  override def withNewMutableAggBufferOffset(o: Int): BloomSketch =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): BloomSketch =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): BloomSketch = copy(hashChild = c.head)
}

object BloomSketch {
  val FnName = "graft_bloom"
  val ContainsFnName = "graft_bloom_contains"

  /** Number of bit positions per key (double hashing h1 + i·h2). */
  val K = 4

  /** The i-th bit position of hash v in an m-bit filter. The
    * contract input is the nonneg 60-bit md5 prefix
    * (KmvSketch.md5Hash60); the sign-bit mask makes an
    * out-of-contract negative hash (possible from raw SQL) land on a
    * valid — if less uniform — position instead of a negative array
    * index. h2 ∈ [1, m-1] keeps the probe sequence non-degenerate.
    */
  private def position(v0: Long, i: Int, m: Int): Int = {
    val v = v0 & Long.MaxValue
    val h1 = v % m
    val h2 = 1L + (v / m) % (m - 1)
    ((h1 + i * h2) % m).toInt
  }

  private def setBits(buf: Array[Long], v: Long, m: Int): Unit = {
    var i = 0
    while (i < K) {
      val p = position(v, i, m)
      buf(p >>> 6) |= 1L << (p & 63)
      i += 1
    }
  }

  /** Probe directly against the ArrayData words — no per-row copy of
    * the (broadcast) bitset; K getLong calls per row.
    */
  def mightContain(grid: ArrayData, v: Long): Boolean = {
    val m = grid.numElements() * 64
    var i = 0
    while (i < K) {
      val p = position(v, i, m)
      if (((grid.getLong(p >>> 6) >>> (p & 63)) & 1L) == 0L) return false
      i += 1
    }
    true
  }

  /** Scalar membership probe: (bitset, hash) → might-contain. Codegen
    * emits one static call per row; no false negatives by
    * construction.
    */
  case class BloomContains(left: Expression, right: Expression)
      extends BinaryExpression {
    override def checkInputDataTypes(): TypeCheckResult =
      if (left.dataType.isInstanceOf[ArrayType] &&
          left.dataType.asInstanceOf[ArrayType].elementType == LongType &&
          right.dataType == LongType)
        TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        s"$ContainsFnName expects (ARRAY<BIGINT>, BIGINT), got " +
          s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
    override def dataType: DataType = BooleanType
    override def nullSafeEval(grid: Any, v: Any): Any =
      mightContain(grid.asInstanceOf[ArrayData], v.asInstanceOf[Long])
    override protected def doGenCode(ctx: CodegenContext,
        ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (g, v) =>
        s"${ev.value} = graft.functions.BloomSketch.mightContain($g, $v);")
    override protected def withNewChildrenInternal(
        l: Expression, r: Expression): BloomContains = copy(l, r)
  }

  /** `(hash, m-literal)` → aggregate expression; shared by the
    * temp-function path and GraftExtensions' catalog injection.
    */
  def fromExprs(exprs: Seq[Expression]): Expression = {
    val m = exprs(1) match {
      case Literal(v: Int, _) => v
      case other => throw new IllegalArgumentException(
        s"$FnName: numBits must be an INTEGER literal, got $other")
    }
    BloomSketch(exprs.head, m).toAggregateExpression()
  }

  /** name → builder, shared with GraftExtensions' catalog injection. */
  val Builders: Seq[(String, Seq[Expression] => Expression)] = Seq(
    FnName -> (fromExprs _),
    ContainsFnName -> (es => BloomContains(es.head, es(1))))

  def ensureRegistered(spark: SparkSession): Unit =
    graft.GraftExtensions.ensure(spark, Builders)

  /** The bitset as an agg Column over a pre-computed 60-bit hash. */
  def bloom(spark: SparkSession, hash: Column, numBits: Int): Column = {
    ensureRegistered(spark)
    call_function(FnName, hash, lit(numBits))
  }

  def contains(spark: SparkSession, grid: Column, hash: Column): Column = {
    ensureRegistered(spark)
    call_function(ContainsFnName, grid, hash)
  }
}
