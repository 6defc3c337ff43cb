package graft.functions

import java.nio.ByteBuffer

import scala.collection.mutable

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.functions.{call_function, lit}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Bounded per-key top-k as a native aggregate: keep the k smallest
  * (priority, id) ROWS per group, emitted as a struct array sorted
  * ascending. The per-key rank-and-cap every corpus-capping /
  * per-key-leaderboard pipeline step needs (q96), without the
  * operator that kills it at scale: a `row_number()` window sorts
  * EVERY row of a hot key in one task, while this is a
  * `TypedImperativeAggregate` — each map task reduces its rows to a
  * ≤k-entry heap, only heaps cross the shuffle (≤ k rows per key per
  * task), and no sort of the full key ever happens anywhere.
  *
  * Determinism and window equality: the comparator is the total
  * order (priority, id) in UTF-8 BINARY byte order — exactly what
  * Spark's UTF8String and an engine's ORDER BY compare (Java String
  * order would diverge on supplementary characters) — and duplicate
  * (priority, id) rows are counted with multiplicity, so the result
  * equals `row_number() OVER (ORDER BY priority, id) <= k` row for
  * row even on non-unique input.
  *
  * Buffer: count-valued TreeMap capped at k total rows (k is small;
  * the log-k insert is noise next to the row decode).
  */
case class TopKAgg(
    pr: Expression,
    id: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[TopKAgg.Buf] {

  require(k > 0, s"${TopKAgg.FnName}: k must be positive, got $k")

  override def checkInputDataTypes(): TypeCheckResult =
    if (pr.dataType == StringType && id.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"${TopKAgg.FnName} expects (STRING, BIGINT) inputs, got " +
        s"(${pr.dataType.simpleString}, ${id.dataType.simpleString})" +
        " (k is a constructor-time INTEGER literal)")

  override def createAggregationBuffer(): TopKAgg.Buf = new TopKAgg.Buf

  override def update(buf: TopKAgg.Buf, input: InternalRow): TopKAgg.Buf = {
    val p = pr.eval(input)
    val i = id.eval(input)
    // getBytes copies out of Spark's reused row buffer — storing the
    // UTF8String itself would alias mutated memory
    if (p != null && i != null)
      buf.add((p.asInstanceOf[UTF8String].getBytes,
        i.asInstanceOf[Long]), 1, k)
    buf
  }

  override def merge(buf: TopKAgg.Buf, other: TopKAgg.Buf): TopKAgg.Buf = {
    other.m.foreach { case (key, n) => buf.add(key, n, k) }
    buf
  }

  override def eval(buf: TopKAgg.Buf): Any =
    new GenericArrayData(buf.m.iterator.flatMap { case ((b, i), n) =>
      Iterator.fill(n)(InternalRow(UTF8String.fromBytes(b), i))
    }.toSeq)

  override def serialize(buf: TopKAgg.Buf): Array[Byte] = {
    val items = buf.m.toSeq
    val bb = ByteBuffer.allocate(4 + items.map(_._1._1.length + 16).sum)
    bb.putInt(items.size)
    items.foreach { case ((b, i), n) =>
      bb.putInt(b.length); bb.put(b); bb.putLong(i); bb.putInt(n)
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKAgg.Buf = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new TopKAgg.Buf
    var i = 0
    while (i < n) {
      val b = new Array[Byte](bb.getInt)
      bb.get(b)
      val id = bb.getLong
      buf.add((b, id), bb.getInt, k)
      i += 1
    }
    buf
  }

  override def dataType: DataType = TopKAgg.ResultType
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(pr, id)
  override def withNewMutableAggBufferOffset(o: Int): TopKAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): TopKAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): TopKAgg = copy(pr = c(0), id = c(1))
}

object TopKAgg {
  val FnName = "graft_topk"

  type Key = (Array[Byte], Long)

  /** UTF-8 binary byte order then id — UTF8String.compareTo's order,
    * which is what ORDER BY compares in Spark and in the oracle.
    */
  val KeyOrd: Ordering[Key] = new Ordering[Key] {
    override def compare(a: Key, b: Key): Int = {
      val c = java.util.Arrays.compareUnsigned(a._1, b._1)
      if (c != 0) c else java.lang.Long.compare(a._2, b._2)
    }
  }

  /** The bounded heap: (priority, id) → multiplicity, capped at k
    * total rows. Duplicate rows count — dropping them would return
    * fewer rows than the window formulation on non-unique input.
    */
  final class Buf {
    val m: mutable.TreeMap[Key, Int] = mutable.TreeMap.empty(KeyOrd)
    private var total = 0

    def add(key: Key, n: Int, k: Int): Unit = {
      // full and not below the current max → every copy would be
      // trimmed right back out
      if (total >= k && KeyOrd.compare(key, m.lastKey) >= 0) return
      m.updateWith(key)(c => Some(c.getOrElse(0) + n))
      total += n
      while (total > k) {
        val (lk, lc) = m.last
        val drop = math.min(lc, total - k)
        if (drop == lc) m.remove(lk) else m.update(lk, lc - drop)
        total -= drop
      }
    }
  }

  val ResultType: DataType = ArrayType(StructType(Seq(
    StructField("pr", StringType, nullable = false),
    StructField("id", LongType, nullable = false))), containsNull = false)

  /** `(priority STRING, id BIGINT, k INT-literal)` → aggregate;
    * shared by the temp-function path and GraftExtensions' catalog
    * injection.
    */
  def fromExprs(exprs: Seq[Expression]): Expression = {
    val k = exprs(2) match {
      case Literal(v: Int, _) if v > 0 => v
      case other => throw new IllegalArgumentException(
        s"$FnName: k must be a positive INTEGER literal, got $other")
    }
    TopKAgg(exprs(0), exprs(1), k).toAggregateExpression()
  }

  def ensureRegistered(spark: SparkSession): Unit =
    graft.GraftExtensions.ensure(spark, Seq(FnName -> (fromExprs _)))

  /** `topk(priority, id, k)` as an agg Column: the k smallest
    * (priority, id) rows of the group, ascending.
    */
  def topk(spark: SparkSession, pr: Column, id: Column, k: Int): Column = {
    ensureRegistered(spark)
    call_function(FnName, pr, id, lit(k))
  }
}
