package graft.functions

import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets

import scala.collection.mutable

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.functions.{call_function, lit}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Bounded per-key top-k as a native aggregate: keep the k smallest
  * (priority, id) pairs per group, emitted as a struct array sorted
  * ascending. The per-key rank-and-cap every corpus-capping /
  * per-key-leaderboard pipeline step needs (q96), without the
  * operator that kills it at scale: a `row_number()` window sorts
  * EVERY row of a hot key in one task, while this is a
  * `TypedImperativeAggregate` — each map task reduces its rows to a
  * ≤k-entry heap, only heaps cross the shuffle (≤ k rows per key per
  * task), and no sort of the full key ever happens anywhere.
  *
  * Determinism: the comparator is the total order (priority, id) —
  * ASCII/UTF8 binary string order, identical to an ORDER BY in any
  * engine — so the surviving set and its order are engine-exact.
  *
  * Buffer: TreeSet capped at k (k is small; the log-k insert is noise
  * next to the row decode).
  */
case class TopKAgg(
    pr: Expression,
    id: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[mutable.TreeSet[(String, Long)]] {

  override def createAggregationBuffer(): mutable.TreeSet[(String, Long)] =
    mutable.TreeSet.empty[(String, Long)]

  override def update(buf: mutable.TreeSet[(String, Long)],
      input: InternalRow): mutable.TreeSet[(String, Long)] = {
    val p = pr.eval(input)
    val i = id.eval(input)
    // toString copies out of Spark's reused row buffer — storing the
    // UTF8String itself would alias mutated memory
    if (p != null && i != null)
      add(buf, (p.asInstanceOf[UTF8String].toString, i.asInstanceOf[Long]))
    buf
  }

  override def merge(buf: mutable.TreeSet[(String, Long)],
      other: mutable.TreeSet[(String, Long)]): mutable.TreeSet[(String, Long)] = {
    other.foreach(add(buf, _))
    buf
  }

  private def add(buf: mutable.TreeSet[(String, Long)],
      v: (String, Long)): Unit =
    if (buf.size < k) buf += v
    else if (implicitly[Ordering[(String, Long)]].lt(v, buf.last)) {
      buf += v
      if (buf.size > k) buf -= buf.last
    }

  override def eval(buf: mutable.TreeSet[(String, Long)]): Any =
    new GenericArrayData(buf.toSeq.map { case (p, i) =>
      InternalRow(UTF8String.fromString(p), i)
    })

  override def serialize(buf: mutable.TreeSet[(String, Long)]): Array[Byte] = {
    val items = buf.toSeq.map { case (p, i) =>
      (p.getBytes(StandardCharsets.UTF_8), i)
    }
    val bb = ByteBuffer.allocate(4 + items.map(_._1.length + 12).sum)
    bb.putInt(items.size)
    items.foreach { case (b, i) =>
      bb.putInt(b.length); bb.put(b); bb.putLong(i)
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): mutable.TreeSet[(String, Long)] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = mutable.TreeSet.empty[(String, Long)]
    var i = 0
    while (i < n) {
      val b = new Array[Byte](bb.getInt)
      bb.get(b)
      buf += ((new String(b, StandardCharsets.UTF_8), bb.getLong))
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

  val ResultType: DataType = ArrayType(StructType(Seq(
    StructField("pr", StringType, nullable = false),
    StructField("id", LongType, nullable = false))), containsNull = false)

  /** `(priority STRING, id BIGINT, k INT-literal)` → aggregate;
    * shared by the temp-function path and GraftExtensions' catalog
    * injection.
    */
  def fromExprs(exprs: Seq[Expression]): Expression = {
    val k = exprs(2) match {
      case Literal(v: Int, _) => v
      case other => throw new IllegalArgumentException(
        s"$FnName: k must be an INTEGER literal, got $other")
    }
    TopKAgg(exprs(0), exprs(1), k).toAggregateExpression()
  }

  def ensureRegistered(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      FnName, fromExprs, "scala_udf")

  /** `topk(priority, id, k)` as an agg Column: the k smallest
    * (priority, id) pairs of the group, ascending.
    */
  def topk(spark: SparkSession, pr: Column, id: Column, k: Int): Column = {
    ensureRegistered(spark)
    call_function(FnName, pr, id, lit(k))
  }
}
