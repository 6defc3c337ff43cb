package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.functions.{call_function, lit}
import org.apache.spark.sql.types.{DataType, DoubleType}

/** KMV (k-minimum-values) distinct-count sketch over a 60-bit hash
  * column: keep the k smallest DISTINCT hash values; estimate
  * `(k-1) / fraction(k-th smallest)`. Unlike HLL
  * (`approx_count_distinct`), the estimator is a pure function of the
  * input set — deterministic and reproducible in plain SQL — so the
  * result hash-matches an independent engine, while still being a
  * bounded-memory one-pass sketch.
  *
  * Scale design: a `TypedImperativeAggregate`, so Spark runs it with
  * map-side partial aggregation — each task reduces its rows to a
  * ≤k-element buffer (k·8 bytes), and only buffers cross the shuffle.
  * The naive formulation (DISTINCT + row_number window per group, as
  * the DuckDB oracle does) shuffles every distinct hash to one task
  * per group; this one ships k longs per task per group.
  *
  * Buffer: a sorted long set capped at k (TreeSet — k is small, the
  * log-k insert is noise next to the hash itself).
  */
case class KmvSketch(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[scala.collection.mutable.TreeSet[Long]] {

  /** Hash domain: 15 hex chars = 60 bits (fits a signed long; exactly
    * representable as a double power of two for the estimator).
    */
  private val domain = 1.152921504606846976e18 // 16^15

  override def createAggregationBuffer(): scala.collection.mutable.TreeSet[Long] =
    scala.collection.mutable.TreeSet.empty[Long]

  override def update(buf: scala.collection.mutable.TreeSet[Long],
      input: InternalRow): scala.collection.mutable.TreeSet[Long] = {
    val v = child.eval(input)
    if (v != null) add(buf, v.asInstanceOf[Long])
    buf
  }

  override def merge(buf: scala.collection.mutable.TreeSet[Long],
      other: scala.collection.mutable.TreeSet[Long]): scala.collection.mutable.TreeSet[Long] = {
    other.foreach(add(buf, _))
    buf
  }

  private def add(buf: scala.collection.mutable.TreeSet[Long], v: Long): Unit =
    if (buf.size < k) buf += v
    else if (v < buf.last && !buf.contains(v)) { buf += v; buf -= buf.last }

  override def eval(buf: scala.collection.mutable.TreeSet[Long]): Any =
    if (buf.size < k) buf.size.toDouble
    else (k - 1) * domain / buf.last

  override def serialize(buf: scala.collection.mutable.TreeSet[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 8 * buf.size)
    bb.putInt(buf.size)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): scala.collection.mutable.TreeSet[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = scala.collection.mutable.TreeSet.empty[Long]
    var i = 0
    while (i < n) { buf += bb.getLong; i += 1 }
    buf
  }

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)
  override def withNewMutableAggBufferOffset(o: Int): KmvSketch =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): KmvSketch =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): KmvSketch = copy(child = c.head)
}

object KmvSketch {
  val FnName = "graft_kmv"

  /** `(hash, k-literal)` → aggregate expression; shared by the
    * temp-function path and GraftExtensions' catalog injection.
    */
  def fromExprs(exprs: Seq[Expression]): Expression = {
    val k = exprs(1) match {
      case Literal(v: Int, _) => v
      case other => throw new IllegalArgumentException(
        s"$FnName: k must be an INTEGER literal, got $other")
    }
    KmvSketch(exprs.head, k).toAggregateExpression()
  }

  def ensureRegistered(spark: SparkSession): Unit =
    graft.GraftExtensions.ensure(spark, Seq(FnName -> (fromExprs _)))

  /** The shared 60-bit hash recipe: 15-hex md5 prefix → long in
    * [0, 16^15). Used by the KMV sketch (q60) and stratified sampling
    * (q64); the DuckDB mirror is
    * `('0x'||substr(md5(CAST(x AS VARCHAR)),1,15))::BIGINT`.
    */
  def md5Hash60(c: Column): Column = {
    import org.apache.spark.sql.functions.{conv, md5, substring}
    conv(substring(md5(c.cast("string")), 1, 15), 16, 10).cast("long")
  }

  /** `kmv_distinct(hashCol, k)` as an agg Column. `hashCol` must be a
    * long uniformly hashed into [0, 16^15) — [[md5Hash60]] is the
    * recipe shared with the DuckDB oracle.
    */
  def kmvDistinct(spark: SparkSession, hash: Column, k: Int): Column = {
    ensureRegistered(spark)
    call_function(FnName, hash, lit(k))
  }

  /** The MATERIALIZED sketch (sorted ≤k min-hash array) instead of the
    * estimate — the mergeable-partial form a maintained rollup stores
    * per bucket: the k smallest distinct hashes of a union are always
    * contained in the union of each part's k smallest, so re-merging
    * materialized sketches ([[kmvMergeEstimate]]) is EXACTLY the
    * sketch of the whole set, never an approximation of an
    * approximation.
    */
  def kmvState(spark: SparkSession, hash: Column, k: Int): Column = {
    graft.GraftExtensions.ensure(spark, StateBuilders)
    call_function(StateFnName, hash, lit(k))
  }

  /** Merge materialized sketches (array<long> columns) and evaluate
    * the same estimator [[kmvDistinct]] uses — exact below k distinct.
    */
  def kmvMergeEstimate(spark: SparkSession, sketches: Column,
      k: Int): Column = {
    graft.GraftExtensions.ensure(spark, StateBuilders)
    call_function(MergeFnName, sketches, lit(k))
  }

  val StateFnName = "graft_kmv_state"
  val MergeFnName = "graft_kmv_merge"

  private def literalK(exprs: Seq[Expression], fn: String): Int =
    exprs(1) match {
      case Literal(v: Int, _) => v
      case other => throw new IllegalArgumentException(
        s"$fn: k must be an INTEGER literal, got $other")
    }

  val StateBuilders: Seq[(String, Seq[Expression] => Expression)] = Seq(
    StateFnName -> (es =>
      KmvState(es.head, literalK(es, StateFnName)).toAggregateExpression()),
    MergeFnName -> (es =>
      KmvMerge(es.head, literalK(es, MergeFnName)).toAggregateExpression()))
}

/** [[KmvSketch]] evaluating to the materialized sorted min-hash array
  * (the mergeable partial) instead of the estimate. Same buffer, same
  * update/merge — only eval differs.
  */
case class KmvState(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[scala.collection.mutable.TreeSet[Long]] {

  private val inner = KmvSketch(child, k)

  override def createAggregationBuffer(): scala.collection.mutable.TreeSet[Long] =
    scala.collection.mutable.TreeSet.empty[Long]
  override def update(buf: scala.collection.mutable.TreeSet[Long],
      input: InternalRow): scala.collection.mutable.TreeSet[Long] =
    inner.update(buf, input)
  override def merge(buf: scala.collection.mutable.TreeSet[Long],
      other: scala.collection.mutable.TreeSet[Long]): scala.collection.mutable.TreeSet[Long] =
    inner.merge(buf, other)
  override def eval(buf: scala.collection.mutable.TreeSet[Long]): Any =
    new org.apache.spark.sql.catalyst.util.GenericArrayData(buf.toArray)
  override def serialize(buf: scala.collection.mutable.TreeSet[Long]): Array[Byte] =
    inner.serialize(buf)
  override def deserialize(bytes: Array[Byte]): scala.collection.mutable.TreeSet[Long] =
    inner.deserialize(bytes)
  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(
      org.apache.spark.sql.types.LongType, containsNull = false)
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)
  override def withNewMutableAggBufferOffset(o: Int): KmvState =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): KmvState =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): KmvState = copy(child = c.head)
}

/** Union materialized [[KmvState]] sketches back into one bounded
  * buffer and evaluate the estimator — the read side of sketch
  * partials. Input rows are array<long> sketches; k must match the
  * k the states were built with (a smaller k would under-merge, a
  * larger one would mistake a capped sketch for an exact set).
  */
case class KmvMerge(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[scala.collection.mutable.TreeSet[Long]] {

  private val domain = 1.152921504606846976e18 // 16^15
  private val inner = KmvSketch(child, k)

  override def createAggregationBuffer(): scala.collection.mutable.TreeSet[Long] =
    scala.collection.mutable.TreeSet.empty[Long]

  override def update(buf: scala.collection.mutable.TreeSet[Long],
      input: InternalRow): scala.collection.mutable.TreeSet[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val arr = v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      // k-mismatch guard: a stored sketch LARGER than this merge's k
      // means the states were built with a bigger k (a hand-edited or
      // future-version rollup meta) — merging them under the smaller
      // k would silently under-merge (treat a capped sketch's k-th
      // value as the true k-th minimum). Fail loudly instead.
      // ONE-DIRECTIONAL by construction: states built with a SMALLER
      // k than this merge's are structurally indistinguishable from
      // legitimately under-full sketches (the values between the two
      // k-th minimums simply were never stored), so they merge to a
      // silent underestimate no guard can detect. Only reachable by
      // hand-editing the stored k out of the meta it round-trips
      // through — changing k means detach and re-attach the rollup.
      require(arr.numElements() <= k,
        s"${KmvSketch.MergeFnName}: sketch holds ${arr.numElements()} " +
          s"values but k=$k — the states were built with a larger k; " +
          "merge with the k they were built with")
      var i = 0
      while (i < arr.numElements()) {
        add(buf, arr.getLong(i)); i += 1
      }
    }
    buf
  }

  private def add(buf: scala.collection.mutable.TreeSet[Long], v: Long): Unit =
    if (buf.size < k) buf += v
    else if (v < buf.last && !buf.contains(v)) { buf += v; buf -= buf.last }

  override def merge(buf: scala.collection.mutable.TreeSet[Long],
      other: scala.collection.mutable.TreeSet[Long]): scala.collection.mutable.TreeSet[Long] = {
    other.foreach(add(buf, _))
    buf
  }

  override def eval(buf: scala.collection.mutable.TreeSet[Long]): Any =
    if (buf.size < k) buf.size.toDouble
    else (k - 1) * domain / buf.last

  override def serialize(buf: scala.collection.mutable.TreeSet[Long]): Array[Byte] =
    inner.serialize(buf)
  override def deserialize(bytes: Array[Byte]): scala.collection.mutable.TreeSet[Long] =
    inner.deserialize(bytes)
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)
  override def withNewMutableAggBufferOffset(o: Int): KmvMerge =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): KmvMerge =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): KmvMerge = copy(child = c.head)
}
