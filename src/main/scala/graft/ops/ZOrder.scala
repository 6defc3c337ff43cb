package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton) clustering — the lakehouse multi-dimensional
  * layout op. Files written in interleaved-bit code order are tight
  * in BOTH dimensions, so parquet min/max zone maps prune scans on
  * either predicate; a single-dimension sort is tight in that
  * dimension and spans the full domain of the other.
  *
  * ONE kernel for the oracle-checked q81 audit (which measures the
  * per-bucket zone tightness this layout produces) and the write
  * path; ScaleOpsSpec demonstrates the written files' worst-dimension
  * extent beating a single-dimension sort by construction.
  */
object ZOrder {

  /** Morton interleave of the low `bits` bits of x and y (callers
    * pre-bucket both into [0, 2^bits)). Pure bit arithmetic — stays
    * in codegen, exact in any engine. Inputs are cast to LONG first:
    * Spark's shift functions keep the input type and Java int shifts
    * wrap the count mod 32, so an IntegerType column at bits ≥ 16
    * would silently produce negative or colliding codes.
    */
  def zcode(x: Column, y: Column, bits: Int): Column = {
    require(bits > 0 && bits <= 31, s"bits must be in [1, 31], got $bits")
    val (xl, yl) = (x.cast("long"), y.cast("long"))
    (0 until bits).map(i =>
      shiftleft(shiftright(xl, i).bitwiseAND(1), 2 * i)
        + shiftleft(shiftright(yl, i).bitwiseAND(1), 2 * i + 1))
      .reduce(_ + _)
  }

  private val CodeCol = "_graft_zcode"

  /** The write layout: range-partition by the code (sampled
    * boundaries absorb skew), sort within each partition — every
    * output file is a contiguous z-range, bounded in both source
    * dimensions. Write the result with `.write.parquet(...)`.
    */
  def layout(df: DataFrame, x: Column, y: Column, bits: Int,
      partitions: Int): DataFrame = {
    // case-insensitive: Spark's withColumn/drop resolve names
    // case-insensitively by default, so "_GRAFT_ZCODE" would be
    // silently replaced and dropped without this check
    require(!df.columns.exists(_.equalsIgnoreCase(CodeCol)),
      s"column $CodeCol is reserved by ZOrder.layout")
    df.withColumn(CodeCol, zcode(x, y, bits))
      .repartitionByRange(partitions, col(CodeCol))
      .sortWithinPartitions(CodeCol)
      .drop(CodeCol)
  }
}
