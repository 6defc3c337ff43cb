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
    * in codegen, exact in any engine.
    */
  def zcode(x: Column, y: Column, bits: Int): Column =
    (0 until bits).map(i =>
      shiftleft(shiftright(x, i).bitwiseAND(1), 2 * i)
        + shiftleft(shiftright(y, i).bitwiseAND(1), 2 * i + 1))
      .reduce(_ + _)

  /** The write layout: range-partition by the code (sampled
    * boundaries absorb skew), sort within each partition — every
    * output file is a contiguous z-range, bounded in both source
    * dimensions. Write the result with `.write.parquet(...)`.
    */
  def layout(df: DataFrame, x: Column, y: Column, bits: Int,
      partitions: Int): DataFrame = {
    require(bits > 0 && bits <= 31, s"bits must be in [1, 31], got $bits")
    df.withColumn("_zcode", zcode(x, y, bits))
      .repartitionByRange(partitions, col("_zcode"))
      .sortWithinPartitions("_zcode")
      .drop("_zcode")
  }
}
