package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton) clustering: multi-dimensional data skipping.
  *
  * Partition pruning handles ONE leading dimension; at 100 TB the second
  * predicate column reads everything. Z-ordering interleaves the bits of
  * two dimensions into one sort key, so sorting by it makes every
  * contiguous file span a ROUGHLY SQUARE region of the 2-D space — both
  * dimensions' per-file min/max stay tight, and parquet min/max stats let
  * a scan with a predicate on EITHER dimension (or both) skip most files
  * (ZOrderSpec demonstrates the skip on real footer stats; a linear
  * layout skips nothing on the non-sort dimension).
  *
  * The interleave is the branch-free spread-bits chain (Morton encoding
  * via magic masks — public bit-twiddling canon), built from plain
  * bitwise Column ops so it stays inside whole-stage codegen AND states
  * identically in ANSI SQL (the oracle runs the same chain in DuckDB).
  *
  * Callers quantize each dimension to a 16-bit non-negative grid first
  * (rank, bucket, or unit-scale); `zValue16` masks to 16 bits, so the
  * z-value is a 32-bit code in a non-negative long.
  */
object ZOrder {

  /** Spread the low 16 bits of `c` to the even bit positions of a long:
    * 0b1111 → 0b01010101. */
  def spread16(c: Column): Column = {
    val v0 = c.cast("long").bitwiseAND(lit(0xFFFFL))
    val v1 = v0.bitwiseOR(shiftleft(v0, 8)).bitwiseAND(lit(0x00FF00FFL))
    val v2 = v1.bitwiseOR(shiftleft(v1, 4)).bitwiseAND(lit(0x0F0F0F0FL))
    val v3 = v2.bitwiseOR(shiftleft(v2, 2)).bitwiseAND(lit(0x33333333L))
    v3.bitwiseOR(shiftleft(v3, 1)).bitwiseAND(lit(0x55555555L))
  }

  /** 32-bit Morton code of two 16-bit dimensions: `a` on even bits,
    * `b` on odd. */
  def zValue16(a: Column, b: Column): Column =
    spread16(a).bitwiseOR(shiftleft(spread16(b), 1))

  /** The identical spread chain as oracle SQL over expression `e`. */
  def spread16Sql(e: String): String = {
    val v0 = s"(($e) & 65535)"
    val v1 = s"(($v0 | ($v0 << 8)) & 16711935)"
    val v2 = s"(($v1 | ($v1 << 4)) & 252645135)"
    val v3 = s"(($v2 | ($v2 << 2)) & 858993459)"
    s"(($v3 | ($v3 << 1)) & 1431655765)"
  }

  /** Oracle SQL form of [[zValue16]]. */
  def zValue16Sql(a: String, b: String): String =
    s"(${spread16Sql(a)} | (${spread16Sql(b)} << 1))"

  /** Write `df` clustered by the z-order of two quantized dimensions:
    * range-partition on the z-value (each output file owns a contiguous
    * z-range = a compact 2-D tile), sort within files so row-group stats
    * are tight too. `files` is the scale lever — size it so each file is
    * ~0.5–1 GB at the target volume; the range exchange is the one-time
    * clustering cost, identical in shape to a global sort. */
  def clusterWrite(df: DataFrame, dimA: Column, dimB: Column,
                   files: Int, path: String): Unit =
    df.withColumn("_z", zValue16(dimA, dimB))
      .repartitionByRange(files, col("_z"))
      .sortWithinPartitions("_z")
      .drop("_z")
      .write.mode("overwrite").parquet(path)
}
