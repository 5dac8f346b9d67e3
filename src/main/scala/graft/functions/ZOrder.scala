package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton) interleaving — multi-dimensional data clustering so
  * ONE sort order serves range predicates on BOTH dimensions.
  *
  * Why it matters at 100 TB: parquet min/max skipping only prunes on
  * the physical sort key. Sorting by x makes y predicates unprunable;
  * sorting by z(x, y) keeps rows close in BOTH coordinates inside each
  * file, so a rectangle query prunes files on either (or both) columns.
  * This is the layout trick behind Delta/Iceberg `OPTIMIZE ZORDER BY`,
  * re-expressed here as a pure column expression plus a range-
  * partitioned write.
  *
  * The interleave is a static fold of shift/mask terms — whole-stage
  * codegen'd integer ops, no UDF, no shuffle — and identical integer
  * arithmetic is expressible in ANSI SQL, so the z-value itself is
  * oracle-checkable.
  */
object ZOrder {

  /** Interleave the low `bits` bits of two non-negative integral
    * columns: bit i of `x` lands at position 2i, bit i of `y` at
    * 2i + 1. Values are masked to `bits` bits first, so out-of-range
    * inputs degrade to their low bits instead of colliding the high
    * ones. 2·bits ≤ 62 keeps the result positive in a signed long.
    */
  def zValue2(x: Column, y: Column, bits: Int = 16): Column = {
    require(bits >= 1 && bits <= 31, s"bits must be in [1,31], got $bits")
    val xs = x.cast("long").bitwiseAND(lit((1L << bits) - 1))
    val ys = y.cast("long").bitwiseAND(lit((1L << bits) - 1))
    (0 until bits).map { i =>
      val xb = shiftleft(xs.bitwiseAND(lit(1L << i)), i)
      val yb = shiftleft(ys.bitwiseAND(lit(1L << i)), i + 1)
      xb.bitwiseOR(yb)
    }.reduce(_ bitwiseOR _)
  }

  /** Cluster-write: compute z, range-partition on it (disjoint z
    * intervals per output file — that disjointness IS the pruning
    * guarantee), sort within partitions so parquet row-group min/max
    * stays tight, and write. `numFiles` sizes output files; at scale
    * pick it from bytes/file targets, not row counts.
    */
  def zorderWrite(
      df: DataFrame,
      xCol: String,
      yCol: String,
      path: String,
      bits: Int = 16,
      numFiles: Int = 8): Unit =
    df.withColumn("z", zValue2(col(xCol), col(yCol), bits))
      .repartitionByRange(numFiles, col("z"))
      .sortWithinPartitions(col("z"))
      .write.mode("overwrite").parquet(path)
}
