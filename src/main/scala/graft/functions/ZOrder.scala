package graft.functions

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

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

  /** N-column Morton interleave: bit i of column j lands at position
    * i·n + j, so `zValueN(Seq(x, y), bits)` ≡ [[zValue2]] exactly
    * (spec-pinned). n·bits ≤ 62 keeps the result positive in a signed
    * long — the budget the caller splits across dimensions (3 cols →
    * ≤ 20 bits each), which is also the honest statement of z-order's
    * limit: each added dimension costs every other dimension locality,
    * so cluster on the 2–4 columns range queries actually filter by,
    * not everything.
    */
  def zValueN(cols: Seq[Column], bits: Int): Column = {
    require(cols.size >= 2 && cols.size <= 8,
      s"zValueN takes 2..8 columns, got ${cols.size}")
    require(bits >= 1 && cols.size * bits <= 62,
      s"need n*bits <= 62, got ${cols.size} * $bits")
    val n = cols.size
    cols.zipWithIndex.map { case (c, j) =>
      val m = c.cast("long").bitwiseAND(lit((1L << bits) - 1))
      (0 until bits).map { i =>
        shiftleft(m.bitwiseAND(lit(1L << i)), i * (n - 1) + j)
      }.reduce(_ bitwiseOR _)
    }.reduce(_ bitwiseOR _)
  }

  /** Affine-scale a column to the full [0, 2^bits) range. Z-ordering
    * RAW values only clusters both dimensions when their domains have
    * comparable bit widths: with x spanning 15 bits and y spanning 10,
    * z's high bits are x's alone (y's bits 10-14 are constant zero), so
    * range-partitioning on z degenerates to partitioning on x and the
    * y-dimension gets no locality at all — ZOrderProbe measured 99 % of
    * rows scanned for a 5 % y-range predicate under raw interleaving.
    * Scaling both dimensions to the same width restores the alternating
    * quadtree cuts that make BOTH dimensions prunable. (Min/max scaling
    * assumes roughly uniform domains — the fixture's and TPC-H's shape;
    * for heavily skewed columns use [[zorderWriteRanked]], which maps
    * values to exact ranks first and interleaves those.)
    */
  def scaleTo(c: Column, lo: Long, hi: Long, bits: Int): Column = {
    val width = math.max(1L, hi - lo)
    ((c.cast("double") - lo) * (((1L << bits) - 1).toDouble / width))
      .cast("long")
  }

  /** Cluster-write: min/max-scale both dimensions to `bits` width (see
    * [[scaleTo]]), compute z, range-partition on it (disjoint z
    * intervals per output file — that disjointness IS the pruning
    * guarantee), sort within partitions so parquet row-group min/max
    * stays tight, and write. `numFiles` sizes output files; pass 0 (the
    * default) to derive it from the input's Catalyst leaf stats at a
    * 128 MiB-per-file target — the bytes-per-file sizing a real table
    * layout uses, same stats source as the shuffle-width autosizing
    * (`graft.Sessions`), clamped to [1, 65536]. The min/max pass is one
    * cheap two-column agg; at 100 TB use table-level stats instead.
    */
  val TargetBytesPerFile: Long = 128L << 20

  def zorderWrite(
      df: DataFrame,
      xCol: String,
      yCol: String,
      path: String,
      bits: Int = 16,
      numFiles: Int = 0): Unit = {
    val r = df.agg(
      min(col(xCol)).cast("long"), max(col(xCol)).cast("long"),
      min(col(yCol)).cast("long"), max(col(yCol)).cast("long")).head()
    require(!r.anyNull, s"zorderWrite: empty input or null keys in $xCol/$yCol")
    val files =
      if (numFiles > 0) numFiles
      else math.max(1L, math.min(65536L,
        (graft.Sessions.statsBytes(df) + TargetBytesPerFile - 1)
          / TargetBytesPerFile)).toInt
    val zx = scaleTo(col(xCol), r.getLong(0), r.getLong(1), bits)
    val zy = scaleTo(col(yCol), r.getLong(2), r.getLong(3), bits)
    df.withColumn("z", zValue2(zx, zy, bits))
      .repartitionByRange(files, col("z"))
      .sortWithinPartitions(col("z"))
      .write.mode("overwrite").parquet(path)
  }

  /** Exact 0-based dense rank of the DISTINCT non-null values of `c`:
    * returns the two-column relation (_v: long, _r: long) with `_r` =
    * position of `_v` in ascending order. Distributed exact rank, no
    * single-task window: distinct → range-repartition → sort within
    * partitions → `zipWithIndex` (partition-ordered, so the index IS
    * the global rank; range boundaries are sampled but any boundary
    * placement yields the same value→rank mapping, so the result is
    * deterministic). Cost: one distinct shuffle + one range shuffle
    * over the DOMAIN, which is ≪ rows for any real cluster key.
    */
  def rankMap(df: DataFrame, c: String): DataFrame = {
    val spark = df.sparkSession
    val sorted = df.select(col(c).cast("long").as("_v"))
      .filter(col("_v").isNotNull).distinct()
      .repartitionByRange(col("_v")).sortWithinPartitions("_v")
    val rdd = sorted.rdd.zipWithIndex.map { case (r, i) => Row(r.getLong(0), i) }
    spark.createDataFrame(rdd, StructType(Seq(
      StructField("_v", LongType, nullable = false),
      StructField("_r", LongType, nullable = false))))
  }

  /** Rank-preprocessed z column: both dimensions mapped to their exact
    * dense rank, the ranks min/max-scaled (lo = 0, hi = maxRank — the
    * same [[scaleTo]] affine step, now over a domain that is contiguous
    * BY CONSTRUCTION), then interleaved. This is the skew-proof layout
    * key: min/max scaling of raw values collapses under heavy-tailed
    * domains — one 2⁴⁰ outlier over a 2²⁰-wide mass maps the entire
    * mass to scaled bucket 0, silently degenerating the layout the same
    * way the unequal-domain bug did (ZOrderProbe r14, 99.15 % scanned)
    * — while ranks are distribution-free: exactly ⌈n/2^bits⌉ distinct
    * values per bucket for ANY input distribution. Rows with a null in
    * either dimension are dropped (no rank exists for them), matching
    * [[zorderWrite]]'s non-null requirement.
    *
    * Scale shape: two rank-map joins on the key columns — AQE
    * broadcasts a small domain's map, a 10⁸-key domain goes SMJ; either
    * way the cost is borne once at WRITE time, which is where layout
    * belongs. On a contiguous 0..n−1 domain ranks equal values, so this
    * reduces to exactly the min/max-scaled key (spec-pinned).
    */
  def withRankedZ(
      df: DataFrame,
      xCol: String,
      yCol: String,
      bits: Int = 16,
      zName: String = "z"): DataFrame = {
    val rx = rankMap(df, xCol)
      .withColumnRenamed("_v", "_xv").withColumnRenamed("_r", "_xr")
    val ry = rankMap(df, yCol)
      .withColumnRenamed("_v", "_yv").withColumnRenamed("_r", "_yr")
    val nx = rx.agg(max(col("_xr"))).head()
    val ny = ry.agg(max(col("_yr"))).head()
    require(!nx.isNullAt(0) && !ny.isNullAt(0),
      s"withRankedZ: empty input or all-null keys in $xCol/$yCol")
    df.join(rx, col(xCol).cast("long") === col("_xv"))
      .join(ry, col(yCol).cast("long") === col("_yv"))
      .withColumn(zName, zValue2(
        scaleTo(col("_xr"), 0L, nx.getLong(0), bits),
        scaleTo(col("_yr"), 0L, ny.getLong(0), bits), bits))
      .drop("_xv", "_xr", "_yv", "_yr")
  }

  /** Cluster-write over RANK-scaled dimensions (see [[withRankedZ]]) —
    * the operator the [[scaleTo]] scaladoc used to delegate to caller
    * knowledge ("for heavily skewed columns, map values to ranks
    * first"). Same range-partitioned, within-sorted, bytes-sized write
    * as [[zorderWrite]]; only the key preprocessing differs. Measured
    * (ZOrderProbe `skew:` mode): on log-uniform heavy-tailed keys the
    * min/max layout collapses while this one prunes like the uniform
    * case — SCALE.md r15.
    */
  def zorderWriteRanked(
      df: DataFrame,
      xCol: String,
      yCol: String,
      path: String,
      bits: Int = 16,
      numFiles: Int = 0): Unit = {
    val files =
      if (numFiles > 0) numFiles
      else math.max(1L, math.min(65536L,
        (graft.Sessions.statsBytes(df) + TargetBytesPerFile - 1)
          / TargetBytesPerFile)).toInt
    withRankedZ(df, xCol, yCol, bits, "z")
      .repartitionByRange(files, col("z"))
      .sortWithinPartitions(col("z"))
      .write.mode("overwrite").parquet(path)
  }

  /** N-column cluster-write ([[zValueN]] over min/max-scaled
    * dimensions) — the training-data layout shape: cluster documents on
    * (source, length-bucket, quality-bucket) so per-dimension range
    * filters all prune. `bits` defaults to the per-column share of the
    * 62-bit budget; everything else as [[zorderWrite]].
    */
  def zorderWriteN(
      df: DataFrame,
      cols: Seq[String],
      path: String,
      bits: Int = 0,
      numFiles: Int = 0): Unit = {
    require(cols.size >= 2 && cols.size <= 8,
      s"zorderWriteN takes 2..8 columns, got ${cols.size}")
    val b = if (bits > 0) bits else 62 / cols.size
    val r = df.agg(
      min(col(cols.head)).cast("long"),
      max(col(cols.head)).cast("long") +:
        cols.tail.flatMap(c =>
          Seq(min(col(c)).cast("long"), max(col(c)).cast("long"))): _*)
      .head()
    require(!r.anyNull, s"zorderWriteN: empty input or null keys in $cols")
    val files =
      if (numFiles > 0) numFiles
      else math.max(1L, math.min(65536L,
        (graft.Sessions.statsBytes(df) + TargetBytesPerFile - 1)
          / TargetBytesPerFile)).toInt
    val scaled = cols.zipWithIndex.map { case (c, j) =>
      scaleTo(col(c), r.getLong(2 * j), r.getLong(2 * j + 1), b)
    }
    df.withColumn("z", zValueN(scaled, b))
      .repartitionByRange(files, col("z"))
      .sortWithinPartitions(col("z"))
      .write.mode("overwrite").parquet(path)
  }
}
