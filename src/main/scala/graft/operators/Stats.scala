package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact distributed percentiles via value histogram + cumulative ranks.
  *
  * Spark's built-in exact `percentile` is a TypedImperativeAggregate
  * holding a value→count map per group: memory grows with distinct
  * values and the whole map serializes between partial and final
  * aggregation — on near-unique doubles (prices) it is the slowest kind
  * of aggregate. This operator computes the same result with shuffle
  * machinery that scales: aggregate (group, value) counts (map-side
  * combined), window-sort values within group accumulating ranks, then
  * one conditional aggregation picks the bracketing values per
  * percentile and interpolates. Peak memory is one (value, count) row,
  * not a map; the sort is the same per-group sort every ranking window
  * already pays.
  *
  * Interpolation matches `percentile`/DuckDB `quantile_cont`:
  * pos = p·(n−1); result = lo + (pos − ⌊pos⌋)·(hi − lo) where lo/hi are
  * the values at ranks ⌊pos⌋+1 / ⌈pos⌉+1 (1-based) — oracle-gated in
  * q_stats_profile.
  */
object Stats {

  /** One output column per (name, p) on top of the group column. */
  def percentilesByGroup(
      df: DataFrame,
      groupCol: String,
      valueCol: String,
      ps: Seq[(String, Double)]): DataFrame = {
    require(ps.nonEmpty && ps.forall { case (_, p) => p >= 0.0 && p <= 1.0 },
      s"percentiles must lie in [0,1]: $ps")
    val hist = df
      .filter(col(valueCol).isNotNull) // percentile semantics ignore nulls
      .groupBy(col(groupCol), col(valueCol).cast("double").as("_v"))
      .agg(count(lit(1)).as("_c"))
    val byGroup = Window.partitionBy(col(groupCol))
    val cumW = byGroup.orderBy(col("_v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val ranked = hist
      .withColumn("_cum", sum(col("_c")).over(cumW))
      .withColumn("_n", sum(col("_c")).over(byGroup))
    val aggs = ps.flatMap { case (name, p) =>
      val pos = lit(p) * (col("_n") - 1) // fractional rank, 0-based
      val lo = min(when(col("_cum") >= floor(pos) + 1, col("_v")))
      val hi = min(when(col("_cum") >= ceil(pos) + 1, col("_v")))
      val posA = min(pos) // per-group constant, carried through the agg
      // (ceil−pos)·lo + (pos−floor)·hi with the integer-position branch —
      // Spark's Percentile.getPercentile arithmetic exactly, so results
      // compare bit-identically with the built-in (spec-asserted)
      Seq(when(floor(posA) === ceil(posA), lo)
        .otherwise((ceil(posA) - posA) * lo + (posA - floor(posA)) * hi)
        .as(name))
    }
    ranked.groupBy(col(groupCol)).agg(aggs.head, aggs.tail: _*)
  }
}
