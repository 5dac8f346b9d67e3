package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Mergeable distinct-count sketches (Apache DataSketches HLL, native in
  * Spark since 3.5). The operational difference from
  * `approx_count_distinct` (the ksql-parity op, `q_approx_distinct`):
  * that one fuses build+estimate in a single aggregation, while these
  * emit the SKETCH as a storable binary column — the artifact a 100 TB
  * pipeline keeps per partition/day/source and merges at query time, so
  * "distinct users over any date range" is a union of kilobyte sketches
  * instead of a rescan of the raw data. Merge is exact over sketches:
  * union-then-estimate ≡ build-once-estimate (spec-asserted).
  */
object Sketches {

  /** Per-group HLL sketch of `target` — the mergeable partial. */
  def hllPartials(
      df: DataFrame,
      target: Column,
      groups: Column*): DataFrame =
    df.groupBy(groups: _*)
      .agg(hll_sketch_agg(target).as("hll_sketch"))

  /** Merge stored partials (e.g. daily sketches) back to per-group
    * estimates — the query-time side of the partial/merge split.
    */
  def hllMergeEstimate(partials: DataFrame, groups: Column*): DataFrame =
    partials.groupBy(groups: _*)
      .agg(hll_sketch_estimate(hll_union_agg(col("hll_sketch")))
        .as("approx_distinct"))

  /** One-shot per-group estimate (build + estimate fused). */
  def hllDistinct(
      df: DataFrame,
      target: Column,
      groups: Column*): DataFrame =
    df.groupBy(groups: _*)
      .agg(hll_sketch_estimate(hll_sketch_agg(target)).as("approx_distinct"))
}
