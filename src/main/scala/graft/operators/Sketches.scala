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

  /** Per-group KLL(double) quantile sketch — the MERGEABLE percentile
    * partial (DataSketches KLL, native in Spark 4). Where
    * [[Stats.percentilesByGroup]] gives exact answers from a rescan,
    * these kilobyte sketches are the artifact a 100 TB pipeline stores
    * per day/source and merges at query time: "p99 latency over any
    * date range" becomes a union of sketches, never a rescan. Rank
    * error ≈ 1.65 % at the default k — spec-asserted against the exact
    * percentile.
    */
  def kllPartials(
      df: DataFrame,
      target: Column,
      groups: Column*): DataFrame =
    df.groupBy(groups: _*)
      .agg(call_function("kll_sketch_agg_double", target.cast("double"))
        .as("kll_sketch"))

  /** Merge stored KLL partials to per-group quantile estimates — the
    * query-time side. `groups` must be the (coarser) key the partials
    * are re-grouped on.
    */
  def kllMergeQuantiles(
      partials: DataFrame,
      ps: Seq[(String, Double)],
      groups: Column*): DataFrame = {
    require(ps.nonEmpty, "kllMergeQuantiles needs >= 1 quantile")
    val merged = partials.groupBy(groups: _*)
      .agg(call_function("kll_merge_agg_double", col("kll_sketch")).as("_m"))
    val keep = merged.columns.filterNot(_ == "_m").map(col).toSeq
    val qs = ps.map { case (name, p) =>
      call_function("kll_sketch_get_quantile_double", col("_m"), lit(p)).as(name)
    }
    merged.select(keep ++ qs: _*)
  }

  /** Per-group theta sketch of distinct `target` values — the partial
    * that supports SET ALGEBRA over distinct counts: union, intersection
    * and difference of sketches estimate |A∪B| / |A∩B| / |A\B| without
    * touching raw data again (plain HLL can only union). Exact below the
    * sketch's nominal-entries threshold.
    */
  def thetaPartials(
      df: DataFrame,
      target: Column,
      groups: Column*): DataFrame =
    df.groupBy(groups: _*)
      .agg(call_function("theta_sketch_agg", target).as("theta_sketch"))

  /** Estimated distinct-overlap |A∩B| between two theta-sketch relations
    * sharing a key — e.g. "users active in BOTH segments", computed from
    * stored per-segment sketches.
    */
  def thetaIntersectEstimate(
      a: DataFrame,
      b: DataFrame,
      key: String): DataFrame =
    a.select(col(key), col("theta_sketch").as("_a"))
      .join(b.select(col(key), col("theta_sketch").as("_b")), key)
      .select(col(key),
        call_function("theta_sketch_estimate",
          call_function("theta_intersection", col("_a"), col("_b")))
          .as("approx_overlap"))

  /** Approximate per-group top-k heavy hitters (DataSketches frequent
    * items under Spark's `approx_top_k`): bounded-memory, mergeable —
    * the scan-speed alternative to the exact
    * sort+limit/TakeOrderedAndProject when the item domain is huge.
    * Returns one row per (group, item, est_count), descending.
    */
  def approxTopK(
      df: DataFrame,
      item: Column,
      k: Int,
      groups: Column*): DataFrame =
    df.groupBy(groups: _*)
      .agg(call_function("approx_top_k", item, lit(k)).as("_tk"))
      .select((df.select(groups: _*).columns.map(col).toSeq :+
        explode(col("_tk")).as("_e")): _*)
      .select((df.select(groups: _*).columns.map(col).toSeq ++ Seq(
        col("_e.item").as("item"),
        col("_e.count").as("est_count"))): _*)
}
