package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact distributed percentiles via coarse-bucket localization + exact
  * rank refinement.
  *
  * Spark's built-in exact `percentile` is a TypedImperativeAggregate
  * holding a value→count map per group: memory grows with distinct
  * values and the whole map serializes between partial and final
  * aggregation — on near-unique doubles (prices) it is the slowest kind
  * of aggregate. The previous formulation here (value histogram + one
  * cumulative window per group) was exact but put EVERY distinct value
  * of a group through a single-task window sort — fine for 3 groups at
  * sf0.1, a scale-killer for a 100 TB fact table where one group's
  * distinct values don't fit one task.
  *
  * This version localizes first: per-group (min, max, n) in one
  * scan-agg, then a coarse B-bucket count histogram (map-side combined,
  * B rows per group), whose tiny cumulative window pinpoints the bucket
  * containing each percentile's bracketing ranks and the exact rank
  * offset below it. Only rows inside those ≤ 2·|ps| buckets per group
  * (≈ n/B each, assuming values spread over the range; worst case — all
  * mass in one bucket — degrades to the previous full sort) enter the
  * exact value-histogram window. No stage holds per-group state larger
  * than one (value, count) row; every shuffle key includes the bucket,
  * so in-group parallelism is B, not 1.
  *
  * Interpolation matches `percentile`/DuckDB `quantile_cont`:
  * pos = p·(n−1); result = (⌈pos⌉−pos)·lo + (pos−⌊pos⌋)·hi with the
  * integer-position branch, where lo/hi are the values at 1-based ranks
  * ⌊pos⌋+1 / ⌈pos⌉+1 — bit-identical to the built-in (spec-asserted)
  * and oracle-gated in q_stats_profile.
  */
object Stats {

  /** One output column per (name, p) on top of the group column. */
  def percentilesByGroup(
      df: DataFrame,
      groupCol: String,
      valueCol: String,
      ps: Seq[(String, Double)],
      buckets: Int = 1024): DataFrame = {
    require(ps.nonEmpty && ps.forall { case (_, p) => p >= 0.0 && p <= 1.0 },
      s"percentiles must lie in [0,1]: $ps")
    require(buckets >= 2, s"need >= 2 coarse buckets, got $buckets")
    val rows = df
      .filter(col(valueCol).isNotNull) // percentile semantics ignore nulls
      .select(col(groupCol).as("_g"), col(valueCol).cast("double").as("_v"))

    // pass 0: per-group extent + count
    val bounds = rows.groupBy(col("_g")).agg(
      count(lit(1)).as("_n"), min(col("_v")).as("_mn"), max(col("_v")).as("_mx"))

    // identical expression in both passes → identical bucket ids
    def bucketOf(v: Column): Column =
      when(col("_mx") === col("_mn"), lit(0))
        .otherwise(least(lit(buckets - 1),
          floor((v - col("_mn")) / ((col("_mx") - col("_mn")) / buckets))
            .cast("int")))

    // pass 1: coarse per-bucket counts; the cumulative window runs over
    // ≤ B rows per group — negligible at any data size
    val coarse = rows.join(broadcast(bounds), "_g")
      .groupBy(col("_g"), bucketOf(col("_v")).as("_b"))
      .agg(count(lit(1)).as("_bc"))
    val wB = Window.partitionBy(col("_g")).orderBy(col("_b"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cumB = coarse
      .withColumn("_cumb", sum(col("_bc")).over(wB))
      .withColumn("_beforeb", col("_cumb") - col("_bc"))
      .join(bounds.select(col("_g"), col("_n")), "_g")
    // a bucket is needed iff it contains a bracketing rank of some p
    val needed = ps.map { case (_, p) =>
      val pos = lit(p) * (col("_n") - 1) // fractional rank, 0-based
      (col("_beforeb") < floor(pos) + 1 && col("_cumb") >= floor(pos) + 1) ||
        (col("_beforeb") < ceil(pos) + 1 && col("_cumb") >= ceil(pos) + 1)
    }.reduce(_ || _)
    val kept = cumB.filter(needed).select(col("_g"), col("_b"), col("_beforeb"))

    // pass 2: exact value histogram + rank window INSIDE kept buckets
    // only; _cum is the absolute in-group rank (bucket offset + local
    // running count), so rank selection below is unchanged semantics
    val fine = rows.join(broadcast(bounds), "_g")
      .withColumn("_b", bucketOf(col("_v")))
      .join(broadcast(kept), Seq("_g", "_b"))
      .groupBy(col("_g"), col("_b"), col("_beforeb"), col("_v"))
      .agg(count(lit(1)).as("_c"))
    val wV = Window.partitionBy(col("_g"), col("_b")).orderBy(col("_v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val ranked = fine
      .withColumn("_cum", col("_beforeb") + sum(col("_c")).over(wV))
      .join(broadcast(bounds.select(col("_g"), col("_n"))), "_g")

    val aggs = ps.map { case (name, p) =>
      val pos = lit(p) * (col("_n") - 1)
      val lo = min(when(col("_cum") >= floor(pos) + 1, col("_v")))
      val hi = min(when(col("_cum") >= ceil(pos) + 1, col("_v")))
      val posA = min(pos) // per-group constant, carried through the agg
      // (ceil−pos)·lo + (pos−floor)·hi with the integer-position branch —
      // Spark's Percentile.getPercentile arithmetic exactly, so results
      // compare bit-identically with the built-in (spec-asserted)
      when(floor(posA) === ceil(posA), lo)
        .otherwise((ceil(posA) - posA) * lo + (posA - floor(posA)) * hi)
        .as(name)
    }
    ranked.groupBy(col("_g")).agg(aggs.head, aggs.tail: _*)
      .withColumnRenamed("_g", groupCol)
  }
}
