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
  * of aggregate. The round-3 formulation here (value histogram + one
  * cumulative window per group) was exact but put EVERY distinct value
  * of a group through a single-task window sort — fine for 3 groups at
  * sf0.1, a scale-killer for a 100 TB fact table where one group's
  * distinct values don't fit one task.
  *
  * This version localizes TWICE before any exact work: per-group
  * (min, max, n) in one scan-agg, then a coarse B-bucket count histogram
  * (map-side combined, B rows per group) whose tiny cumulative window
  * pinpoints the buckets containing each percentile's bracketing ranks —
  * and then the SAME localization again inside those kept buckets, over
  * each kept bucket's own observed [min, max] sub-range. Only rows in
  * kept SUB-buckets (≈ n/B² each when values spread; bounded by the kept
  * bucket's distinct values over B sub-ranges otherwise) enter the exact
  * value-histogram window. The round-4 worst case — all mass landing in
  * one coarse bucket (an outlier stretching the range) — now degrades to
  * a second B-way split of that bucket instead of a full per-group sort;
  * a distribution would have to collapse both levels (n·(1−1/B²) of its
  * mass inside a range B² times smaller than its extent, with the
  * remaining distinct values still huge) before any window grows beyond
  * ~distinct/B² — and repeated values never hurt at all, because the
  * exact pass groups by value BEFORE the window. No stage holds
  * per-group state larger than one (value, count) row; every exact-pass
  * shuffle key includes (bucket, sub-bucket), so in-group parallelism is
  * the number of kept sub-buckets, not 1.
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
    val ranked = localizedRanks(df, groupCol, valueCol, ps, buckets)
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

  /** The exact (value, absolute in-group rank) relation feeding percentile
    * selection, after two levels of bucket localization. Package-private
    * so the spec can assert the exact pass's window partitions stay
    * bounded on adversarial (all-mass-one-bucket) distributions.
    * Columns: _g, _v, _c (count of _v), _cum (absolute 1-based rank of
    * the last occurrence of _v in its group), _n (group row count).
    */
  private[operators] def localizedRanks(
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

    // identical expression wherever bucket ids are computed → identical
    // assignment across passes
    def bucketOf(v: Column, mn: Column, mx: Column): Column =
      when(mx === mn, lit(0))
        .otherwise(least(lit(buckets - 1),
          floor((v - mn) / ((mx - mn) / buckets)).cast("int")))

    // a bucket/sub-bucket is needed iff it contains a bracketing rank of
    // some p: ranks ⌊pos⌋+1 and ⌈pos⌉+1, pos = p·(n−1)
    def needed(before: Column, cum: Column): Column = ps.map { case (_, p) =>
      val pos = lit(p) * (col("_n") - 1)
      (before < floor(pos) + 1 && cum >= floor(pos) + 1) ||
        (before < ceil(pos) + 1 && cum >= ceil(pos) + 1)
    }.reduce(_ || _)

    // pass 1: coarse per-bucket counts; the cumulative window runs over
    // ≤ B rows per group — negligible at any data size
    val coarse = rows.join(broadcast(bounds), "_g")
      .groupBy(col("_g"), bucketOf(col("_v"), col("_mn"), col("_mx")).as("_b"))
      .agg(count(lit(1)).as("_bc"))
    val wB = Window.partitionBy(col("_g")).orderBy(col("_b"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cumB = coarse
      .withColumn("_cumb", sum(col("_bc")).over(wB))
      .withColumn("_beforeb", col("_cumb") - col("_bc"))
      .join(bounds.select(col("_g"), col("_n")), "_g")
    val kept1 = cumB.filter(needed(col("_beforeb"), col("_cumb")))
      .select(col("_g"), col("_b"), col("_beforeb"))

    // rows inside kept coarse buckets (≈ 2·|ps|·n/B of the input when
    // values spread over the range) — materialized once so the three
    // refinement passes below don't re-scan the base relation
    val keptRows = rows.join(broadcast(bounds), "_g")
      .withColumn("_b", bucketOf(col("_v"), col("_mn"), col("_mx")))
      .drop("_n", "_mn", "_mx")
      .join(broadcast(kept1), Seq("_g", "_b"))
      .localCheckpoint()

    // pass 1.5: localize AGAIN inside each kept bucket, over the bucket's
    // own observed extent — this is what bounds the worst case where one
    // coarse bucket holds (almost) all the group's mass
    val subBounds = keptRows.groupBy(col("_g"), col("_b"))
      .agg(min(col("_v")).as("_smn"), max(col("_v")).as("_smx"))
    val subCoarse = keptRows.join(broadcast(subBounds), Seq("_g", "_b"))
      .groupBy(col("_g"), col("_b"), col("_beforeb"),
        bucketOf(col("_v"), col("_smn"), col("_smx")).as("_sb"))
      .agg(count(lit(1)).as("_sc"))
    val wSB = Window.partitionBy(col("_g"), col("_b")).orderBy(col("_sb"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cumSB = subCoarse
      .withColumn("_cums", col("_beforeb") + sum(col("_sc")).over(wSB))
      .withColumn("_befores", col("_cums") - col("_sc"))
      .join(broadcast(bounds.select(col("_g"), col("_n"))), "_g")
    val kept2 = cumSB.filter(needed(col("_befores"), col("_cums")))
      .select(col("_g"), col("_b"), col("_sb"), col("_befores"))

    // pass 2: exact value histogram + rank window INSIDE kept sub-buckets
    // only; _cum is the absolute in-group rank (sub-bucket offset + local
    // running count), so rank selection is unchanged semantics
    val fine = keptRows.join(broadcast(subBounds), Seq("_g", "_b"))
      .withColumn("_sb", bucketOf(col("_v"), col("_smn"), col("_smx")))
      .join(broadcast(kept2), Seq("_g", "_b", "_sb"))
      .groupBy(col("_g"), col("_b"), col("_sb"), col("_befores"), col("_v"))
      .agg(count(lit(1)).as("_c"))
    val wV = Window.partitionBy(col("_g"), col("_b"), col("_sb")).orderBy(col("_v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    fine
      .withColumn("_cum", col("_befores") + sum(col("_c")).over(wV))
      .join(broadcast(bounds.select(col("_g"), col("_n"))), "_g")
      .select(col("_g"), col("_v"), col("_c"), col("_cum"), col("_n"),
        col("_b"), col("_sb"))
  }
}
