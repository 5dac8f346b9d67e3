package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental aggregate maintenance — the materialized-view pattern a
  * 100 TB pipeline uses so a daily delta does NOT force a full-corpus
  * re-aggregation.
  *
  * The algebraic decomposition: every measure kept in the state is
  * MERGEABLE — count and sum merge by summing partials, max by max —
  * so `state(base ∪ delta) = merge(state(base), state(delta))`
  * associatively, and non-mergeable read-side values (averages, the
  * cents→dollars projection) are derived only at [[finalizeState]].
  * The nightly job touches |delta| rows plus |keys| state rows; the
  * 100 TB history is never re-read. The same decomposition is what
  * Spark itself exploits for partial (map-side) aggregation — this
  * module just persists the partial between runs.
  *
  * Correctness contract (oracled): finalize(merge(state(base),
  * state(delta))) is bit-identical to the full recompute over
  * base ∪ delta — money kept as integer cents inside the state so
  * merge order cannot perturb a double sum.
  */
object Incremental {

  private def cents(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    floor(c * 100 + 0.5).cast("long")

  /** Partial-aggregate state of the per-customer order profile for one
    * increment (one scan, map-side combine, one shuffle on the key).
    */
  def orderState(orders: DataFrame): DataFrame =
    orders.groupBy(col("o_custkey"))
      .agg(
        count(lit(1)).as("n_orders"),
        sum(cents(col("o_totalprice"))).as("price_cents"),
        max(col("o_totalprice")).as("max_price"))

  /** Associative merge of any number of increment states: keyed
    * re-aggregation over state rows only (|keys| each — the 100 TB of
    * underlying facts is absent here).
    */
  def mergeStates(states: Seq[DataFrame]): DataFrame =
    states.reduce(_ unionByName _)
      .groupBy(col("o_custkey"))
      .agg(
        sum(col("n_orders")).as("n_orders"),
        sum(col("price_cents")).as("price_cents"),
        max(col("max_price")).as("max_price"))

  /** Read-side projection: derive the non-mergeable values (dollar
    * total, average) from the mergeable state.
    */
  def finalizeState(state: DataFrame): DataFrame =
    state.select(
      col("o_custkey"),
      col("n_orders"),
      (col("price_cents") / 100.0).as("total_price"),
      col("max_price"),
      round(col("price_cents") / 100.0 / col("n_orders"), 6).as("avg_price"))

  /** CDC-aware state update: apply a delta carrying inserts AND deletes
    * (`op` ∈ 'i'/'d' — the unwrapped Debezium envelope shape,
    * [[Relational.cdcUnwrap]]) to the MV state WITHOUT re-reading
    * history for the retractable measures: count and sum retract by
    * sign, so deletes fold into the same |delta|-row aggregation as
    * inserts.
    *
    * `max` is NOT retractable — deleting the current max exposes a
    * runner-up only the remaining rows know — so it is REPAIRED by
    * re-aggregating ONLY the keys that saw a delete, read from the
    * post-delta base relation. That is a key-pruned scan (with the base
    * bucketed/partitioned on the key, 100 TB of history prunes to the
    * touched buckets), never a full recompute, and keys without deletes
    * skip it entirely (their max stays mergeable). Keys whose rows are
    * all deleted leave the view. No broadcast hint on the repair join:
    * delete volume is unbounded in principle, AQE promotes it when
    * small.
    */
  def applyCdcDelta(
      state: DataFrame,
      delta: DataFrame,
      postDeltaBase: DataFrame): DataFrame = {
    val sign = when(col("op") === "d", -1L).otherwise(1L)
    val signed = delta.groupBy(col("o_custkey")).agg(
      sum(sign).as("n_orders"),
      sum(sign * cents(col("o_totalprice"))).as("price_cents"),
      // inserts can raise the max incrementally; deletes contribute
      // nothing here (their damage is undone by the repair below)
      max(when(col("op") =!= "d", col("o_totalprice"))).as("max_price"))
    val merged = mergeStates(Seq(state, signed))
      .filter(col("n_orders") > 0)
    val delKeys = delta.filter(col("op") === "d")
      .select(col("o_custkey")).distinct()
    val repaired = postDeltaBase
      .join(delKeys, Seq("o_custkey")) // the key-pruned rescan
      .groupBy(col("o_custkey"))
      .agg(max(col("o_totalprice")).as("_max_repair"))
    merged.join(repaired, Seq("o_custkey"), "left")
      .select(col("o_custkey"), col("n_orders"), col("price_cents"),
        coalesce(col("_max_repair"), col("max_price")).as("max_price"))
  }
}
