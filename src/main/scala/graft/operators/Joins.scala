package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Join operators (SURVEY.md §2.3).
  *
  * J1 — the flagship stream-table LEFT OUTER equi-join enriching
  * aggregated events with the current user row (README.md:56-58,69-70).
  * J2 — the batch inner equi-join attaching user dims to windowed
  * features (train.py:275).
  *
  * Scale stance: dimension tables (users/customer) are small relative to
  * the fact side at any scale factor — broadcast them explicitly so the
  * 100 TB fact side never shuffles for the join. ksqlDB instead forces a
  * repartition topic (the manual `PARTITION BY` rekey); Spark's broadcast
  * hash join removes that entire exchange.
  */
object Joins {

  /** J1 — left-enrich facts with a (already latest-by-key) dimension.
    * Unmatched fact rows keep nulls, per reference LEFT JOIN semantics.
    */
  def leftEnrich(
      facts: DataFrame,
      dim: DataFrame,
      factKey: String,
      dimKey: String): DataFrame =
    facts.join(broadcast(dim), facts(factKey) === dim(dimKey), "left")

  /** J2 — inner-enrich (training-side join). */
  def innerEnrich(
      facts: DataFrame,
      dim: DataFrame,
      factKey: String,
      dimKey: String): DataFrame =
    facts.join(broadcast(dim), facts(factKey) === dim(dimKey), "inner")

  /** Interval (range) equi+band join: rows of `left` matched to rows of
    * `right` with the same key and right.ts ∈ [left.ts + lowerSec,
    * left.ts + upperSec] — the attribution-join shape (e.g. clicks in
    * the 10 minutes before each purchase).
    *
    * Scale: the equi-key makes this a hash-partitioned join with the
    * band as a post-join filter — Catalyst plans SortMergeJoin on the
    * key with the range predicate pushed into the join condition. For
    * stream-stream, the same expression with watermarks on both sides
    * bounds join state (see Streaming tests).
    */
  def intervalJoin(
      left: DataFrame,
      right: DataFrame,
      leftKey: String,
      rightKey: String,
      leftTsSec: String,
      rightTsSec: String,
      lowerSec: Long,
      upperSec: Long,
      joinType: String = "inner"): DataFrame = {
    val cond = left(leftKey) === right(rightKey) &&
      right(rightTsSec) >= left(leftTsSec) + lowerSec &&
      right(rightTsSec) <= left(leftTsSec) + upperSec
    left.join(right, cond, joinType)
  }

  /** Key-coercion helper for the reference's string/int key wrinkle
    * (SURVEY.md §2.3: events.user_id STRING vs users.id INTEGER — the
    * join works via stringified rekey). Engine convention: normalize to
    * the dimension's key type at the fact side, asserted in tests.
    */
  def coerceKey(df: DataFrame, key: String, toType: String): DataFrame =
    df.withColumn(key, col(key).cast(toType))
}
