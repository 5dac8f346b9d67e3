package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-handling aggregation (SCALE.md): two-stage salted aggregation
  * for hot keys. Stage 1 aggregates on (key, salt) — a hot key's rows
  * spread over `saltBuckets` reducers — stage 2 combines the partials on
  * the key alone. Semantically identical to the direct aggregation for
  * any commutative+associative aggregate (verified against the plain
  * GROUP BY oracle).
  *
  * AQE's skew-join splitting covers joins; this covers aggregations
  * whose partial-agg map-side combine isn't enough (e.g. high-cardinality
  * secondary grouping or giant per-key value sets).
  */
object Skew {

  /** Salted two-stage sum/count. `sums` maps output column name → value
    * expression to sum.
    */
  def saltedAgg(
      df: DataFrame,
      key: String,
      sums: Map[String, Column],
      saltBuckets: Int = 16): DataFrame = {
    val salted = df.withColumn("_salt",
      pmod(xxhash64(monotonically_increasing_id()), lit(saltBuckets.toLong)))
    val partial = salted
      .groupBy(col(key), col("_salt"))
      .agg(
        sums.head match { case (n, c) => sum(c).as(n) },
        (sums.tail.map { case (n, c) => sum(c).as(n) }.toSeq :+
          count(lit(1)).as("_n")): _*)
    partial
      .groupBy(col(key))
      .agg(
        sums.head match { case (n, _) => sum(col(n)).as(n) },
        (sums.tail.map { case (n, _) => sum(col(n)).as(n) }.toSeq :+
          sum(col("_n")).as("n_rows")): _*)
  }
}
