package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Classifier evaluation as RELATIONAL algebra — the distributed,
  * oracle-checkable counterpart of driver-side metric libraries. The
  * reference evaluates its bot detector with MLlib's
  * BinaryClassificationEvaluator (train.py's areaUnderROC); these
  * operators state the same mathematics as aggregations a 100 TB
  * scored table can run without collecting anything, and (being pure
  * integer-count algebra until the final division) they hash-match an
  * ANSI-SQL oracle bit-for-bit — which a black-box evaluator cannot.
  */
object Metrics {

  /** Exact ROC-AUC via the Mann–Whitney U statistic with tie
    * correction, computed on the SCORE HISTOGRAM: group rows by
    * distinct score (map-side combinable), then one cumulative window
    * over the histogram — the window sorts |distinct scores| rows,
    * never the table (the percentile-localization discipline; quantize
    * scores first if they are continuous and unbounded in cardinality).
    *
    * AUC = Σ_s n⁺(s) · (N⁻(<s) + n⁻(s)/2) / (P·N) — each positive
    * counts the negatives ranked strictly below it plus half its own
    * tie group. Doubled U stays an exact integer sum, so both engines
    * agree before the single rounded division. Output one row:
    * (n_pos, n_neg, auc); auc is NULL when either class is absent.
    */
  def aucExact(
      df: DataFrame,
      labelCol: Column,
      scoreCol: Column): DataFrame = {
    val h = df
      .groupBy(scoreCol.cast("double").as("s"))
      .agg(
        sum(when(labelCol, 1L).otherwise(0L)).as("np"),
        sum(when(labelCol, 0L).otherwise(1L)).as("nn"))
    // cumulative negatives strictly below each score: a window over the
    // distinct-score histogram (|scores| rows), same single-partition
    // trade as Sampling.mixtureWeights' group-relation window
    val w = Window.orderBy(col("s"))
      .rowsBetween(Window.unboundedPreceding, -1)
    h.withColumn("below", coalesce(sum(col("nn")).over(w), lit(0L)))
      .agg(
        sum(col("np")).as("n_pos"),
        sum(col("nn")).as("n_neg"),
        // doubled U keeps the sum integral: np · (2·below + nn)
        sum(col("np") * (lit(2L) * col("below") + col("nn"))).as("_u2"))
      .select(
        col("n_pos"), col("n_neg"),
        when(col("n_pos") > 0 && col("n_neg") > 0,
          round(col("_u2") / (lit(2.0) * col("n_pos") * col("n_neg")), 6))
          .as("auc"))
  }

  /** Reliability (calibration) bins: bucket a [0, 1] score into `bins`
    * equal-width bins and report per-bin count, mean predicted score,
    * and observed positive rate — the relation a calibration curve /
    * ECE computation reads. Scores are clamped into [0, 1] (bin edges
    * are fixed, not data-dependent, so bins are comparable across
    * models and runs); assignment floors v·bins with v = 1 clamped to
    * the last bin, mirroring [[graft.operators.Stats.histogramEquiWidth]].
    * One hash aggregation, ≤ bins rows of state. The mean score sums
    * micro-units as integers (the integer-cents discipline): a double
    * sum's partition order could flip the 6th decimal and break the
    * oracle hash, an integer sum cannot.
    */
  def calibrationBins(
      df: DataFrame,
      labelCol: Column,
      scoreCol: Column,
      bins: Int = 10): DataFrame = {
    require(bins >= 2, s"calibrationBins: bins must be >= 2, got $bins")
    val v = least(greatest(scoreCol.cast("double"), lit(0.0)), lit(1.0))
    val micros = floor(v * 1000000 + 0.5).cast("long")
    df
      .withColumn("bin",
        least(floor(v * bins).cast("int"), lit(bins - 1)))
      .groupBy(col("bin"))
      .agg(
        count(lit(1)).as("n"),
        round(sum(micros) / 1000000.0 / count(lit(1)), 6).as("mean_score"),
        sum(when(labelCol, 1L).otherwise(0L)).as("n_pos"),
        round(sum(when(labelCol, 1L).otherwise(0L)) / count(lit(1)).cast("double"), 6)
          .as("pos_rate"))
  }
}
