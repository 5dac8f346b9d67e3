package graft.ml

import org.apache.spark.sql.functions._
import graft.SparkSpec

class MetricsSpec extends SparkSpec {
  import spark.implicits._

  test("aucExact: known values — perfect 1.0, inverted 0.0, all-tied 0.5") {
    val perfect = Seq((true, 0.9), (true, 0.8), (false, 0.2), (false, 0.1))
      .toDF("label", "score")
    assert(Metrics.aucExact(perfect, $"label", $"score")
      .head().getAs[Double]("auc") == 1.0)
    val inverted = Seq((true, 0.1), (true, 0.2), (false, 0.8), (false, 0.9))
      .toDF("label", "score")
    assert(Metrics.aucExact(inverted, $"label", $"score")
      .head().getAs[Double]("auc") == 0.0)
    // every score identical: each positive ties every negative -> 0.5
    val tied = Seq((true, 0.5), (true, 0.5), (false, 0.5), (false, 0.5))
      .toDF("label", "score")
    assert(Metrics.aucExact(tied, $"label", $"score")
      .head().getAs[Double]("auc") == 0.5)
    // single-class input -> NULL, not a division blowup
    val onlyPos = Seq((true, 0.5), (true, 0.7)).toDF("label", "score")
    assert(Metrics.aucExact(onlyPos, $"label", $"score").head().isNullAt(2))
  }

  test("aucExact ≡ MLlib BinaryClassificationMetrics on a seeded frame with ties") {
    val rnd = new scala.util.Random(13)
    // discrete scores force tie groups; positives skewed toward higher
    // scores so the AUC is nontrivial
    val rows = Vector.fill(400) {
      val s = rnd.nextInt(20) / 20.0
      val label = rnd.nextDouble() < (0.2 + 0.6 * s)
      (label, s)
    }
    val df = rows.toDF("label", "score")
    val ours = Metrics.aucExact(df, $"label", $"score")
      .head().getAs[Double]("auc")
    val mllib = new org.apache.spark.mllib.evaluation.BinaryClassificationMetrics(
      df.select($"score", when($"label", 1.0).otherwise(0.0))
        .rdd.map(r => (r.getDouble(0), r.getDouble(1))))
      .areaUnderROC()
    assert(math.abs(ours - mllib) < 1e-6, s"ours=$ours mllib=$mllib")
  }

  test("calibrationBins: counts partition, rates exact, clamped edges") {
    val df = Seq(
      (true, 0.05), (false, 0.05),          // bin 0: rate 0.5
      (true, 0.95), (true, 0.99),           // bin 9: rate 1.0
      (false, -0.3), (true, 1.7))           // clamped into bins 0 and 9
      .toDF("label", "score")
    val out = Metrics.calibrationBins(df, $"label", $"score", bins = 10)
      .collect().map(r => r.getInt(0) ->
        (r.getLong(1), r.getAs[Double]("mean_score"), r.getAs[Double]("pos_rate"))).toMap
    assert(out.keySet == Set(0, 9))
    assert(out(0)._1 == 3L && out(0)._3 == 0.333333)
    assert(out(9)._1 == 3L && out(9)._3 == 1.0)
    // v = 1 (clamped) lands in the LAST bin, not a phantom bin 10
    assert(math.abs(out(9)._2 - (0.95 + 0.99 + 1.0) / 3) < 1e-5)
  }
}
