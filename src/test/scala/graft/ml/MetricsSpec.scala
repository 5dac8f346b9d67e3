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

  test("aucExact: continuous near-unique scores — every window partitioned, small buckets exact") {
    // the q_auc registered shape: a continuous double score whose
    // distinct-value histogram approaches row count. The bucket
    // localization must (a) put a partition key on EVERY window in the
    // plan — the single-partition WindowExec warning is the round-7
    // scale-killer — and (b) change nothing about the answer, at any
    // bucket count (bucket edges only relocate where the running sum is
    // split)
    val rnd = new scala.util.Random(41)
    val rows = Vector.fill(3000) {
      val s = rnd.nextDouble() * 500.0
      (rnd.nextDouble() < (0.1 + 0.7 * s / 500.0), s)
    }
    val df = rows.toDF("label", "score")
    val out = Metrics.aucExact(df, $"label", $"score")
    val plan = out.queryExecution.executedPlan.toString
    val specs = "windowspecdefinition\\(".r.findAllIn(plan).length
    val partitioned = "windowspecdefinition\\(_b#".r.findAllIn(plan).length
    assert(specs > 0 && specs == partitioned,
      s"$partitioned of $specs windows carry the bucket partition key:\n${plan.take(2000)}")
    // degenerate bucketing (everything in ~3 buckets) ≡ default ≡ the
    // O(n log n) reference computed driver-side
    val auc = out.head().getAs[Double]("auc")
    val auc3 = Metrics.aucExact(df, $"label", $"score", buckets = 3)
      .head().getAs[Double]("auc")
    val sorted = rows.sortBy(_._2)
    val nPos = rows.count(_._1).toLong
    val nNeg = rows.length - nPos
    var below = 0L; var u2 = 0L
    sorted.groupBy(_._2).toVector.sortBy(_._1).foreach { case (_, g) =>
      val np = g.count(_._1).toLong; val nn = g.length - np
      u2 += np * (2L * below + nn); below += nn
    }
    val ref = BigDecimal(u2 / (2.0 * nPos * nNeg))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(auc == ref && auc3 == ref, s"auc=$auc auc3=$auc3 ref=$ref")
  }

  test("aucByGroup ≡ aucExact per group; all windows carry (group, bucket)") {
    val rnd = new scala.util.Random(29)
    val rows = Vector.fill(900) {
      val g = s"seg${rnd.nextInt(4)}"
      val s = rnd.nextDouble() * 100.0
      // per-segment slope differences make the per-group AUCs distinct
      (g, rnd.nextDouble() < (0.1 + (g.last - '0') * 0.2 * s / 100.0), s)
    } :+ (("seg9", true, 1.0)) // single-class group -> NULL auc
    val df = rows.toDF("seg", "label", "score")
    val out = Metrics.aucByGroup(df, $"seg", $"label", $"score", outGroup = "seg")
    val got = out.collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), Option(r.get(3)).map(_.asInstanceOf[Double])))
      .toMap
    assert(got.keySet == Set("seg0", "seg1", "seg2", "seg3", "seg9"))
    assert(got("seg9")._3.isEmpty, "single-class group must have NULL auc")
    for (g <- Seq("seg0", "seg1", "seg2", "seg3")) {
      val sub = df.filter($"seg" === g)
      val ref = Metrics.aucExact(sub, $"label", $"score").head()
      assert(got(g)._1 == ref.getLong(0) && got(g)._2 == ref.getLong(1))
      assert(got(g)._3.contains(ref.getAs[Double]("auc")),
        s"group $g: grouped=${got(g)._3} solo=${ref.getAs[Double]("auc")}")
    }
    // scale shape: every window in the plan is partitioned (carries the
    // group key alongside the bucket key) — grouping must never
    // introduce an unpartitioned WindowExec
    val plan = out.queryExecution.executedPlan.toString
    val specs = "windowspecdefinition\\(".r.findAllIn(plan).length
    val partitioned = "windowspecdefinition\\(seg#".r.findAllIn(plan).length
    assert(specs > 0 && specs == partitioned,
      s"$partitioned of $specs windows carry the group partition key:\n${plan.take(2000)}")
  }

  test("aucExact: NULL scores rank below every real score (nulls-first contract)") {
    // a NULL-score negative must count as "below" every positive; a
    // NULL-score positive ties nothing and sees no negatives below it
    val df = Seq(
      (false, None: Option[Double]), (true, Some(0.9)), (false, Some(0.5)))
      .toDF("label", "score")
    // positive at 0.9 is above both negatives: U2 = 1·(2·2+0) = 4 of
    // max 2·P·N = 4 → auc 1.0
    assert(Metrics.aucExact(df, $"label", $"score")
      .head().getAs[Double]("auc") == 1.0)
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
