package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.model.Tables

/** Histogram+rank exact percentiles must equal the built-in value-map
  * `percentile` aggregate bit-for-bit (same interpolation arithmetic).
  */
class StatsSpec extends SparkSpec {
  import spark.implicits._

  test("percentilesByGroup ≡ built-in percentile on the fixture, incl. edges") {
    val li = Tables.lineitem(spark, sf0001)
    val ps = Seq("p0" -> 0.0, "p25" -> 0.25, "p50" -> 0.5,
      "p90" -> 0.9, "p100" -> 1.0)
    val ours = Stats.percentilesByGroup(li, "l_returnflag", "l_extendedprice", ps)
      .collect().map(r => r.getString(0) ->
        (1 to 5).map(r.getDouble)).toMap
    val builtin = li.groupBy("l_returnflag")
      .agg(expr("percentile(l_extendedprice, array(0.0, 0.25, 0.5, 0.9, 1.0))"))
      .collect().map(r => r.getString(0) -> r.getSeq[Double](1)).toMap
    assert(ours.keySet == builtin.keySet && ours.nonEmpty)
    ours.foreach { case (g, vs) =>
      vs.zip(builtin(g)).zipWithIndex.foreach { case ((a, b), i) =>
        assert(a == b, s"group $g percentile #$i: $a != $b")
      }
    }
  }

  test("percentilesGlobal ≡ built-in percentile, incl. the forced refine path") {
    val li = Tables.lineitem(spark, sf0001)
    val ps = Seq(0.0, 0.05, 0.25, 0.5, 0.9, 1.0)
    val builtin = li
      .agg(expr(s"percentile(l_extendedprice, array(${ps.mkString(",")}))"))
      .head().getSeq[Double](0)
    val ours = Stats.percentilesGlobal(li, "l_extendedprice", ps)
    ours.zip(builtin).zipWithIndex.foreach { case ((a, b), i) =>
      assert(a == b, s"percentile #$i: $a != $b")
    }
    // adversarial skew: one outlier stretches the range so nearly all
    // mass lands in coarse bucket 0 → with a tiny refineThreshold the
    // second localization MUST engage and still match bit-for-bit
    val skew = ((1 to 999).map(_.toDouble / 1000) :+ 1.0e9).toDF("v")
    val skewBuiltin = skew
      .agg(expr("percentile(v, array(0.25, 0.5, 0.9))"))
      .head().getSeq[Double](0)
    val skewOurs = Stats.percentilesGlobal(
      skew, "v", Seq(0.25, 0.5, 0.9), buckets = 16, refineThreshold = 64L)
    skewOurs.zip(skewBuiltin).foreach { case (a, b) =>
      assert(a == b, s"refine path: $a != $b")
    }
    // empty and constant inputs
    assert(Stats.percentilesGlobal(skew.filter(lit(false)), "v", Seq(0.5))
      .forall(_.isNaN))
    assert(Stats.percentilesGlobal(
      Seq(7.0, 7.0).toDF("v"), "v", Seq(0.1, 0.9)) == Seq(7.0, 7.0))
  }

  test("percentilesByGroup handles repeated values and nulls like the built-in") {
    val df = Seq(
      ("a", Some(1.0)), ("a", Some(1.0)), ("a", Some(2.0)), ("a", None),
      ("b", Some(5.0))
    ).toDF("g", "v")
    val ours = Stats.percentilesByGroup(df, "g", "v", Seq("p50" -> 0.5))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(ours("a") == 1.0) // median of (1, 1, 2), null ignored
    assert(ours("b") == 5.0)
  }

  test("second localization bounds exact windows when one coarse bucket holds all mass") {
    // adversarial for single-level localization: one outlier stretches the
    // range so all 4000 DISTINCT values land in coarse bucket 0 — round-4
    // code degraded to one 4000-row window sort here; the sub-localization
    // must split that bucket B ways
    val b = 16
    val df = ((1 to 4000).map(i => ("a", i / 4000000.0)) :+ (("a", 1e9)))
      .toDF("g", "v")
    val ps = Seq("p25" -> 0.25, "p50" -> 0.5, "p99" -> 0.99)
    // refineThreshold below the hot bucket's 4000 rows forces the second
    // localization; the default threshold must give identical results
    for (thr <- Seq(256L, 1L << 16)) {
      val ours = Stats.percentilesByGroup(df, "g", "v", ps, buckets = b,
        refineThreshold = thr)
        .collect().map(r => r.getString(0) -> (1 to 3).map(r.getDouble)).toMap
      val builtin = df.groupBy("g")
        .agg(expr("percentile(v, array(0.25, 0.5, 0.99))"))
        .collect().map(r => r.getString(0) -> r.getSeq[Double](1)).toMap
      ours("a").zip(builtin("a")).foreach { case (x, y) =>
        assert(x == y, s"thr=$thr: $x != $y") }
    }
    // boundedness: with refinement engaged, no exact-pass window partition
    // sees more than ~1/B of the hot bucket's distinct values (was 4000
    // in one partition before)
    val ranked = Stats.localizedRanks(df, "g", "v", ps, buckets = b,
      refineThreshold = 256L)
    val maxPart = ranked.groupBy("_g", "_b", "_sb").count()
      .agg(max("count")).head().getLong(0)
    assert(maxPart <= 4000 / b + 32,
      s"exact window partition of $maxPart rows — sub-localization not engaged")
    // constant-heavy mass never hurts: the exact pass groups by value
    val const = ((1 to 5000).map(_ => ("c", 7.0)) :+ (("c", 9.0))).toDF("g", "v")
    val cr = Stats.localizedRanks(const, "g", "v", Seq("p50" -> 0.5), buckets = b,
      refineThreshold = 256L)
    assert(cr.count() <= 2, "repeated values must collapse before the window")
    val cp = Stats.percentilesByGroup(const, "g", "v", Seq("p50" -> 0.5), buckets = b)
      .head().getDouble(1)
    assert(cp == 7.0)
  }

  test("percentilesMulti ≡ per-measure percentilesByGroup, bit-for-bit") {
    val li = Tables.lineitem(spark, sf0001)
    val multi = Stats.percentilesMulti(li, "l_returnflag",
      Seq(
        "l_quantity" -> Seq("q50" -> 0.5, "q90" -> 0.9),
        "l_extendedprice" -> Seq("p25" -> 0.25, "p99" -> 0.99)))
      .collect().map(r => r.getString(0) -> (1 to 4).map(r.getDouble)).toMap
    val qty = Stats.percentilesByGroup(li, "l_returnflag", "l_quantity",
      Seq("q50" -> 0.5, "q90" -> 0.9))
      .collect().map(r => r.getString(0) -> (1 to 2).map(r.getDouble)).toMap
    val price = Stats.percentilesByGroup(li, "l_returnflag", "l_extendedprice",
      Seq("p25" -> 0.25, "p99" -> 0.99))
      .collect().map(r => r.getString(0) -> (1 to 2).map(r.getDouble)).toMap
    assert(multi.nonEmpty && multi.keySet == qty.keySet)
    multi.foreach { case (g, vs) =>
      assert(vs == qty(g) ++ price(g), s"group $g: $vs vs ${qty(g) ++ price(g)}")
    }
  }

  test("bucket localization stays exact on skewed mass and tiny bucket counts") {
    // 99% of the mass on one value (one hot coarse bucket), an outlier
    // stretching the range, and buckets=4 so bracketing ranks of
    // different ps land in different buckets
    val rows = (1 to 990).map(_ => ("a", 10.0)) ++
      (1 to 9).map(i => ("a", 100.0 + i)) :+ (("a", 100000.0)) :+ (("b", 1.0))
    val df = rows.toDF("g", "v")
    val ps = Seq("p01" -> 0.01, "p50" -> 0.5, "p99" -> 0.99, "p999" -> 0.999)
    for (b <- Seq(4, 1024)) {
      val ours = Stats.percentilesByGroup(df, "g", "v", ps, buckets = b)
        .collect().map(r => r.getString(0) -> (1 to 4).map(r.getDouble)).toMap
      val builtin = df.groupBy("g")
        .agg(expr("percentile(v, array(0.01, 0.5, 0.99, 0.999))"))
        .collect().map(r => r.getString(0) -> r.getSeq[Double](1)).toMap
      ours.foreach { case (g, vs) =>
        vs.zip(builtin(g)).foreach { case (x, y) =>
          assert(x == y, s"buckets=$b group $g: $x != $y") } }
    }
  }
  test("madByGroup histogram path ≡ two-pass generic, bit-for-bit, incl. edges") {
    // quantized domain (≤ 50 distinct values per group → the histogram
    // strategy) + engineered edges: single-row group, constant group,
    // nulls, heavy ties, an outlier stretching the range
    val rnd = new scala.util.Random(12)
    val rows = (1 to 3000).map { _ =>
      (s"g${rnd.nextInt(4)}", math.floor(rnd.nextDouble() * 50) + 1)
    } ++ Seq(("solo", 42.0), ("const", 7.0), ("const", 7.0), ("const", 7.0),
      ("out", 1.0), ("out", 2.0), ("out", 3.0), ("out", 1e9))
    val df = rows.toDF("g", "v")
      .union(Seq(("g0", null.asInstanceOf[java.lang.Double]))
        .toDF("g", "v").select(col("g"), col("v").cast("double")))
    for (b <- Seq(4, 1024)) {
      val fast = Stats.madByGroup(df, "g", "v", buckets = b)
        .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
      val slow = Stats.madByGroupGeneric(df, "g", "v", buckets = b)
        .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
      assert(fast == slow && fast.keySet ==
        Set("g0", "g1", "g2", "g3", "solo", "const", "out"),
        s"buckets=$b: $fast vs $slow")
    }
  }

  test("madByGroup localization path ≡ two-pass generic on near-unique doubles") {
    // refineThreshold below the distinct-value count forces the
    // one-round localization strategy (the high-cardinality path);
    // uniform mass keeps every kept bucket and the deviation band small
    val rnd = new scala.util.Random(34)
    val df = ((1 to 2000).map(_ => ("a", rnd.nextDouble() * 1000)) ++
      (1 to 1500).map(_ => ("b", 50 + rnd.nextGaussian() * 10)) :+
      (("solo", 3.25))).toDF("g", "v")
    for (b <- Seq(16, 1024)) {
      val fast = Stats.madByGroup(df, "g", "v", buckets = b, refineThreshold = 300L)
        .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
      val slow = Stats.madByGroupGeneric(df, "g", "v", buckets = b)
        .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
      assert(fast == slow && fast.keySet == Set("a", "b", "solo"),
        s"buckets=$b: $fast vs $slow")
    }
  }

  test("madByGroup falls back to the generic path on adversarial mass concentration") {
    // 500 near-unique values crammed into one coarse bucket (an outlier
    // stretches the range) with refineThreshold=64: approx-distinct ≈ 501
    // skips the histogram path, then the kept median bucket holds 500 >
    // 64 rows → generic fallback; result must still match
    val df = ((1 to 500).map(i => ("a", 10.0 + i * 1e-9)) :+ (("a", 1e12)))
      .toDF("g", "v")
    val fast = Stats.madByGroup(df, "g", "v", refineThreshold = 64L)
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getDouble(2)))
    val slow = Stats.madByGroupGeneric(df, "g", "v")
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getDouble(2)))
    assert(fast.sameElements(slow), s"${fast.toSeq} vs ${slow.toSeq}")
  }

  test("histogramEquiWidth: counts total, buckets bounded, edges contain extents") {
    import spark.implicits._
    val df = (1 to 100).map(_.toDouble).toDF("v")
    val out = Stats.histogramEquiWidth(df, "v", bins = 10).orderBy("bucket").collect()
    assert(out.map(_.getLong(1)).sum == 100L)
    assert(out.forall(r => r.getInt(0) >= 0 && r.getInt(0) < 10))
    // the max value clamps into the last bucket instead of spilling to bin 10
    assert(out.last.getInt(0) == 9 && out.last.getDouble(3) == 100.0)
    out.foreach { r =>
      assert(r.getDouble(2) >= r.getDouble(4) - 1e-9, "bucket_min below edge_lo")
      assert(r.getDouble(3) <= r.getDouble(5) + 1e-9, "bucket_max above edge_hi")
    }
  }

  test("histogramEquiWidth: constant column lands in bucket 0; NULLs are excluded") {
    import spark.implicits._
    val df = Seq(Some(7.0), Some(7.0), Some(7.0), None).toDF("v")
    val out = Stats.histogramEquiWidth(df, "v", bins = 5).collect()
    assert(out.length == 1)
    assert(out.head.getInt(0) == 0 && out.head.getLong(1) == 3L,
      "three non-null constant rows in bucket 0, the NULL excluded")
  }

  test("histogramEquiDepth: near-equal depths vs brute force, ties to the lower bucket") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val vals = Vector.fill(500)(math.floor(rnd.nextDouble() * 200) / 2.0) // ties
    val df = vals.toDF("v")
    val bins = 10
    val out = Stats.histogramEquiDepth(df, "v", bins = bins)
      .collect().map(r => r.getInt(0) -> (r.getLong(1), r.getDouble(2), r.getDouble(3))).toMap
    assert(out.values.map(_._1).sum == 500L)
    // brute force: same interpolated percentiles (rounded 6), same
    // strictly-below assignment
    val sorted = vals.sorted
    def q(p: Double): Double = {
      val h = (sorted.size - 1) * p; val lo = h.toInt
      val raw = if (lo == h) sorted(lo)
        else sorted(lo) + (h - lo) * (sorted(lo + 1) - sorted(lo))
      BigDecimal(raw).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    val bounds = (1 until bins).map(i => q(i.toDouble / bins))
    val expect = vals.groupBy(v => bounds.count(_ < v)).map { case (b, vs) =>
      b -> ((vs.size.toLong, vs.min, vs.max))
    }
    assert(out == expect, s"ours=$out brute=$expect")
    // depths are near-equal: every bucket within 2x of the ideal depth
    // unless collapsed by ties
    val ideal = 500.0 / bins
    assert(out.values.forall(_._1 <= 2 * ideal), s"skewed depths: $out")
    // monotone extents across buckets
    val ordered = out.toSeq.sortBy(_._1).map(_._2)
    ordered.sliding(2).foreach {
      case Seq((_, _, hi1), (_, lo2, _)) => assert(hi1 <= lo2)
      case _ =>
    }
  }

  test("winsorize: clamps into the band, keeps every row, interior values untouched") {
    import spark.implicits._
    val df = (1 to 100).map(i => ("g", i.toLong, i.toDouble)).toDF("g", "id", "v")
    val out = Stats.winsorize(df, "g", "v", 0.1, 0.9)
      .collect().map(r => r.getLong(1) -> r.getAs[Double]("v_wins")).toMap
    assert(out.size == 100, "winsorize must keep every row")
    // exact p10/p90 of 1..100 (interpolated): 10.9 and 90.1
    assert(out(1L) == 10.9 && out(5L) == 10.9, "low tail clamps to p10")
    assert(out(100L) == 90.1 && out(95L) == 90.1, "high tail clamps to p90")
    assert(out(50L) == 50.0, "interior values pass through unchanged")
  }

  test("histogramEquiDepth: NULLs excluded, constant column collapses to one bucket") {
    import spark.implicits._
    val df = Seq(Some(7.0), Some(7.0), Some(7.0), None).toDF("v")
    val out = Stats.histogramEquiDepth(df, "v", bins = 4).collect()
    assert(out.length == 1)
    assert(out.head.getInt(0) == 0 && out.head.getLong(1) == 3L)
  }

  test("quantileDrift: exact R-7 day percentiles and day-over-day deltas") {
    import spark.implicits._
    import java.sql.Timestamp
    val day0 = 86400L * 100
    def ts(d: Int, s: Long) = new Timestamp((day0 + d * 86400L + s) * 1000L)
    // day 0: values 1,2,4,8 → p50=3, p90=6.8; day 1: 10,20 → p50=15, p90=19
    val df = Seq(
      (ts(0, 10), 1.0), (ts(0, 20), 2.0), (ts(0, 30), 4.0), (ts(0, 40), 8.0),
      (ts(1, 10), 10.0), (ts(1, 20), 20.0)
    ).toDF("ts", "value")
    val out = Stats.quantileDrift(df).orderBy("day").collect()
    assert(out.length == 2)
    val d0 = out(0); val d1 = out(1)
    assert(d0.getLong(1) == 4L && d0.getDouble(2) == 3.0 && d0.getDouble(3) == 6.8)
    assert(d0.isNullAt(4) && d0.isNullAt(5), "first day has no delta")
    assert(d1.getLong(1) == 2L && d1.getDouble(2) == 15.0 && d1.getDouble(3) == 19.0)
    assert(d1.getDouble(4) == 12.0 && math.abs(d1.getDouble(5) - 12.2) < 1e-9)
  }

}
