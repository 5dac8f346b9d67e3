package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.model.Tables

/** Mergeable HLL sketches: estimate accuracy vs exact distinct, and the
  * partial/merge identity that makes sketches storable artifacts.
  */
class SketchesSpec extends SparkSpec {
  import spark.implicits._

  test("hllDistinct tracks exact distinct within HLL error on the fixture") {
    val ev = Tables.events(spark, sf0001)
    val approx = Sketches.hllDistinct(ev, col("user_id"), col("event_type"))
      .as[(String, Long)].collect().toMap
    val exact = ev.groupBy("event_type").agg(countDistinct("user_id"))
      .as[(String, Long)].collect().toMap
    assert(approx.keySet == exact.keySet)
    exact.foreach { case (k, n) =>
      val e = approx(k)
      assert(math.abs(e - n) <= math.max(3.0, 0.05 * n),
        s"$k: estimate $e vs exact $n")
    }
  }

  test("merged daily partials ≡ one-shot sketch (mergeability identity)") {
    val ev = Tables.events(spark, sf0001)
      .withColumn("day", dayofmonth(col("ts")))
    // build per-(type, day) partials, then merge away the day dimension
    val partials = Sketches.hllPartials(ev, col("user_id"),
      col("event_type"), col("day"))
    assert(partials.schema("hll_sketch").dataType.typeName == "binary")
    val merged = Sketches.hllMergeEstimate(partials, col("event_type"))
      .as[(String, Long)].collect().toMap
    val oneShot = Sketches.hllDistinct(ev, col("user_id"), col("event_type"))
      .as[(String, Long)].collect().toMap
    assert(merged == oneShot) // sketch union is exact over sketches
  }

  test("KLL merged quantiles land within rank error of the exact percentile") {
    val li = Tables.lineitem(spark, sf0001)
    val est = Sketches.kllMergeQuantiles(
      Sketches.kllPartials(li, col("l_quantity"),
        col("l_returnflag"), col("l_linestatus")),
      Seq("p50" -> 0.5, "p90" -> 0.9), col("l_returnflag"))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    // rank-error check: the fraction of values at-or-below the estimate
    // must bracket the target rank within KLL's ~1.65% (+ slack)
    est.foreach { case (flag, (p50, p90)) =>
      val g = li.filter(col("l_returnflag") === flag)
      val n = g.count().toDouble
      def rankLe(v: Double) = g.filter(col("l_quantity") <= v).count() / n
      def rankLt(v: Double) = g.filter(col("l_quantity") < v).count() / n
      assert(rankLe(p50) >= 0.45 && rankLt(p50) <= 0.55,
        s"$flag p50=$p50 rank [${rankLt(p50)}, ${rankLe(p50)}]")
      assert(rankLe(p90) >= 0.85 && rankLt(p90) <= 0.95,
        s"$flag p90=$p90 rank [${rankLt(p90)}, ${rankLe(p90)}]")
    }
  }

  test("theta intersection estimates the exact distinct overlap (exact below nominal entries)") {
    val ev = Tables.events(spark, sf0001)
    def seg(t: String) = Sketches.thetaPartials(
      ev.filter(col("event_type") === t).withColumn("seg", lit("s")),
      col("user_id"), col("seg"))
    val est = Sketches.thetaIntersectEstimate(seg("click"), seg("purchase"), "seg")
      .head().getLong(1).toDouble
    val exact = ev.filter(col("event_type") === "click").select("user_id")
      .intersect(ev.filter(col("event_type") === "purchase").select("user_id"))
      .count().toDouble
    assert(exact > 0)
    assert(math.abs(est - exact) <= math.max(1.0, 0.02 * exact),
      s"theta overlap $est vs exact $exact")
  }

  test("approxTopK agrees with the exact heavy hitters on skewed data") {
    val docs = graft.model.Tables.documents(spark, sf0001)
    val grams = graft.llm.TextOps.ngrams(docs, 2)
    val approx = Sketches.approxTopK(grams, col("gram"), 10)
      .collect().map(r => r.getString(0) -> r.getLong(1))
    val exact = graft.llm.TextOps.topNgrams(docs, 2, 10)
      .collect().map(r => r.getString(0) -> r.getLong(1))
    assert(approx.length == 10)
    // the heavy boilerplate items sit far above sketch error: the top
    // sets agree and the reported counts for common items are exact or
    // near-exact
    val aMap = approx.toMap; val eMap = exact.toMap
    val common = aMap.keySet intersect eMap.keySet
    assert(common.size >= 7, s"approx/exact top-10 overlap only $common")
    common.foreach { g =>
      assert(math.abs(aMap(g) - eMap(g)) <= math.max(2.0, 0.05 * eMap(g)),
        s"$g: approx ${aMap(g)} vs exact ${eMap(g)}")
    }
  }

  test("CMS: estimate >= exact, eps*N bound holds, partial/merge == one-shot") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a a a b", "s1"), (2L, "a b c", "s2"), (3L, "c c d", "s1")
    ).toDF("doc_id", "text", "source")
    val exact = Map("a" -> 4L, "b" -> 2L, "c" -> 3L, "d" -> 1L, "zz" -> 0L)
    val probes = exact.keys.toSeq.sorted
    val est = Sketches.cmsTermCounts(docs, probes)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val n = 10L // total tokens
    probes.foreach { t =>
      assert(est(t) >= exact(t), s"$t: CMS must never underestimate")
      assert(est(t) <= exact(t) + (0.0001 * n).ceil.toLong + 1,
        s"$t: est ${est(t)} breaks the eps*N bound over exact ${exact(t)}")
    }
    // the per-source partial/merge composition equals a single global
    // sketch built with the same parameters
    val tok = docs.select(lit("all").as("g"),
      explode(split(col("text"), " ")).as("term"))
    val oneShot = Sketches.cmsMergeEstimates(
      Sketches.cmsPartials(tok, col("term"), 0.0001, 0.99, 42, col("g")),
      probes)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(oneShot == est, "union of per-source partials must equal one-shot")
  }

  test("registered q_cms_term_counts bounded ROW-WISE by its exact twin q_cms_exact_terms") {
    val dir = sf0001
    val est = graft.SparkEntry.queries("q_cms_term_counts")(spark, dir)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = graft.SparkEntry.queries("q_cms_exact_terms")(spark, dir)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(est.keySet == exact.keySet, "twin queries must probe the same terms")
    val n = graft.model.Tables.documents(spark, dir)
      .select(org.apache.spark.sql.functions.explode(
        org.apache.spark.sql.functions.split(
          org.apache.spark.sql.functions.col("text"), " "))).count()
    val slack = (0.0001 * n).ceil.toLong
    exact.foreach { case (t, ex) =>
      assert(est(t) >= ex, s"$t: CMS under-estimated ($ex > ${est(t)})")
      assert(est(t) <= ex + slack,
        s"$t: est ${est(t)} breaks exact + eps*N = ${ex + slack}")
    }
  }
}
