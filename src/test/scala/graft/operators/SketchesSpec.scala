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
}
