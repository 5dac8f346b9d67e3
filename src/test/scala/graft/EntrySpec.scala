package graft

import org.apache.spark.sql.functions._

class EntrySpec extends SparkSpec {

  test("entry: flagship pivot→join→predict pipeline produces labeled rows") {
    val out = SparkEntry.entry(spark)
    val rows = out.limit(2000).collect()
    assert(rows.nonEmpty)
    assert(out.columns.contains("predicted_label"))
    val labels = rows.map(_.getAs[String]("predicted_label")).toSet
    assert(labels.subsetOf(Set("bot", "user")), s"labels=$labels")
    assert(!labels.contains(null))
  }

  test("every declared query runs at sf0.001 and returns rows") {
    // smoke over the full driver contract (skip the two training-heavy
    // queries — covered by MLSpec/EntrySpec — and streaming, covered by
    // StreamingSpec)
    val heavy = Set("q_ml_train_score", "q_predict_udf", "q_stream_hopping_pivot", "q_sim_ivf")
    for ((name, fn) <- SparkEntry.queries if !heavy(name)) {
      val n = fn(spark, sf0001).limit(1).count()
      assert(n > 0, s"$name returned no rows")
    }
  }

  test("oracleSql keys are a subset of queries keys with matching columns contract") {
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
    assert(SparkEntry.benchQueries.forall(SparkEntry.queries.contains))
  }
}
