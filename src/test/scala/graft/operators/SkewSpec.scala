package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.model.Tables

/** Skew rewrites must be EXACT: salted aggregation and salted join both
  * asserted equal to their direct (unsalted) formulations on the fixture.
  */
class SkewSpec extends SparkSpec {

  test("saltedAgg ≡ direct GROUP BY") {
    val ev = Tables.events(spark, sf0001)
    val salted = Skew.saltedAgg(ev, "user_id",
      Map("value_cents" -> floor(col("value") * 100 + lit(0.5)).cast("long")))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val direct = ev.groupBy("user_id")
      .agg(sum(floor(col("value") * 100 + lit(0.5)).cast("long")).as("value_cents"),
        count(lit(1)).as("n_rows"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(salted == direct && direct.nonEmpty)
  }

  test("saltedJoin inner/left ≡ direct join incl. null preservation") {
    val ev = Tables.events(spark, sf0001)
    val cust = Tables.customer(spark, sf0001)
    def rows(df: org.apache.spark.sql.DataFrame) = df
      .select(col("event_id"), col("user_id"), col("c_name"))
      .collect().map(r => (r.getLong(0), r.getLong(1), Option(r.getString(2)))).toSet
    val inner = rows(Skew.saltedJoin(ev, cust, "user_id", "c_custkey"))
    val innerDirect = rows(ev.join(cust, ev("user_id") === cust("c_custkey")))
    assert(inner == innerDirect && inner.nonEmpty)
    val left = rows(Skew.saltedJoin(ev, cust, "user_id", "c_custkey",
      joinType = "left"))
    val leftDirect = rows(ev.join(cust, ev("user_id") === cust("c_custkey"), "left"))
    assert(left == leftDirect)
    // events without a matching customer survive the left join as nulls
    assert(left.exists(_._3.isEmpty) ||
      inner.size == left.size) // (fixture may fully match; then sizes agree)
    intercept[IllegalArgumentException] {
      Skew.saltedJoin(ev, cust, "user_id", "c_custkey", joinType = "right")
    }
  }
}
