package graft.operators

import graft.SparkSpec
import graft.model.Tables
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

class IncrementalSpec extends SparkSpec {

  private def canon(df: DataFrame): Seq[String] =
    df.orderBy("o_custkey").collect().map(_.toString).toSeq

  private lazy val orders = Tables.orders(spark, sf0001)

  test("merge(base, delta) finalizes identically to the full recompute") {
    val cutoff = to_timestamp(lit("1998-01-01"))
    val merged = Incremental.finalizeState(Incremental.mergeStates(Seq(
      Incremental.orderState(orders.filter(col("o_orderdate") < cutoff)),
      Incremental.orderState(orders.filter(col("o_orderdate") >= cutoff)))))
    val full = Incremental.finalizeState(Incremental.orderState(orders))
    assert(canon(merged) == canon(full))
  }

  test("state merge is associative across increment orderings") {
    val parts = Seq(0, 1, 2).map(i =>
      Incremental.orderState(orders.filter(pmod(col("o_orderkey"), lit(3)) === i)))
    val leftFold = Incremental.mergeStates(Seq(
      Incremental.mergeStates(Seq(parts(0), parts(1))), parts(2)))
    val rightFold = Incremental.mergeStates(Seq(
      parts(0), Incremental.mergeStates(Seq(parts(2), parts(1)))))
    assert(canon(Incremental.finalizeState(leftFold)) ==
      canon(Incremental.finalizeState(rightFold)))
  }

  test("merging a single state is the identity") {
    val s = Incremental.orderState(orders)
    assert(canon(Incremental.finalizeState(Incremental.mergeStates(Seq(s)))) ==
      canon(Incremental.finalizeState(s)))
  }

  test("delta maintenance touches only state rows, not the base facts") {
    // The merge plan's scan set must not include the base fact source —
    // it aggregates over the two state relations only. Materialize the
    // base state to parquet (as a real MV would), then merge from disk.
    val dir = java.nio.file.Files.createTempDirectory("incr").toString
    val cutoff = to_timestamp(lit("1998-01-01"))
    Incremental.orderState(orders.filter(col("o_orderdate") < cutoff))
      .write.mode("overwrite").parquet(dir)
    val baseState = spark.read.parquet(dir)
    val merged = Incremental.mergeStates(Seq(baseState,
      Incremental.orderState(orders.filter(col("o_orderdate") >= cutoff))))
    val scans = merged.queryExecution.executedPlan.toString
    // exactly one orders scan (the delta side); the base arrives from
    // the materialized state
    assert("orders\\.parquet".r.findAllIn(scans).length == 1, scans)
  }
}
