package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.model.Tables
import graft.sources.Bucketed

class BucketedJoinSpec extends SparkSpec {

  // unique per run: a crashed earlier run may have left the managed
  // location behind without the catalog entry
  private val run = java.util.UUID.randomUUID().toString.take(8)
  private val tOrders = s"b_orders_$run"
  private val tLineitem = s"b_lineitem_$run"

  test("bucketed fact tables sort-merge join with zero exchanges (SMB co-location)") {
    val thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // forbid broadcast so the exchange-free plan can only come from
      // the bucketed layout, not from a broadcast fallback
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      Bucketed.writeBucketed(
        Tables.orders(spark, sf0001), tOrders, "o_orderkey", 8)
      Bucketed.writeBucketed(
        Tables.lineitem(spark, sf0001), tLineitem, "l_orderkey", 8)
      val joined = spark.table(tLineitem)
        .join(spark.table(tOrders), col("l_orderkey") === col("o_orderkey"))
        .select(col("o_orderkey"), col("l_linenumber"), col("o_totalprice"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join must not shuffle:\n$plan")
      assert(plan.contains("SortMergeJoin"), s"expected SMB join:\n$plan")
      assert(plan.contains("Bucketed: true"),
        s"scan must report the bucketed layout:\n$plan")
      // NOTE: the per-side Sorts remain by design — Spark ≥ 3 does not
      // trust bucket-file sort order at read time (several files per
      // bucket would each be sorted only locally), so it re-sorts
      // within partitions. The shuffle elision is the 100 TB win; the
      // in-partition sort of already-sorted runs is linear and local.
      // correctness: identical relation to the plain (shuffling) join
      val plain = Tables.lineitem(spark, sf0001)
        .join(Tables.orders(spark, sf0001),
          col("l_orderkey") === col("o_orderkey"))
        .select(col("o_orderkey"), col("l_linenumber"), col("o_totalprice"))
      assert(joined.exceptAll(plain).count() == 0 &&
        plain.exceptAll(joined).count() == 0)
      assert(joined.count() == plain.count() && joined.count() > 0)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thresh)
      spark.sql(s"DROP TABLE IF EXISTS $tOrders")
      spark.sql(s"DROP TABLE IF EXISTS $tLineitem")
    }
  }
}
