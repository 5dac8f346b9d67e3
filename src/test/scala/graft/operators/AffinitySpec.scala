package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

class AffinitySpec extends SparkSpec {
  import spark.implicits._

  test("transitionMatrix counts per-user ordered transitions, rows normalize to 1") {
    val df = Seq(
      // user 1: A -> B -> A; user 2: A -> B — transitions: A->B x2, B->A x1
      (1L, 1L, 0L, "A"), (2L, 1L, 10L, "B"), (3L, 1L, 20L, "A"),
      (4L, 2L, 0L, "A"), (5L, 2L, 10L, "B"))
      .toDF("event_id", "user_id", "sec", "event_type")
      .withColumn("ts", timestamp_seconds($"sec"))
    val out = Affinity.transitionMatrix(df)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getDouble(3))).toMap
    assert(out == Map(("A", "B") -> (2L, 1.0), ("B", "A") -> (1L, 1.0)))
    // last event of each user emits no transition: 5 events, 3 pairs
    assert(out.values.map(_._1).sum == 3L)
  }

  test("coOccurrence counts distinct-entity pairs, support threshold filters") {
    val df = Seq(
      (1L, "x"), (1L, "y"), (1L, "y"), // duplicate (1, y) collapses
      (2L, "x"), (2L, "y"),
      (3L, "x"), (3L, "z"))
      .toDF("user_id", "event_type")
    val out = Affinity.coOccurrence(df, "user_id", "event_type")
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(out == Map(("x", "y") -> 2L, ("x", "z") -> 1L))
    val filtered = Affinity.coOccurrence(df, "user_id", "event_type", minSupport = 2L)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(filtered == Set(("x", "y")))
  }

  test("coOccurrence excludes NULL values by contract, other pairs unaffected") {
    // documented semantics: a NULL value never pairs — explicitly
    // filtered, not a side effect of NULL comparison in item_a < item_b
    val df = Seq(
      (1L, Option("x")), (1L, Option("y")), (1L, Option.empty[String]),
      (2L, Option("x")), (2L, Option.empty[String]))
      .toDF("user_id", "event_type")
    val out = Affinity.coOccurrence(df, "user_id", "event_type")
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(out == Map(("x", "y") -> 1L), s"got $out")
  }
}
