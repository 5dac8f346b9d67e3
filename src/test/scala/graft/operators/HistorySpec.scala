package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

class HistorySpec extends SparkSpec {
  import spark.implicits._

  private def hist = Seq(
    // user 1: A → A (no change) → B → A, interleaved ts
    (1L, 0L, "2024-01-01 00:00:00", "A"),
    (1L, 1L, "2024-01-01 01:00:00", "A"),
    (1L, 2L, "2024-01-01 02:00:00", "B"),
    (1L, 3L, "2024-01-01 03:00:00", "A"),
    // user 2: single observation
    (2L, 4L, "2024-01-01 00:30:00", "X"))
    .toDF("user_id", "event_id", "t", "event_type")
    .withColumn("ts", to_timestamp($"t")).drop("t")

  test("scd2: change compaction, half-open intervals, single current row") {
    val out = History.scd2(hist, "user_id", "event_type", "ts", "event_id")
      .orderBy("user_id", "version").collect()
    // user 1 collapses 4 observations into 3 change rows; user 2 has 1
    assert(out.length == 4)
    val u1 = out.filter(_.getLong(0) == 1L)
    assert(u1.map(_.getString(1)).toSeq == Seq("A", "B", "A"))
    assert(u1.map(_.getInt(5)).toSeq == Seq(1, 2, 3))
    // each valid_to equals the next valid_from (contiguous, half-open)
    for (i <- 0 until u1.length - 1)
      assert(u1(i).getTimestamp(3) == u1(i + 1).getTimestamp(2),
        s"interval $i not contiguous")
    // exactly one current row per entity, and it is the last version
    assert(u1.count(_.getBoolean(4)) == 1 && u1.last.getBoolean(4))
    val u2 = out.filter(_.getLong(0) == 2L)
    assert(u2.length == 1 && u2.head.getBoolean(4) && u2.head.get(3) == null)
  }

  test("scd2: one exchange — both windows share the partitioning") {
    val plan = History.scd2(hist, "user_id", "event_type", "ts", "event_id")
      .queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(exchanges == 1, s"expected a single exchange, got $exchanges:\n$plan")
  }

  private def clickstream = Seq(
    // user 1: view → click → purchase (attributed to click),
    // then a purchase 3 days later (outside the 1-day gap → unattributed)
    (10L, 1L, "2024-01-01 00:00:00", "view"),
    (11L, 1L, "2024-01-01 00:10:00", "click"),
    (12L, 1L, "2024-01-01 00:20:00", "purchase"),
    (13L, 1L, "2024-01-04 00:20:00", "purchase"),
    // user 2: purchase with no preceding event at all
    (14L, 2L, "2024-01-01 05:00:00", "purchase"),
    // user 3: two purchases back-to-back — the second's last touch is
    // still the click (purchases are not touches)
    (15L, 3L, "2024-01-01 00:00:00", "click"),
    (16L, 3L, "2024-01-01 00:01:00", "purchase"),
    (17L, 3L, "2024-01-01 00:02:00", "purchase"))
    .toDF("event_id", "user_id", "t", "event_type")
    .withColumn("ts", to_timestamp($"t")).drop("t")

  test("last-touch attribution: gap bound, non-touch conversions, no-touch NULL") {
    val out = History.lastTouchAttribution(
      clickstream, "purchase", maxGapSec = 86400L)
      .orderBy("event_id").collect()
      .map(r => r.getLong(0) -> Option(r.getString(3))).toMap
    assert(out(12L).contains("click")) // most recent touch, not the view
    assert(out(12L).isDefined && out.size == 5)
    assert(out(13L).isEmpty) // 3 days > 1-day gap
    assert(out(14L).isEmpty) // nothing precedes
    assert(out(16L).contains("click"))
    assert(out(17L).contains("click")) // skips the preceding purchase
  }

  test("attribution totals reconcile: one output row per conversion") {
    val n = clickstream.filter($"event_type" === "purchase").count()
    val out = History.lastTouchAttribution(clickstream, "purchase", 86400L)
    assert(out.count() == n)
  }
  test("scd2 treats NULL attributes as values: [A, NULL, A] yields three versions") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val df = Seq(
      (1L, 0L, "2024-01-01 00:00:00", Some("A")),
      (1L, 1L, "2024-01-01 01:00:00", None),
      (1L, 2L, "2024-01-01 02:00:00", Some("A")),
      (1L, 3L, "2024-01-01 03:00:00", Some("A"))) // repeat compacts
      .toDF("user_id", "event_id", "t", "event_type")
      .withColumn("ts", to_timestamp($"t")).drop("t")
    val out = History.scd2(df, "user_id", "event_type", "ts", "event_id")
      .orderBy("version").collect()
    assert(out.map(r => Option(r.getString(1))).toSeq ==
      Seq(Some("A"), None, Some("A")),
      "NULL must be a tracked value, not a wildcard")
    assert(out.map(_.getInt(5)).toSeq == Seq(1, 2, 3))
  }

}
