package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

class WindowOpsSpec extends SparkSpec {
  import spark.implicits._

  private val types = Seq("click", "view")

  test("hopping pivot: every event lands in exactly size/slide = 5 windows") {
    val df = Seq((1L, "2024-01-01 00:05:00", "click"))
      .toDF("user_id", "t", "event_type")
      .withColumn("ts", to_timestamp($"t"))
    val out = WindowOps.hoppingPivot(df, eventTypes = types)
    val rows = out.collect()
    assert(rows.length == 5)
    // epoch-aligned starts (multiples of the 120s slide), all containing the event
    val starts = rows.map(_.getAs[Long]("w_start")).sorted
    val ep = 1704067500L // 00:05:00
    val aligned = ep - ep % 120
    assert(starts.toSeq == (0 to 4).map(k => aligned - 480 + k * 120))
    assert(starts.forall(s => s % 120 == 0 && s <= ep && s + 600 > ep))
    assert(rows.forall(_.getAs[Long]("click_views") == 1L))
    assert(rows.forall(_.getAs[Long]("view_views") == 0L))
  }

  test("hopping pivot: window_start/end are observed min/max event times, not bounds") {
    val df = Seq(
      (1L, "2024-01-01 00:00:30", "click"),
      (1L, "2024-01-01 00:01:15", "view"))
      .toDF("user_id", "t", "event_type")
      .withColumn("ts", to_timestamp($"t"))
    val out = WindowOps.hoppingPivot(df, eventTypes = types)
    // the window starting at 00:00:00 contains both events
    val w0 = out.filter($"w_start" === 1704067200L).head()
    assert(w0.getAs[String]("window_start") == "00:00:30")
    assert(w0.getAs[String]("window_end") == "00:01:15")
  }

  test("rolling counts equal brute-force over [t-600, t]") {
    val events = Seq(
      (1L, 0L, "click"), (1L, 300L, "click"), (1L, 600L, "view"),
      (1L, 601L, "click"), (1L, 1200L, "click"), (2L, 0L, "click"))
      .toDF("user_id", "ts_sec", "event_type")
    val out = WindowOps.rollingCounts(events, eventTypes = types)
      .select("user_id", "ts_sec", "clicks_last_600s").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    // brute force
    val data = Seq((1L, 0L, "click"), (1L, 300L, "click"), (1L, 600L, "view"),
      (1L, 601L, "click"), (1L, 1200L, "click"), (2L, 0L, "click"))
    for ((u, t, _) <- data) {
      val expected = data.count { case (u2, t2, e2) =>
        u2 == u && t2 >= t - 600 && t2 <= t && e2 == "click"
      }
      assert(out((u, t)) == expected.toLong, s"user $u ts $t")
    }
  }

  test("topKPerGroup returns k rows per group in order") {
    val df = Seq((1L, 10.0), (1L, 30.0), (1L, 20.0), (2L, 5.0))
      .toDF("k", "v")
    val out = WindowOps.topKPerGroup(df, Seq("k"), Seq($"v".desc), 2)
      .orderBy("k", "rank_in_group").collect()
    assert(out.map(r => (r.getLong(0), r.getDouble(1), r.getInt(2))).toSeq ==
      Seq((1L, 30.0, 1), (1L, 20.0, 2), (2L, 5.0, 1)))
  }

  test("distinctKeys") {
    val df = Seq(1L, 1L, 2L).toDF("user_id")
    assert(WindowOps.distinctKeys(df, "user_id").count() == 2)
  }

  test("retentionCohorts: cohort day, offsets, distinct-user counts") {
    val df = Seq(
      (1L, "2024-01-01 10:00:00"), (1L, "2024-01-01 23:00:00"), // same day once
      (1L, "2024-01-03 00:00:00"),                              // offset 2
      (2L, "2024-01-01 05:00:00"),                              // same cohort
      (3L, "2024-01-02 09:00:00"))                              // later cohort
      .toDF("user_id", "s")
      .withColumn("ts", to_timestamp($"s"))
    val out = WindowOps.retentionCohorts(df)
      .collect()
      .map(r => (r.getDate(0).toString, r.getInt(1), r.getLong(2)))
      .toSet
    assert(out == Set(
      ("2024-01-01", 0, 2L), // users 1,2 on their cohort day
      ("2024-01-01", 2, 1L), // user 1 back two days later
      ("2024-01-02", 0, 1L)))
  }
}
