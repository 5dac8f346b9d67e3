package graft.operators

import graft.SparkSpec

class JoinsSpec extends SparkSpec {
  import spark.implicits._

  test("leftEnrich keeps unmatched facts with nulls (J1 semantics)") {
    val facts = Seq((1L, 10.0), (99L, 20.0)).toDF("user_id", "v")
    val dim = Seq((1L, "alice")).toDF("id", "name")
    val out = Joins.leftEnrich(facts, dim, "user_id", "id")
      .orderBy("user_id").collect()
    assert(out.length == 2)
    assert(out(0).getAs[String]("name") == "alice")
    assert(out(1).isNullAt(out(1).fieldIndex("name")))
  }

  test("leftEnrich preserves left cardinality under unique dim keys") {
    val facts = (1 to 100).map(i => (i.toLong, i * 1.0)).toDF("user_id", "v")
    val dim = (1 to 50).map(i => (i.toLong, s"u$i")).toDF("id", "name")
    assert(Joins.leftEnrich(facts, dim, "user_id", "id").count() == 100)
  }

  test("leftEnrich plans a broadcast hash join (no fact-side shuffle)") {
    val facts = Seq((1L, 10.0)).toDF("user_id", "v")
    val dim = Seq((1L, "alice")).toDF("id", "name")
    val plan = Joins.leftEnrich(facts, dim, "user_id", "id")
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"expected broadcast join in:\n$plan")
  }

  test("bucketed tables join with zero shuffle exchanges (co-located join)") {
    import graft.model.Tables
    spark.sql("DROP TABLE IF EXISTS b_events")
    spark.sql("DROP TABLE IF EXISTS b_orders")
    // a fresh in-memory catalog doesn't know about last run's managed
    // tables, but their warehouse dirs persist — remove them or
    // saveAsTable fails with LOCATION_ALREADY_EXISTS
    for (t <- Seq("b_events", "b_orders")) {
      val d = new java.io.File(s"/tmp/graft_warehouse/$t")
      if (d.exists()) {
        def rm(f: java.io.File): Unit = {
          if (f.isDirectory) f.listFiles().foreach(rm)
          f.delete()
        }
        rm(d)
      }
    }
    Tables.events(spark, sf0001)
      .write.mode("overwrite").bucketBy(4, "user_id").sortBy("user_id")
      .saveAsTable("b_events")
    Tables.orders(spark, sf0001)
      .selectExpr("o_custkey AS user_id", "o_totalprice")
      .write.mode("overwrite").bucketBy(4, "user_id").sortBy("user_id")
      .saveAsTable("b_orders")
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("b_events")
        .join(spark.table("b_orders"), "user_id")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join should not shuffle:\n${plan.take(2000)}")
      assert(joined.count() > 0)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
    }
  }

  test("asOfJoin: latest right row at-or-before each left ts, nulls before first") {
    val left = Seq(
      (1L, 1L, 5L),   // before any right row → null
      (2L, 1L, 10L),  // exactly at right ts=10 → v10 (<= semantics)
      (3L, 1L, 15L),  // between 10 and 20 → v10
      (4L, 1L, 25L),  // after 20 → v20
      (5L, 2L, 100L)  // key with no right rows → null
    ).toDF("id", "k", "t")
    val right = Seq((1L, 10L, "v10"), (1L, 20L, "v20")).toDF("rk", "rt", "v")
    val out = Joins.asOfJoin(left, right, "k", "rk", "t", "rt", Seq("v"))
      .orderBy("id").collect().map(r => (r.getLong(0), r.getAs[String]("v")))
    assert(out.toSeq == Seq(
      (1L, null), (2L, "v10"), (3L, "v10"), (4L, "v20"), (5L, null)))
  }

  test("asOfJoin: NULL payload in the matching right row stays NULL (no mixed rows)") {
    // right t=5 has v1="a5", t=10 has v1=NULL: a left row at t=20 matches
    // t=10, so v1 must be NULL — per-column filling would leak "a5" in
    val left = Seq((1L, 1L, 20L)).toDF("id", "k", "t")
    val right = Seq(
      (1L, 5L, Option("a5"), Option("y5")),
      (1L, 10L, Option.empty[String], Option("x10")))
      .toDF("rk", "rt", "v1", "v2")
    val out = Joins.asOfJoin(left, right, "k", "rk", "t", "rt", Seq("v1", "v2"))
      .collect()
    assert(out.length == 1)
    assert(out(0).getAs[String]("v1") == null, "v1 must come from the t=10 row")
    assert(out(0).getAs[String]("v2") == "x10")
  }

  test("asOfJoinBroadcast: same semantics as asOfJoin on the boundary fixture") {
    val left = Seq(
      (1L, 1L, 5L), (2L, 1L, 10L), (3L, 1L, 15L), (4L, 1L, 25L), (5L, 2L, 100L)
    ).toDF("id", "k", "t")
    val right = Seq((1L, 10L, "v10"), (1L, 20L, "v20")).toDF("rk", "rt", "v")
    val bc = Joins.asOfJoinBroadcast(left, right, "k", "rk", "t", "rt", Seq("v"))
      .orderBy("id").collect().map(r => (r.getLong(0), r.getAs[String]("v")))
    assert(bc.toSeq == Seq(
      (1L, null), (2L, "v10"), (3L, "v10"), (4L, "v20"), (5L, null)))
    // NULL payload in the matching version stays NULL (atomic struct)
    val r2 = Seq(
      (1L, 5L, Option("a5"), Option("y5")),
      (1L, 10L, Option.empty[String], Option("x10")))
      .toDF("rk", "rt", "v1", "v2")
    val l2 = Seq((1L, 1L, 20L)).toDF("id", "k", "t")
    val out2 = Joins.asOfJoinBroadcast(l2, r2, "k", "rk", "t", "rt", Seq("v1", "v2"))
      .collect().head
    assert(out2.getAs[String]("v1") == null && out2.getAs[String]("v2") == "x10")
  }

  test("asOfJoinBroadcast: duplicate (key, ts) versions resolve to the max payload tuple") {
    // the strengthened contract the fused-dedup q_asof_broadcast relies
    // on: no latestByKey pre-pass needed — sort-order-last among tied
    // ts = highest version id's payload, deterministically
    val left = Seq((1L, 1L, 10L), (2L, 1L, 25L)).toDF("id", "k", "t")
    val right = Seq(
      (1L, 10L, 7L, "ver7"), (1L, 10L, 9L, "ver9"), (1L, 10L, 3L, "ver3"),
      (1L, 20L, 11L, "ver11"))
      .toDF("rk", "rt", "version", "v")
    val out = Joins.asOfJoinBroadcast(
      left, right, "k", "rk", "t", "rt", Seq("version", "v"))
      .orderBy("id").collect()
      .map(r => (r.getLong(0), r.getAs[Long]("version"), r.getAs[String]("v")))
    assert(out.toSeq == Seq((1L, 9L, "ver9"), (2L, 11L, "ver11")))
  }

  test("asOfJoinBroadcast ≡ asOfJoin on a random frame; fact side never exchanges") {
    import org.apache.spark.sql.functions.col
    val rnd = new scala.util.Random(5)
    val left = (1 to 300).map(i =>
      (i.toLong, (rnd.nextInt(8) + 1).toLong, rnd.nextInt(1000).toLong))
      .toDF("id", "k", "t")
    val right = (1 to 40).map(i =>
      ((i % 10 + 1).toLong, (i * 37 % 1000).toLong, s"p$i"))
      .groupBy(r => (r._1, r._2)).map(_._2.head).toSeq // (key, ts) unique
      .toDF("rk", "rt", "v")
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), Option(r.getAs[String]("v")))).toSet
    val mergeV = canon(Joins.asOfJoin(left, right, "k", "rk", "t", "rt", Seq("v")))
    val bcast = Joins.asOfJoinBroadcast(left, right, "k", "rk", "t", "rt", Seq("v"))
    assert(canon(bcast) == mergeV)
    // AQE's toString repeats the pre-adaptive plan under "Initial Plan"
    // — count exchanges in the executed FINAL section only
    val plan = bcast.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    // exactly one hash exchange: the DIM compaction; the fact side rides
    // a broadcast join with no exchange and no sort
    assert("Exchange hashpartitioning".r.findAllIn(plan).length <= 1, plan.take(1500))
    assert(plan.contains("BroadcastHashJoin"), plan.take(1500))
  }

  test("asOfJoinAuto: history size picks the plan; both picks agree") {
    val left = Seq(
      (1L, 1L, 5L), (2L, 1L, 10L), (3L, 1L, 15L), (4L, 1L, 25L), (5L, 2L, 100L)
    ).toDF("id", "k", "t")
    val right = Seq((1L, 10L, "v10"), (1L, 20L, "v20")).toDF("rk", "rt", "v")
    assert(Joins.asOfHistorySize(right, "rt") == 2L)
    def planOf(df: org.apache.spark.sql.DataFrame) =
      df.queryExecution.executedPlan.toString.split("== Initial Plan ==").head
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), Option(r.getAs[String]("v")))).toSet
    // history (2) ≤ threshold → broadcast shape; > threshold → the
    // shuffle merge-join shape (its carry-forward Window is the marker)
    val bc = Joins.asOfJoinAuto(left, right, "k", "rk", "t", "rt", Seq("v"),
      historyThreshold = 2L)
    val sh = Joins.asOfJoinAuto(left, right, "k", "rk", "t", "rt", Seq("v"),
      historyThreshold = 1L)
    assert(planOf(bc).contains("BroadcastHashJoin"), planOf(bc).take(1200))
    assert(!planOf(bc).contains("Window"), planOf(bc).take(1200))
    assert(planOf(sh).contains("Window"), planOf(sh).take(1200))
    assert(!planOf(sh).contains("BroadcastHashJoin"), planOf(sh).take(1200))
    val expect = Set((1L, None), (2L, Some("v10")), (3L, Some("v10")),
      (4L, Some("v20")), (5L, None))
    assert(canon(bc) == expect && canon(sh) == expect)
  }

  test("asOfJoinAuto: non-integral ts always takes the shuffle path") {
    val left = Seq((1L, 1L, 10.5), (2L, 1L, 30.0)).toDF("id", "k", "t")
    val right = Seq((1L, 10.0, "v10"), (1L, 20.0, "v20")).toDF("rk", "rt", "v")
    val out = Joins.asOfJoinAuto(left, right, "k", "rk", "t", "rt", Seq("v"),
      historyThreshold = 1000000L) // would pick broadcast if types allowed
    assert(planOf2(out).contains("Window") &&
      !planOf2(out).contains("BroadcastHashJoin"))
    val got = out.orderBy("id").collect().map(_.getAs[String]("v")).toSeq
    assert(got == Seq("v10", "v20"))
  }

  private def planOf2(df: org.apache.spark.sql.DataFrame) =
    df.queryExecution.executedPlan.toString.split("== Initial Plan ==").head

  test("fuzzyBlockedPairs: within-block pairs only, each once, exact distance") {
    val df = Seq(
      (1L, "A", "red widget"), (2L, "A", "red widgit"), // distance 1
      (3L, "A", "blue bolt"),                           // far from both
      (4L, "B", "red widget"))                          // same name, other block
      .toDF("id", "blk", "name")
    val out = Joins.fuzzyBlockedPairs(df, "blk", "id", "name", maxDistance = 2)
      .collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getAs[Long]("left_id") == 1L && r.getAs[Long]("right_id") == 2L)
    assert(r.getAs[Int]("distance") == 1)
  }

  test("fuzzyBlockedPairs never compares across blocks (no cartesian)") {
    val df = (1 to 60).map(i => (i.toLong, s"b${i % 6}", s"name $i"))
      .toDF("id", "blk", "name")
    // maxDistance large enough to keep every within-block pair:
    // 6 blocks × C(10,2) = 270 — the all-pairs C(60,2)=1770 never forms
    val out = Joins.fuzzyBlockedPairs(df, "blk", "id", "name", maxDistance = 100)
    assert(out.count() == 270)
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Cartesian"), plan)
  }

  test("fuzzyBlockedPairs: bucketed band equals brute-force within-block pairs") {
    // names straddle length-bucket boundaries (d=2 → buckets of width 2)
    // so the ±1 neighbor probe is load-bearing, not just the same-bucket
    // path: e.g. len 9 (bucket 4) vs len 10 (bucket 5)
    val df = (1 to 40).map { i =>
      (i.toLong, s"b${i % 3}", "x" * (5 + i % 7) + (i % 5).toString)
    }.toDF("id", "blk", "name")
    val got = Joins.fuzzyBlockedPairs(df, "blk", "id", "name", maxDistance = 2)
      .select("left_id", "right_id", "distance").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    // brute force: all within-block pairs scored directly
    import org.apache.spark.sql.functions.{col, levenshtein}
    val l = df.select(col("blk"), col("id").as("a"), col("name").as("na"))
    val r = df.select(col("blk"), col("id").as("b"), col("name").as("nb"))
    val want = l.join(r, Seq("blk")).filter(col("a") < col("b"))
      .withColumn("d", levenshtein(col("na"), col("nb")))
      .filter(col("d") <= 2)
      .select("a", "b", "d").collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getInt(2))).toSet
    assert(got == want, s"bucketed ${got.size} vs brute ${want.size}")
    assert(got.nonEmpty, "fixture must produce pairs for the test to bite")
  }

  test("fuzzyBlockedPairs: duplicate names expand to distance-0 id pairs, once each") {
    // the domain-compare design pairs NAMES then re-attaches ids: the
    // (x, x) name pair must expand to each unordered id pair exactly
    // once, and a (x, y) pair to the full id cross product, id-ordered
    val df = Seq(
      (1L, "A", "red bolt"), (4L, "A", "red bolt"), (2L, "A", "red bolt"),
      (3L, "A", "red bolz"))
      .toDF("id", "blk", "name")
    val out = Joins.fuzzyBlockedPairs(df, "blk", "id", "name", maxDistance = 2)
      .collect()
      .map(r => (r.getAs[Long]("left_id"), r.getAs[Long]("right_id"),
        r.getAs[Int]("distance"))).toSet
    assert(out == Set(
      (1L, 2L, 0), (1L, 4L, 0), (2L, 4L, 0),       // the triple of dups
      (1L, 3L, 1), (2L, 3L, 1), (3L, 4L, 1)),      // each dup vs the variant
      s"got $out")
    // names travel with their ids after the least/greatest reorder
    val named = Joins.fuzzyBlockedPairs(df, "blk", "id", "name", 2)
      .filter($"left_id" === 3L || $"right_id" === 3L).collect()
    named.foreach { r =>
      val (lid, lname) = (r.getAs[Long]("left_id"), r.getAs[String]("left_name"))
      assert((lid == 3L) == (lname == "red bolz"), s"row $r")
    }
  }

  test("fuzzyBlockedPairs: an id under two near names never emits a self-pair") {
    // one id occurring with TWO different names within maxDistance: the
    // (na, nb) name pair is a genuine match, but its id expansion
    // contains (7, 7) — the pair contract (left_id < right_id) must
    // exclude it while keeping the cross-id pairs
    val df = Seq(
      (7L, "A", "red bolt"), (7L, "A", "red bolz"), (8L, "A", "red bol"))
      .toDF("id", "blk", "name")
    val out = Joins.fuzzyBlockedPairs(df, "blk", "id", "name", maxDistance = 2)
      .collect()
    assert(out.forall(r =>
      r.getAs[Long]("left_id") < r.getAs[Long]("right_id")), out.mkString(";"))
    // both 7-vs-8 name pairings survive (distinct name columns)
    assert(out.count(r => r.getAs[Long]("left_id") == 7L &&
      r.getAs[Long]("right_id") == 8L) == 2, out.mkString(";"))
  }

  test("fuzzyBlockedPairs: maxBlock caps a hot cell without touching cold ones") {
    // hot cell: one block, 50 identical-length near-identical names —
    // the fixed-cardinality-block quadratic blowup in miniature.
    // Cold cell: a pair in another block that must survive the cap.
    val hot = (1 to 50).map(i => (i.toLong, "HOT", f"widget$i%02d"))
    val cold = Seq((100L, "COLD", "red bolt"), (101L, "COLD", "red bolz"))
    val df = (hot ++ cold).toDF("id", "blk", "name")
    val uncapped = Joins.fuzzyBlockedPairs(df, "blk", "id", "name", 2)
    assert(uncapped.filter($"block" === "HOT").count() > 100,
      "hot cell must be quadratic-many uncapped for the test to bite")
    val capped = Joins.fuzzyBlockedPairs(df, "blk", "id", "name", 2, maxBlock = 10)
    assert(capped.filter($"block" === "HOT").count() == 0,
      "rows in a hot (block x length-bucket) cell are excluded")
    val coldPairs = capped.filter($"block" === "COLD").collect()
    assert(coldPairs.length == 1 &&
      coldPairs.head.getAs[Long]("left_id") == 100L)
    // and a cap above every cell's membership changes nothing
    val loose = Joins.fuzzyBlockedPairs(df, "blk", "id", "name", 2, maxBlock = 10000)
      .select("left_id", "right_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val all = uncapped
      .select("left_id", "right_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(loose == all)
  }

  test("rangeLookupJoin: values land in the covering interval, hash join not nested-loop") {
    val facts = Seq((1L, 5.0), (2L, 49.9), (3L, 50.0), (4L, 175.0)).toDF("id", "v")
    val dim = Seq((0.0, 50.0, "low"), (50.0, 200.0, "high")).toDF("lo", "hi", "tier")
    val out = Joins.rangeLookupJoin(facts, "v", dim, "lo", "hi", bucketWidth = 50)
    val got = out.collect().map(r => (r.getAs[Long]("id"), r.getAs[String]("tier"))).toMap
    assert(got == Map(1L -> "low", 2L -> "low", 3L -> "high", 4L -> "high"))
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("NestedLoop"), plan)
  }

  test("rangeLookupJoin: overlapping intervals match a fact to each") {
    val facts = Seq((1L, 75.0)).toDF("id", "v")
    val dim = Seq((0.0, 100.0, "a"), (50.0, 150.0, "b")).toDF("lo", "hi", "tier")
    val tiers = Joins.rangeLookupJoin(facts, "v", dim, "lo", "hi", 50)
      .collect().map(_.getAs[String]("tier")).toSet
    assert(tiers == Set("a", "b"))
  }

  test("rangeLookupJoinAuto: width = dim's median interval length; result " +
    "width-invariant across a 256x sweep") {
    val facts = Seq((1L, 5.0), (2L, 49.9), (3L, 50.0), (4L, 175.0), (5L, 320.0))
      .toDF("id", "v")
    val dim = Seq((0.0, 50.0, "low"), (50.0, 100.0, "mid"),
      (100.0, 200.0, "high"), (200.0, 500.0, "peak")).toDF("lo", "hi", "tier")
    // decision pinned: median of lengths {50, 50, 100, 300} = 75
    graft.Sessions.clearEstimates()
    val w = Joins.rangeBucketWidth(dim, "lo", "hi")
    assert(w == 75.0, s"width $w")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getAs[Long]("id"), r.getAs[String]("tier"))).toSet
    val auto = rows(Joins.rangeLookupJoinAuto(facts, "v", dim, "lo", "hi"))
    // the residual filter makes the result exact at ANY width —
    // mis-estimation can only cost time, never rows
    for (width <- Seq(0.5, 8.0, 75.0, 128.0)) {
      assert(rows(Joins.rangeLookupJoin(facts, "v", dim, "lo", "hi", width)) == auto,
        s"width $width diverged")
    }
    assert(auto == Set((1L, "low"), (2L, "low"), (3L, "mid"), (4L, "high"),
      (5L, "peak")))
    // degenerate dim (all point intervals) still yields a positive width
    val pts = Seq((1.0, 1.0, "p")).toDF("lo", "hi", "tier")
    graft.Sessions.clearEstimates()
    assert(Joins.rangeBucketWidth(pts, "lo", "hi") > 0.0)
    intercept[IllegalArgumentException] {
      Joins.rangeLookupJoin(facts, "v", dim, "lo", "hi", 0.0)
    }
  }

  test("coerceKey normalizes string/int key wrinkle before join") {
    val facts = Seq(("1", 10.0), ("2", 20.0)).toDF("user_id", "v")
    val dim = Seq((1L, "alice"), (2L, "bob")).toDF("id", "name")
    val coerced = Joins.coerceKey(facts, "user_id", "long")
    val out = Joins.innerEnrich(coerced, dim, "user_id", "id")
    assert(out.count() == 2)
  }
}
