package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

class RelationalSpec extends SparkSpec {
  import spark.implicits._

  test("latestByKey keeps exactly the newest row per key, deterministic on ties") {
    val df = Seq(
      (1L, "a", 10L), (1L, "b", 20L), (1L, "c", 20L), // tie on ts=20 → max payload wins via orderBy tiebreak
      (2L, "x", 5L)
    ).toDF("id", "v", "ts")
    val latest = Relational.latestByKey(df, Seq("id"), Seq("ts", "v"))
      .orderBy("id").collect()
    assert(latest.map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq ==
      Seq((1L, "c", 20L), (2L, "x", 5L)))
  }

  test("latestByKey is idempotent") {
    val df = Seq((1L, "a", 10L), (1L, "b", 20L)).toDF("id", "v", "ts")
    val once = Relational.latestByKey(df, Seq("id"), Seq("ts"))
    val twice = Relational.latestByKey(once, Seq("id"), Seq("ts"))
    assert(once.collect().toSet == twice.collect().toSet)
  }

  test("cdcUnwrap drops deletes and unwraps after.*") {
    val df = Seq((1L, "alice"), (2L, "bob")).toDF("id", "name")
    val env = Relational.toCdcEnvelope(df,
      when($"id" === 2L, lit("d")).otherwise(lit("c")))
    val out = Relational.cdcUnwrap(env)
    assert(out.columns.toSeq == Seq("id", "name"))
    assert(out.collect().map(_.getLong(0)).toSeq == Seq(1L))
  }

  test("cdcUnwrapJson decodes the serialized Debezium envelope from the wire") {
    val ts = java.sql.Timestamp.valueOf("2024-01-02 03:04:05")
    val df = Seq(
      (1L, Option("alice"), Option(ts)),
      (2L, Option("bob"), Option(ts)),
      (3L, Option.empty[String], Option.empty[java.sql.Timestamp])) // nulls survive decode
      .toDF("id", "name", "seen")
    val wire = Relational.toCdcJson(df,
      when($"id" === 2L, lit("d")).otherwise(lit("c")), lit(1234567890L))
    assert(wire.columns.toSeq == Seq("value")) // one JSON string per record
    val afterSchema = org.apache.spark.sql.types.StructType(
      df.schema.fields.map(_.copy(nullable = true)))
    val out = Relational.cdcUnwrapJson(wire, afterSchema)
      .orderBy("id").collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(1L, 3L)) // delete dropped
    assert(out(0).getString(1) == "alice" && out(0).getTimestamp(2) == ts)
    assert(out(1).isNullAt(1) && out(1).isNullAt(2))
  }

  test("indicator is 1 iff value matches") {
    val df = Seq("click", "view").toDF("e")
      .select(Relational.indicator($"e", "click").as("i"))
    assert(df.collect().map(_.getInt(0)).toSeq == Seq(1, 0))
  }

  test("timestampToString formats HH:mm:ss in UTC") {
    val df = Seq(1704067798L).toDF("s")
      .select(Relational.timestampToString(timestamp_seconds($"s")).as("hms"))
    assert(df.head().getString(0) == "00:09:58")
  }

  test("jsonGet extracts scalar from props JSON") {
    val df = Seq("""{"k": 87}""").toDF("props")
      .select(Relational.jsonGet($"props", "$.k").as("k"))
    assert(df.head().getString(0) == "87")
  }

  test("rekey preserves data and sets hash partitioning") {
    val df = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "v")
    val out = Relational.rekey(df, "id", Some(2))
    assert(out.rdd.getNumPartitions == 2)
    assert(out.collect().toSet == df.collect().toSet)
  }

  test("unpivot melts wide columns to (key, value) rows, nulls preserved") {
    val wide = Seq((1L, 10L, 20L), (2L, 30L, 40L)).toDF("id", "click", "view")
    val long = Relational.unpivot(wide, Seq("id"), Seq("click", "view"), "k", "v")
    assert(long.columns.toSeq == Seq("id", "k", "v"))
    val got = long.collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(got == Set((1L, "click", 10L), (1L, "view", 20L),
      (2L, "click", 30L), (2L, "view", 40L)))
    // pivot→unpivot round trip drops nothing: 2 rows × 2 cols = 4
    assert(long.count() == 4)
  }
  test("modePerGroup: highest count wins, ties go to the smallest value") {
    import spark.implicits._
    val df = Seq(("g1", "b"), ("g1", "b"), ("g1", "a"),
      ("g2", "z"), ("g2", "y"), ("g2", "y"), ("g2", "z"))
      .toDF("k", "v")
    val out = Relational.modePerGroup(df, Seq("k"), "v").orderBy("k").collect()
    assert(out(0).getString(1) == "b" && out(0).getLong(2) == 2L)
    // g2 ties y/z at 2 — the smaller value wins deterministically
    assert(out(1).getString(1) == "y" && out(1).getLong(2) == 2L)
  }

  test("profileNumeric counts nulls and exact distincts per column") {
    import spark.implicits._
    val df = Seq(
      (Some(1), Some(1.0)), (Some(1), None), (Some(2), Some(3.5)), (None, Some(3.5)))
      .toDF("a", "b")
    val out = Relational.profileNumeric(df, Seq("a", "b"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.get(4), r.get(5))).toMap
    assert(out("a") == ((4L, 1L, 2L, 1.0, 2.0)))
    assert(out("b") == ((4L, 1L, 2L, 1.0, 3.5)))
  }

  test("tableDiff emits c/u/d with after-image for c/u, before-image " +
    "for d, nothing for unchanged") {
    val before = Seq(
      (1L, "PL", 10.0), // unchanged
      (2L, "DE", 20.0), // updated value
      (3L, "FR", 30.0)  // deleted
    ).toDF("k", "country", "bal")
    val after = Seq(
      (1L, "PL", 10.0),
      (2L, "DE", 25.0),
      (4L, "ES", 40.0)  // inserted
    ).toDF("k", "country", "bal")
    val out = Relational.tableDiff(before, after, Seq("k"))
      .orderBy("k").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2), r.getDouble(3)))
    assert(out.toSeq == Seq(
      ("u", 2L, "DE", 25.0),  // after image
      ("d", 3L, "FR", 30.0),  // before image (the tombstone's last row)
      ("c", 4L, "ES", 40.0)))
  }

  test("tableDiff change detection is null-safe both directions; " +
    "composes with cdcUnwrap semantics (d filtered, c/u applied)") {
    val before = Seq(
      (1L, Option("x")), (2L, Option.empty[String]), (3L, Option("z"))
    ).toDF("k", "v")
    val after = Seq(
      (1L, Option.empty[String]), (2L, Option("y")), (3L, Option("z"))
    ).toDF("k", "v")
    val out = Relational.tableDiff(before, after, Seq("k"))
      .orderBy("k").collect().map(r => (r.getString(0), r.getLong(1), r.get(2)))
    assert(out.toSeq == Seq(("u", 1L, null), ("u", 2L, "y")),
      "null→value and value→null must both register as updates; " +
        "null<=>null must not")
    // applying the changelog to `before` reproduces `after` exactly:
    // upserts (c/u) replace, tombstones (d) retract — the downstream
    // document-store contract the CDC surface feeds
    val diff = Relational.tableDiff(before, after, Seq("k"))
    val applied = before.join(diff, Seq("k"), "left_anti")
      .unionByName(diff.filter(col("op") =!= "d").drop("op"))
    assert(applied.exceptAll(after).count() == 0 &&
      after.exceptAll(applied).count() == 0)
  }

  test("tableDiff survives input columns named like its presence " +
    "markers (__a/__b) — markers are derived collision-free") {
    // before the fix, withColumn("__b", …) REPLACED the data column:
    // op classification and the output projection silently corrupted
    val before = Seq((1L, "x", "keepB"), (2L, "y", "delB"))
      .toDF("k", "__a", "__b")
    val after = Seq((1L, "x2", "keepB"), (3L, "z", "newB"))
      .toDF("k", "__a", "__b")
    val out = Relational.tableDiff(before, after, Seq("k"))
      .orderBy("k").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2), r.getString(3)))
    assert(out.toSeq == Seq(
      ("u", 1L, "x2", "keepB"),
      ("d", 2L, "y", "delB"),
      ("c", 3L, "z", "newB")))
  }

  test("tableDiff multi-column key; identical tables diff to empty") {
    val t = Seq((1L, "a", 1.0), (1L, "b", 2.0)).toDF("k1", "k2", "v")
    assert(Relational.tableDiff(t, t, Seq("k1", "k2")).count() == 0)
    val moved = Seq((1L, "a", 1.0), (2L, "b", 2.0)).toDF("k1", "k2", "v")
    val ops = Relational.tableDiff(t, moved, Seq("k1", "k2"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2))).toSet
    // a key-move is a delete of the old key and an insert of the new
    assert(ops == Set(("d", 1L, "b"), ("c", 2L, "b")))
  }

  test("riCheck counts planted orphans, zero on intact edges") {
    import spark.implicits._
    val fact = Seq((1L, 10L), (2L, 10L), (3L, 99L)).toDF("id", "fk")
    val dim = Seq((10L, "x"), (11L, "y")).toDF("pk", "v")
    val out = Relational.riCheck(Seq(
      ("fact_dim", fact, "fk", dim, "pk"),
      ("dim_dim", dim, "pk", dim, "pk")))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out == Map("fact_dim" -> 1L, "dim_dim" -> 0L))
  }

}
