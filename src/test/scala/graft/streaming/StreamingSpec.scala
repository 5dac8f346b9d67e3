package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkSpec
import graft.model.Tables
import graft.operators.{Relational, WindowOps}

class StreamingSpec extends SparkSpec {
  import spark.implicits._

  test("streaming hopping pivot ≡ batch hopping pivot on the same fixture") {
    val batch = WindowOps.hoppingPivot(
      Tables.events(spark, sf0001), eventTypes = Tables.EventTypes)
      .collect().toSet
    val streamed = Streaming.runToMemory(
      spark, Streaming.hoppingPivotStream(spark, sf0001))
      .collect().toSet
    assert(streamed == batch)
    assert(batch.nonEmpty)
  }

  test("flagship stream (pivot + stream-static left join) produces enriched rows") {
    val out = Streaming.runToMemory(spark, Streaming.flagshipStream(spark, sf0001))
    assert(out.count() > 0)
    assert(out.columns.contains("c_mktsegment"))
    // every user in the fixture matches a customer → no null enrichment
    assert(out.filter(col("c_name").isNull).count() == 0)
  }

  test("latestByKeyStream upserts to the newest row per key (TABLE semantics)") {
    val input = MemoryStream[(String, String, Long)](spark)
    val df = input.toDF().toDF("id", "v", "ts")
    val q = Streaming.latestByKeyStream(df, "id", "ts")
      .writeStream.format("memory").queryName("latest_tbl")
      .outputMode(OutputMode.Update()).start()
    input.addData(("a", "v1", 1L), ("b", "x1", 1L))
    q.processAllAvailable()
    input.addData(("a", "v2", 2L)) // upsert a
    q.processAllAvailable()
    input.addData(("a", "v0", 0L)) // stale update must NOT win
    q.processAllAvailable()
    val state = spark.table("latest_tbl")
      .groupBy("id").agg(max_by(col("v"), col("ts")).as("v"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    q.stop()
    assert(state == Map("a" -> "v2", "b" -> "x1"))
  }

  test("watermarked stream still matches batch when no data is late") {
    val streamed = Streaming.runToMemory(
      spark,
      WindowOps.hoppingPivot(
        Streaming.withLateness(Streaming.eventsStream(spark, sf0001)),
        eventTypes = Tables.EventTypes),
      OutputMode.Append())
    val batch = WindowOps.hoppingPivot(
      Tables.events(spark, sf0001), eventTypes = Tables.EventTypes)
    // Append mode only emits windows the watermark has passed; the final
    // windows may be withheld, so streamed ⊆ batch and covers most of it.
    val b = batch.collect().toSet
    val s = streamed.collect().toSet
    assert(s.subsetOf(b))
    assert(s.size >= b.size / 2, s"${s.size} of ${b.size}")
  }
}
