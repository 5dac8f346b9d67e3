package graft.llm

import graft.SparkSpec
import graft.model.Tables

class MultimodalSpec extends SparkSpec {

  test("asMedia produces the opaque-payload + typed-metadata shape") {
    val media = Multimodal.asMedia(Tables.documents(spark, sf0001))
    val schema = media.schema
    assert(schema("payload").dataType.typeName == "binary")
    assert(schema("meta").dataType.typeName == "struct")
    val r = media.head()
    val meta = r.getStruct(r.fieldIndex("meta"))
    assert(meta.getAs[Int]("n_bytes") > 0)
  }

  test("decode is deterministic across repartitioning") {
    val media = Multimodal.asMedia(Tables.documents(spark, sf0001))
    val d1 = Multimodal.decode(media).orderBy("media_id").collect().toSeq
    val d2 = Multimodal.decode(media.repartition(5)).orderBy("media_id").collect().toSeq
    assert(d1 == d2)
  }

  test("decoded dimensions are within the stub's declared ranges") {
    val decoded = Multimodal.decode(
      Multimodal.asMedia(Tables.documents(spark, sf0001)))
    import org.apache.spark.sql.functions._
    val bad = decoded.filter(
      col("decoded.width") < 32 || col("decoded.width") >= 1312 ||
        col("decoded.height") < 32 || col("decoded.height") >= 752 ||
        size(col("decoded.features")) =!= 8).count()
    assert(bad == 0)
  }

  test("partition-batched decode matches payload sizes") {
    val media = Multimodal.asMedia(Tables.documents(spark, sf0001))
    val out = Multimodal.decodePartitioned(media)
    import org.apache.spark.sql.functions._
    val joined = out.as("o").join(media.as("m"), "media_id")
      .filter(col("o.n_bytes") =!= col("m.meta.n_bytes"))
    assert(joined.count() == 0)
  }

  test("frame sampling fans out per sampled frame with payload pruned pre-explode") {
    val media = Multimodal.asMedia(Tables.documents(spark, sf0001))
    val frames = Multimodal.sampleFrames(media, nFrames = 32, everyNth = 8)
    import org.apache.spark.sql.functions._
    // 4 sampled frames per media row (0, 8, 16, 24)
    val perDoc = frames.groupBy("media_id").count()
      .filter(col("count") =!= 4).count()
    assert(perDoc == 0)
    assert(frames.count() == media.count() * 4)
    // features are deterministic and in [0, 1)
    assert(frames.filter(col("frame_feature") < 0 || col("frame_feature") >= 1).count() == 0)
    // the payload column is hashed then dropped BEFORE the explode
    val plan = frames.queryExecution.optimizedPlan.toString
    assert(!plan.split("Generate")(1).contains("payload"),
      s"payload must not survive past the explode:\n$plan")
  }

  test("decode contract: every decode-dependent consumer is null-safe " +
    "end-to-end (r16 VERDICT #7 — the stub's surface cannot widen silently)") {
    // MediaSchema declares payload AND meta nullable (an unfetched
    // object-store reference is a legal record); fakeDecode is the ONE
    // honest stub in the engine (no codecs in this sandbox), so the
    // contract a real codec must slot into is pinned here: every
    // consumer (decode → resizeFeatures, sampleFrames,
    // decodePartitioned — the q_multimodal_decode/_frames/_partitioned
    // paths) must (1) not throw on null payload/meta, (2) not silently
    // DROP the row (a lost media_id is data loss, not degradation),
    // (3) produce a deterministic documented fallback, stable across
    // repartitioning. A swapped-in real codec that NPEs or filters
    // nulls fails THIS spec before it corrupts a corpus.
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.Row
    val rows = new java.util.ArrayList[Row]()
    rows.add(Row(1L, "image", "real bytes".getBytes("UTF-8"), Row(10, "application/x-fake")))
    rows.add(Row(2L, "image", null, Row(0, null)))      // payload lost
    rows.add(Row(3L, "image", null, null))              // payload AND meta lost
    rows.add(Row(4L, "video", "clip".getBytes("UTF-8"), null)) // meta lost
    val media = spark.createDataFrame(rows, Multimodal.MediaSchema)

    // decode + resize: all 4 ids survive, null payload decodes to the
    // deterministic empty-input shape (xxhash64 of no bytes), never null
    val decoded = Multimodal.decode(media)
    assert(decoded.count() == 4 && decoded.select("media_id").distinct().count() == 4)
    assert(decoded.filter(col("decoded").isNull).count() == 0,
      "decode must yield the fallback struct for null payload, not null")
    val resized = Multimodal.resizeFeatures(decoded, 640, 360)
    assert(resized.count() == 4)
    assert(resized.filter(size(col("features")) =!= 8).count() == 0,
      "feature width must hold for null-payload rows")

    // frame sampling: the fan-out must cover null-payload AND null-meta
    // rows (n_bytes degrades to null, frames still emit)
    val frames = Multimodal.sampleFrames(media, nFrames = 16, everyNth = 8)
    assert(frames.select("media_id").distinct().count() == 4)
    assert(frames.count() == 4 * 2)
    assert(frames.filter(col("frame_feature").isNull).count() == 0)

    // partition-batched decode: the documented null branch (0 bytes,
    // checksum 0) — and ids preserved
    val part = Multimodal.decodePartitioned(media)
      .collect().map(r => r.getLong(0) -> (r.getInt(1), r.getLong(2))).toMap
    assert(part.keySet == Set(1L, 2L, 3L, 4L))
    assert(part(2L) == ((0, 0L)) && part(3L) == ((0, 0L)),
      s"null payload must decode to the empty shape, got $part")

    // determinism of the fallback across repartitioning
    val again = Multimodal.decode(media.repartition(7))
      .orderBy("media_id").collect().toSeq
    assert(again == decoded.orderBy("media_id").collect().toSeq)
  }
}
