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
}
