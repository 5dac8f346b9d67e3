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
}
