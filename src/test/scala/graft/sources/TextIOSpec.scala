package graft.sources

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.model.Tables

/** Format completeness (SURVEY §2.1): the engine round-trips its
  * relations through the line-oriented interchange formats a pipeline
  * actually meets at its edges — JSONL and CSV — with explicit schemas
  * on the read side (schema inference is a scan of its own at 100 TB;
  * the engine convention is always-explicit schemas).
  */
class TextIOSpec extends SparkSpec {

  private def tmp(prefix: String) =
    java.nio.file.Files.createTempDirectory(prefix).toString + "/data"

  test("JSONL roundtrip preserves the events relation exactly") {
    val ev = Tables.events(spark, sf0001)
    val path = tmp("jsonl")
    // micros-precision timestampFormat: the default JSON form truncates
    // to millis and 999/1000 fixture events carry sub-ms event times
    val fmt = "yyyy-MM-dd HH:mm:ss.SSSSSS"
    ev.write.option("timestampFormat", fmt).json(path)
    val back = spark.read.schema(ev.schema).option("timestampFormat", fmt).json(path)
    assert(back.count() == ev.count())
    assert(back.exceptAll(ev).count() == 0 && ev.exceptAll(back).count() == 0)
  }

  test("CSV roundtrip preserves the orders relation exactly (header + explicit schema)") {
    val o = Tables.orders(spark, sf0001)
    val path = tmp("csv")
    // timestampFormat with micros so o_orderdate survives text form
    o.write.option("header", "true")
      .option("timestampFormat", "yyyy-MM-dd HH:mm:ss.SSSSSS").csv(path)
    val back = spark.read.schema(o.schema).option("header", "true")
      .option("timestampFormat", "yyyy-MM-dd HH:mm:ss.SSSSSS").csv(path)
    assert(back.count() == o.count())
    assert(back.exceptAll(o).count() == 0 && o.exceptAll(back).count() == 0)
  }

  test("partitioned parquet export lays out (lang) directories a catalog can prune") {
    val docs = Tables.documents(spark, sf0001)
    val path = tmp("part")
    docs.write.partitionBy("lang").parquet(path)
    val langs = new java.io.File(path).listFiles()
      .filter(_.isDirectory).map(_.getName).filter(_.startsWith("lang=")).sorted
    assert(langs.length >= 3, s"expected lang partitions, got ${langs.toSeq}")
    // a lang-filtered read touches only its directory (partition pruning)
    val one = spark.read.parquet(path).filter(col("lang") === "en")
    val scan = one.queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters") && one.count() > 0)
    assert(one.count() ==
      docs.filter(col("lang") === "en").count())
  }
}
