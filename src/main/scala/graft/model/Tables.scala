package graft.model

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Fixture catalog: loaders for the driver-generated parquet tables
  * (`/root/testdata/sf*`, see TESTDATA.md / FIXTURES.md §B).
  *
  * Design note (100 TB): every loader is a plain parquet scan so Catalyst
  * keeps predicate pushdown / column pruning / partition pruning. No
  * eager caching here — callers decide what to cache or broadcast.
  */
object Tables {
  private def p(dir: String, name: String): String = s"$dir/$name.parquet"

  /** events.parquet carries TIMESTAMP(NANOS) which Spark 4 refuses to
    * read natively — read `ts` as raw INT64 nanos via an explicit schema
    * (works regardless of session config) and convert to TimestampType
    * micros, truncating exactly like DuckDB's ns→µs conversion so the
    * oracle sees identical instants.
    */
  private val eventsRawSchema = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", LongType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  def events(spark: SparkSession, dir: String): DataFrame =
    spark.read.schema(eventsRawSchema).parquet(p(dir, "events"))
      .withColumn("ts", timestamp_micros(expr("ts DIV 1000")))

  def customer(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(p(dir, "customer"))

  def orders(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(p(dir, "orders"))

  def lineitem(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(p(dir, "lineitem"))

  def part(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(p(dir, "part"))

  def supplier(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(p(dir, "supplier"))

  def nation(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(p(dir, "nation"))

  def region(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(p(dir, "region"))

  def documents(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(p(dir, "documents"))

  def embeddings(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(p(dir, "embeddings"))

  /** events with an epoch-seconds column for range-window ops. The
    * session runs in UTC everywhere (build.sbt / Verify), so the cast to
    * long truncates to whole seconds exactly like DuckDB's
    * floor(epoch(ts)).
    */
  def eventsWithEpoch(spark: SparkSession, dir: String): DataFrame =
    events(spark, dir).withColumn("ts_sec", col("ts").cast("long"))

  /** The five event_type values in the fixture clickstream
    * (FIXTURES.md §B). The reference has four page states
    * (/root/reference/traffic-generator/generator.py:38); the pivot
    * operator below is value-set-agnostic, this is the fixture binding.
    */
  val EventTypes: Seq[String] = Seq("click", "view", "purchase", "signup", "error")
}
