package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.model.Tables

/** TEMPORARY stage-by-stage decomposition of percentilesGlobal. */
object ProfileHist2 {

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[p2] $label%-36s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
      r
    }

    for (rnd <- 1 to 2) {
      println(s"== round $rnd ==")
      val df = Tables.orders(spark, sfDir)
      val valueCol = "o_totalprice"
      val buckets = 1024
      val bins = 20
      val psD = (1 until bins).map(_.toDouble / bins)

      val rows = df.select(col(valueCol).cast("double").as("_v"))
        .filter(col("_v").isNotNull)
      val ext = t("ext head")(rows.agg(count(lit(1)).as("_n"),
        min(col("_v")).as("_mn"), max(col("_v")).as("_mx")).head())
      val n = ext.getLong(0); val mn = ext.getDouble(1); val mx = ext.getDouble(2)
      val pos = psD.map(p => p * (n - 1).toDouble)
      val rankPairs = pos.map(x => (math.floor(x).toLong + 1L, math.ceil(x).toLong + 1L))
      val ranksNeeded = rankPairs.flatMap { case (a, b) => Seq(a, b) }.distinct.sorted

      def bucketOf(v: Column, lo: Double, hi: Double): Column =
        least(lit(buckets - 1),
          floor((v - lit(lo)) / lit((hi - lo) / buckets)).cast("int"))

      val coarse = t("coarse collect")(
        rows.groupBy(bucketOf(col("_v"), mn, mx).as("_b"))
          .agg(count(lit(1)).as("_c"))
          .collect().map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1))
      var running = 0L
      val cum = coarse.map { case (b, c) => val before = running; running += c; (b, c, before) }
      def isNeeded(before: Long, cumV: Long): Boolean =
        ranksNeeded.exists(k => before < k && cumV >= k)
      val kept = cum.filter { case (_, c, before) => isNeeded(before, before + c) }
      println(s"[p2] kept buckets = ${kept.length}, max depth = ${kept.map(_._2).max}")

      val b = bucketOf(col("_v"), mn, mx)
      val before = kept.foldLeft(lit(0L)) { case (acc, (kb, _, kbefore)) =>
        when(b === kb, lit(kbefore)).otherwise(acc)
      }
      val keepExpr = b.isInCollection(kept.map(_._1))

      val exact = rows.filter(keepExpr)
        .select(col("_v"), before.as("_before"), b.as("_part"))
      t("exact filter count")(exact.count())
      val fine = exact.groupBy(col("_part"), col("_before"), col("_v"))
        .agg(count(lit(1)).as("_c"))
      val wV = Window.partitionBy(col("_part")).orderBy(col("_v"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val ranked = fine.withColumn("_cum", col("_before") + sum(col("_c")).over(wV))
      val aggCols = ranksNeeded.map(k => min(when(col("_cum") >= k, col("_v"))).as(s"_r$k"))
      val vr = t("rank agg head")(ranked.agg(aggCols.head, aggCols.tail: _*).head())

      // A/B: broadcast-join a LocalRelation of kept buckets instead of
      // IN-list + nested when-chain
      {
        import spark.implicits._
        val keptDf = kept.toSeq.map { case (kb, _, kbefore) => (kb, kbefore) }
          .toDF("_b", "_before")
        val exact2 = rows.withColumn("_part", b)
          .join(broadcast(keptDf), col("_part") === col("_b"))
        val fine2 = exact2.groupBy(col("_part"), col("_before"), col("_v"))
          .agg(count(lit(1)).as("_c"))
        val ranked2 = fine2.withColumn("_cum", col("_before") + sum(col("_c")).over(wV))
        t("rank agg JOIN variant")(ranked2.agg(aggCols.head, aggCols.tail: _*).head())
      }
      val valAt = ranksNeeded.zipWithIndex.map { case (k, i) => k -> vr.getDouble(i) }.toMap
      val bs = pos.zip(rankPairs).map { case (x, (kLo, kHi)) =>
        val lo = valAt(kLo); val hi = valAt(kHi)
        val fl = math.floor(x); val cl = math.ceil(x)
        if (fl == cl) lo else (cl - x) * lo + (x - fl) * hi
      }

      val v = col(valueCol).cast("double")
      val bounds = array(bs.map(x => round(lit(x), 6)): _*)
      val hist = df.filter(v.isNotNull)
        .withColumn("bucket", size(filter(bounds, bb => bb < v)))
        .groupBy(col("bucket"))
        .agg(count(lit(1)).as("n"), min(v).as("bucket_min"), max(v).as("bucket_max"))
      t("probe+agg noop write")(
        hist.write.format("noop").mode("overwrite").save())
    }
    spark.stop()
  }
}
