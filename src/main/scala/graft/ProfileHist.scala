package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.model.Tables
import graft.operators.Stats

/** TEMPORARY profiling harness for q_histogram_equidepth and
  * q_embed_covariance (round-9 judge asks #1 and #2). Deleted before
  * final commit.
  */
object ProfileHist {

  private def force(df: DataFrame): Unit =
    df.write.format("noop").mode("overwrite").save()

  private def time(spark: SparkSession, label: String)(mk: => DataFrame): Double = {
    val st = spark.sparkContext.statusTracker
    val j0 = st.getJobIdsForGroup(null).length
    val t0 = System.nanoTime()
    force(mk)
    val sec = (System.nanoTime() - t0) / 1e9
    val j1 = st.getJobIdsForGroup(null).length
    println(f"[prof] $label%-40s $sec%8.3f s   jobs=${j1 - j0}")
    sec
  }

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

    val warmDir = "/root/testdata/sf0.001"

    // ---- q_histogram_equidepth decomposition ----
    def hist(dir: String) = Stats.histogramEquiDepth(Tables.orders(spark, dir), "o_totalprice", bins = 20)
    // warm codegen at tiny SF
    force(hist(warmDir))
    time(spark, "equidepth FULL (warm) run1")(hist(sfDir))
    time(spark, "equidepth FULL (warm) run2")(hist(sfDir))

    // ---- suite-context experiment: replay the Bench warmup (all
    // registered queries at sf0.001), then re-time equidepth at sf0.1.
    // If it inflates to ~9 s the suite state (codegen cache eviction /
    // accumulated checkpoints) is the cost, not the plan.
    if (sys.env.get("PROF_SUITE").contains("1")) {
      graft.functions.GraftFunctions.register(spark)
      val names = SparkEntry.benchQueries.filter(SparkEntry.queries.contains)
      val t0 = System.nanoTime()
      names.foreach { n =>
        try force(SparkEntry.queries(n)(spark, warmDir))
        catch { case _: Throwable => () }
      }
      println(f"[prof] suite warmup replay                    ${(System.nanoTime()-t0)/1e9}%8.3f s")
      time(spark, "equidepth FULL after-suite run1")(hist(sfDir))
      time(spark, "equidepth FULL after-suite run2")(hist(sfDir))
      time(spark, "equidepth FULL after-suite run3")(hist(sfDir))
    }

    // ---- direct-predecessor experiment: the two queries timed right
    // before q_histogram_equidepth in Bench order, at sf0.1, then it.
    if (sys.env.get("PROF_PRED").contains("1")) {
      graft.functions.GraftFunctions.register(spark)
      time(spark, "q_winnow_overlap_exact sf0.1")(
        SparkEntry.queries("q_winnow_overlap_exact")(spark, sfDir))
      time(spark, "q_incr_cdc sf0.1")(
        SparkEntry.queries("q_incr_cdc")(spark, sfDir))
      time(spark, "equidepth after winnow run1")(hist(sfDir))
      time(spark, "equidepth after winnow run2")(hist(sfDir))
      time(spark, "equidepth after winnow run3")(hist(sfDir))
    }

    // ---- full bench-prefix replication: sf0.001 warmup of everything,
    // then the timed sf0.1 sequence up to q_histogram_equidepth, then it.
    if (sys.env.get("PROF_FULL").contains("1")) {
      graft.functions.GraftFunctions.register(spark)
      val names = SparkEntry.benchQueries.filter(SparkEntry.queries.contains)
      names.foreach { n =>
        try force(SparkEntry.queries(n)(spark, warmDir))
        catch { case _: Throwable => () }
      }
      val prefix = names.takeWhile(_ != "q_histogram_equidepth")
      prefix.foreach { n =>
        val t0 = System.nanoTime()
        try force(SparkEntry.queries(n)(spark, sfDir))
        catch { case _: Throwable => () }
        println(f"[pref] $n%-40s ${(System.nanoTime()-t0)/1e9}%8.3f s")
      }
      time(spark, "equidepth IN-CONTEXT run1")(hist(sfDir))
      time(spark, "equidepth IN-CONTEXT run2")(hist(sfDir))
      time(spark, "equidepth IN-CONTEXT run3")(hist(sfDir))
    }

    // component A: the bounds subtree alone (percentiles + array)
    val ps = (1 until 20).map(i => (s"_b$i", i.toDouble / 20))
    def bounds(dir: String) = {
      val nonNull = Tables.orders(spark, dir)
        .filter(col("o_totalprice").isNotNull)
      Stats.percentilesByGroup(
        nonNull.withColumn("_g", lit(1)), "_g", "o_totalprice", ps, 1024)
        .select(array(ps.map { case (n, _) => round(col(n), 6) }: _*).as("_bs"))
    }
    force(bounds(warmDir))
    time(spark, "bounds subtree only run1")(bounds(sfDir))
    time(spark, "bounds subtree only run2")(bounds(sfDir))

    // component B: assignment+agg with LITERAL boundaries (no percentile subtree)
    val bs = bounds(sfDir).head().getSeq[Double](0)
    def assignFilter(dir: String) = {
      val v = col("o_totalprice").cast("double")
      Tables.orders(spark, dir).filter(v.isNotNull)
        .withColumn("bucket",
          size(filter(lit(bs.toArray), b => b < v)))
        .groupBy(col("bucket"))
        .agg(count(lit(1)).as("n"), min(v).as("bucket_min"), max(v).as("bucket_max"))
    }
    force(assignFilter(warmDir))
    time(spark, "assign via array filter (literal)")(assignFilter(sfDir))
    time(spark, "assign via array filter run2")(assignFilter(sfDir))

    // component C: assignment via chained when (codegen-able)
    def assignWhen(dir: String) = {
      val v = col("o_totalprice").cast("double")
      val bucket = bs.foldLeft(lit(0)) { (acc, b) => acc + when(lit(b) < v, 1).otherwise(0) }
      Tables.orders(spark, dir).filter(v.isNotNull)
        .withColumn("bucket", bucket)
        .groupBy(col("bucket"))
        .agg(count(lit(1)).as("n"), min(v).as("bucket_min"), max(v).as("bucket_max"))
    }
    force(assignWhen(warmDir))
    time(spark, "assign via summed-when (literal)")(assignWhen(sfDir))
    time(spark, "assign via summed-when run2")(assignWhen(sfDir))

    // component D: crossJoin(broadcast(bounds)) + filter-lambda probe (the real shape)
    def assignCross(dir: String) = {
      val v = col("o_totalprice").cast("double")
      Tables.orders(spark, dir).filter(v.isNotNull)
        .crossJoin(broadcast(bounds(dir)))
        .withColumn("bucket", size(filter(col("_bs"), b => b < v)))
        .groupBy(col("bucket"))
        .agg(count(lit(1)).as("n"), min(v).as("bucket_min"), max(v).as("bucket_max"))
    }
    force(assignCross(warmDir))
    time(spark, "crossJoin bounds + filter probe")(assignCross(sfDir))
    time(spark, "crossJoin bounds + filter run2")(assignCross(sfDir))

    // component E: percentilesByGroup with ONE p vs 19 ps (does |ps| dominate?)
    def bounds1(dir: String) = {
      val nonNull = Tables.orders(spark, dir).filter(col("o_totalprice").isNotNull)
      Stats.percentilesByGroup(
        nonNull.withColumn("_g", lit(1)), "_g", "o_totalprice",
        Seq("_med" -> 0.5), 1024)
    }
    force(bounds1(warmDir))
    time(spark, "percentiles 1p only")(bounds1(sfDir))
    time(spark, "percentiles 1p run2")(bounds1(sfDir))

    spark.stop()
  }
}
