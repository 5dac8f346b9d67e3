package graft.tools

import org.apache.spark.sql.SparkSession

/** Ad-hoc plan dump for named SparkEntry queries (test scope):
  * `Test/runMain graft.tools.ExplainMain <sfDir> <q1,q2,...>`.
  */
object ExplainMain {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "8192")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", false).getOrCreate()
    val dir = args(0)
    val noExec = args.contains("--no-exec")
    args(1).split(",").foreach { q =>
      println(s"===== $q =====")
      val df = graft.SparkEntry.queries(q)(spark, dir)
      if (noExec) {
        // plan-only (big SFs: executing/collecting would be the cost);
        // shows logical repartition widths and Catalyst size estimates
        println(df.queryExecution.optimizedPlan.toString)
      } else {
        df.collect() // let AQE finalize
        println(df.queryExecution.executedPlan.toString
          .split("== Initial Plan ==")(0))
      }
    }
    spark.stop()
  }
}
