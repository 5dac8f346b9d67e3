package graft.operators

import org.apache.spark.sql.DataFrame

/** Parallelism guard for compute-heavy map phases behind narrow scans.
  *
  * A demo-sized corpus is often ONE parquet split, so an expensive
  * per-row expression (winnow fingerprints, n-gram string builds, d²/2
  * covariance expansion) would run in a single task no matter how many
  * cores the session has — Spark sizes scan stages by INPUT bytes, not
  * by downstream compute. A real 100 TB corpus arrives in thousands of
  * splits and skips this entirely (`getNumPartitions >= parallelism`),
  * so the round-robin shuffle this inserts is a small-input-only cost,
  * never a production-path one.
  */
object Spread {

  /** Repartition `df` up to the session's default parallelism iff it
    * has fewer partitions; identity otherwise.
    */
  def toCores(df: DataFrame): DataFrame = {
    val p = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < p) df.repartition(p) else df
  }
}
