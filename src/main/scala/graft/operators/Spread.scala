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
    * has fewer partitions; identity otherwise. Streaming DataFrames
    * pass through untouched (`.rdd` is illegal on them, and micro-batch
    * inputs already arrive pre-partitioned by the source) — so the
    * shared text operators stay usable on both sides of the
    * batch ≡ streaming contract.
    */
  def toCores(df: DataFrame): DataFrame = {
    if (df.isStreaming) return df
    val p = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < p) df.repartition(p) else df
  }
}
