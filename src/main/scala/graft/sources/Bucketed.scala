package graft.sources

import org.apache.spark.sql.DataFrame

/** Bucketed (sort-merge-bucket) table layout — the co-located-join
  * story the engine offers for repeated big⋈big joins on a stable key:
  * both sides pre-hashed into the same bucket count on the join key and
  * sorted within buckets, so the join planner skips BOTH exchanges
  * (SortMergeJoin directly over the scans; the residual in-partition
  * sorts are linear passes over locally-sorted runs — Spark ≥ 3 keeps
  * them because bucket sort order is per-file, not per-bucket,
  * guaranteed).
  *
  * At 100 TB this converts the nightly fact⋈fact join from two
  * full-table shuffles into a metadata decision — the same contract as
  * Hive/Iceberg bucketed tables. BucketedJoinSpec asserts the
  * exchange-free bucketed plan and result equality against the plain join.
  */
object Bucketed {

  def writeBucketed(
      df: DataFrame,
      table: String,
      key: String,
      buckets: Int): Unit =
    df
      // align the write partitioning with the bucket hash so every
      // bucket is exactly ONE file: with several files per bucket the
      // reader keeps the sorted-scan property per file only and must
      // re-Sort before a merge join — one file per bucket elides it
      .repartition(buckets, org.apache.spark.sql.functions.col(key))
      .write
      .bucketBy(buckets, key)
      .sortBy(key)
      .mode("overwrite")
      .format("parquet")
      .saveAsTable(table)
}
