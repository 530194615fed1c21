package graft.queries

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed-table layout — the shuffle-elimination tool SCALE.md's join
  * inventory leans on. Writing both sides of a recurring equi-join
  * bucketed (and sorted) by the join key co-locates matching keys in
  * same-numbered buckets, so every later join or aggregation on that key
  * plans with ZERO Exchange: the shuffle is paid once at write time and
  * amortized over every subsequent read.
  *
  * At 100 TB this is the difference between re-shuffling the fact table
  * per query and a scan-local sort-merge join: for a nightly
  * orders⋈lineitem workload the bucketed layout removes the dominant
  * network cost of every run after the first. Bucket count is chosen at
  * write time (buckets ≈ table_size / target_partition_size; both sides
  * of a co-located join must use the SAME count — Spark requires matching
  * bucket counts to plan the exchange-free join).
  *
  * Reference note: the reference's fixed (account, dt) Hive layout
  * (`convert.go:20-35`) is directory partition pruning; bucketing is the
  * complementary intra-partition tool Spark adds for JOIN keys with too
  * many distinct values to be directories (user ids, order keys).
  */
object Bucketing {

  /** Write `df` as a parquet table bucketed AND sorted by `key` —
    * `buckets` files per partition, rows hash-routed by key, sorted
    * within each bucket so sort-merge joins skip their sort too.
    */
  def writeBucketed(
      df: DataFrame,
      table: String,
      key: String,
      buckets: Int
  ): Unit =
    df.write
      .mode(SaveMode.Overwrite)
      .format("parquet")
      .bucketBy(buckets, key)
      .sortBy(key)
      .saveAsTable(table)

  /** The co-located join: both tables bucketed by the key → equi-join
    * with no Exchange on either side (asserted in BucketingSpec).
    */
  def coLocatedJoin(
      spark: SparkSession,
      left: String,
      right: String,
      key: String
  ): DataFrame =
    spark.table(left).join(spark.table(right), key)
}
