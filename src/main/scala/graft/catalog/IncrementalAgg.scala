package graft.catalog

import graft.etl.ConvertJob
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Incremental aggregate maintenance: keep a per-(account, dt) summary
  * of the converted table current by recomputing ONLY newly-arrived
  * partitions — never a full-history rescan. At 100 TB the base table
  * is append-only behind partition registration (`Partitions`), so the
  * history's aggregates cannot change; rescanning them to refresh a
  * summary is pure waste.
  *
  * The summary stores ALGEBRAIC partials (counts and sums): any rollup
  * — daily totals, per-account rates, averages via sum/count — derives
  * from the summary alone by re-aggregation, the same contract partial
  * aggregation uses inside a shuffle. One row per partition, so the
  * summary is catalog-sized, not data-sized.
  */
object IncrementalAgg {

  /** Per-(account, dt) partials of a converted flowlogs frame. Sums are
    * widened to long up front: INT32 `bytes` per row, but a partition's
    * sum at production scale does not fit an int. min/max keep the BASE
    * column type (min-of-mins / max-of-maxes re-aggregate exactly and
    * the MV rewrite must stay type-preserving); n_bytes/n_packets are
    * NON-NULL counts so avg rewrites exactly as sum-of-sums over
    * sum-of-counts even on a nullable column.
    */
  def partials(converted: DataFrame): DataFrame =
    converted
      .groupBy(col("account"), col("dt"))
      .agg(
        count(lit(1)).as("n_rows"),
        sum(col("bytes").cast("long")).as("sum_bytes"),
        sum(col("packets").cast("long")).as("sum_packets"),
        count(when(col("action") === "REJECT", lit(1))).as("n_rejects"),
        min(col("bytes")).as("min_bytes"),
        max(col("bytes")).as("max_bytes"),
        min(col("packets")).as("min_packets"),
        max(col("packets")).as("max_packets"),
        count(col("bytes")).as("n_bytes"),
        count(col("packets")).as("n_packets")
      )

  /** Partials for `updated` partitions only. The filter is a disjunction
    * over the two PARTITION columns, so it prunes at the directory
    * level — the scan never opens a file of any other partition
    * (IncrementalAggSpec pins this via the scan's output-row metric).
    */
  def freshPartials(
      spark: SparkSession,
      convertedPath: String,
      updated: Seq[(String, String)]
  ): DataFrame = {
    require(updated.nonEmpty, "no partitions to refresh")
    val pred = updated
      .map { case (a, d) => col("account") === a && col("dt") === d }
      .reduce(_ || _)
    partials(ConvertJob.readConverted(spark, convertedPath).filter(pred))
  }

  /** Refresh the summary at `summaryPath` for the given partitions:
    * recompute their partials from the base table (partition-pruned),
    * keep every other existing summary row (anti-join against the
    * refreshed keys — broadcast bounded by the caller's partition list,
    * never the summary size), publish via the `_tmp_`/`_old_` swap
    * `Maintenance.compactPartition` uses (the summary is being read
    * while rewritten — an in-place overwrite would race its own scan).
    * Idempotent: re-running with the same `updated` list converges to
    * the same summary. Returns the summary row count after the refresh.
    */
  def update(
      spark: SparkSession,
      convertedPath: String,
      summaryPath: String,
      updated: Seq[(String, String)]
  ): Long = {
    val dir = new Path(summaryPath)
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val tmp = new Path(dir.getParent, "_tmp_" + dir.getName)
    val old = new Path(dir.getParent, "_old_" + dir.getName)
    if (fs.exists(old)) { // self-heal a crashed swap, as compactPartition
      if (!fs.exists(dir)) {
        if (!fs.rename(old, dir))
          throw new java.io.IOException(s"summary: cannot restore $old")
      } else fs.delete(old, true)
    }
    if (fs.exists(tmp)) fs.delete(tmp, true)

    val fresh = freshPartials(spark, convertedPath, updated)
    val next =
      if (fs.exists(dir)) {
        import spark.implicits._
        val updDf = updated.toDF("account", "dt")
        spark.read
          .parquet(summaryPath)
          .join(broadcast(updDf), Seq("account", "dt"), "left_anti")
          .unionByName(fresh)
      } else fresh

    next.write.mode(SaveMode.Overwrite).parquet(tmp.toString)
    if (fs.exists(dir) && !fs.rename(dir, old))
      throw new java.io.IOException(s"summary: cannot move $dir aside")
    if (!fs.rename(tmp, dir)) {
      if (fs.exists(old)) fs.rename(old, dir)
      throw new java.io.IOException(s"summary: cannot publish $tmp")
    }
    fs.delete(old, true)
    spark.read.parquet(summaryPath).count()
  }
}
