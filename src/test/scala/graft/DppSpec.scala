package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.functions._

/** q125's contract is the MECHANISM, not just the answer: the quarter
  * filter lives only in the dim's data, yet the fact scan must skip
  * 77 of 80 month partitions at runtime via dynamic partition pruning.
  */
class DppSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def factScans(df: DataFrame): Seq[FileSourceScanExec] = {
    def scans(p: SparkPlan): Seq[FileSourceScanExec] =
      p.collect {
        case s: FileSourceScanExec    => Seq(s)
        case q: QueryStageExec        => scans(q.plan)
        case a: AdaptiveSparkPlanExec => scans(a.executedPlan)
      }.flatten
    scans(df.queryExecution.executedPlan)
      .filter(_.relation.location.rootPaths.exists(_.toString.contains("orders_by_month")))
  }

  test("q125 fact scan prunes 80 month partitions to 3 via dynamicpruning") {
    val df = SparkEntry.queries("q125_dynamic_partition_pruning")(spark, sf)
    df.collect()
    val scan = factScans(df) match {
      case Seq(s) => s
      case other  => fail(s"expected one fact scan, got ${other.size}")
    }
    assert(
      scan.partitionFilters.exists(_.toString.toLowerCase.contains("dynamicpruning")),
      s"no dynamic pruning filter on the fact scan: ${scan.partitionFilters}"
    )
    assert(scan.metrics.contains("numPartitions"))
    assert(
      scan.metrics("numPartitions").value == 3,
      s"partitions read: ${scan.metrics("numPartitions").value} (want 3 of 80)"
    )
  }

  test("q125 pruned result equals the unpartitioned closed-form replay") {
    val got = SparkEntry
      .queries("q125_dynamic_partition_pruning")(spark, sf)
      .collect()
      .toSeq
    val want = queries.Tables
      .table(spark, sf, "orders")
      .withColumn("o_month", date_format(col("o_orderdate"), "yyyy-MM"))
      .filter(col("o_month").isin("1996-04", "1996-05", "1996-06"))
      .groupBy("o_month")
      .agg(
        count(lit(1)).as("n_orders"),
        (sum(round(col("o_totalprice") * 100.0, 0).cast("long")) / 100.0)
          .as("revenue")
      )
      .orderBy("o_month")
      .collect()
      .toSeq
    assert(got == want)
    assert(got.size == 3) // one row per month of the quarter
  }

  test("control: with DPP disabled the same query reads all 80 partitions") {
    val key = "spark.sql.optimizer.dynamicPartitionPruning.enabled"
    val prev = spark.conf.get(key)
    try {
      spark.conf.set(key, "false")
      val df = SparkEntry.queries("q125_dynamic_partition_pruning")(spark, sf)
      df.collect()
      val scan = factScans(df).head
      val read =
        if (scan.metrics.contains("numPartitions"))
          scan.metrics("numPartitions").value
        else 80L // no partition filter at all → full scan
      assert(read == 80, s"expected a full 80-partition scan, read $read")
    } finally spark.conf.set(key, prev)
  }
}
