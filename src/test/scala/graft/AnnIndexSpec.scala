package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.functions._

/** q138's contract is the LAYOUT, not just the answer: serving from the
  * cell-partitioned store must read only the probed cells' partitions,
  * and the served values must equal the in-plan trained-IVF gate (q136)
  * exactly — build/serve moves bytes, not values.
  */
class AnnIndexSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def indexScans(df: DataFrame): Seq[FileSourceScanExec] = {
    def scans(p: SparkPlan): Seq[FileSourceScanExec] =
      p.collect {
        case s: FileSourceScanExec    => Seq(s)
        case q: QueryStageExec        => scans(q.plan)
        case a: AdaptiveSparkPlanExec => scans(a.executedPlan)
      }.flatten
    scans(df.queryExecution.executedPlan)
      .filter(_.relation.location.rootPaths.exists(_.toString.contains("graft_annindex")))
  }

  test("q138 served results equal q136's in-plan results row-for-row") {
    val served = SparkEntry
      .queries("q138_knn_ivf_index")(spark, sf)
      .collect()
      .toSeq
    val inPlan = SparkEntry
      .queries("q136_knn_ivf_trained")(spark, sf)
      .collect()
      .toSeq
    assert(served == inPlan)
    assert(served.nonEmpty)
  }

  test("one-probe serve reads exactly nprobe of the 16 cell partitions") {
    val df = graft.llm.AnnIndex.serve(spark, sf, col("vec_id") === 3)
    df.collect()
    val scan = indexScans(df) match {
      case Seq(s) => s
      case other  => fail(s"expected one index scan, got ${other.size}")
    }
    assert(scan.metrics.contains("numPartitions"))
    val read = scan.metrics("numPartitions").value
    assert(read == 4, s"partitions read: $read (want nprobe=4 of 16)")
  }
}
