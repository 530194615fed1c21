package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** One shared local SparkSession for the whole test JVM. */
object SparkSpec {
  lazy val spark: SparkSession = {
    val s = SparkSession
      .builder()
      .master("local[4]")
      .appName("graft-test")
      .withExtensions(new graft.plans.GraftExtensions) // as Sessions.local does
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}

trait SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSpec.spark
  def tmpDir(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  /** Sum of the parquet scans' numOutputRows after executing `df` — the
    * rows that survived file/row-group/partition pruning and reached
    * Spark. Recurses into AQE query stages (leaf nodes wrapping the
    * materialized stage plans).
    */
  def scannedRows(df: org.apache.spark.sql.DataFrame): Long = {
    import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    df.collect()
    def fileScans(p: SparkPlan): Seq[FileSourceScanExec] =
      p.collect {
        case s: FileSourceScanExec    => Seq(s)
        case q: QueryStageExec        => fileScans(q.plan)
        case a: AdaptiveSparkPlanExec => fileScans(a.executedPlan)
      }.flatten
    fileScans(df.queryExecution.executedPlan)
      .map(_.metrics("numOutputRows").value)
      .sum
  }
}
