package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.functions._

/** q140's contract is the MECHANISM: the query addresses the base
  * store, yet the executed plan must scan the catalog-sized summary —
  * and outside the rule's soundness bounds (or with the conf off) it
  * must scan the base and still agree value-for-value.
  */
class MvRewriteSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def scanPaths(df: DataFrame): Seq[String] = {
    def scans(p: SparkPlan): Seq[FileSourceScanExec] =
      p.collect {
        case s: FileSourceScanExec    => Seq(s)
        case q: QueryStageExec        => scans(q.plan)
        case a: AdaptiveSparkPlanExec => scans(a.executedPlan)
      }.flatten
    scans(df.queryExecution.executedPlan)
      .flatMap(_.relation.location.rootPaths.map(_.toString))
  }

  test("q140 executed plan scans the summary, not the base store") {
    val df = SparkEntry.queries("q140_mv_rewrite")(spark, sf)
    val rows = df.collect()
    assert(rows.length == graft.etl.FlowLogCorpus.Accounts)
    val paths = scanPaths(df)
    assert(paths.nonEmpty && paths.forall(_.contains("/summary")), paths.toString)
  }

  test("control: with the rule disabled the same query scans the base and agrees") {
    val on = SparkEntry.queries("q140_mv_rewrite")(spark, sf).collect().toSeq
    val key = graft.plans.RewriteAggregateToSummary.EnabledKey
    try {
      spark.conf.set(key, "false")
      val df = SparkEntry.queries("q140_mv_rewrite")(spark, sf)
      val off = df.collect().toSeq
      val paths = scanPaths(df)
      assert(paths.nonEmpty && paths.forall(_.contains("/base")), paths.toString)
      assert(on == off)
    } finally spark.conf.unset(key)
  }

  test("an aggregate outside the mapped shapes is NOT rewritten") {
    // same base, but max(bytes) has no algebraic twin in the summary —
    // the rule must leave the whole aggregate on the base scan
    val base = SparkEntry.queries("q140_mv_rewrite")(spark, sf) // ensures store+registration
    base.collect()
    val df = graft.etl.ConvertJob
      .readConverted(
        spark,
        new java.io.File(
          new java.io.File(
            sys.props("java.io.tmpdir"),
            s"graft_mv_${spark.sparkContext.applicationId}"
          ),
          "base"
        ).getPath
      )
      .groupBy(col("account"))
      .agg(count(lit(1)).as("n_rows"), max(col("bytes")).as("max_bytes"))
    df.collect()
    val paths = scanPaths(df)
    assert(paths.nonEmpty && paths.forall(_.contains("/base")), paths.toString)
  }
}
