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

  private def basePath: String =
    new java.io.File(
      new java.io.File(
        sys.props("java.io.tmpdir"),
        s"graft_mv_${spark.sparkContext.applicationId}"
      ),
      "base"
    ).getPath

  test("an aggregate outside the mapped shapes is NOT rewritten") {
    // same base, but srcport has no partials in the summary — the rule
    // must leave the WHOLE aggregate on the base scan (never partial)
    SparkEntry.queries("q140_mv_rewrite")(spark, sf).collect() // ensures store+registration
    val df = graft.etl.ConvertJob
      .readConverted(spark, basePath)
      .groupBy(col("account"))
      .agg(
        count(lit(1)).as("n_rows"),
        sum(col("srcport").cast("long")).as("sum_srcport")
      )
    df.collect()
    val paths = scanPaths(df)
    assert(paths.nonEmpty && paths.forall(_.contains("/base")), paths.toString)
  }

  test("q140b: filtered min/max/avg rollup scans the summary; control agrees") {
    val df = SparkEntry.queries("q140b_mv_rewrite_minmaxavg")(spark, sf)
    val on = df.collect().toSeq
    assert(on.nonEmpty)
    val paths = scanPaths(df)
    assert(paths.nonEmpty && paths.forall(_.contains("/summary")), paths.toString)
    val key = graft.plans.RewriteAggregateToSummary.EnabledKey
    try {
      spark.conf.set(key, "false")
      val ctrl = SparkEntry.queries("q140b_mv_rewrite_minmaxavg")(spark, sf)
      val off = ctrl.collect().toSeq
      val ctrlPaths = scanPaths(ctrl)
      assert(ctrlPaths.nonEmpty && ctrlPaths.forall(_.contains("/base")), ctrlPaths.toString)
      assert(on == off)
    } finally spark.conf.unset(key)
  }

  test("q140c: global rollup scans the summary; count coalesces to 0 on empty") {
    val df = SparkEntry.queries("q140c_mv_rewrite_global")(spark, sf)
    val on = df.collect().toSeq
    assert(on.size == 1)
    val paths = scanPaths(df)
    assert(paths.nonEmpty && paths.forall(_.contains("/summary")), paths.toString)
    val key = graft.plans.RewriteAggregateToSummary.EnabledKey
    try {
      spark.conf.set(key, "false")
      val off = SparkEntry.queries("q140c_mv_rewrite_global")(spark, sf).collect().toSeq
      assert(on == off)
    } finally spark.conf.unset(key)
    // the empty-base case: a filter matching NOTHING must yield count=0
    // (not null) through the summary exactly as through the base
    val empty = graft.etl.ConvertJob
      .readConverted(spark, basePath)
      .filter(col("dt") >= "2999-01-01")
      .agg(count(lit(1)).as("n_rows"), sum(col("bytes").cast("long")).as("sum_bytes"))
    val row = empty.collect() match { case Array(r) => r }
    assert(scanPaths(empty).forall(_.contains("/summary")))
    assert(row.getLong(0) == 0L && row.isNullAt(1), row.toString)
  }

  test("HAVING on an aggregate rewrites the inner aggregate (filter stays above)") {
    // HAVING sum(bytes) > X leaves a Filter ABOVE the Aggregate (it
    // references the aggregate output, so pushdown can't move it);
    // the rule fires on the inner Aggregate regardless
    SparkEntry.queries("q140_mv_rewrite")(spark, sf).collect()
    val df = graft.etl.ConvertJob
      .readConverted(spark, basePath)
      .groupBy(col("account"))
      .agg(sum(col("bytes").cast("long")).as("sum_bytes"))
      .filter(col("sum_bytes") > 1000000L)
      .orderBy("account")
    val on = df.collect().toSeq
    assert(on.nonEmpty)
    val paths = scanPaths(df)
    assert(paths.nonEmpty && paths.forall(_.contains("/summary")), paths.toString)
    val key = graft.plans.RewriteAggregateToSummary.EnabledKey
    try {
      spark.conf.set(key, "false")
      val off = graft.etl.ConvertJob
        .readConverted(spark, basePath)
        .groupBy(col("account"))
        .agg(sum(col("bytes").cast("long")).as("sum_bytes"))
        .filter(col("sum_bytes") > 1000000L)
        .orderBy("account")
        .collect()
        .toSeq
      assert(on == off)
    } finally spark.conf.unset(key)
  }

  test("a filter on a NON-partition column blocks the rewrite") {
    // WHERE on a data column cannot transplant onto the summary — the
    // whole aggregate must stay on the base scan
    SparkEntry.queries("q140_mv_rewrite")(spark, sf).collect()
    val df = graft.etl.ConvertJob
      .readConverted(spark, basePath)
      .filter(col("action") === "ACCEPT")
      .groupBy(col("account"))
      .agg(count(lit(1)).as("n_rows"))
    df.collect()
    val paths = scanPaths(df)
    assert(paths.nonEmpty && paths.forall(_.contains("/base")), paths.toString)
  }
}
