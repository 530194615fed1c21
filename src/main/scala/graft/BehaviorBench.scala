package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.window.{WindowExec, WindowGroupLimitExec}
import org.apache.spark.sql.functions._

/** Measured 10× stress for the behavior family (q78 funnel, q79
  * retention, q85 sliding distinct, q88 session paths, q89 sessionize)
  * → SCALE.md. These are the most data-shape-sensitive operators of
  * round 8/9 — windows and explodes over per-user histories — so the
  * scale argument needs a measured point beyond sf0.1, not just plan
  * reasoning.
  *
  * Synthesizes a deterministic events corpus at K× the sf0.1 row count
  * (10× rows over 3× users by default → ~3.3× deeper per-user
  * histories, stressing both axes), runs each query at both scales in
  * the SAME session, reports medians, and re-runs the
  * GlobalWindowAuditSpec invariant on the big corpus: no query may
  * acquire an unpartitioned corpus-sized window just because the data
  * grew.
  *
  * Usage: tools/run_main.sh graft.BehaviorBench [rowMultiple] [iters]
  */
object BehaviorBench {

  private val Queries =
    Seq("q78_funnel", "q79_cohort_retention", "q85_sliding_distinct",
      "q88_session_paths", "q89_sessionize", "q126_activity_streaks",
      "q128_growth_accounting")

  private def median(xs: Seq[Double]): Double = xs.sorted.apply(xs.size / 2)

  private def globalWindows(p: SparkPlan): Seq[SparkPlan] =
    p.collect {
      case w: WindowExec if w.partitionSpec.isEmpty           => Seq(w: SparkPlan)
      case w: WindowGroupLimitExec if w.partitionSpec.isEmpty => Seq(w: SparkPlan)
      case q: QueryStageExec                                  => globalWindows(q.plan)
      case a: AdaptiveSparkPlanExec                           => globalWindows(a.executedPlan)
    }.flatten

  /** Deterministic synthetic events with the testdata schema: hashes of
    * the row id drive every attribute, so re-runs build byte-identical
    * corpora (no rand()).
    */
  private def synthesize(
      s: org.apache.spark.sql.SparkSession,
      n: Long,
      users: Long,
      spanDays: Int,
      out: String
  ): Unit = {
    val spanUs = spanDays.toLong * 86400L * 1000000L
    s.range(n)
      .select(
        col("id").as("event_id"),
        expr(s"timestamp_micros(CAST(1704067200000000 + pmod(xxhash64(id, 3), ${spanUs}L) AS BIGINT))")
          .as("ts"),
        pmod(xxhash64(col("id")), lit(users)).as("user_id"),
        when(pmod(xxhash64(col("id"), lit(1)), lit(100)) < 60, "view")
          .when(pmod(xxhash64(col("id"), lit(1)), lit(100)) < 85, "click")
          .when(pmod(xxhash64(col("id"), lit(1)), lit(100)) < 95, "purchase")
          .otherwise("signup")
          .as("event_type"),
        (pmod(xxhash64(col("id"), lit(2)), lit(40000)).cast("double") / 100.0)
          .as("value"),
        lit("{}").as("props")
      )
      .coalesce(8)
      .write
      .mode("overwrite")
      .parquet(s"$out/events.parquet")
  }

  def main(args: Array[String]): Unit = {
    val mult = args.headOption.map(_.toInt).getOrElse(10)
    val iters = args.lift(1).map(_.toInt).getOrElse(3)
    val spark = Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"), "graft-behaviorbench")
    val baseDir = "/root/testdata/sf0.1"
    val base = graft.queries.Tables.table(spark, baseDir, "events")
    val baseN = base.count()
    val baseU = base.select(countDistinct("user_id")).head().getLong(0)

    val bigDir = graft.TempDirs.deleteOnExit(
      new java.io.File(sys.props("java.io.tmpdir"), "graft_behavior_stress").getPath
    )
    synthesize(spark, baseN * mult, baseU * 3, 30, bigDir)
    val bigN = baseN * mult

    println(s"[corpus] base $baseN rows/$baseU users ($baseDir); big $bigN rows/${baseU * 3} users ($bigDir)")

    val fns = graft.queries.Behavior.queries
    Queries.foreach { name =>
      val fn = fns(name)
      def run(dir: String): Double = {
        val ts = (1 to iters).map { _ =>
          val t0 = System.nanoTime()
          fn(spark, dir).count()
          (System.nanoTime() - t0) / 1e9
        }
        median(ts)
      }
      // JIT/codegen warm-up on the small corpus, then measure both
      val baseMed = run(baseDir)
      val bigMed = run(bigDir)
      // plan-stability audit at 10×: executed plan must stay free of
      // unpartitioned corpus windows
      val df: DataFrame = fn(spark, bigDir)
      df.count()
      val gw = globalWindows(df.queryExecution.executedPlan)
      val ratio = bigMed / baseMed
      println(f"[stress] $name%-22s base ${baseMed}%6.2f s  ${mult}x ${bigMed}%6.2f s  ratio ${ratio}%4.1f  globalWindows=${gw.size}")
      if (gw.nonEmpty)
        println(s"[stress] WARNING: $name acquired an unpartitioned window at ${mult}x")
    }
    spark.stop()
  }
}
