package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec
import org.apache.spark.sql.execution.window.WindowExec
import org.apache.spark.sql.functions._

/** Measured 10×/100× stress for the CDC/SCD2 family (q84 apply, q84b
  * history build, q84c point-in-time lookup) → SCALE.md — the
  * BehaviorBench recipe applied to a change log with a HOT KEY.
  *
  * The gated queries derive their log from `orders` (≤4 changes per
  * key — the short-history regime real CDC feeds live in). A stressed
  * deployment also sees the OTHER regime: one entity whose row churns
  * constantly (a counter row, a bot account), giving one key a
  * corpus-scale history. This bench synthesizes a deterministic log at
  * N× the sf0.1-derived log size where key 0 absorbs ~1% of ALL
  * changes (a ~200k-deep history at 100×) and times the exact SHARED
  * plan shapes the gated queries run ([[graft.queries.Cdc.applyLog]] /
  * [[graft.queries.Cdc.scd2Versions]] / [[graft.queries.Cdc.pitLookup]]
  * — same code, so the stressed plan IS the gated plan), plus a
  * plan-stability audit: the window must stay key-partitioned and the
  * PIT join must stay an equi hash join (never BroadcastNestedLoop) no
  * matter how the data grows.
  *
  * Expected asymmetry (the q84 scaladoc claim, now measured): the
  * max_by APPLY absorbs the hot key map-side (partial aggregation
  * collapses each task's churn to one row before the shuffle), while
  * the SCD2 WINDOW must sort the hot key's full history in one task —
  * the measured gap between those two ratios is the documented reason
  * q84 is an aggregate and only history CONSTRUCTION pays the window.
  *
  * Usage: tools/run_main.sh graft.CdcBench [mult] [iters]
  */
object CdcBench {

  private def median(xs: Seq[Double]): Double = xs.sorted.apply(xs.size / 2)

  /** Deterministic change log: nKeys entities, ~1% of all changes on
    * hot key 0, global seq = row id (unique per key by uniqueness),
    * op mix ~20% I / 70% U / 10% D via hash buckets.
    */
  private def synthLog(s: SparkSession, n: Long, nKeys: Long, out: String): Unit =
    s.range(n)
      .select(
        when(pmod(xxhash64(col("id"), lit(5)), lit(100)) < 1, 0L)
          .otherwise(pmod(xxhash64(col("id")), lit(nKeys)))
          .as("k"),
        when(pmod(xxhash64(col("id"), lit(1)), lit(10)) < 2, "I")
          .when(pmod(xxhash64(col("id"), lit(1)), lit(10)) < 9, "U")
          .otherwise("D")
          .as("op"),
        (pmod(xxhash64(col("id"), lit(2)), lit(1000000)).cast("double") / 100.0)
          .as("payload"),
        col("id").as("seq")
      )
      .coalesce(8)
      .write
      .mode("overwrite")
      .parquet(out)

  private def synthFacts(s: SparkSession, nKeys: Long): DataFrame =
    s.range(nKeys * 4)
      .select(
        pmod(col("id"), lit(nKeys)).as("k"),
        pmod(xxhash64(col("id"), lit(7)), lit(1000000)).as("t")
      )

  private def findBad(p: SparkPlan): Seq[String] =
    p.collect {
      case w: WindowExec if w.partitionSpec.isEmpty =>
        Seq("unpartitioned-window")
      case _: BroadcastNestedLoopJoinExec => Seq("nested-loop-join")
      case q: QueryStageExec              => findBad(q.plan)
      case a: AdaptiveSparkPlanExec       => findBad(a.executedPlan)
    }.flatten

  def main(args: Array[String]): Unit = {
    val mult = args.headOption.map(_.toInt).getOrElse(10)
    val iters = args.lift(1).map(_.toInt).getOrElse(3)
    val spark =
      Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"), "graft-cdcbench")

    // base ≈ the gated q84 log size at sf0.1 (orders 150k → 4-wave log
    // ~198k rows over 150k keys)
    val baseN = 200000L
    val nKeys = 150000L
    val dirs = Seq(1, mult).map { m =>
      val d = graft.TempDirs.deleteOnExit(
        new java.io.File(
          sys.props("java.io.tmpdir"),
          s"graft_cdc_stress_${m}x"
        ).getPath
      )
      synthLog(spark, baseN * m, nKeys, d)
      m -> d
    }
    val hot = spark.read.parquet(dirs.last._2).filter(col("k") === 0).count()
    println(
      s"[corpus] base $baseN rows / $nKeys keys; big ${baseN * mult} rows, hot-key depth $hot"
    )

    val shapes: Seq[(String, String => DataFrame)] = Seq(
      "cdc_apply" -> { d: String =>
        graft.queries.Cdc.applyLog(spark.read.parquet(d))
      },
      "scd2_history" -> { d: String =>
        graft.queries.Cdc.scd2Versions(spark.read.parquet(d))
      },
      "pit_lookup" -> { d: String =>
        val versions = graft.queries.Cdc
          .scd2Versions(spark.read.parquet(d))
          .select(
            col("k"),
            col("payload").as("price"),
            col("seq").as("valid_from"),
            col("valid_to")
          )
        graft.queries.Cdc.pitLookup(synthFacts(spark, nKeys), versions)
      }
    )

    // consume EVERY output column (hash-checksum aggregate): a bare
    // count() would let Catalyst prune the window/join columns and time
    // a hollowed-out plan (measured: scd2's whole window vanished).
    // Returns the executed aggregate frame — its finalized plan CONTAINS
    // the shape's window/join operators, so the audit below inspects the
    // very plan that was timed instead of re-executing the 100× pipeline
    // a fourth time just to finalize AQE.
    def consume(df: DataFrame): DataFrame = {
      val out = df.agg(sum(hash(df.columns.map(col): _*)))
      out.head()
      out
    }
    shapes.foreach { case (name, mk) =>
      var lastBig: DataFrame = null
      def run(d: String, trackLast: Boolean): Double =
        median((1 to iters).map { _ =>
          val t0 = System.nanoTime()
          val executed = consume(mk(d))
          if (trackLast) lastBig = executed
          (System.nanoTime() - t0) / 1e9
        })
      val baseMed = run(dirs.head._2, trackLast = false)
      val bigMed = run(dirs.last._2, trackLast = true)
      val bad = findBad(lastBig.queryExecution.executedPlan)
      println(
        f"[stress] $name%-14s base $baseMed%6.2f s  ${mult}x $bigMed%6.2f s  ratio ${bigMed / baseMed}%5.2f  planFlags=${bad.mkString(",")}"
      )
    }
    spark.stop()
  }
}
