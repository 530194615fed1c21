package graft

/** Dev tool: print a query's formatted physical plan (the `.explain`
  * iterate-until-it's-the-plan-you-want loop, runnable without sbt):
  * `tools/run_main.sh graft.Explain q65_chunking [sfDir]`
  * Accepts a comma-separated list of query names (one JVM, one session —
  * the r16 plan-capture loop writes one `plans/r16/<q>_{before,after}.txt`
  * per name from the delimited sections).
  *
  * `--executed` (r17, the q71 evidence ask): RUN each query first and
  * print `queryExecution.executedPlan` — the ADAPTIVE final plan, the
  * only artifact that can show whether an iteration join consumed a
  * cache's partitioning (AQE decides at runtime; the static dump always
  * shows the conservative Sort+Exchange). Session caches are released
  * between names either way, so a later query's capture never reflects
  * an earlier name's warmed state (r16 advisor note).
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val executed = args.contains("--executed")
    val rest = args.filterNot(_.startsWith("--"))
    val names = rest(0).split(',').filter(_.nonEmpty)
    val sfDir = if (rest.length > 1) rest(1) else "/root/testdata/sf0.01"
    val spark = Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"), "graft-explain")
    names.foreach { name =>
      println(s"===EXPLAIN $name===")
      val df = SparkEntry.queries(name)(spark, sfDir)
      if (executed) {
        // collect() (not a noop write) so THIS QueryExecution's adaptive
        // plan is the one finalized — a write action builds its own QE
        // and the captured plan would still say isFinalPlan=false
        df.collect()
        println(df.queryExecution.executedPlan.toString)
      } else df.explain("formatted")
      graft.llm.Dedup.releaseTrackedCaches(spark)
      graft.queries.Graph.releaseCaches(spark)
    }
    spark.stop()
  }
}
