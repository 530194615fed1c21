package graft

/** Dev tool: print a query's formatted physical plan (the `.explain`
  * iterate-until-it's-the-plan-you-want loop, runnable without sbt):
  * `tools/run_main.sh graft.Explain q65_chunking [sfDir]`
  * Accepts a comma-separated list of query names (one JVM, one session —
  * the r16 plan-capture loop writes one `plans/r16/<q>_{before,after}.txt`
  * per name from the delimited sections).
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val names = args(0).split(',').filter(_.nonEmpty)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    val spark = Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"), "graft-explain")
    names.foreach { name =>
      println(s"===EXPLAIN $name===")
      val df = SparkEntry.queries(name)(spark, sfDir)
      df.explain("formatted")
    }
    spark.stop()
  }
}
