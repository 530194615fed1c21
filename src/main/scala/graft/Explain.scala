package graft

/** Dev tool: print a query's formatted physical plan (the `.explain`
  * iterate-until-it's-the-plan-you-want loop, runnable without sbt):
  * `tools/run_main.sh graft.Explain q65_chunking [sfDir]`
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    val spark = Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"), "graft-explain")
    val df = SparkEntry.queries(name)(spark, sfDir)
    df.explain("formatted")
    spark.stop()
  }
}
