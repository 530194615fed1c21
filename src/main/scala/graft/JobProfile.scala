package graft

import org.apache.spark.scheduler._

/** Dev tool: per-JOB profile of a query run (guide §1 "measure first" —
  * where TimeQuery answers "how long", this answers "how many jobs and
  * which ones": the stage-latency floor of the sub-second tail gates is
  * job count × scheduler round-trip, invisible in a single total).
  *
  * Usage: tools/run_main.sh graft.JobProfile <sfDir> q03 [qNN…]
  *
  * Prints one line per job (duration, #stages, #tasks, first stage
  * name) for the SECOND run of each query (first run pays plan/JIT
  * warm-up; caches are released between runs exactly as Bench does),
  * then the query's job/stage/task totals.
  */
object JobProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val wanted = args.drop(1).toSet
    val spark =
      Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"), "graft-jobprofile")

    val selected = SparkEntry.queries.filter { case (name, _) =>
      wanted.isEmpty || wanted.contains(name.takeWhile(_ != '_')) || wanted.contains(name)
    }
    require(selected.nonEmpty, s"no query matches ${wanted.mkString(",")}")

    case class Job(
        id: Int,
        var start: Long = 0L,
        var end: Long = 0L,
        var stages: Int = 0,
        var tasks: Int = 0,
        var desc: String = ""
    )
    val jobs = scala.collection.mutable.LinkedHashMap.empty[Int, Job]
    @volatile var recording = false
    val listener = new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit =
        if (recording) {
          val j = Job(js.jobId, start = js.time)
          j.stages = js.stageInfos.size
          j.tasks = js.stageInfos.map(_.numTasks).sum
          j.desc = Option(js.properties)
            .flatMap(p => Option(p.getProperty("spark.job.description")))
            .getOrElse(js.stageInfos.lastOption.map(_.name.take(60)).getOrElse(""))
          jobs.synchronized { jobs(js.jobId) = j }
        }
      override def onJobEnd(je: SparkListenerJobEnd): Unit =
        jobs.synchronized { jobs.get(je.jobId).foreach(_.end = je.time) }
    }
    spark.sparkContext.addSparkListener(listener)

    selected.foreach { case (name, fn) =>
      // run 1: warm-up (plan + JIT), unrecorded
      graft.llm.Dedup.releaseTrackedCaches(spark)
      try fn(spark, sfDir).count()
      catch { case e: Throwable => println(s"$name FAILED: ${e.getMessage}") }
      // run 2: recorded
      graft.llm.Dedup.releaseTrackedCaches(spark)
      jobs.synchronized(jobs.clear())
      recording = true
      val t0 = System.nanoTime()
      try fn(spark, sfDir).count()
      catch { case _: Throwable => () }
      val dt = (System.nanoTime() - t0) / 1e9
      recording = false
      spark.sparkContext.listenerBus.waitUntilEmpty()
      val snap = jobs.synchronized(jobs.values.toSeq)
      println(s"=== $name total ${f"$dt%.3f"} s, ${snap.size} jobs, " +
        s"${snap.map(_.stages).sum} stages, ${snap.map(_.tasks).sum} tasks ===")
      snap.foreach { j =>
        val d = if (j.end > 0) (j.end - j.start) / 1e3 else -1.0
        println(f"  job ${j.id}%4d ${d}%7.3f s stages=${j.stages}%2d tasks=${j.tasks}%4d ${j.desc}")
      }
    }
    spark.stop()
  }
}
