package graft

/** Time a named subset of SparkEntry queries — the per-query profiling
  * companion to [[Bench]] (which always runs the full inventory).
  *
  * Usage: tools/run_main.sh graft.TimeQuery <sfDir> <iters> q27… [qNN…]
  *
  * Prefix match on the short id (everything before the first '_'), so
  * "q27" selects q27_dedup_minhash_lsh. Per-iteration times are printed
  * (not just the median) so contention spikes are visible, and the
  * q26/q27 shingle cache is warmed outside the timed region exactly as
  * Bench does.
  */
object TimeQuery {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val iters = args.lift(1).map(_.toInt).getOrElse(3).max(1)
    val wanted = args.drop(2).toSet
    val spark = Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"), "graft-timequery")

    val selected = SparkEntry.queries.filter { case (name, _) =>
      wanted.isEmpty || wanted.contains(name.takeWhile(_ != '_')) || wanted.contains(name)
    }
    require(selected.nonEmpty, s"no query matches ${wanted.mkString(",")}")

    // same warm-up discipline as Bench: plan/JIT at sf0.001, corpus
    // shingle cache outside the timed region
    val warmDir = "/root/testdata/sf0.001"
    if (new java.io.File(warmDir).isDirectory)
      selected.foreach { case (n, fn) =>
        if (n != "q00_etl_convert") { try fn(spark, warmDir).count() catch { case _: Throwable => () } }
      }
    val t0 = System.nanoTime()
    graft.llm.Dedup.warmShingles(spark, sfDir)
    println(f"shingle_warm ${(System.nanoTime() - t0) / 1e9}%.3f s")
    // SPARK_GRAFT_COLD_GRAPH=1 → measure the graph family COLD: skip the
    // shared co-occurrence warm AND drop it between iterations, so q80
    // pays its full pair-count build every run (how the q80b-cheaper-
    // than-q80 swap-in claim is measured; SCALE.md graph table)
    val coldGraph = sys.env.get("SPARK_GRAFT_COLD_GRAPH").contains("1")
    if (!coldGraph) {
      val t1 = System.nanoTime()
      graft.queries.Graph.warmEdges(spark, sfDir)
      println(f"edge_warm ${(System.nanoTime() - t1) / 1e9}%.3f s")
    }

    selected.foreach { case (name, fn) =>
      val times = (1 to iters).map { i =>
        graft.llm.Dedup.releaseTrackedCaches(spark)
        if (coldGraph) graft.queries.Graph.releaseCaches(spark)
        val s0 = System.nanoTime()
        val n = fn(spark, sfDir).count()
        val dt = (System.nanoTime() - s0) / 1e9
        println(f"$name iter$i $dt%.3f s ($n rows)")
        dt
      }
      val med = times.sorted.apply(times.size / 2)
      println(f"$name MEDIAN $med%.3f s over $iters iters")
    }
    graft.llm.Dedup.releaseCaches(spark)
    graft.queries.Graph.releaseCaches(spark)
    spark.stop()
  }
}
