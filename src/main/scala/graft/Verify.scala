package graft
import java.nio.file.{Files, Paths}

/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare.
  */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = Sessions.local(cpus, "graft-verify")
    new java.io.File(outDir).mkdirs()
    // dev-loop filter (comma-separated substrings, any-match — the
    // Bench convention); the driver sets no env so runs everything
    val filter = sys.env.get("SPARK_GRAFT_QUERY_FILTER")
    SparkEntry.queries
      .filter { case (name, _) =>
        filter.forall(_.split(',').exists(f => f.nonEmpty && name.contains(f)))
      }
      .foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
    }
    def q(s: String): String = Json.str(s)
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    graft.llm.Dedup.releaseCaches(spark)
    graft.queries.Graph.releaseCaches(spark)
    graft.llm.BpeTrain.releaseCaches(spark)
    graft.llm.Clustering.releaseCaches(spark)
    spark.stop()
  }
}
