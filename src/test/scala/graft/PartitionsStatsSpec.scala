package graft

import graft.catalog.Partitions
import graft.etl.FlowLogCorpus
import java.nio.file.Files

/** ANALYZE TABLE → catalog statistics → the optimizer's cost model:
  * after analyze, the table's plan stats carry the exact row count
  * (CBO's input), and column stats land for the analyzed columns.
  */
class PartitionsStatsSpec extends SparkSpec {

  test("analyze records row count the optimizer sees, plus column stats") {
    val base = Files.createTempDirectory("graft_stats").toString
    FlowLogCorpus.convertTo(spark, s"$base/logs")
    val table = "flowlogs_stats_spec"
    spark.sql(s"DROP TABLE IF EXISTS $table")
    Partitions.createExternalTable(spark, table, s"$base/logs")
    Partitions.registerAll(spark, table, s"$base/logs")
    val expected = spark.table(table).count()

    Partitions.analyze(spark, table, Seq("srcaddr", "bytes"))
    val prev = spark.conf.get("spark.sql.cbo.enabled", "false")
    try {
      spark.conf.set("spark.sql.cbo.enabled", "true")
      val stats = spark.table(table).queryExecution.optimizedPlan.stats
      assert(
        stats.rowCount.exists(_.toLong == expected),
        s"optimizer row count ${stats.rowCount} != analyzed $expected"
      )
      assert(stats.sizeInBytes > 0)
      // column stats are in the catalog for the analyzed columns
      val cols = spark.sharedState.externalCatalog
        .getTable("default", table)
        .stats
        .map(_.colStats.keySet)
        .getOrElse(Set.empty[String])
      assert(
        Set("srcaddr", "bytes").subsetOf(cols),
        s"column stats missing: got $cols"
      )
    } finally {
      spark.conf.set("spark.sql.cbo.enabled", prev)
      spark.sql(s"DROP TABLE IF EXISTS $table")
    }
  }
}
