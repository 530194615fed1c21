package graft

import graft.catalog.{Maintenance, Partitions}
import graft.etl.{ConvertJob, FlowLogCorpus}
import java.nio.file.Files

/** Partition compaction + retention over a real converted tree. */
class MaintenanceSpec extends SparkSpec {

  private def convertCorpus(): String = {
    val base = Files.createTempDirectory("graft_maint").toString
    FlowLogCorpus.convertTo(spark, s"$base/logs")
    s"$base/logs"
  }

  test("compactPartition consolidates files and preserves rows") {
    val root = convertCorpus()
    // fragment one partition into many small files first
    val dirs = new java.io.File(root).listFiles().filter(_.isDirectory)
    val part = dirs.head.listFiles().filter(_.isDirectory).head.getPath
    val before = ConvertJob.readConverted(spark, root).count()
    val rows = spark.read.schema(graft.etl.FlowLogSchema.schema).parquet(part)
    rows.repartition(8).write.mode("overwrite").parquet(part + "._frag")
    val fs = org.apache.hadoop.fs.FileSystem.get(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(part), true)
    fs.rename(new org.apache.hadoop.fs.Path(part + "._frag"), new org.apache.hadoop.fs.Path(part))
    val fragFiles = new java.io.File(part).listFiles().count(f => f.isFile && !f.getName.startsWith("_") && !f.getName.endsWith(".crc"))
    assert(fragFiles >= 8, s"expected fragmentation, got $fragFiles files")

    val after = Maintenance.compactPartition(spark, part)
    assert(after == 1, s"expected 1 compacted file, got $after")
    assert(ConvertJob.readConverted(spark, root).count() == before)
  }

  test("dropOlderThan removes directories and catalog partitions") {
    val root = convertCorpus()
    spark.sql("DROP TABLE IF EXISTS flowlogs_maint")
    Partitions.createExternalTable(spark, "flowlogs_maint", root)
    val registered = Partitions.registerAll(spark, "flowlogs_maint", root)
    assert(registered == FlowLogCorpus.Accounts * FlowLogCorpus.Days)

    // corpus dates start at BaseDate; drop the first 3 days
    val cutoff = "2023-11-17"
    val dropped = Maintenance.dropOlderThan(spark, "flowlogs_maint", root, cutoff)
    assert(dropped == FlowLogCorpus.Accounts * 3, s"dropped $dropped")

    val remainingDt = spark
      .sql("SHOW PARTITIONS flowlogs_maint")
      .collect()
      .map(_.getString(0))
    assert(remainingDt.nonEmpty && remainingDt.forall(p => p.split("/").exists(s => s.startsWith("dt=") && s.drop(3) >= cutoff)))
    val minData = ConvertJob
      .readConverted(spark, root)
      .agg(org.apache.spark.sql.functions.min("dt"))
      .collect()(0)
      .getString(0)
    assert(minData >= cutoff)
    spark.sql("DROP TABLE flowlogs_maint")
  }
}
