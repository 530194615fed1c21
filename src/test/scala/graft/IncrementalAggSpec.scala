package graft

import graft.catalog.IncrementalAgg
import graft.etl.{ConvertJob, FlowLogCorpus}
import java.nio.file.Files

/** Incremental summary maintenance over a real converted tree:
  * incremental == full recompute, idempotent re-run, and the refresh
  * scan is partition-pruned (output-row metric = refreshed partitions'
  * rows only).
  */
class IncrementalAggSpec extends SparkSpec {

  private def summaryRows(path: String): Set[(String, String, Long, Long, Long, Long)] =
    spark.read
      .parquet(path)
      .collect()
      .map(r =>
        (
          r.getAs[String]("account"),
          r.getAs[String]("dt"),
          r.getAs[Long]("n_rows"),
          r.getAs[Long]("sum_bytes"),
          r.getAs[Long]("sum_packets"),
          r.getAs[Long]("n_rejects")
        )
      )
      .toSet

  test("incremental summary converges to the full recompute and prunes its scans") {
    val base = Files.createTempDirectory("graft_incr").toString
    val logs = s"$base/logs"
    val summary = s"$base/summary"
    FlowLogCorpus.convertTo(spark, logs)
    val converted = ConvertJob.readConverted(spark, logs)

    val allParts = converted
      .select("account", "dt")
      .distinct()
      .collect()
      .map(r => (r.getString(0), r.getString(1)))
      .toSeq
      .sorted
    assert(allParts.size >= 4, s"corpus too small: $allParts")
    val (batch1, batch2) = allParts.splitAt(allParts.size / 2)

    // two incremental refreshes == one full recompute
    IncrementalAgg.update(spark, logs, summary, batch1)
    val n = IncrementalAgg.update(spark, logs, summary, batch2)
    assert(n == allParts.size.toLong)
    val full = IncrementalAgg
      .partials(converted)
      .collect()
      .map(r =>
        (
          r.getAs[String]("account"),
          r.getAs[String]("dt"),
          r.getAs[Long]("n_rows"),
          r.getAs[Long]("sum_bytes"),
          r.getAs[Long]("sum_packets"),
          r.getAs[Long]("n_rejects")
        )
      )
      .toSet
    assert(summaryRows(summary) == full)

    // idempotent: refreshing the same batch again changes nothing
    IncrementalAgg.update(spark, logs, summary, batch2)
    assert(summaryRows(summary) == full)

    // partition pruning: the refresh scan reads ONLY the two partitions
    // it recomputes, not the table
    val two = allParts.take(2)
    val twoRows = {
      import org.apache.spark.sql.functions.col
      converted
        .filter(
          two
            .map { case (a, d) => col("account") === a && col("dt") === d }
            .reduce(_ || _)
        )
        .count()
    }
    val read = scannedRows(IncrementalAgg.freshPartials(spark, logs, two))
    assert(read == twoRows, s"refresh scan read $read rows, partitions hold $twoRows")
  }
}
