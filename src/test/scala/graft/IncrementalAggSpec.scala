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

  test("update self-heals both crash windows of the summary swap") {
    val base = Files.createTempDirectory("graft_incr_crash").toString
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
    IncrementalAgg.update(spark, logs, summary, allParts)
    val healthy = summaryRows(summary)

    // crash window 1: dir was moved aside but the new summary never
    // published — _old_ exists, dir does not; the next update must
    // RESTORE the retained copy before applying its refresh (the exact
    // window whose upsert twin lost data in round 9, ADVICE high)
    val dir = new java.io.File(summary)
    val old = new java.io.File(dir.getParentFile, "_old_" + dir.getName)
    assert(dir.renameTo(old), "test setup: could not simulate the crash")
    IncrementalAgg.update(spark, logs, summary, allParts.take(2))
    assert(summaryRows(summary) == healthy, "post-crash update lost rows")
    assert(!old.exists(), "stale _old_ left behind")

    // crash window 2: stale _tmp_ debris and a stale _old_ alongside a
    // LIVE dir — both must be cleared, the live summary kept
    val tmp = new java.io.File(dir.getParentFile, "_tmp_" + dir.getName)
    tmp.mkdirs()
    new java.io.File(tmp, "junk").createNewFile()
    old.mkdirs()
    new java.io.File(old, "stale").createNewFile()
    IncrementalAgg.update(spark, logs, summary, allParts.take(2))
    assert(summaryRows(summary) == healthy)
    assert(!tmp.exists() && !old.exists(), "swap debris not cleared")
  }
}
