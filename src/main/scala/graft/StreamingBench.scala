package graft

import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.functions._

/** Measured throughput/latency for the Structured-Streaming convert
  * path → SCALE.md: the streaming half has correctness twins
  * (StreamingSpec, q89's gated batch twin) but carried no recorded
  * rate, unlike every batch family.
  *
  * Two measurements, both on the deterministic 150k-line FlowLogCorpus
  * rendered as text files:
  *
  *  1. Drain throughput — `Trigger.AvailableNow` over N input files
  *     with `maxFilesPerTrigger` backpressure (the one-Lambda-
  *     invocation shape): wall-clock, micro-batch count, rows/s,
  *     files/s, from the sink's own progress records.
  *  2. Steady-state latency — a `Trigger.ProcessingTime` stream while
  *     files arrive one at a time: per-batch `triggerExecution` ms for
  *     the non-empty batches (the number a latency SLO is written
  *     against), median + max.
  *
  * A third argument switches on the AMORTIZATION mode (round-11
  * measurement): files are scaled to S3-object size (linesPerFile of
  * 10⁵–10⁶), the drip-latency stage is skipped, and the headline is
  * rows/s converging to the batch-ETL rate as the ~1.4 s per-batch
  * floor amortizes over big batches — the projection SCALE.md's
  * streaming section makes from the small-file floor table.
  *
  * Usage: tools/run_main.sh graft.StreamingBench [nFiles] [filesPerTrigger] [linesPerFile]
  */
object StreamingBench {

  def main(args: Array[String]): Unit = {
    val nFiles = args.headOption.map(_.toInt).getOrElse(50)
    val perTrigger = args.lift(1).map(_.toInt).getOrElse(10)
    val linesPerFile = args.lift(2).map(_.toLong)
    val spark =
      Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"), "graft-streambench")

    val root = graft.TempDirs.deleteOnExit(
      new java.io.File(
        sys.props("java.io.tmpdir"),
        s"graft_stream_bench_${spark.sparkContext.applicationId}"
      ).getPath
    )
    val inDir = s"$root/in"
    val totalRows =
      linesPerFile.map(_ * nFiles).getOrElse(graft.etl.FlowLogCorpus.Rows)
    graft.etl.FlowLogCorpus
      .lines(spark, totalRows)
      .repartition(nFiles)
      .write
      .mode("overwrite")
      .text(inDir)

    // ---- 1. AvailableNow drain throughput ----
    val t0 = System.nanoTime()
    val qs = graft.streaming.StreamingConvertJob.start(
      spark,
      graft.streaming.StreamingConvertJob.Config(
        inputDir = inDir,
        outputDir = s"$root/out",
        checkpointDir = s"$root/ckpt",
        quarantineDir = Some(s"$root/quarantine"),
        availableNow = true,
        maxFilesPerTrigger = Some(perTrigger)
      )
    )
    qs.foreach(_.awaitTermination())
    val drainSec = (System.nanoTime() - t0) / 1e9
    val main = qs.head
    val progresses = main.recentProgress.filter(_.numInputRows > 0)
    val batches = progresses.length
    val outRows = spark.read
      .parquet(s"$root/out")
      .count()
    println(
      f"[drain] files=$nFiles filesPerTrigger=$perTrigger batches=$batches " +
        f"wall=${drainSec}%.2f s rows=$totalRows out_rows=$outRows " +
        f"rows_per_sec=${totalRows / drainSec}%.0f files_per_sec=${nFiles / drainSec}%.1f"
    )

    if (linesPerFile.isDefined) { spark.stop(); return }

    // ---- 2. Steady-state micro-batch latency ----
    // fresh input dir; files drip in one at a time while a
    // ProcessingTime stream runs — per-batch triggerExecution is the
    // end-to-end micro-batch latency (read+parse+partitioned write)
    val dripSrc = new java.io.File(s"$root/in")
      .listFiles()
      .filter(_.getName.endsWith(".txt"))
      .sortBy(_.getName)
      .take(12)
    val inDir2 = s"$root/in2"
    new java.io.File(inDir2).mkdirs()
    val reader = spark.readStream.option("maxFilesPerTrigger", "1")
    val parsed = graft.etl.FlowLogParser.parse(reader.text(inDir2))
    val q2 = graft.etl.FlowLogParser
      .withPartitionKey(parsed.good)
      .drop("ts")
      .writeStream
      .format("parquet")
      .option("path", s"$root/out2")
      .option("checkpointLocation", s"$root/ckpt2")
      .partitionBy(graft.etl.FlowLogSchema.partitionColumns: _*)
      .outputMode("append")
      .trigger(Trigger.ProcessingTime("500 milliseconds"))
      .start()
    dripSrc.foreach { f =>
      java.nio.file.Files.copy(
        f.toPath,
        java.nio.file.Path.of(inDir2, f.getName)
      )
      Thread.sleep(700)
    }
    // let the final files commit
    Thread.sleep(3000)
    val latencies = q2.recentProgress
      .filter(_.numInputRows > 0)
      .map(p => p.durationMs.get("triggerExecution").toLong)
      .sorted
    q2.stop()
    if (latencies.nonEmpty) {
      val med = latencies(latencies.length / 2)
      println(
        s"[latency] non_empty_batches=${latencies.length} " +
          s"rows_per_batch=${totalRows / nFiles} " +
          s"trigger_exec_ms median=$med p_max=${latencies.last} min=${latencies.head}"
      )
    } else println("[latency] no non-empty batches captured")
    spark.stop()
  }
}
