package graft.streaming

import graft.etl.{FlowLogParser, FlowLogSchema}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Structured-Streaming convert — the Spark-native form of the reference's
  * event-driven Lambda (reference `main.go:67-84,152-173`): each S3
  * notification there is one micro-batch here; `Trigger.AvailableNow`
  * reproduces the drain-and-stop shape of a single Lambda invocation, a
  * processing-time trigger gives the continuous service the reference
  * approximates with concurrent invocations.
  *
  * Differences by design (SURVEY.md §2.3):
  *  - exactly-once file output via the checkpointed file-sink commit log —
  *    the reference's temp-file+upload has a crash window between upload
  *    (`convert.go:87`) and DDL registration (`main.go:177`);
  *  - no watermark: like the reference, a record lands in whatever
  *    (account, dt) partition its own start_ts names, however late it
  *    arrives (`convert.go:20-27`);
  *  - bad lines go to a quarantine stream instead of aborting the object
  *    (`convert.go:48-50`) — loud, not silent.
  *
  * The plan is a narrow scan→parse→project→write pipeline: NO shuffle at
  * any scale; throughput scales linearly with executors, backpressure via
  * maxFilesPerTrigger (the analog of the reference's concurrency cap,
  * `template.yml:35-37`).
  */
object StreamingConvertJob {

  final case class Config(
      inputDir: String,
      outputDir: String,
      checkpointDir: String,
      quarantineDir: Option[String] = None,
      availableNow: Boolean = true,
      maxFilesPerTrigger: Option[Int] = None
  )

  /** Start the convert stream (and, if configured, the quarantine stream).
    * Returns the started queries; callers await/stop them.
    */
  def start(spark: SparkSession, config: Config): Seq[StreamingQuery] = {
    val reader = spark.readStream
    config.maxFilesPerTrigger.foreach(n => reader.option("maxFilesPerTrigger", n))
    val raw = reader.text(config.inputDir)

    val parsed = FlowLogParser.parse(raw)
    val withKeys = FlowLogParser.withPartitionKey(parsed.good).drop("ts")

    val trigger =
      if (config.availableNow) Trigger.AvailableNow()
      else Trigger.ProcessingTime("10 seconds")

    val main = withKeys.writeStream
      .format("parquet")
      .option("path", config.outputDir)
      .option("checkpointLocation", config.checkpointDir)
      .partitionBy(FlowLogSchema.partitionColumns: _*)
      .outputMode("append")
      .trigger(trigger)
      .start()

    val quarantine = config.quarantineDir.map { qdir =>
      parsed.quarantined.writeStream
        .format("parquet")
        .option("path", qdir)
        .option("checkpointLocation", qdir + "_checkpoint")
        .outputMode("append")
        .trigger(trigger)
        .start()
    }

    Seq(main) ++ quarantine
  }

  /** Drain-and-stop: run all configured streams to completion of available
    * input (the one-Lambda-invocation shape) and return row counts seen.
    */
  def runAvailableNow(spark: SparkSession, config: Config): Unit = {
    val queries = start(spark, config.copy(availableNow = true))
    queries.foreach(_.awaitTermination())
  }

  /** Convert with a `foreachBatch` sink — the custom-per-batch-logic
    * surface the declarative file sink cannot express: each micro-batch
    * appends to the partitioned base table AND refreshes the
    * per-partition summary (`catalog.IncrementalAgg`) for exactly the
    * partitions that batch touched, so the summary tracks the base
    * table batch-by-batch with no history rescans.
    *
    * Semantics, honestly: `foreachBatch` trades the file sink's commit
    * log for arbitrary logic, so Spark replays an uncommitted batch
    * after a crash (at-least-once). A per-batch commit marker under the
    * checkpoint narrows the duplicate-append window to the instants
    * between append and marker creation; the summary refresh is
    * idempotent and recomputes FROM the base table, so summary and base
    * can never drift from each other regardless of replays. When plain
    * partitioned output with exactly-once is all that's needed, use
    * [[start]] (the commit-log sink) — this job is for multi-action
    * batches.
    */
  def startWithSummary(
      spark: SparkSession,
      config: Config,
      summaryPath: String
  ): StreamingQuery = {
    import org.apache.hadoop.fs.Path
    import org.apache.spark.sql.{DataFrame, SaveMode}
    val reader = spark.readStream
    config.maxFilesPerTrigger.foreach(n => reader.option("maxFilesPerTrigger", n))
    val withKeys = FlowLogParser
      .withPartitionKey(FlowLogParser.parse(reader.text(config.inputDir)).good)
      .drop("ts")

    val trigger =
      if (config.availableNow) Trigger.AvailableNow()
      else Trigger.ProcessingTime("10 seconds")

    withKeys.writeStream
      .outputMode("append")
      .option("checkpointLocation", config.checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val s = batch.sparkSession
        val fs = new Path(config.outputDir)
          .getFileSystem(s.sparkContext.hadoopConfiguration)
        val marker =
          new Path(s"${config.checkpointDir}/graft_batch_commits/$batchId")
        batch.persist()
        try {
          // partitions this batch touches — bounded by (accounts × days)
          // per batch, a handful, never data-sized
          val touched = batch
            .select(FlowLogSchema.partitionColumns.map(batch.col): _*)
            .distinct()
            .collect()
            .map(r => (r.getString(0), r.getString(1)))
            .toSeq
          if (touched.nonEmpty) {
            if (!fs.exists(marker)) { // replayed batch: skip the append
              batch.write
                .mode(SaveMode.Append)
                .partitionBy(FlowLogSchema.partitionColumns: _*)
                .parquet(config.outputDir)
              fs.mkdirs(marker)
            }
            graft.catalog.IncrementalAgg
              .update(s, config.outputDir, summaryPath, touched)
          }
        } finally batch.unpersist()
        ()
      }
      .start()
  }

  /** Drain available input, then retire the output for batch consumption:
    * drop the sink's `_spark_metadata` log and compact micro-batch file
    * debris (each trigger leaves one file per touched partition — a
    * steady stream accretes thousands). Terminal by contract: do not
    * point this sink at the output again afterwards
    * (Maintenance.retireStreamOutput scaladoc has the full rationale).
    * Returns the number of partitions compacted.
    */
  def runAvailableNowAndRetire(
      spark: SparkSession,
      config: Config,
      minFiles: Int = 2
  ): Int = {
    runAvailableNow(spark, config)
    graft.catalog.Maintenance.retireStreamOutput(spark, config.outputDir, minFiles)
  }

  /** Streaming CDC apply: corrections arrive as flow-log text files
    * (late fixes, re-delivered batches with amended fields) and each
    * micro-batch MERGES into an existing store via
    * `Maintenance.upsert` — rows with matching `keyCols` are replaced,
    * new keys insert, only update-named partitions rewrite. The
    * streaming twin of q84's batch CDC reduction: the file source +
    * checkpoint give exactly-once BATCHES, and upsert itself is
    * idempotent per batch (re-applying the same keys yields the same
    * state), so a replayed batch after a crash converges instead of
    * duplicating — the property an append sink needs commit markers
    * for, MERGE gets from its semantics.
    *
    * `config.outputDir` is the EXISTING store being corrected (not a
    * fresh sink), so this does not interact with any `_spark_metadata`
    * sink log — reads go through the catalog/path listing as with
    * every Maintenance job.
    */
  def startUpsertApply(
      spark: SparkSession,
      config: Config,
      keyCols: Seq[String]
  ): StreamingQuery = {
    val reader = spark.readStream
    config.maxFilesPerTrigger.foreach(n => reader.option("maxFilesPerTrigger", n))
    val withKeys = FlowLogParser
      .withPartitionKey(FlowLogParser.parse(reader.text(config.inputDir)).good)
      .drop("ts")
    val trigger =
      if (config.availableNow) Trigger.AvailableNow()
      else Trigger.ProcessingTime("10 seconds")
    withKeys.writeStream
      .outputMode("append")
      .option("checkpointLocation", config.checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        if (!batch.isEmpty) {
          graft.catalog.Maintenance
            .upsert(batch.sparkSession, config.outputDir, batch, keyCols)
        }
        ()
      }
      .start()
  }

  def runUpsertApplyAvailableNow(
      spark: SparkSession,
      config: Config,
      keyCols: Seq[String]
  ): Unit = {
    val q = startUpsertApply(spark, config.copy(availableNow = true), keyCols)
    q.awaitTermination()
  }
}
