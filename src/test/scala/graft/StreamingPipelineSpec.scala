package graft

import graft.streaming.StreamingPipeline
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types.{LongType, StringType, StructType}

/** The composed end-to-end STREAMING curation pipeline (r15 verdict
  * stretch): file-source JSONL ingest → NFC → StreamingDedup keyed
  * state → static keep-list → leakage-safe split, run once under
  * `Trigger.AvailableNow`, must equal the batch q177 pipeline on the
  * same corpus — per-document assignments AND the packed per-split
  * stats (the streamed survivors finalize through
  * `Pipeline.packStats` verbatim, the batch-epoch packing a production
  * stream runs).
  */
class StreamingPipelineSpec extends SparkSpec {

  test("AvailableNow JSONL ingest through the composed stream equals batch q177") {
    // transformWithState requires the RocksDB provider (Sessions.local
    // pins it; the shared test session does not) — the
    // StreamingDedupSpec convention, restored after the test
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(
      key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
    )
    try runPipeline()
    finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None    => spark.conf.unset(key)
    }
  }

  /** Crash/restart for the COMPOSED pipeline (the StreamingDedupSpec
    * convention, extended end-to-end): run phase 1 (the full corpus)
    * through curate() into a parquet sink + checkpoint, STOP the
    * query, then restart a brand-new query from the same checkpoint
    * and deliver phase 2 — exact COPIES of 10 phase-1 documents under
    * new doc_ids (same text ⇒ same digest). The copies must route
    * is_new=false off the RESTORED digest state and be dropped by the
    * pipeline: the sink gains ZERO rows across the restart. Sharp by
    * construction — a lost state store would mark every copy new, and
    * (unlabeled ⇒ keep-list-exempt) each would survive into the sink.
    */
  test("restart from checkpoint: re-delivered duplicates add zero survivors") {
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(
      key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
    )
    try {
      val dir = "/root/testdata/sf0.001"
      val docs = graft.queries.Tables
        .table(spark, dir, "documents")
        .select(col("doc_id"), col("text"))
      val base = tmpDir("graft-spipe-restart")
      val in = base + "/in"
      val out = base + "/out"
      val ckpt = base + "/ckpt"
      java.nio.file.Files.createDirectories(java.nio.file.Paths.get(in))
      docs.coalesce(1).write.mode("overwrite").json(s"$in/phase1")

      val labels = graft.llm.Clustering.cachedClusterLabels(spark, dir)
      val quality = docs.select(
        col("doc_id"),
        (round(
          length(regexp_replace(col("text"), "[^a-z]", ""))
            .cast("double") / nullif(length(col("text")), lit(0)).cast("double"),
          4
        ) + 0.0).as("reward")
      )
      val kept = labels
        .join(quality, "doc_id")
        .groupBy("cluster_id")
        .agg(max_by(col("doc_id"), struct(col("reward"), -col("doc_id"))).as("kept_id"))

      val schema =
        new StructType().add("doc_id", LongType).add("text", StringType)
      def start() = StreamingPipeline
        .curate(
          spark.readStream.schema(schema).option("recursiveFileLookup", "true").json(in),
          labels,
          kept
        )
        .writeStream
        .format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(Trigger.ProcessingTime(0))
        .start()
      val sinkSchema = new StructType()
        .add("doc_id", LongType)
        .add("cluster_id", LongType)
        .add("split", StringType)
      def survivors(): Set[(Long, Long, String)] =
        spark.read
          .schema(sinkSchema)
          .parquet(out)
          .collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
          .toSet

      val q1 = start()
      val phase1 =
        try { q1.processAllAvailable(); survivors() }
        finally q1.stop()
      // phase 1 must equal the batch pipeline's assignments
      val batch = graft.llm.Pipeline
        .assignedFrame(spark, dir)
        .select("doc_id", "cluster_id", "split")
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
        .toSet
      assert(phase1 === batch)

      // phase 2: exact copies of 10 phase-1 documents under fresh ids
      import spark.implicits._
      docs
        .orderBy("doc_id")
        .limit(10)
        .select((col("doc_id") + 1000000L).as("doc_id"), col("text"))
        .coalesce(1)
        .write
        .mode("overwrite")
        .json(s"$in/phase2")
      val q2 = start()
      val all =
        try { q2.processAllAvailable(); survivors() }
        finally q2.stop()
      assert(all === phase1, "re-delivered duplicates leaked into the sink")
    } finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None    => spark.conf.unset(key)
    }
  }

  private def runPipeline(): Unit = {
    val dir = "/root/testdata/sf0.001"
    val docs = graft.queries.Tables
      .table(spark, dir, "documents")
      .select(col("doc_id"), col("text"))

    // the ingest corpus: the documents table as JSONL files (the q60
    // routing shape), two part files consumed in one AvailableNow pass
    // — all rows of a digest arrive in one micro-batch, so
    // StreamingDedup's per-batch min-doc_id keeper matches q25's
    // global min (the StreamingDedupSpec arrival-order contract)
    val in = tmpDir("graft-spipe") + "/in"
    docs.repartition(2).write.mode("overwrite").json(in)

    // static side inputs, spelled exactly as q177 builds them: the
    // session cluster labels and the per-cluster quality winners
    // (reward on the ORIGINAL text — q50b's contract)
    val labels = graft.llm.Clustering.cachedClusterLabels(spark, dir)
    val quality = docs.select(
      col("doc_id"),
      (round(
        length(regexp_replace(col("text"), "[^a-z]", ""))
          .cast("double") / nullif(length(col("text")), lit(0)).cast("double"),
        4
      ) + 0.0).as("reward")
    )
    val kept = labels
      .join(quality, "doc_id")
      .groupBy("cluster_id")
      .agg(
        max_by(col("doc_id"), struct(col("reward"), -col("doc_id"))).as("kept_id")
      )

    val schema =
      new StructType().add("doc_id", LongType).add("text", StringType)
    val stream = spark.readStream.schema(schema).json(in)
    val q = StreamingPipeline
      .curate(stream, labels, kept)
      .writeStream
      .format("memory")
      .queryName("graft_spipe")
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
    try q.awaitTermination()
    finally q.stop()

    val streamedAssign = spark
      .table("graft_spipe")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
      .toSet
    val batchAssign = graft.llm.Pipeline
      .assignedFrame(spark, dir)
      .select("doc_id", "cluster_id", "split")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
      .toSet
    assert(streamedAssign.nonEmpty)
    assert(streamedAssign === batchAssign)

    // finalize the STREAMED survivors through the identical batch
    // packing epoch and pin the hash-gated q177 output. The survivor
    // frame re-enters as a LocalRelation (collect + toDF): joining the
    // memory-sink view into packStats' two-branch self-join trips
    // Catalyst's conflicting-reference resolution on the re-expanded
    // view — and re-entry is the production shape anyway (the packing
    // epoch reads the curated SINK, not the live query).
    import spark.implicits._
    val counts = graft.llm.Pipeline
      .baseFrame(spark, dir)
      .select("doc_id", "n_tokens", "n_chars")
    val finalizeIn = spark
      .table("graft_spipe")
      .join(counts, "doc_id")
      .select("doc_id", "n_tokens", "n_chars", "split")
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getString(3)))
      .toSeq
      .toDF("doc_id", "n_tokens", "n_chars", "split")
    val streamedStats = graft.llm.Pipeline
      .packStats(finalizeIn)
      .collect()
      .map(_.toSeq)
      .toSeq
    val gate = SparkEntry
      .queries("q177_pipeline_end_to_end")(spark, dir)
      .collect()
      .map(_.toSeq)
      .toSeq
    assert(streamedStats === gate)
  }
}
