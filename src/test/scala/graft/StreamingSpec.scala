package graft

import graft.catalog.Partitions
import graft.streaming.{StreamingAggregates, StreamingConvertJob}
import java.nio.file.{Files, Paths, StandardCopyOption}

/** Streaming convert: AvailableNow drain, checkpointed idempotency
  * (re-run adds nothing), incremental pickup of new files, quarantine
  * side output, and catalog registration of the produced partitions.
  */
class StreamingSpec extends SparkSpec {

  private def copyInto(dir: String, name: String, src: String): Unit =
    Files.copy(
      Paths.get(src),
      Paths.get(dir, name),
      StandardCopyOption.REPLACE_EXISTING
    )

  test("AvailableNow convert: partitioned output, idempotent re-run, incremental files") {
    val base = tmpDir("graft-stream")
    val in = s"$base/in"; Files.createDirectories(Paths.get(in))
    val cfg = StreamingConvertJob.Config(
      inputDir = in,
      outputDir = s"$base/out",
      checkpointDir = s"$base/chk",
      quarantineDir = Some(s"$base/quarantine")
    )

    copyInto(in, "sample1.log", "/root/reference/samples/sample1.log")
    StreamingConvertJob.runAvailableNow(spark, cfg)
    val out1 = spark.read.parquet(cfg.outputDir)
    assert(out1.count() == 2)

    // re-run with no new input: the file-sink commit log must not re-add
    StreamingConvertJob.runAvailableNow(spark, cfg)
    assert(spark.read.parquet(cfg.outputDir).count() == 2)

    // a new file (gzip twin + one bad line file) arrives: only new rows
    copyInto(in, "sample2.log.gz", "/root/reference/samples/sample2.log.gz")
    Files.writeString(Paths.get(in, "bad.log"), "3 v3row only tokens\n2 too few\n")
    StreamingConvertJob.runAvailableNow(spark, cfg)
    assert(spark.read.parquet(cfg.outputDir).count() == 4)

    val q = spark.read.parquet(s"$base/quarantine")
    assert(q.count() == 2)

    // partition layout on disk is Hive-style (account=…/dt=…)
    val dirs = new java.io.File(cfg.outputDir).listFiles().map(_.getName)
    assert(dirs.exists(_.startsWith("account=123456789000")))
  }

  test("catalog: external table + ADD PARTITION registration + pruning query") {
    val base = tmpDir("graft-catalog")
    graft.etl.ConvertJob.convert(
      spark,
      "/root/reference/samples/sample1.log",
      s"$base/logs",
      None,
      org.apache.spark.sql.SaveMode.Overwrite
    )
    spark.sql("DROP TABLE IF EXISTS flowlogs_test")
    Partitions.createExternalTable(spark, "flowlogs_test", s"$base/logs")
    val n = Partitions.registerAll(spark, "flowlogs_test", s"$base/logs")
    assert(n == 1)
    val rows = spark
      .sql(
        "SELECT srcaddr, bytes FROM flowlogs_test " +
          "WHERE account = '123456789000' AND dt = '2018-11-04' ORDER BY bytes"
      )
      .collect()
    assert(rows.length == 2)
    assert(rows.map(_.getInt(1)).toSeq == Seq(553, 965))
    // registration is idempotent (ADD IF NOT EXISTS — main.go:177 parity)
    assert(Partitions.registerAll(spark, "flowlogs_test", s"$base/logs") == 1)
    spark.sql("DROP TABLE flowlogs_test")
  }

  test("streaming tumbling window agg with watermark over a file stream") {
    import org.apache.spark.sql.types._
    val base = tmpDir("graft-stream-agg")
    val in = s"$base/in"; Files.createDirectories(Paths.get(in))
    // minutes 0 and 12 → two 10-minute windows with 2 and 1 events
    Files.writeString(
      Paths.get(in, "events.csv"),
      "2024-01-01T00:01:00,1,click,1.5\n" +
        "2024-01-01T00:04:00,1,view,2.0\n" +
        "2024-01-01T00:12:00,2,click,3.0\n"
    )
    val schema = StructType(
      Seq(
        StructField("ts", TimestampType),
        StructField("user_id", LongType),
        StructField("event_type", StringType),
        StructField("value", DoubleType)
      )
    )
    val stream = spark.readStream.schema(schema).csv(in)
    val agg = StreamingAggregates.tumblingCounts(stream)
    val q = agg.writeStream
      .format("memory")
      .queryName("graft_tumbling")
      .outputMode("complete")
      .start()
    try {
      q.processAllAvailable()
      val rows = spark
        .sql("SELECT win_start, event_type, cnt FROM graft_tumbling ORDER BY win_start, event_type")
        .collect()
      assert(rows.length == 3)
      assert(rows.map(_.getLong(2)).toSeq == Seq(1L, 1L, 1L))
    } finally q.stop()
  }

  test("leading-zero account ids survive read-back and catalog registration") {
    val base = tmpDir("graft-zero")
    Files.writeString(
      Paths.get(base, "in.log"),
      "2 012345678901 eni-a 1.1.1.1 2.2.2.2 80 443 6 5 1000 1541375637 1541376057 ACCEPT OK\n"
    )
    graft.etl.ConvertJob.convert(
      spark,
      s"$base/in.log",
      s"$base/logs",
      None,
      org.apache.spark.sql.SaveMode.Overwrite
    )
    val back = graft.etl.ConvertJob.readConverted(spark, s"$base/logs")
    // partition-type inference would mangle this to "12345678901"
    assert(back.select("account").collect().map(_.getString(0)).toSeq ==
      Seq("012345678901"))
    spark.sql("DROP TABLE IF EXISTS fl_zero_spec")
    Partitions.createExternalTable(spark, "fl_zero_spec", s"$base/logs")
    assert(Partitions.registerAll(spark, "fl_zero_spec", s"$base/logs") == 1)
    assert(
      spark
        .sql("SELECT count(*) FROM fl_zero_spec WHERE account='012345678901'")
        .collect()(0)
        .getLong(0) == 1
    )
    spark.sql("DROP TABLE fl_zero_spec")
  }

  test("streaming session windows merge events within the gap") {
    import org.apache.spark.sql.types._
    val base = tmpDir("graft-stream-sess")
    val in = s"$base/in"; Files.createDirectories(Paths.get(in))
    // user 1: events at 00:00 and 00:10 (one session), then 01:00 (new
    // session after >30min gap); user 2: one event
    Files.writeString(
      Paths.get(in, "events.csv"),
      "2024-01-01T00:00:00,1,click,1.0\n" +
        "2024-01-01T00:10:00,1,view,1.0\n" +
        "2024-01-01T01:00:00,1,click,1.0\n" +
        "2024-01-01T00:05:00,2,view,1.0\n"
    )
    val schema = StructType(
      Seq(
        StructField("ts", TimestampType),
        StructField("user_id", LongType),
        StructField("event_type", StringType),
        StructField("value", DoubleType)
      )
    )
    val stream = spark.readStream.schema(schema).csv(in)
    val q = graft.streaming.StreamingAggregates
      .sessionCounts(stream)
      .writeStream
      .format("memory")
      .queryName("graft_sessions")
      .outputMode("complete")
      .start()
    try {
      q.processAllAvailable()
      val rows = spark
        .sql("SELECT user_id, cnt FROM graft_sessions ORDER BY user_id, session_start")
        .collect()
        .map(r => (r.getLong(0), r.getLong(1)))
        .toSeq
      assert(rows == Seq((1L, 2L), (1L, 1L), (2L, 1L)))
    } finally q.stop()
  }

  test("stream-stream join matches purchases to prior views within the hour") {
    import org.apache.spark.sql.types._
    val base = tmpDir("graft-ssjoin")
    val in = s"$base/in"; Files.createDirectories(Paths.get(in))
    // user 1: view at 00:00 then purchase at 00:30 (match);
    // user 1: purchase at 02:00 (view is 2h old -> no match);
    // user 2: purchase at 00:30 with no view (no match)
    Files.writeString(
      Paths.get(in, "events.csv"),
      "1,2024-01-01T00:00:00,1,view,0.0\n" +
        "2,2024-01-01T00:30:00,1,purchase,9.0\n" +
        "3,2024-01-01T02:00:00,1,purchase,9.0\n" +
        "4,2024-01-01T00:30:00,2,purchase,9.0\n"
    )
    val schema = StructType(
      Seq(
        StructField("event_id", LongType),
        StructField("ts", TimestampType),
        StructField("user_id", LongType),
        StructField("event_type", StringType),
        StructField("value", DoubleType)
      )
    )
    val stream = spark.readStream.schema(schema).csv(in)
    val q = graft.streaming.StreamingAggregates
      .purchaseViewJoin(stream)
      .writeStream
      .format("memory")
      .queryName("graft_ssjoin")
      .outputMode("append")
      .start()
    try {
      q.processAllAvailable()
      val rows = spark
        .sql("SELECT user_id, p_id, v_id FROM graft_ssjoin ORDER BY p_id")
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        .toSeq
      assert(rows == Seq((1L, 2L, 1L)), s"got $rows")
    } finally q.stop()
  }

  test("foreachBatch convert maintains the incremental summary batch-by-batch") {
    import graft.catalog.IncrementalAgg
    val base = tmpDir("graft-febatch")
    val in = s"$base/in"; Files.createDirectories(Paths.get(in))
    (1 to 3).foreach(i => copyInto(in, s"f$i.log", "/root/reference/samples/sample1.log"))
    val cfg = StreamingConvertJob.Config(
      inputDir = in,
      outputDir = s"$base/out",
      checkpointDir = s"$base/chk",
      maxFilesPerTrigger = Some(1) // 3 data micro-batches
    )
    val summary = s"$base/summary"

    val q = StreamingConvertJob.startWithSummary(spark, cfg, summary)
    q.awaitTermination()
    assert(q.recentProgress.count(_.numInputRows > 0) == 3)

    // base table holds all converted rows; summary equals a fresh full
    // recompute of the base after the last batch
    val converted = graft.etl.ConvertJob.readConverted(spark, cfg.outputDir)
    assert(converted.count() == 6) // 3 files × 2 data rows
    val full = IncrementalAgg
      .partials(converted)
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getAs[Long]("n_rows")))
      .toSet
    val got = spark.read
      .parquet(summary)
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getAs[Long]("n_rows")))
      .toSet
    assert(got == full, s"summary $got != recompute $full")

    // restart over the same drained input: no new batches, nothing changes
    val q2 = StreamingConvertJob.startWithSummary(spark, cfg, summary)
    q2.awaitTermination()
    assert(graft.etl.ConvertJob.readConverted(spark, cfg.outputDir).count() == 6)
    assert(spark.read.parquet(summary).collect().length == full.size)
  }

  test("maxFilesPerTrigger backpressure: backlog drains in capped micro-batches with per-batch registration") {
    import org.apache.spark.sql.streaming.StreamingQueryListener
    import org.apache.spark.sql.streaming.StreamingQueryListener._
    val base = tmpDir("graft-backpressure")
    val in = s"$base/in"; Files.createDirectories(Paths.get(in))
    // a 6-file backlog (the reference's "many S3 notifications queued"
    // shape); maxFilesPerTrigger=2 is the concurrency-cap analog
    // (template.yml:35-37) and must yield exactly 3 data micro-batches
    (1 to 6).foreach(i => copyInto(in, s"backlog$i.log", "/root/reference/samples/sample1.log"))
    val cfg = StreamingConvertJob.Config(
      inputDir = in,
      outputDir = s"$base/out",
      checkpointDir = s"$base/chk",
      maxFilesPerTrigger = Some(2)
    )

    spark.sql("DROP TABLE IF EXISTS flowlogs_bp")
    Partitions.createExternalTable(spark, "flowlogs_bp", cfg.outputDir)

    // per-batch partition registration, as the reference registers after
    // every Lambda invocation (main.go:169-177): a listener registers the
    // output's partitions after each committed data batch
    val registrations = new java.util.concurrent.CopyOnWriteArrayList[Int]()
    val listener = new StreamingQueryListener {
      override def onQueryStarted(e: QueryStartedEvent): Unit = ()
      override def onQueryProgress(e: QueryProgressEvent): Unit =
        if (e.progress.numInputRows > 0)
          registrations.add(Partitions.registerAll(spark, "flowlogs_bp", cfg.outputDir))
      override def onQueryTerminated(e: QueryTerminatedEvent): Unit = ()
    }
    spark.streams.addListener(listener)
    try {
      val queries = StreamingConvertJob.start(spark, cfg)
      queries.foreach(_.awaitTermination())
      val batches = queries.head.recentProgress.filter(_.numInputRows > 0)
      assert(
        batches.length == 3,
        s"expected 3 capped micro-batches, saw input rows ${batches.map(_.numInputRows).toSeq}"
      )
      // numInputRows counts raw text lines: 6 files × (1 header + 2 data)
      assert(batches.map(_.numInputRows).sum == 18)

      // exactly-once: draining the same backlog again adds nothing
      StreamingConvertJob.runAvailableNow(spark, cfg)
      assert(spark.read.parquet(cfg.outputDir).count() == 12)

      // listener events are async — allow them to drain before asserting
      val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
      while (registrations.size < 3 && System.nanoTime() < deadline)
        Thread.sleep(50)
      assert(registrations.size >= 3, s"per-batch registrations: ${registrations.size}")
      // each registration is idempotent over the same single partition
      assert(registrations.toArray.forall(_ == 1))
      assert(spark.sql("SELECT count(*) FROM flowlogs_bp").head().getLong(0) == 12)
    } finally {
      spark.streams.removeListener(listener)
      spark.sql("DROP TABLE IF EXISTS flowlogs_bp")
    }
  }

  test("stream-static join enriches each micro-batch against a batch dimension") {
    import org.apache.spark.sql.types._
    val base = tmpDir("graft-stream-static")
    val in = s"$base/in"; Files.createDirectories(Paths.get(in))
    Files.writeString(
      Paths.get(in, "events.csv"),
      "2024-01-01T00:01:00,1,click,1.0\n" +
        "2024-01-01T00:02:00,2,view,2.0\n" +
        "2024-01-01T00:03:00,9,click,3.0\n" // no dim row: inner join drops
    )
    val schema = StructType(
      Seq(
        StructField("ts", TimestampType),
        StructField("user_id", LongType),
        StructField("event_type", StringType),
        StructField("value", DoubleType)
      )
    )
    import spark.implicits._
    val dim = Seq((1L, "gold"), (2L, "basic")).toDF("user_id", "tier")
    val stream = spark.readStream.schema(schema).csv(in)
    val q = StreamingAggregates
      .enrichWithStatic(stream, dim, "user_id")
      .writeStream
      .format("memory")
      .queryName("graft_enriched")
      .outputMode("append")
      .start()
    try {
      q.processAllAvailable()
      val rows = spark
        .sql("SELECT user_id, tier FROM graft_enriched ORDER BY user_id")
        .collect()
        .map(r => (r.getLong(0), r.getString(1)))
        .toSeq
      assert(rows == Seq((1L, "gold"), (2L, "basic")))
    } finally q.stop()
  }

  test("streaming as-of enrichment equals the batch operator; dim re-resolves per batch") {
    import org.apache.spark.sql.types._
    import org.apache.spark.sql.functions._
    val base = tmpDir("graft-stream-asof")
    val in = s"$base/in"; Files.createDirectories(Paths.get(in))
    val out = s"$base/out"
    val schema = StructType(
      Seq(
        StructField("euser", LongType),
        StructField("eid", LongType),
        StructField("et", LongType)
      )
    )
    import spark.implicits._
    // versioned dim, MUTABLE across batches (a var the closure re-resolves)
    var dimRows = Seq((1L, 100L, "v1a"), (2L, 150L, "v2a"))
    def dim() = dimRows.toDF("duser", "dt_us", "dver")
    val stream = spark.readStream.schema(schema).csv(in)
    val q = graft.streaming.StreamingAggregates
      .asOfEnrichWriter(stream, () => dim(), "euser", "duser", "et", "dt_us", out)
      .start()
    try {
      // drop 1: user 1 at t=120 → v1a(100); user 2 at t=140 → no version yet
      Files.writeString(Paths.get(in, "d1.csv"), "1,10,120\n2,11,140\n")
      q.processAllAvailable()
      // dim gains a version BETWEEN batches (vt=200, after drop-1 times)
      dimRows = dimRows :+ ((1L, 200L, "v1b"))
      // drop 2: user 1 at t=250 → v1b(200); user 2 at t=160 → v2a(150)
      Files.writeString(Paths.get(in, "d2.csv"), "1,12,250\n2,13,160\n")
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.read
      .parquet(out)
      .select("eid", "dver")
      .collect()
      .map(r => (r.getLong(0), Option(r.getString(1))))
      .sortBy(_._1)
      .toSeq
    assert(
      got == Seq(
        (10L, Some("v1a")),
        (11L, None),
        (12L, Some("v1b")),
        (13L, Some("v2a"))
      ),
      got.mkString(", ")
    )
    // batch twin: the SAME operator over the full event set + final dim
    // (the new version's vt postdates drop-1 events, so equality holds)
    val events = Seq((1L, 10L, 120L), (2L, 11L, 140L), (1L, 12L, 250L), (2L, 13L, 160L))
      .toDF("euser", "eid", "et")
    val batch = graft.plans.AsOf
      .join(events, dim(), "euser", "duser", "et", "dt_us")
      .select("eid", "dver")
      .collect()
      .map(r => (r.getLong(0), Option(r.getString(1))))
      .sortBy(_._1)
      .toSeq
    assert(got == batch)
  }

  test("streaming dedup within watermark drops in-stream duplicates") {
    import org.apache.spark.sql.types._
    val base = tmpDir("graft-stream-dedup")
    val in = s"$base/in"; Files.createDirectories(Paths.get(in))
    Files.writeString(
      Paths.get(in, "events.csv"),
      "2024-01-01T00:01:00,1,click,1.0\n" +
        "2024-01-01T00:02:00,1,click,9.9\n" + // dup key within watermark
        "2024-01-01T00:03:00,2,view,2.0\n"
    )
    val schema = StructType(
      Seq(
        StructField("ts", TimestampType),
        StructField("user_id", LongType),
        StructField("event_type", StringType),
        StructField("value", DoubleType)
      )
    )
    val stream = spark.readStream.schema(schema).csv(in)
    val q = StreamingAggregates
      .dedupWithinWatermark(stream)
      .writeStream
      .format("memory")
      .queryName("graft_dedup")
      .outputMode("append")
      .start()
    try {
      q.processAllAvailable()
      assert(spark.sql("SELECT * FROM graft_dedup").count() == 2)
    } finally q.stop()
  }
}
