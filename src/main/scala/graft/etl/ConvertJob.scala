package graft.etl

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Batch convert pipeline — the Spark-native equivalent of the reference's
  * Lambda handler path (reference `convert.go:41-95`, `main.go:152-219`):
  * read gzip'd/plain flow-log text → parse/validate/cast → route into
  * per-(account, dt) groups → write Snappy Parquet.
  *
  * Spark-first mapping (SURVEY.md §2.1):
  *   - the reference's per-key writer fan-out `wmap` (`convert.go:42,57-67`)
  *     is `DataFrameWriter.partitionBy("account","dt")` — FileFormatWriter
  *     performs exactly that per-key writer fan-out inside each task, with
  *     spill, so the plan is a narrow scan→project→write pipeline with NO
  *     shuffle (scales linearly with input at 100 TB).
  *   - Snappy + 128 MB row groups + dictionary encoding (`parquet.go:33-35`,
  *     `flowlog.go:16-28`) are Spark's parquet defaults.
  *   - Hive-style layout `account=…/dt=…` replaces the reference's
  *     `logs/{account}/{yyyy}/{mm}/{dd}` path (`convert.go:29-31`);
  *     semantics and pruning identical (SURVEY.md §7.4).
  */
object ConvertJob {

  final case class ConvertStats(goodRows: Long, quarantinedRows: Long)

  /** Read raw flow-log text (Hadoop's GzipCodec handles `.gz`
    * transparently — the analog of rlogs' S3GzipLines, `convert.go:44-45`).
    */
  def readRaw(spark: SparkSession, inPath: String): DataFrame =
    spark.read.text(inPath)

  /** Full convert: text in → partitioned parquet out. Returns the parsed
    * (pre-write) frame for further composition.
    *
    * @param quarantinePath side output for rejected lines (badRecordsPath
    *        analog); None = drop silently like `main.go:77-83` swallows.
    */
  def convert(
      spark: SparkSession,
      inPath: String,
      outPath: String,
      quarantinePath: Option[String] = None,
      mode: SaveMode = SaveMode.Append,
      filesPerPartition: Int = 1
  ): ConvertStats = {
    val parsed = FlowLogParser.parse(readRaw(spark, inPath))

    val withKeys = FlowLogParser
      .withPartitionKey(parsed.good)
      .drop("ts") // data files carry the 14 columns only, like parquet.go

    // goodRows rides the write job as an observed metric — a second
    // count() pass would read and gunzip the ENTIRE input again (at
    // 100 TB that doubles the job's I/O just for a statistic).
    import org.apache.spark.sql.Observation
    import org.apache.spark.sql.functions.{count, lit}
    val obs = Observation("convert_stats")
    writePartitioned(
      withKeys.observe(obs, count(lit(1)).as("good_rows")),
      outPath,
      mode,
      filesPerPartition
    )

    val quarantined = quarantinePath match {
      case Some(qp) =>
        val q = parsed.quarantined.cache()
        val n = q.count()
        if (n > 0) q.write.mode(SaveMode.Append).parquet(qp)
        q.unpersist()
        n
      case None => 0L
    }

    // empty-relation propagation can optimize the observe node away
    // entirely when the input has no good rows — an absent metric IS zero
    val good = obs.get.get("good_rows").map(_.asInstanceOf[Long]).getOrElse(0L)
    ConvertStats(good, quarantined)
  }

  /** THE partitioned-write recipe, shared by batch convert, the bench
    * query, and the oracle corpus so the layout can never drift between
    * them. One shuffle on the partition key before the fan-out write:
    * without it every task opens a writer per key it happens to see
    * (#tasks × #keys small files — the classic partitioned-write failure
    * at scale). The bounded salt splits hot (account, dt) keys across up
    * to filesPerPartition writers; maxRecordsPerFile caps file size
    * regardless. Mirrors the reference's one-file-per-(key, source)
    * layout (convert.go:72-73) with explicit control. The salt hashes
    * the row's own columns — a row-id-based salt would change on task
    * retry and let a recovered shuffle duplicate/drop rows.
    */
  /** `codec`: "snappy" is the reference's pinned choice (`parquet.go:35`)
    * and stays the default for byte-layout parity; "zstd" writes 1.8×
    * smaller at the same write/read speed on this data (measured table
    * in SCALE.md) — at production scale the storage and scan-I/O win
    * usually dominates, flip it per deployment.
    */
  def writePartitioned(
      df: DataFrame,
      outPath: String,
      mode: SaveMode,
      filesPerPartition: Int = 1,
      codec: String = "snappy"
  ): Unit = {
    import org.apache.spark.sql.functions.{col, lit, pmod, xxhash64}
    val partitionCols = FlowLogSchema.partitionColumns.map(col)
    // at the default filesPerPartition=1 the salt is pmod(·, 1) ≡ 0 —
    // skip the 14-column xxhash64 per row entirely (r16; same key
    // clustering, one file per key either way)
    val repartitionCols =
      if (filesPerPartition <= 1) partitionCols
      else
        partitionCols :+ pmod(
          xxhash64(FlowLogSchema.columns.map { case (n, _) => col(n) }: _*),
          lit(filesPerPartition)
        )
    df.repartition(repartitionCols: _*)
      .write
      .mode(mode)
      .option("maxRecordsPerFile", 5000000)
      .option("compression", codec)
      .partitionBy(FlowLogSchema.partitionColumns: _*)
      .parquet(outPath)
  }

  /** Re-read the converted table, the way downstream queries see it
    * (partition columns materialized from the path). The explicit schema
    * declares both partition columns as STRING, which makes Spark parse
    * the raw path values directly instead of type-inferring them — a
    * post-hoc cast could never recover `account=012345678901` once
    * inference had turned it into the number 12345678901 (AWS account
    * IDs may start with 0). Matches the reference's string DDL
    * (`template.yml:122-126`); pruning on (account, dt) is unaffected.
    */
  def readConverted(spark: SparkSession, outPath: String): DataFrame = {
    import org.apache.spark.sql.types.{StringType, StructField, StructType}
    val fullSchema = StructType(
      FlowLogSchema.schema.fields.toSeq ++
        FlowLogSchema.partitionColumns.map(StructField(_, StringType))
    )
    spark.read.schema(fullSchema).parquet(outPath)
  }
}
