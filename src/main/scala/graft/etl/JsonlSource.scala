package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** JSON-lines corpus source — the wire format LLM training corpora
  * actually arrive in (one JSON document per line, usually gzip'd;
  * gzip is transparent here exactly as for the flow-log text source).
  *
  * Scale rules this encodes:
  *  - the schema is DECLARED, never inferred: schema inference is a
  *    full extra pass over the input before the real read, and its
  *    result depends on which files exist today (the SchemaEvolution
  *    argument, applied to ingestion);
  *  - corrupt lines are kept, loudly, not dropped: PERMISSIVE mode
  *    routes any unparseable line's raw text into a corrupt-record
  *    column, and the caller gets it as a quarantine frame — the same
  *    side-output policy as the flow-log parser (`FlowLogParser`
  *    quarantine; deviation from the reference's abort-the-object
  *    documented at SURVEY §7.4).
  */
object JsonlSource {

  val CorruptCol = "_corrupt_record"

  /** Declared schema + the corrupt-record column; loud if the caller's
    * schema already claims that name (the routing filters would then
    * misclassify every row).
    */
  private def corruptSchema(schema: StructType): StructType = {
    require(
      !schema.fieldNames.contains(CorruptCol),
      s"schema must not declare $CorruptCol — it is the corrupt-routing column"
    )
    StructType(schema.fields.toSeq :+ StructField(CorruptCol, StringType))
  }

  /** `release()` drops the shared scan cache once both frames are
    * consumed — a long-lived session ingesting many corpora must not
    * accumulate executor storage.
    */
  final case class Read(good: DataFrame, quarantined: DataFrame, private val raw: DataFrame) {
    def release(): Unit = { raw.unpersist(); () }
  }

  /** Streaming ingest: corpora land incrementally (a crawler drop per
    * hour), so the same declared-schema + corrupt-routing read runs as
    * a file-source stream. One `foreachBatch` query SPLITS each batch
    * into the good and quarantine sinks from a single cached read —
    * two independent streaming queries over the source would each keep
    * their own file log and read every input file twice. AvailableNow
    * by default (the drain-and-stop shape); the checkpoint makes
    * re-runs incremental.
    */
  def streamIngest(
      spark: SparkSession,
      inPath: String,
      schema: StructType,
      goodPath: String,
      quarantinePath: String,
      checkpointDir: String
  ): org.apache.spark.sql.streaming.StreamingQuery = {
    val withCorrupt = corruptSchema(schema)
    spark.readStream
      .schema(withCorrupt)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", CorruptCol)
      .json(inPath)
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        batch.persist()
        try {
          batch
            .filter(col(CorruptCol).isNull)
            .select(schema.fieldNames.map(col).toSeq: _*)
            .write
            .mode("append")
            .parquet(goodPath)
          batch
            .filter(col(CorruptCol).isNotNull)
            .select(col(CorruptCol).as("raw_line"))
            .write
            .mode("append")
            .parquet(quarantinePath)
        } finally batch.unpersist()
        ()
      }
      .start()
  }

  /** Read JSONL under the declared schema. `good` carries the schema
    * columns for rows that parsed; `quarantined` carries the raw line
    * of every row that did not. Both derive from ONE pass (a cached
    * scan serves both filters; at 100 TB the alternative — two reads —
    * doubles ingest I/O).
    */
  def read(spark: SparkSession, path: String, schema: StructType): Read = {
    val withCorrupt = corruptSchema(schema)
    val raw = spark.read
      .schema(withCorrupt)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", CorruptCol)
      .json(path)
      .cache()
    Read(
      good = raw
        .filter(col(CorruptCol).isNull)
        .select(schema.fieldNames.map(col).toSeq: _*),
      quarantined = raw
        .filter(col(CorruptCol).isNotNull)
        .select(col(CorruptCol).as("raw_line")),
      raw = raw
    )
  }
}
