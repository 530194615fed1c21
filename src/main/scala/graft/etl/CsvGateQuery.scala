package graft.etl

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

/** CSV corpus source: declared schema, PERMISSIVE type-failure routing
  * into a quarantine frame — the JsonlSource policy applied to the other
  * wire format corpora arrive in. Spark's CSV reader treats a row with
  * the wrong token COUNT as padding/truncation (nulls / dropped extras),
  * so "corrupt" here means what it means at scale: a field that fails
  * its declared type (the raw line is preserved, never dropped).
  */
object CsvSource {

  val CorruptCol = "_corrupt_record"

  private def corruptSchema(schema: StructType): StructType = {
    require(
      !schema.fieldNames.contains(CorruptCol),
      s"schema must not declare $CorruptCol — it is the corrupt-routing column"
    )
    StructType(schema.fields.toSeq :+ StructField(CorruptCol, StringType))
  }

  /** One cached pass serves both routes (two reads would double ingest
    * I/O at 100 TB — same rationale as JsonlSource.read).
    */
  def read(spark: SparkSession, path: String, schema: StructType): JsonlSource.Read = {
    val raw = spark.read
      .schema(corruptSchema(schema))
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", CorruptCol)
      .csv(path)
      .cache()
    JsonlSource.Read(
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

/** q66: the CSV source as a driver-gated query (q60's pattern for the
  * second wire format): synthesize CSV deterministically from
  * spark.range — quoted fields with embedded commas, empty-field nulls,
  * and type-corrupt rows — run the full CsvSource.read path, and return
  * per-category aggregates plus a quarantine-count row. The DuckDB
  * oracle never parses CSV: it recomputes routing from the generative
  * formula (corrupt iff i % 7 = 3; null score iff i % 13 = 5).
  */
object CsvGateQuery {

  private val Lines = 20000L

  private val schema = StructType(
    Seq(
      StructField("id", LongType),
      StructField("cat", StringType),
      StructField("score", LongType)
    )
  )

  /** `id,"c,<id%5>",<score>` — the quoted cat embeds the delimiter, so
    * any quote-handling fault shifts every downstream count; score is
    * `xx` (type-corrupt) on the i%7=3 rows and empty (null) on i%13=5.
    */
  private def syntheticCsv(spark: SparkSession): DataFrame =
    spark
      .range(0, Lines)
      .select(
        concat(
          col("id"),
          lit(",\"c,"),
          col("id") % 5,
          lit("\","),
          when(col("id") % 7 === 3, lit("xx"))
            .when(col("id") % 13 === 5, lit(""))
            .otherwise((col("id") * 3).cast("string"))
        ).as("value")
      )

  private def corpusDir(spark: SparkSession): String = synchronized {
    val dir = new java.io.File(
      sys.props("java.io.tmpdir"),
      s"graft_csv_gate_${spark.sparkContext.applicationId}"
    ).getPath
    if (!new java.io.File(dir, "_SUCCESS").exists())
      syntheticCsv(spark).write.mode(SaveMode.Overwrite).text(dir)
    graft.TempDirs.deleteOnExit(dir)
  }

  private def q66(spark: SparkSession, sfDir: String): DataFrame = {
    // cache lifetime rationale as in JsonlGateQuery.q60: the cached
    // parsed frame is the designed-in route around the corrupt-column-
    // only-scan restriction, deduped across invocations per JVM.
    val r = CsvSource.read(spark, corpusDir(spark), schema)
    val good = r.good
      .groupBy("cat")
      .agg(
        count(lit(1)).as("cnt"),
        sum(col("score")).as("sum_score"),
        (count(lit(1)) - count(col("score"))).as("null_scores")
      )
    val quarantined = r.quarantined
      .agg(count(lit(1)).as("cnt"))
      .select(
        lit("_corrupt").as("cat"),
        col("cnt"),
        lit(null).cast("long").as("sum_score"),
        lit(null).cast("long").as("null_scores")
      )
    good
      .select("cat", "cnt", "sum_score", "null_scores")
      .union(quarantined)
      .orderBy("cat")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q66_csv_ingest" -> q66
  )

  val oracleSql: Map[String, String] = Map(
    "q66_csv_ingest" ->
      s"""WITH g AS (SELECT unnest(generate_series(0, ${Lines - 1})) AS id),
         |good AS (
         |  SELECT 'c,' || (id % 5) AS cat,
         |         CASE WHEN id % 13 = 5 THEN NULL ELSE id * 3 END AS score
         |  FROM g WHERE id % 7 <> 3)
         |SELECT cat, count(*) AS cnt, CAST(sum(score) AS BIGINT) AS sum_score,
         |       count(*) - count(score) AS null_scores
         |FROM good GROUP BY cat
         |UNION ALL
         |SELECT '_corrupt' AS cat, count(*) AS cnt, CAST(NULL AS BIGINT) AS sum_score,
         |       CAST(NULL AS BIGINT) AS null_scores
         |FROM g WHERE id % 7 = 3
         |ORDER BY cat""".stripMargin
  )
}
