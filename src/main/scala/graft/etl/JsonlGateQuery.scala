package graft.etl

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

/** q60: the JSONL corpus source as a driver-gated query (the q00 pattern
  * applied to ingestion): synthesize a JSONL file deterministically from
  * spark.range — including INTENTIONALLY corrupt lines (truncated
  * objects, non-JSON garbage) — run the full JsonlSource.read path
  * (declared schema, PERMISSIVE corrupt-routing, good/quarantine split),
  * and return per-category aggregates plus a quarantine-count row.
  *
  * The DuckDB oracle never parses JSON: it recomputes the expected
  * routing from the generative formula (line i is corrupt iff i % 7 = 3).
  * Any divergence in Spark's parse/routing — a "corrupt" line accepted, a
  * good line quarantined, a field misparsed — shifts a count or a sum and
  * fails the hash, so the SOURCE itself is value-gated, not just
  * spec-tested (JsonlSourceSpec keeps the content-level checks).
  */
object JsonlGateQuery {

  private val Lines = 20000L

  private val schema = StructType(
    Seq(
      StructField("id", LongType),
      StructField("cat", StringType),
      StructField("score", LongType)
    )
  )

  /** One JSON document per line; every field a pure function of the row
    * id (integers only — no float rendering to diverge on).
    */
  private def syntheticJsonl(spark: SparkSession): DataFrame =
    spark
      .range(0, Lines)
      .select(
        when(
          col("id") % 7 === 3,
          // two corrupt shapes: garbage prefix and a truncated object —
          // both unambiguously invalid JSON on any parser
          when(col("id") % 2 === 0, lit("not json {"))
            .otherwise(concat(lit("{\"id\": "), col("id")))
        ).otherwise(
          concat(
            lit("{\"id\": "),
            col("id"),
            lit(", \"cat\": \"c"),
            col("id") % 5,
            lit("\", \"score\": "),
            col("id") * 3,
            lit("}")
          )
        ).as("value")
      )

  /** Write the corpus once per JVM (appId-suffixed, `_SUCCESS`-guarded):
    * repeated invocations (Bench's warm-up + iterations) then read the
    * SAME immutable files, so JsonlSource's cached scan dedups in the
    * CacheManager instead of accumulating one entry per call.
    */
  private def corpusDir(spark: SparkSession): String = synchronized {
    val dir = new java.io.File(
      sys.props("java.io.tmpdir"),
      s"graft_jsonl_gate_${spark.sparkContext.applicationId}"
    ).getPath
    if (!new java.io.File(dir, "_SUCCESS").exists())
      syntheticJsonl(spark).write.mode(SaveMode.Overwrite).text(dir)
    graft.TempDirs.deleteOnExit(dir)
  }

  private def q60(spark: SparkSession, sfDir: String): DataFrame = {
    // the Read's cache must stay LIVE until the result materializes:
    // Spark refuses a query that selects only the corrupt-record column
    // of a raw JSON scan (QUERY_ONLY_CORRUPT_RECORD_COLUMN) — the cached
    // parsed frame is the documented (and JsonlSource's designed-in) way
    // through, so an early release() would resurrect the restriction.
    // The 20k-row cache is JVM-lifetime and deduped across invocations.
    val r = JsonlSource.read(spark, corpusDir(spark), schema)
    val good = r.good
      .groupBy("cat")
      .agg(count(lit(1)).as("cnt"), sum(col("score")).as("sum_score"))
    val quarantined = r.quarantined
      .agg(count(lit(1)).as("cnt"))
      .select(
        lit("_corrupt").as("cat"),
        col("cnt"),
        lit(null).cast("long").as("sum_score")
      )
    good.select("cat", "cnt", "sum_score").union(quarantined).orderBy("cat")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q60_jsonl_ingest" -> q60
  )

  /** Closed-form replay of the generative formula — the routing decision
    * (i % 7 = 3 ⇒ corrupt) is recomputed, never re-parsed.
    */
  val oracleSql: Map[String, String] = Map(
    "q60_jsonl_ingest" ->
      s"""WITH g AS (SELECT unnest(generate_series(0, ${Lines - 1})) AS id),
         |good AS (
         |  SELECT 'c' || (id % 5) AS cat, id * 3 AS score
         |  FROM g WHERE id % 7 <> 3)
         |SELECT cat, count(*) AS cnt, CAST(sum(score) AS BIGINT) AS sum_score
         |FROM good GROUP BY cat
         |UNION ALL
         |SELECT '_corrupt' AS cat, count(*) AS cnt, CAST(NULL AS BIGINT) AS sum_score
         |FROM g WHERE id % 7 = 3
         |ORDER BY cat""".stripMargin
  )
}
