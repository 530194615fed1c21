package graft.etl

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** q00: the ETL half as a measurable, oracle-checked query. Synthesizes
  * 1M flow-log v2 lines deterministically from spark.range (closed-form
  * fields, so DuckDB can recompute the expected aggregate from
  * generate_series without ever seeing the pipeline), then runs the FULL
  * convert path — parse → partition key → partitionBy(account, dt)
  * parquet write (150 partitions) → read back — and returns one summary
  * row. This is the reference's entire Lambda workload
  * (`convert.go:41-95`) end-to-end, so BENCH_r{N}.json carries an ETL
  * throughput number alongside the query timings.
  */
object EtlBenchQuery {

  /** 1M lines by default; SPARK_GRAFT_ETL_ROWS overrides for scale-curve
    * measurements (the closed-form oracle below tracks the same value,
    * so correctness holds at any size).
    */
  val Rows: Long = sys.env.get("SPARK_GRAFT_ETL_ROWS") match {
    case None => 1000000L
    case Some(v) =>
      val n =
        try v.toLong
        catch {
          case _: NumberFormatException =>
            throw new IllegalArgumentException(
              s"SPARK_GRAFT_ETL_ROWS must be a positive integer, got '$v'"
            )
        }
      require(n > 0, s"SPARK_GRAFT_ETL_ROWS must be positive, got $n")
      n
  }
  private val Accounts = 5
  private val Days = 30
  private val BaseTs = 1700000000L // 2023-11-14T22:13:20Z

  /** Deterministic raw lines: every numeric field is a pure function of
    * the row id (kept in BIGINT range for the oracle's arithmetic).
    */
  def syntheticLines(spark: SparkSession): DataFrame =
    spark
      .range(0, Rows)
      .select(
        concat_ws(
          " ",
          lit("2"),
          format_string("%012d", col("id") % Accounts),
          concat(lit("eni-"), col("id") % 1000),
          // div, not `/`: Column./ is double division and would render
          // fractional octets like "1.171875" into the synthetic lines
          concat(lit("10.0."), col("id") % 256, lit("."), expr("(id div 256) % 256")),
          concat(lit("10.1."), (col("id") * 7) % 256, lit("."), (col("id") * 13) % 256),
          col("id") % 65536,
          (col("id") * 31) % 65536,
          when(col("id") % 2 === 0, 6).otherwise(17),
          col("id") % 1000,
          (col("id") * 7919) % 100000,
          // day = (id / Accounts) % Days, NOT id % Days: 5 divides 30, so
          // id%5 and id%30 are co-determined and would collapse the
          // partition space to 30 keys instead of Accounts × Days = 150
          lit(BaseTs) + expr(s"(id div $Accounts) % $Days") * 86400L,
          lit(BaseTs) + expr(s"(id div $Accounts) % $Days") * 86400L + 60L,
          lit("ACCEPT"),
          lit("OK")
        ).as("value")
      )

  /** Full pipeline; returns (n_rows, sum_bytes, n_partitions). The output
    * dir is suffixed with the Spark application id: two concurrent JVMs
    * running Bench/Verify must not overwrite each other's output mid-read.
    */
  def run(spark: SparkSession, sfDir: String): DataFrame = {
    val out = graft.TempDirs.deleteOnExit(
      new java.io.File(
        sys.props("java.io.tmpdir"),
        s"graft_etl_bench_${spark.sparkContext.applicationId}"
      ).getPath
    )
    val parsed = FlowLogParser.parse(syntheticLines(spark))
    // ConvertJob.writePartitioned: 1 file per (account, dt) instead of
    // #tasks × #keys small files (a 200k-row probe produced 960 files
    // with a naive write, #keys with the shared recipe)
    ConvertJob.writePartitioned(
      FlowLogParser.withPartitionKey(parsed.good).drop("ts"),
      out,
      SaveMode.Overwrite
    )
    ConvertJob
      .readConverted(spark, out)
      .agg(
        count(lit(1)).as("n_rows"),
        sum(col("bytes")).as("sum_bytes"),
        countDistinct(col("account"), col("dt")).as("n_partitions")
      )
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q00_etl_convert" -> run
  )

  /** Closed-form replay: DuckDB never parses a line — it recomputes the
    * field formulas over the same id range.
    */
  val oracleSql: Map[String, String] = Map(
    "q00_etl_convert" ->
      s"""WITH g AS (SELECT unnest(generate_series(0, ${Rows - 1})) AS id)
         |SELECT count(*) AS n_rows,
         |  CAST(sum((id * 7919) % 100000) AS BIGINT) AS sum_bytes,
         |  count(DISTINCT (id % $Accounts, (id // $Accounts) % $Days)) AS n_partitions
         |FROM g""".stripMargin
  )
}
