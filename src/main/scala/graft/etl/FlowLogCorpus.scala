package graft.etl

import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic synthetic flow-log corpus backing the q01–q04 flow
  * queries — the queries closest to the reference's actual product
  * (its Athena examples, reference `README.md` query section), so they
  * get the strongest check we have: every field is a closed-form
  * function of the row id, letting the DuckDB oracle recompute the
  * expected GOOD rows from `generate_series` without ever seeing the
  * pipeline, while the Spark side runs the id-range through the FULL
  * parse → partition-key → partitioned-write → read-back ETL. Any
  * corruption anywhere in that path diverges from the oracle.
  *
  * The corpus embeds the reference's edge cases (FIXTURES.md §1):
  *   - a header line (skipped, `flowlog.go:42-44`);
  *   - NODATA rows (id % 97 == 0): `-` in addr/port/proto/packets/bytes
  *     /action — lenient casts must yield 0, strings stay `-`
  *     (`flowlog.go:59-90`);
  *   - bad-version rows (id % 50 == 49): version 3, quarantined
  *     (`flowlog.go:46-48`);
  *   - bad-arity rows (id % 101 == 100): 13 tokens, quarantined
  *     (`flowlog.go:37-40`).
  */
object FlowLogCorpus {

  val Rows = 150000L
  val Accounts = 7
  val Days = 20 // Accounts × Days = 140 partitions
  val BaseTs = 1700000000L // 2023-11-14T22:13:20Z (UTC session pinned)
  val BaseDate = "2023-11-14"

  /** Raw text lines (column `value`), header first. */
  def lines(spark: SparkSession): DataFrame = lines(spark, Rows)

  /** The same closed-form corpus over an arbitrary id range —
    * StreamingBench's big-file amortization mode scales the line count
    * to S3-object size (10⁵–10⁶ lines/file) without touching the
    * oracle-pinned 150k default (every field formula is id-pure, so the
    * partition fan-out stays Accounts × Days at any n).
    */
  def lines(spark: SparkSession, n: Long): DataFrame = {
    val id = col("id")
    val nd = id % 97 === 0
    def dash(c: Column): Column = when(nd, lit("-")).otherwise(c)
    val start = lit(BaseTs) + expr(s"(id div $Accounts) % $Days") * 86400L

    val tokens: Seq[Column] = Seq(
      when(id % 50 === 49, "3").otherwise("2"),
      format_string("%012d", id % Accounts),
      concat(lit("eni-"), id % 500),
      dash(concat(lit("10.0."), id % 256, lit("."), expr("(id div 256) % 256"))),
      dash(concat(lit("10.1."), (id * 7) % 256, lit("."), (id * 13) % 256)),
      dash((id % 65536).cast("string")),
      dash(((id * 31) % 65536).cast("string")),
      dash(when(id % 2 === 0, "6").otherwise("17")),
      dash((id % 1000).cast("string")),
      dash(((id * 7919) % 100000).cast("string")),
      start.cast("string"),
      (start + 60L).cast("string"),
      dash(when(id % 3 === 0, "REJECT").otherwise("ACCEPT")),
      when(nd, "NODATA").otherwise("OK")
    )
    val full = concat_ws(" ", tokens: _*)
    val short = concat_ws(" ", tokens.dropRight(1): _*) // arity 13

    val header = spark
      .range(1)
      .select(
        lit(
          "version account-id interface-id srcaddr dstaddr srcport dstport " +
            "protocol packets bytes start end action log-status"
        ).as("value")
      )
    header.union(
      spark
        .range(0, n)
        .select(when(id % 101 === 100, short).otherwise(full).as("value"))
    )
  }

  /** Run the corpus through the full convert path into `out` (Hive
    * account=/dt= layout, one file per partition — same write shape as
    * ConvertJob.convert / EtlBenchQuery).
    */
  def convertTo(spark: SparkSession, out: String): Unit = {
    val parsed = FlowLogParser.parse(lines(spark))
    ConvertJob.writePartitioned(
      FlowLogParser.withPartitionKey(parsed.good).drop("ts"),
      out,
      SaveMode.Overwrite
    )
  }

  /** DuckDB CTE reproducing the GOOD (non-quarantined) rows closed-form;
    * oracle queries select from `f`. Column types are pinned to the
    * parquet schema (bytes/packets INT32, ports INT32).
    */
  val oracleCte: String =
    s"""WITH g AS (SELECT unnest(generate_series(0, ${Rows - 1})) AS id),
       |f AS (SELECT
       |  CASE WHEN id % 97 = 0 THEN '-'
       |       ELSE '10.0.' || (id % 256) || '.' || ((id // 256) % 256) END AS srcaddr,
       |  CASE WHEN id % 97 = 0 THEN '-'
       |       ELSE '10.1.' || ((id * 7) % 256) || '.' || ((id * 13) % 256) END AS dstaddr,
       |  CAST(CASE WHEN id % 97 = 0 THEN 0 ELSE (id * 7919) % 100000 END AS INTEGER) AS bytes,
       |  CAST(CASE WHEN id % 97 = 0 THEN 0 ELSE id % 1000 END AS INTEGER) AS packets,
       |  CASE WHEN id % 97 = 0 THEN '-'
       |       WHEN id % 3 = 0 THEN 'REJECT' ELSE 'ACCEPT' END AS action,
       |  lpad(CAST(id % $Accounts AS VARCHAR), 12, '0') AS account,
       |  strftime(DATE '$BaseDate' + CAST((id // $Accounts) % $Days AS INTEGER), '%Y-%m-%d') AS dt
       |FROM g WHERE id % 50 <> 49 AND id % 101 <> 100)""".stripMargin
}
