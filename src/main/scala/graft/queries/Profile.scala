package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** q96: table profiling — the per-column data-quality report every
  * large-scale pipeline runs before training on a new drop (the
  * Deequ/TFDV-style summary): row count, null count, distinct count,
  * min/max, and the modal value with its frequency, one output row per
  * profiled column.
  *
  * Reference scope: none (extension surface; the reference's only
  * statistics are the partition-level row counts of E13).
  *
  * Scale shape: the naive spelling is one aggregation pass PER COLUMN
  * (N corpus scans, N shuffles). This is the melt shape instead: ONE
  * Generate explodes each row into (column, value-as-string) pairs,
  * ONE hash aggregate reduces them to (column, value, cnt) — the only
  * corpus-sized shuffle, map-side-combined, keyed by (column, value)
  * so it spreads over the cluster regardless of column count — and
  * everything downstream (per-column rollup + modal argmax) runs on
  * the tiny distinct-value frame. Adding a column to the profile adds
  * zero shuffles. The modal tie-break is deterministic: min_by over
  * (−cnt, value) picks the lexicographically smallest value among the
  * most frequent.
  *
  * Parity notes: profiled values are strings BY CONSTRUCTION — ids
  * cast from BIGINT and dates cast DATE→VARCHAR render identically on
  * both engines; doubles are deliberately NOT string-cast (float
  * formatting is engine-specific), which is why o_totalprice is not in
  * the list. NULLs group into one (column, NULL) count row: they feed
  * n_null, and min/max/distinct/top all ignore them (both engines'
  * aggregate semantics).
  */
object Profile {

  /** (output name, profiled expression) — expressions must be
    * engine-portable when cast to string (no raw doubles/timestamps).
    */
  private def profiledCols: Seq[(String, Column)] = Seq(
    "o_orderstatus" -> col("o_orderstatus"),
    "o_orderpriority" -> col("o_orderpriority"),
    "o_custkey" -> col("o_custkey").cast("string"),
    "o_orderdate" -> col("o_orderdate").cast("date").cast("string"),
    // a null-rich derived column so the null accounting is exercised
    "o_status_nonopen" -> nullif(col("o_orderstatus"), lit("O"))
  )

  private def q96(s: SparkSession, dir: String): DataFrame = {
    val entries = profiledCols.map { case (n, c) =>
      struct(lit(n).as("column"), c.cast("string").as("v"))
    }
    val counts = Tables
      .table(s, dir, "orders")
      .select(explode(array(entries: _*)).as("cv"))
      .select(col("cv.column").as("column"), col("cv.v").as("v"))
      .groupBy("column", "v")
      .agg(count(lit(1)).as("cnt"))
    val base = counts
      .groupBy("column")
      .agg(
        sum("cnt").as("n_rows"),
        coalesce(sum(when(col("v").isNull, col("cnt"))), lit(0L)).as("n_null"),
        count(when(col("v").isNotNull, lit(1))).as("n_distinct"),
        min("v").as("min_v"),
        max("v").as("max_v")
      )
    val top = counts
      .filter(col("v").isNotNull)
      .groupBy("column")
      .agg(
        min_by(struct(col("v"), col("cnt")), struct(-col("cnt"), col("v"))).as("t")
      )
      .select(col("column"), col("t.v").as("top_v"), col("t.cnt").as("top_n"))
    base
      .join(broadcast(top), "column")
      .select(
        col("column"),
        col("n_rows"),
        col("n_null"),
        col("n_distinct"),
        col("min_v"),
        col("max_v"),
        col("top_v"),
        col("top_n")
      )
      .orderBy("column")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q96_data_profile" -> q96
  )

  val oracleSql: Map[String, String] = Map(
    // the oracle replays the same melt via UNION ALL (clarity over
    // scalability — it runs on the sf0.01 sample)
    "q96_data_profile" ->
      """WITH m AS (
        |  SELECT 'o_orderstatus' AS "column", o_orderstatus AS v FROM orders
        |  UNION ALL
        |  SELECT 'o_orderpriority', o_orderpriority FROM orders
        |  UNION ALL
        |  SELECT 'o_custkey', CAST(o_custkey AS VARCHAR) FROM orders
        |  UNION ALL
        |  SELECT 'o_orderdate', CAST(CAST(o_orderdate AS DATE) AS VARCHAR)
        |  FROM orders
        |  UNION ALL
        |  SELECT 'o_status_nonopen', nullif(o_orderstatus, 'O') FROM orders),
        |counts AS (
        |  SELECT "column", v, CAST(count(*) AS BIGINT) AS cnt
        |  FROM m GROUP BY 1, 2),
        |base AS (
        |  SELECT "column",
        |    CAST(sum(cnt) AS BIGINT) AS n_rows,
        |    CAST(coalesce(sum(CASE WHEN v IS NULL THEN cnt END), 0) AS BIGINT)
        |      AS n_null,
        |    CAST(count(CASE WHEN v IS NOT NULL THEN 1 END) AS BIGINT)
        |      AS n_distinct,
        |    min(v) AS min_v, max(v) AS max_v
        |  FROM counts GROUP BY 1),
        |ranked AS (
        |  SELECT "column", v, cnt,
        |    row_number() OVER (PARTITION BY "column"
        |                       ORDER BY cnt DESC, v) AS rn
        |  FROM counts WHERE v IS NOT NULL)
        |SELECT b."column", n_rows, n_null, n_distinct, min_v, max_v,
        |  r.v AS top_v, r.cnt AS top_n
        |FROM base b JOIN ranked r ON r."column" = b."column" AND r.rn = 1
        |ORDER BY b."column"""".stripMargin
  )
}
