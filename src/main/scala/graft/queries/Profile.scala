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

  /** q96b: per-group feature scaling — the standard ML feature-prep
    * transforms (z-score and min-max normalization) computed per
    * stratum (l_returnflag), the step that turns raw fact columns into
    * model inputs without leaking cross-group statistics.
    *
    * Scale shape: ONE hash aggregate produces the per-group stats frame
    * (3 rows), broadcast back onto the fact scan; the normalization
    * itself is a map-side projection — the corpus is touched twice
    * (stats + transform) and shuffled zero times beyond the tiny stats
    * aggregate, the textbook alternative to a per-group window (which
    * would sort the full fact table for the same numbers).
    *
    * Float parity: mean/stddev are order-dependent float aggregates, so
    * they are gridded round(·, 6) BEFORE entering the formulas (their
    * ulp-level cross-engine drift is ~1e-9 here, far under the grid);
    * min/max are exact; the outputs carry the family's round(·, 4)+0.0
    * grid with formula operand order spelled identically in the oracle.
    */
  private def q96b(s: SparkSession, dir: String): DataFrame = {
    val li = Tables
      .table(s, dir, "lineitem")
      .filter(col("l_orderkey") < 2000)
      .select(
        col("l_orderkey"),
        col("l_linenumber"),
        col("l_returnflag"),
        col("l_extendedprice").as("x")
      )
    val stats = li
      .groupBy("l_returnflag")
      .agg(
        (round(avg(col("x")), 6) + 0.0).as("mu"),
        (round(stddev_samp(col("x")), 6) + 0.0).as("sigma"),
        min(col("x")).as("lo"),
        max(col("x")).as("hi")
      )
    // degenerate groups are NULL by construction on BOTH engines: a
    // single-row group has sigma NULL (stddev_samp) and hi = lo, a
    // constant-valued group has sigma 0 — and Spark's non-ANSI /0 → NULL
    // while DuckDB's IEEE float /0 → ±inf/NaN would diverge the gate, so
    // both denominators go through nullif(·, 0) here and in the oracle
    li.join(broadcast(stats), "l_returnflag")
      .select(
        col("l_orderkey"),
        col("l_linenumber"),
        col("l_returnflag"),
        col("x"),
        (round(
          (col("x") - col("mu")) / nullif(col("sigma"), lit(0.0)),
          4
        ) + 0.0).as("zscore"),
        (round(
          (col("x") - col("lo")) / nullif(col("hi") - col("lo"), lit(0.0)),
          4
        ) + 0.0).as("minmax")
      )
      .orderBy("l_orderkey", "l_linenumber")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q96_data_profile" -> q96,
    "q96b_feature_scale" -> q96b
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
        |ORDER BY b."column"""".stripMargin,
    "q96b_feature_scale" ->
      """WITH li AS (
        |  SELECT l_orderkey, l_linenumber, l_returnflag, l_extendedprice AS x
        |  FROM lineitem WHERE l_orderkey < 2000),
        |stats AS (
        |  SELECT l_returnflag,
        |    round(avg(x), 6) + 0.0 AS mu,
        |    round(stddev_samp(x), 6) + 0.0 AS sigma,
        |    min(x) AS lo, max(x) AS hi
        |  FROM li GROUP BY 1)
        |SELECT l_orderkey, l_linenumber, l_returnflag, x,
        |  round((x - mu) / nullif(sigma, 0.0), 4) + 0.0 AS zscore,
        |  round((x - lo) / nullif(hi - lo, 0.0), 4) + 0.0 AS minmax
        |FROM li JOIN stats USING (l_returnflag)
        |ORDER BY l_orderkey, l_linenumber""".stripMargin
  )
}
