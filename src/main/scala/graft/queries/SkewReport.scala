package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** q98: join-key skew diagnostics — the report an operator consults
  * BEFORE running a big join: per join side, the key-frequency shape
  * (row count, distinct keys, heaviest-key frequency, skew factor =
  * max_freq / mean_freq) and the top-5 heaviest keys. Skew factor ≫ 1
  * on a join side is the signal that routes a query to the
  * `SaltedJoin` kit (or AQE skew-join) instead of a plain shuffle join
  * — this query is that kit's gated diagnostic sibling.
  *
  * Scale shape: one per-key count aggregate per side (map-side
  * combined, the only corpus-sized shuffles), a 2-row stats aggregate,
  * and a top-5-per-side rank that compiles to WindowGroupLimit
  * (per-partition heaps — no full key-frequency sort). The skew factor
  * is the exact integer ratio max·n_keys/n_rows evaluated as ONE float
  * division under the round-4 grid, so no engine can disagree.
  */
object SkewReport {

  private val TopK = 5

  private def q98(s: SparkSession, dir: String): DataFrame = {
    def side(name: String, df: DataFrame): DataFrame =
      df.groupBy("k")
        .agg(count(lit(1)).as("cnt"))
        .withColumn("side", lit(name))
    val counts = side(
      "lineitem",
      Tables.table(s, dir, "lineitem").select(col("l_orderkey").as("k"))
    ).unionByName(
      side("orders", Tables.table(s, dir, "orders").select(col("o_custkey").as("k")))
    )
    val stats = counts
      .groupBy("side")
      .agg(
        sum("cnt").as("n_rows"),
        count(lit(1)).as("n_keys"),
        max("cnt").as("max_freq")
      )
      .withColumn(
        "skew",
        round(
          (col("max_freq") * col("n_keys")).cast("double") / col("n_rows").cast("double"),
          4
        ) + 0.0
      )
    val w = Window.partitionBy("side").orderBy(desc("cnt"), col("k"))
    counts
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= TopK)
      .join(broadcast(stats), "side")
      .select(
        col("side"),
        col("rank"),
        col("k").as("key"),
        col("cnt"),
        col("n_rows"),
        col("n_keys"),
        col("max_freq"),
        col("skew")
      )
      .orderBy("side", "rank")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q98_skew_report" -> q98
  )

  val oracleSql: Map[String, String] = Map(
    "q98_skew_report" ->
      s"""WITH counts AS (
         |  SELECT 'lineitem' AS side, l_orderkey AS k,
         |    CAST(count(*) AS BIGINT) AS cnt
         |  FROM lineitem GROUP BY 2
         |  UNION ALL
         |  SELECT 'orders', o_custkey, CAST(count(*) AS BIGINT)
         |  FROM orders GROUP BY 2),
         |stats AS (
         |  SELECT side,
         |    CAST(sum(cnt) AS BIGINT) AS n_rows,
         |    CAST(count(*) AS BIGINT) AS n_keys,
         |    CAST(max(cnt) AS BIGINT) AS max_freq
         |  FROM counts GROUP BY 1),
         |ranked AS (
         |  SELECT side, k, cnt,
         |    CAST(row_number() OVER (PARTITION BY side
         |                            ORDER BY cnt DESC, k) AS INT) AS rank
         |  FROM counts)
         |SELECT r.side, r.rank, r.k AS key, r.cnt, s.n_rows, s.n_keys,
         |  s.max_freq,
         |  round(CAST(s.max_freq * s.n_keys AS DOUBLE)
         |        / CAST(s.n_rows AS DOUBLE), 4) + 0.0 AS skew
         |FROM ranked r JOIN stats s USING (side)
         |WHERE r.rank <= $TopK
         |ORDER BY r.side, r.rank""".stripMargin
  )
}
