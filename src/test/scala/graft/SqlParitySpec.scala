package graft

import graft.queries.Tables
import org.apache.spark.sql.DataFrame

/** Internal consistency of the SQL surface: for every oracle whose SQL is
  * engine-portable ANSI (no DuckDB-only functions), running that exact
  * SQL through spark.sql over registered views must reproduce the
  * DataFrame-API result. This is what an Athena-SQL user migrating to
  * the engine would run verbatim.
  */
class SqlParitySpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  // oracles using DuckDB-only constructs (list_*, time_bucket,
  // json_extract_string, string_split, generate_series, //, md5-int
  // casts, epoch_us, xor) are excluded — they exist precisely because
  // the Spark plan uses a different formulation
  private val portable = Seq(
    "q05_join_inner",
    "q07_join_multiway",
    "q08_join_left_outer",
    "q08b_join_right_outer",
    "q08c_join_full_outer",
    "q09_join_semi_anti",
    "q11_agg_having",
    "q12_distinct_agg",
    "q13_rollup",
    "q13b_cube",
    "q14_window_rank",
    "q14b_window_ranks_full",
    "q15_window_analytic",
    "q16_set_ops",
    "q16b_set_ops_all",
    "q21_correlated_subquery",
    "q38_stats_agg",
    "q40b_cond_bitwise_aggs",
    "q41b_date_arithmetic",
    "q45_conditional_fns"
    // q39 excluded: DuckDB spells interpolated percentiles quantile_cont,
    // Spark spells them percentile
  )

  private def rowsSortedByColumn(df: DataFrame): Seq[Seq[Any]] = {
    val order = df.columns.zipWithIndex.sortBy(_._1).map(_._2).toSeq
    df.collect().toSeq.map(r => order.map(i => r.get(i)))
  }

  test("portable oracle SQL reproduces the DataFrame results via spark.sql") {
    Seq("region", "nation", "customer", "supplier", "part", "orders", "lineitem", "events")
      .foreach { t =>
        Tables.table(spark, sf, t).createOrReplaceTempView(t)
      }
    portable.foreach { name =>
      val viaSql = rowsSortedByColumn(spark.sql(SparkEntry.oracleSql(name)))
      val viaApi = rowsSortedByColumn(SparkEntry.queries(name)(spark, sf))
      assert(viaSql == viaApi, s"$name: SQL and DataFrame results differ")
    }
  }
}
