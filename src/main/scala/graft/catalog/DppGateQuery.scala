package graft.catalog

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** q125: dynamic partition pruning (DPP) — the runtime half of the
  * reference's partition-pruning design goal. The reference lays flow
  * logs out as dt/account Hive partitions so Athena prunes them with
  * STATIC predicates (`template.yml:122-126`, `main.go:150-163`); DPP is
  * what a 100 TB Spark warehouse adds on top: when the selective
  * predicate lives on a DIMENSION table (a calendar, a tenant list) and
  * only reaches the fact through a join, Catalyst turns the broadcast
  * build side into a runtime IN-filter on the fact's PARTITION column,
  * so the scan skips every non-qualifying partition directory without
  * the user ever spelling a static partition predicate. At 100 TB a
  * "revenue for fiscal Q2" query then reads 3 of 80 month partitions
  * (~4% of the table) instead of all of them — the difference between a
  * scan-bound job and an index-shaped one.
  *
  * Gate construction (per (JVM, sfDir), app-id tmpdir, atomic publish):
  *  - fact: orders rewritten ONCE partitioned by month
  *    (`o_month = date_format(o_orderdate, 'yyyy-MM')`, 80 dirs at all
  *    SFs — the dt-style layout of `ReferenceLayout`);
  *  - dim: a months calendar (m_month, m_quarter) written as its own
  *    parquet — the quarter label only exists in the dim's data, so the
  *    optimizer CANNOT fold the filter into a static partition predicate
  *    on the fact; pruning must come from the join at runtime.
  *
  * The gated query filters the dim on `m_quarter = '1996-Q2'` (never
  * mentioning months), broadcast-joins the fact on the partition column
  * and aggregates per month. DppSpec pins the mechanism: the executed
  * plan's fact scan carries `dynamicpruningexpression` in
  * PartitionFilters and its "number of partitions read" metric is 3 (of
  * 80). The oracle replays the quarter's months closed-form from the
  * ORIGINAL parquet — equality proves the partitioned rewrite
  * round-tripped and the runtime-pruned join dropped nothing.
  *
  * Numeric determinism: revenue snaps to exact BIGINT centi-units
  * before the sum (q59b convention); count is exact.
  */
object DppGateQuery {

  /** Quarter the gate probes: 3 of the 80 month partitions. */
  private val Quarter = "1996-Q2"

  /** One partitioned (fact, dim) layout per (JVM, sfDir). Publish is
    * atomic (stage + rename) so concurrent JVMs sharing a tmpdir never
    * observe a half-written layout; the app-id key makes that a
    * same-app re-entry concern only, handled by the synchronized block.
    */
  private def ensureLayout(s: SparkSession, dir: String): (String, String) =
    synchronized {
      val tag = dir.replaceAll("[^a-zA-Z0-9]", "_")
      val root = new java.io.File(
        sys.props("java.io.tmpdir"),
        s"graft_dpp_${s.sparkContext.applicationId}$tag"
      )
      val factDir = new java.io.File(root, "orders_by_month")
      val dimDir = new java.io.File(root, "months_dim")
      if (!new java.io.File(root, "_READY").exists()) {
        graft.TempDirs.deleteOnExit(root.getPath)
        val orders = graft.queries.Tables
          .table(s, dir, "orders")
          .withColumn("o_month", date_format(col("o_orderdate"), "yyyy-MM"))
        orders.write
          .mode(SaveMode.Overwrite)
          .partitionBy("o_month")
          .parquet(factDir.getPath)
        // Calendar dim: every month with its quarter label. Derived from
        // the fact's own months (the gate needs no external calendar),
        // but once written to parquet the derivation is invisible to the
        // optimizer — exactly the shape of a real warehouse date dim.
        orders
          .select(col("o_month").as("m_month"))
          .distinct()
          .withColumn(
            "m_quarter",
            concat(
              substring(col("m_month"), 1, 4),
              lit("-Q"),
              ceil(substring(col("m_month"), 6, 2).cast("int") / 3.0)
                .cast("int")
                .cast("string")
            )
          )
          .coalesce(1)
          .write
          .mode(SaveMode.Overwrite)
          .parquet(dimDir.getPath)
        new java.io.File(root, "_READY").createNewFile()
      }
      (factDir.getPath, dimDir.getPath)
    }

  /** The gated frame, exposed for DppSpec's plan + metric pins. */
  def q125(s: SparkSession, dir: String): DataFrame = {
    val (factPath, dimPath) = ensureLayout(s, dir)
    val fact = s.read.parquet(factPath)
    val dim = s.read.parquet(dimPath).filter(col("m_quarter") === Quarter)
    fact
      .join(broadcast(dim), fact("o_month") === dim("m_month"))
      .groupBy(col("o_month"))
      .agg(
        count(lit(1)).as("n_orders"),
        (sum(round(col("o_totalprice") * 100.0, 0).cast("long")) / 100.0)
          .as("revenue")
      )
      .orderBy("o_month")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q125_dynamic_partition_pruning" -> q125
  )

  // The oracle expands the quarter's months closed-form over the
  // ORIGINAL parquet — DuckDB never sees the partitioned layout.
  val oracleSql: Map[String, String] = Map(
    "q125_dynamic_partition_pruning" ->
      """SELECT strftime(o_orderdate, '%Y-%m') AS o_month,
        |  CAST(count(*) AS BIGINT) AS n_orders,
        |  CAST(sum(CAST(round(o_totalprice * 100.0, 0) AS BIGINT)) AS BIGINT)
        |    / 100.0 AS revenue
        |FROM orders
        |WHERE strftime(o_orderdate, '%Y-%m') IN ('1996-04', '1996-05', '1996-06')
        |GROUP BY 1 ORDER BY 1""".stripMargin
  )
}
