package graft.catalog

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** q140: materialized-view query rewrite, driver-gated — the query
  * addresses the BASE store; `RewriteAggregateToSummary` (injected via
  * `GraftExtensions`) redirects the plan to the q103-maintained
  * partials table, so the executed aggregate scans |partitions| summary
  * rows instead of the full store. The oracle recomputes the totals
  * closed-form from the corpus formulas (`FlowLogCorpus.oracleCte`) —
  * DuckDB never sees store or summary — so a green gate proves the
  * rewrite is value-preserving end-to-end (partials build + algebraic
  * re-aggregation + exprId-preserving substitution). MvRewriteSpec pins
  * the MECHANISM: the executed plan scans the summary path (not the
  * base), the disabled-conf control scans the base, and both agree.
  *
  * The gate builds its own DEDICATED base copy of the 150k-line corpus
  * (one convert per JVM) rather than registering the shared q01–q04
  * store: registration is global to the session, and silently rewriting
  * OTHER gates' plans — even value-identically — would make their
  * measured plans lie.
  */
object MvGateQuery {

  /** Build base + summary once per JVM, register the MV. */
  private def ensure(s: SparkSession): String = synchronized {
    val root = new java.io.File(
      sys.props("java.io.tmpdir"),
      s"graft_mv_${s.sparkContext.applicationId}"
    )
    val base = new java.io.File(root, "base").getPath
    val summary = new java.io.File(root, "summary").getPath
    if (!new java.io.File(root, "_READY").exists()) {
      graft.TempDirs.deleteOnExit(root.getPath)
      graft.etl.FlowLogCorpus.convertTo(s, base)
      IncrementalAgg
        .partials(graft.etl.ConvertJob.readConverted(s, base))
        .coalesce(1)
        .write
        .mode("overwrite")
        .parquet(summary)
      graft.plans.MvRegistry.register(s, base, summary)
      new java.io.File(root, "_READY").createNewFile()
    }
    base
  }

  /** The gated frame — exposed for MvRewriteSpec's plan pins. Spelled
    * against the BASE store on purpose; the optimizer substitutes the
    * summary.
    */
  def q140(s: SparkSession, dir: String): DataFrame = {
    val base = ensure(s)
    graft.etl.ConvertJob
      .readConverted(s, base)
      .groupBy(col("account"))
      .agg(
        count(lit(1)).as("n_rows"),
        sum(col("bytes").cast("long")).as("sum_bytes"),
        sum(col("packets").cast("long")).as("sum_packets")
      )
      .orderBy("account")
  }

  /** q140b: the widened rewrite surface in one gate — a partition-key
    * WHERE below the aggregate (transplanted onto the summary, pruning
    * it the same way) plus min/max/avg/count(col) over both measure
    * columns. Still spelled against the BASE; the optimizer substitutes
    * the summary (MvRewriteSpec pins the plan shape + the disabled
    * control). avg is rewritten to Σsum-partials/Σcount-partials —
    * Average's own evaluate expression over exact long totals.
    */
  def q140b(s: SparkSession, dir: String): DataFrame = {
    val base = ensure(s)
    graft.etl.ConvertJob
      .readConverted(s, base)
      .filter(col("dt") >= "2023-11-24")
      .groupBy(col("account"))
      .agg(
        min(col("bytes")).as("min_bytes"),
        max(col("bytes")).as("max_bytes"),
        avg(col("bytes")).as("avg_bytes"),
        min(col("packets")).as("min_packets"),
        max(col("packets")).as("max_packets"),
        count(col("packets")).as("n_packets"),
        count(lit(1)).as("n_rows")
      )
      .orderBy("account")
  }

  /** q140c: the GLOBAL (no GROUP BY) rollup — the "how big is the
    * store" query every dashboard opens with, rewritten to a
    * |partitions|-row summary scan; counts coalesce to 0 so an empty
    * base and an empty summary agree (the one global-case mismatch).
    */
  def q140c(s: SparkSession, dir: String): DataFrame = {
    val base = ensure(s)
    graft.etl.ConvertJob
      .readConverted(s, base)
      .filter(col("dt") >= "2023-11-24")
      .agg(
        count(lit(1)).as("n_rows"),
        sum(col("bytes").cast("long")).as("sum_bytes"),
        min(col("bytes")).as("min_bytes"),
        max(col("bytes")).as("max_bytes"),
        avg(col("packets")).as("avg_packets")
      )
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q140_mv_rewrite" -> q140,
    "q140b_mv_rewrite_minmaxavg" -> q140b,
    "q140c_mv_rewrite_global" -> q140c
  )

  // Closed-form corpus replay per account — independent of store,
  // summary, and rewrite alike.
  val oracleSql: Map[String, String] = Map(
    "q140_mv_rewrite" ->
      s"""${graft.etl.FlowLogCorpus.oracleCte}
         |SELECT account,
         |  CAST(count(*) AS BIGINT) AS n_rows,
         |  CAST(sum(bytes) AS BIGINT) AS sum_bytes,
         |  CAST(sum(packets) AS BIGINT) AS sum_packets
         |FROM f GROUP BY account ORDER BY account""".stripMargin,
    // avg spelled as exact-sum-then-one-divide so both engines round
    // identically (DuckDB sums integers exactly in hugeint; Spark's
    // rewrite sums exactly in long — each casts once and divides once)
    "q140b_mv_rewrite_minmaxavg" ->
      s"""${graft.etl.FlowLogCorpus.oracleCte}
         |SELECT account,
         |  min(bytes) AS min_bytes,
         |  max(bytes) AS max_bytes,
         |  CAST(sum(bytes) AS DOUBLE) / CAST(count(bytes) AS DOUBLE)
         |    AS avg_bytes,
         |  min(packets) AS min_packets,
         |  max(packets) AS max_packets,
         |  CAST(count(packets) AS BIGINT) AS n_packets,
         |  CAST(count(*) AS BIGINT) AS n_rows
         |FROM f WHERE dt >= '2023-11-24'
         |GROUP BY account ORDER BY account""".stripMargin,
    "q140c_mv_rewrite_global" ->
      s"""${graft.etl.FlowLogCorpus.oracleCte}
         |SELECT
         |  CAST(count(*) AS BIGINT) AS n_rows,
         |  CAST(sum(bytes) AS BIGINT) AS sum_bytes,
         |  min(bytes) AS min_bytes,
         |  max(bytes) AS max_bytes,
         |  CAST(sum(packets) AS DOUBLE) / CAST(count(packets) AS DOUBLE)
         |    AS avg_packets
         |FROM f WHERE dt >= '2023-11-24'""".stripMargin
  )
}
