package graft.catalog

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** q103: incremental aggregate maintenance as a driver-gated query —
  * the last spec-only catalog capability put behind the DuckDB oracle
  * (the q89/q101 pattern). The reference re-registers partitions after
  * every conversion (`main.go:169-177`); [[IncrementalAgg]] is the
  * summary-maintenance counterpart: keep a per-(account, dt) partials
  * table current by recomputing ONLY newly-arrived partitions, never a
  * history rescan.
  *
  * Gate construction: the 150k-line FlowLogCorpus store (closed-form,
  * built once per JVM by the q01–q04 machinery) has its summary built
  * INCREMENTALLY — first wave of partitions, then the rest, then a
  * REPLAYED refresh of an already-summarized slice (the idempotent
  * convergence case, exercised inside the gate, not just the spec) —
  * and the resulting summary is rolled up per account. The oracle
  * recomputes the same totals closed-form from the corpus formulas
  * (FlowLogCorpus.oracleCte): equality proves the partials, the
  * anti-join merge, the crash-safe swap publish, and the replay
  * convergence all preserved every row of every partition. Algebraic
  * partials make the rollup exact integers — zero float surface.
  *
  * Scale shape: the summary is catalog-sized (one row per partition);
  * each update scans only the named partitions (directory-pruned,
  * IncrementalAggSpec pins the scan metric) and broadcasts only the
  * caller's partition list.
  */
object IncrementalGateQuery {

  private def q103(s: SparkSession, dir: String): DataFrame = {
    val base = graft.queries.Tables.flowlogsPath(s)
    val summary = graft.TempDirs.deleteOnExit(
      new java.io.File(
        sys.props("java.io.tmpdir"),
        s"graft_incr_summary_${s.sparkContext.applicationId}"
      ).getPath
    )
    // the partition list is catalog-sized by contract (7 accounts ×
    // 20 days = 140 here) — the same driver-side bound
    // Partitions.registerAll documents
    val parts = graft.etl.ConvertJob
      .readConverted(s, base)
      .select("account", "dt")
      .distinct()
      .collect()
      .map(r => (r.getString(0), r.getString(1)))
      .sortBy(identity)
      .toSeq
    val (wave1, wave2) = parts.splitAt(parts.size / 2)
    IncrementalAgg.update(s, base, summary, wave1)
    IncrementalAgg.update(s, base, summary, wave2)
    // replayed refresh of an already-summarized slice: must converge,
    // not double-count
    IncrementalAgg.update(s, base, summary, wave1.take(10))
    s.read
      .parquet(summary)
      .groupBy("account")
      .agg(
        sum(col("n_rows")).as("n_rows"),
        sum(col("sum_bytes")).as("sum_bytes"),
        sum(col("sum_packets")).as("sum_packets"),
        sum(col("n_rejects")).as("n_rejects"),
        count(lit(1)).as("n_partitions")
      )
      .orderBy("account")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q103_incremental_summary" -> q103
  )

  // Closed-form replay: DuckDB recomputes the per-account totals from
  // the corpus formulas — it never sees the store, the summary, or any
  // update wave, so equality proves the whole maintenance path.
  val oracleSql: Map[String, String] = Map(
    "q103_incremental_summary" ->
      s"""${graft.etl.FlowLogCorpus.oracleCte}
         |SELECT account,
         |  CAST(count(*) AS BIGINT) AS n_rows,
         |  CAST(sum(bytes) AS BIGINT) AS sum_bytes,
         |  CAST(sum(packets) AS BIGINT) AS sum_packets,
         |  CAST(count(CASE WHEN action = 'REJECT' THEN 1 END) AS BIGINT)
         |    AS n_rejects,
         |  CAST(count(DISTINCT dt) AS BIGINT) AS n_partitions
         |FROM f GROUP BY account ORDER BY account""".stripMargin
  )
}
