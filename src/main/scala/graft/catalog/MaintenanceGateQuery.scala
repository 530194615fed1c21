package graft.catalog

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** q104: the partition-maintenance lifecycle as a driver-gated query —
  * retention, targeted deletion, and compaction applied to a real
  * partitioned store, with the survivors value-checked against a
  * closed-form oracle. Completes the Maintenance gate coverage (q76
  * gates upsert/MERGE; compaction, retention and the GDPR-style purge
  * were spec-only).
  *
  * Gate construction: a DEDICATED FlowLogCorpus store (the q01–q04
  * corpus converted into its own per-JVM directory — the ops below
  * mutate it, so it must not be the shared store) goes through the
  * lifecycle a production table lives:
  *
  *   1. external-table registration (`Partitions.createExternalTable`
  *      + `registerAll` — the reference's E12/E13 loop);
  *   2. RETENTION: `dropOlderThan(cutoff)` removes the 5 oldest days
  *      (catalog first, then directories — 35 of 140 partitions);
  *   3. TARGETED DELETE: `deleteWhere("bytes % 997 = 17")` purges
  *      scattered rows across every surviving partition (probe-then-
  *      rewrite, only matching partitions rewritten);
  *   4. COMPACTION: `compactPartition` on one surviving partition
  *      (row-preserving by contract).
  *
  * The result aggregates the SURVIVING store per account; the oracle
  * recomputes the same totals closed-form (corpus formulas + the
  * retention date filter + the delete predicate) — DuckDB never sees
  * the store or any maintenance step, so equality proves retention
  * dropped exactly the old days, the purge removed exactly the matching
  * rows (and kept NULL-predicate rows), and compaction lost nothing.
  * All-integer output.
  *
  * Ops run once per JVM (marker file); every op is also idempotent by
  * contract (re-running converges), which MaintenanceSpec pins
  * separately.
  */
object MaintenanceGateQuery {

  private val Cutoff = "2023-11-19" // drops day indexes 0-4 of the 20
  private val DeletePred = "bytes % 997 = 17"

  private def ensureLifecycle(s: SparkSession): String = synchronized {
    val loc = graft.TempDirs.deleteOnExit(
      new java.io.File(
        sys.props("java.io.tmpdir"),
        s"graft_maint_gate_${s.sparkContext.applicationId}"
      ).getPath
    )
    val marker = new java.io.File(loc, "_GRAFT_OPS_DONE")
    if (!marker.exists()) {
      graft.etl.FlowLogCorpus.convertTo(s, loc)
      val table = "graft_maint_gate"
      Partitions.createExternalTable(s, table, loc)
      Partitions.registerAll(s, table, loc)
      Maintenance.dropOlderThan(s, table, loc, Cutoff)
      Maintenance.deleteWhere(s, loc, DeletePred, Some(table))
      Maintenance.compactPartition(
        s,
        s"$loc/account=000000000000/dt=$Cutoff"
      )
      marker.createNewFile()
    }
    loc
  }

  private def q104(s: SparkSession, dir: String): DataFrame =
    graft.etl.ConvertJob
      .readConverted(s, ensureLifecycle(s))
      .groupBy("account")
      .agg(
        count(lit(1)).as("n_rows"),
        sum(col("bytes").cast("long")).as("sum_bytes"),
        count(when(col("action") === "REJECT", lit(1))).as("n_rejects"),
        countDistinct(col("dt")).as("n_partitions"),
        min(col("dt")).as("min_dt"),
        max(col("dt")).as("max_dt")
      )
      .orderBy("account")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q104_maintenance_lifecycle" -> q104
  )

  val oracleSql: Map[String, String] = Map(
    "q104_maintenance_lifecycle" ->
      s"""${graft.etl.FlowLogCorpus.oracleCte}
         |SELECT account,
         |  CAST(count(*) AS BIGINT) AS n_rows,
         |  CAST(sum(bytes) AS BIGINT) AS sum_bytes,
         |  CAST(count(CASE WHEN action = 'REJECT' THEN 1 END) AS BIGINT)
         |    AS n_rejects,
         |  CAST(count(DISTINCT dt) AS BIGINT) AS n_partitions,
         |  min(dt) AS min_dt, max(dt) AS max_dt
         |FROM f
         |WHERE dt >= '$Cutoff' AND NOT ($DeletePred)
         |GROUP BY account ORDER BY account""".stripMargin
  )
}
