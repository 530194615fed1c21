package graft.catalog

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** q134: snapshot / time-travel reads as a driver-gated query — the
  * lakehouse capability completing the catalog family (q101 evolves the
  * schema through time; q134 reads the DATA through time).
  *
  * Gate construction: a DEDICATED FlowLogCorpus store (per-JVM dir; the
  * ops mutate it) goes through two versioned mutations:
  *
  *   1. v1 — `Snapshots.dropOlderThanVersioned(cutoff)`: retention
  *      retires the 5 oldest days' partitions into the history area;
  *   2. v2 — `Snapshots.deleteWhereVersioned(bytes % 991 = 23)`: a
  *      targeted purge rewrites every surviving partition that matches,
  *      retaining each replaced generation.
  *
  * The result then time-travels to ALL THREE states — `readAt(0)` (the
  * untouched corpus), `readAt(1)` (post-retention), `readAt(2)` (the
  * live present) — and aggregates each into one row. The oracle
  * recomputes every state closed-form from the corpus CTE (no filter /
  * the dt filter / dt + NOT-predicate): equality proves the manifest
  * chose the right generation for every partition at every version, the
  * retained files still hold the exact pre-mutation rows AFTER later
  * mutations ran, and the live read is unpolluted by history.
  * SnapshotsSpec additionally pins physical byte-stability, the
  * timestamp→version resolution rule, the crash-window fallback, and
  * vacuum's loud failure.
  *
  * All-integer output; n_partitions counts (account, dt) pairs.
  */
object SnapshotGateQuery {

  private val Cutoff = "2023-11-19" // retires day indexes 0-4 of the 20
  private val DeletePred = "bytes % 991 = 23"

  private def ensureVersions(s: SparkSession): String = synchronized {
    val loc = graft.TempDirs.deleteOnExit(
      new java.io.File(
        sys.props("java.io.tmpdir"),
        s"graft_snapshot_gate_${s.sparkContext.applicationId}"
      ).getPath
    )
    val marker = new java.io.File(loc, "_GRAFT_OPS_DONE")
    if (!marker.exists()) {
      graft.etl.FlowLogCorpus.convertTo(s, loc)
      val v1 = Snapshots.dropOlderThanVersioned(s, loc, Cutoff)
      val v2 = Snapshots.deleteWhereVersioned(s, loc, DeletePred)
      require(v1 == 1 && v2 == 2, s"unexpected versions: $v1, $v2")
      marker.createNewFile()
    }
    loc
  }

  private def stateRow(s: SparkSession, loc: String, v: Int): DataFrame =
    Snapshots
      .readAt(s, loc, v)
      .agg(
        count(lit(1)).as("n_rows"),
        sum(col("bytes").cast("long")).as("sum_bytes"),
        countDistinct(col("account")).as("n_accounts"),
        countDistinct(concat_ws("/", col("account"), col("dt"))).as("n_partitions"),
        min(col("dt")).as("min_dt"),
        max(col("dt")).as("max_dt")
      )
      .select(lit(s"v$v").as("snapshot"), col("*"))

  private def q134(s: SparkSession, dir: String): DataFrame = {
    val loc = ensureVersions(s)
    stateRow(s, loc, 0)
      .unionByName(stateRow(s, loc, 1))
      .unionByName(stateRow(s, loc, 2))
      .orderBy("snapshot")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q134_snapshot_time_travel" -> q134
  )

  val oracleSql: Map[String, String] = {
    def state(tag: String, where: String): String =
      s"""SELECT '$tag' AS snapshot,
         |  CAST(count(*) AS BIGINT) AS n_rows,
         |  CAST(sum(bytes) AS BIGINT) AS sum_bytes,
         |  CAST(count(DISTINCT account) AS BIGINT) AS n_accounts,
         |  CAST(count(DISTINCT account || '/' || dt) AS BIGINT) AS n_partitions,
         |  min(dt) AS min_dt, max(dt) AS max_dt
         |FROM f $where""".stripMargin
    Map(
      "q134_snapshot_time_travel" ->
        s"""${graft.etl.FlowLogCorpus.oracleCte}
           |SELECT * FROM (
           |${state("v0", "")}
           |UNION ALL
           |${state("v1", s"WHERE dt >= '$Cutoff'")}
           |UNION ALL
           |${state("v2", s"WHERE dt >= '$Cutoff' AND NOT ($DeletePred)")}
           |) ORDER BY snapshot""".stripMargin
    )
  }
}
