package graft.catalog

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** q101/q101b: schema evolution as driver-gated queries — the last
  * spec-only ETL capability put behind the DuckDB oracle. The domain
  * motivates it directly: AWS VPC Flow Logs v3–v5 add fields to the v2
  * record the reference hard-codes (`flowlog.go:14-29`), so a long-lived
  * store accretes parquet files with WIDER schemas over time, and a
  * 100 TB engine must read them as one table without rewriting history.
  *
  * The corpus is a fixed three-generation parquet directory, fully
  * closed-form (every field a function of the row id), built once into a
  * DETERMINISTIC tmp path (no app-id suffix — the oracle SQL embeds the
  * path and DuckDB reads the very same files after the Spark JVM exits;
  * creation is atomic-rename so concurrent JVMs cannot interleave):
  *
  *   g1: (id BIGINT, account STRING, bytes INT)            — the v2-era files
  *   g2: g1 + vpc_id STRING, bytes WIDENED to BIGINT       — values > 2^31
  *   g3: g2 + az_id STRING                                 — one more accretion
  *
  * q101 — the STEADY-STATE read ([[SchemaEvolution.readWithSchema]]):
  * the catalog-declared canonical (widest) schema over g1+g2, zero
  * footer sampling; the parquet reader itself upcasts g1's INT32 bytes
  * into the declared BIGINT column and nulls the missing vpc_id. g2's
  * bytes exceed Int.MaxValue, so a reader that silently truncated or
  * refused the widening cannot match the oracle.
  *
  * q101b — the DISCOVERY read ([[SchemaEvolution.discoverMerged]],
  * `mergeSchema`): footer-union over g2+g3 (same physical types,
  * different column sets — Spark's schema merge widens COLUMN SETS but
  * deliberately not physical types, which q101's declared-schema path
  * owns). Rows missing az_id surface as nulls.
  *
  * Both oracles read the SAME mixed directory via DuckDB
  * `read_parquet(..., union_by_name=true)` — an independent engine's
  * schema-evolution semantics over the identical bytes.
  */
object SchemaEvoGateQuery {

  private val GenRows = 30000L

  /** Canonical (widest) schema — in production this is catalog-owned
    * (the reference keeps its DDL in `template.yml`; ours in
    * `Partitions.createExternalTable`), never re-discovered per query.
    */
  private val Canonical: StructType =
    StructType.fromDDL("id BIGINT, account STRING, bytes BIGINT, vpc_id STRING")

  private def gen(s: SparkSession, from: Long, until: Long): DataFrame =
    s.range(from, until)
      .select(
        col("id"),
        concat(lit("acct-"), col("id") % 5).as("account"),
        ((col("id") * 31) % 10000).as("bytes")
      )

  /** The fixed mixed-schema corpus path (deterministic — shared by the
    * Spark queries and the embedded oracle SQL).
    */
  private def corpusDir: java.io.File =
    new java.io.File(sys.props("java.io.tmpdir"), "graft_schema_evo_v1")

  private def ensureCorpus(s: SparkSession): String = synchronized {
    val dir = corpusDir
    if (!dir.isDirectory) {
      // stage under an app-id name, then ATOMIC_MOVE into place: a
      // concurrent JVM either sees the complete directory or none — never
      // a half-written generation (the corpus is deterministic, so
      // whichever JVM wins the rename produced identical bytes)
      val stage = new java.io.File(
        dir.getParentFile,
        s"graft_schema_evo_stage_${s.sparkContext.applicationId}"
      )
      gen(s, 0, GenRows)
        .select(col("id"), col("account"), col("bytes").cast("int").as("bytes"))
        .coalesce(2)
        .write.mode("overwrite").parquet(new java.io.File(stage, "g1").getPath)
      gen(s, GenRows, 2 * GenRows)
        .select(
          col("id"),
          col("account"),
          (col("bytes") + 5000000000L).as("bytes"), // > 2^31: widening is real
          concat(lit("vpc-"), col("id") % 50).as("vpc_id")
        )
        .coalesce(2)
        .write.mode("overwrite").parquet(new java.io.File(stage, "g2").getPath)
      gen(s, 2 * GenRows, 3 * GenRows)
        .select(
          col("id"),
          col("account"),
          (col("bytes") + 5000000000L).as("bytes"),
          concat(lit("vpc-"), col("id") % 50).as("vpc_id"),
          concat(lit("az-"), col("id") % 3).as("az_id")
        )
        .coalesce(2)
        .write.mode("overwrite").parquet(new java.io.File(stage, "g3").getPath)
      try
        java.nio.file.Files.move(
          stage.toPath,
          dir.toPath,
          java.nio.file.StandardCopyOption.ATOMIC_MOVE
        )
      catch {
        case _: java.nio.file.FileAlreadyExistsException |
            _: java.nio.file.DirectoryNotEmptyException =>
          // another JVM won the race with identical content; drop ours
          try
            java.nio.file.Files
              .walk(stage.toPath)
              .sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
              .forEach(p => java.nio.file.Files.deleteIfExists(p))
          catch { case _: java.io.IOException => () }
      }
    }
    dir.getPath
  }

  private def q101(s: SparkSession, dir: String): DataFrame = {
    val base = ensureCorpus(s)
    SchemaEvolution
      .readWithSchema(s, Canonical, s"$base/g1", s"$base/g2")
      .groupBy("account")
      .agg(
        count(lit(1)).as("n_rows"),
        sum(col("bytes")).as("sum_bytes"),
        count(col("vpc_id")).as("n_vpc"),
        countDistinct(col("vpc_id")).as("n_vpc_distinct"),
        min(col("id")).as("min_id"),
        max(col("id")).as("max_id")
      )
      .orderBy("account")
  }

  private def q101b(s: SparkSession, dir: String): DataFrame = {
    val base = ensureCorpus(s)
    SchemaEvolution
      .discoverMerged(s, s"$base/g2", s"$base/g3")
      .groupBy("account")
      .agg(
        count(lit(1)).as("n_rows"),
        sum(col("bytes")).as("sum_bytes"),
        count(col("vpc_id")).as("n_vpc"),
        count(col("az_id")).as("n_az"),
        countDistinct(col("az_id")).as("n_az_distinct")
      )
      .orderBy("account")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q101_schema_evolution_read" -> q101,
    "q101b_schema_merge_discovery" -> q101b
  )

  // Embedded absolute paths: the corpus dir is deterministic and the
  // oracle runs on the same machine after Verify — DuckDB reads the very
  // files Spark read, with ITS schema-evolution semantics
  // (union_by_name promotes INT32→INT64 and nulls absent columns).
  val oracleSql: Map[String, String] = {
    val base = corpusDir.getPath
    Map(
      "q101_schema_evolution_read" ->
        s"""SELECT account,
           |  CAST(count(*) AS BIGINT) AS n_rows,
           |  CAST(sum(bytes) AS BIGINT) AS sum_bytes,
           |  CAST(count(vpc_id) AS BIGINT) AS n_vpc,
           |  CAST(count(DISTINCT vpc_id) AS BIGINT) AS n_vpc_distinct,
           |  min(id) AS min_id, max(id) AS max_id
           |FROM read_parquet(['$base/g1/*.parquet', '$base/g2/*.parquet'],
           |                  union_by_name=true)
           |GROUP BY account ORDER BY account""".stripMargin,
      "q101b_schema_merge_discovery" ->
        s"""SELECT account,
           |  CAST(count(*) AS BIGINT) AS n_rows,
           |  CAST(sum(bytes) AS BIGINT) AS sum_bytes,
           |  CAST(count(vpc_id) AS BIGINT) AS n_vpc,
           |  CAST(count(az_id) AS BIGINT) AS n_az,
           |  CAST(count(DISTINCT az_id) AS BIGINT) AS n_az_distinct
           |FROM read_parquet(['$base/g2/*.parquet', '$base/g3/*.parquet'],
           |                  union_by_name=true)
           |GROUP BY account ORDER BY account""".stripMargin
    )
  }
}
