package graft.catalog

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Schema evolution for an append-only partitioned store. The domain
  * motivates it directly: AWS VPC Flow Logs v3–v5 add fields (vpc-id,
  * subnet-id, tcp-flags, …) to the v2 record the reference hard-codes
  * (`flowlog.go:14-29`), so a long-lived table accretes files with
  * WIDER schemas over time — and a 100 TB engine must read them as one
  * table without rewriting history.
  *
  * Two reads, two costs:
  *  - [[discoverMerged]] (`mergeSchema`): Spark unions the schemas of
  *    the footers it samples. Correct, but it is a DISCOVERY operation —
  *    at production file counts the footer pass is real I/O, and the
  *    result depends on what exists today. Use it to learn the current
  *    union schema, not on every query.
  *  - [[readWithSchema]]: the steady-state read — the canonical (widest)
  *    schema is declared, zero footer sampling, files missing a column
  *    yield nulls from the parquet reader itself. The catalog owns the
  *    canonical schema (the reference keeps its DDL in `template.yml`;
  *    ours in `Partitions.createExternalTable`), so reads are
  *    reproducible no matter which files a scan happens to touch.
  *
  * Frame-level evolution (joining results computed against different
  * schema versions) is `unionByName(allowMissingColumns = true)` —
  * position-based `union` silently mismatches reordered columns.
  */
object SchemaEvolution {

  /** Union schema of the files under `path`, discovered from footers. */
  def discoverMerged(spark: SparkSession, path: String): DataFrame =
    spark.read.option("mergeSchema", "true").parquet(path)

  /** Steady-state read under the declared canonical schema: no footer
    * sampling; columns absent in older files come back null.
    */
  def readWithSchema(
      spark: SparkSession,
      path: String,
      canonical: StructType
  ): DataFrame =
    spark.read.schema(canonical).parquet(path)

  /** Name-based union of frames carrying different schema generations;
    * columns missing on one side become nulls there.
    */
  def unionEvolved(dfs: Seq[DataFrame]): DataFrame = {
    require(dfs.nonEmpty, "nothing to union")
    dfs.reduce(_.unionByName(_, allowMissingColumns = true))
  }
}
