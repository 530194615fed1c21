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

  /** Union schema of the files under `paths`, discovered from footers.
    * Widens COLUMN SETS only — Spark's schema merge deliberately refuses
    * physical-type widening (INT32 vs INT64 throws CANNOT_MERGE_SCHEMAS);
    * that case is [[readWithSchema]]'s, where the declared type drives
    * the reader's upcast.
    */
  def discoverMerged(spark: SparkSession, paths: String*): DataFrame =
    spark.read.option("mergeSchema", "true").parquet(paths: _*)

  /** Steady-state read under the declared canonical schema: no footer
    * sampling; columns absent in older files come back null, and
    * narrower physical types (INT32 under a declared BIGINT) upcast in
    * the parquet reader itself.
    */
  def readWithSchema(
      spark: SparkSession,
      canonical: StructType,
      paths: String*
  ): DataFrame =
    spark.read.schema(canonical).parquet(paths: _*)

  /** Name-based union of frames carrying different schema generations;
    * columns missing on one side become nulls there.
    */
  def unionEvolved(dfs: Seq[DataFrame]): DataFrame = {
    require(dfs.nonEmpty, "nothing to union")
    dfs.reduce(_.unionByName(_, allowMissingColumns = true))
  }
}
