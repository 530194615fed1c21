package graft.etl

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** q133: the Avro source/sink as a driver-gated query — the fourth wire
  * format after JSONL (q60), CSV (q66), and ORC (q74), through the
  * repo's own DataSource V2 connector (`sources/GraftAvro.scala`; the
  * distro has Avro's core library but not the `spark-avro` module, and
  * the build has no dependency egress).
  *
  * Gate construction (the q74 pattern): the documents corpus is pushed
  * through a full graft-avro write → read round trip (once per JVM,
  * app-id-keyed tmpdir), then aggregated per language INCLUDING an
  * exact md5-prefix content digest of every text. DuckDB cannot read
  * Avro (no extension offline) — so the oracle computes the SAME
  * aggregates from the original parquet table: the two agree iff the
  * Avro round trip preserved every row, every string byte, and every
  * numeric value across the connector's record encode/decode, snappy
  * blocks, temp-file commit protocol, and union-null handling.
  * AvroSourceSpec additionally pins the on-disk format (a foreign
  * plain-Avro reader decodes the files), truncate/overwrite semantics,
  * and the null/binary/timestamp type lattice.
  *
  * Scale shape: one partitioned write + one scan (a read partition per
  * container file) + one partial-aggregated groupBy on a
  * low-cardinality key; the digest is an exact-integer sum (md5-prefix
  * mod P — commutative, no float, no order sensitivity).
  */
object AvroGateQuery {

  private val ModP = 1000003L

  private def avroDir(spark: SparkSession, sfDir: String): String =
    synchronized {
      val dir = new java.io.File(
        sys.props("java.io.tmpdir"),
        s"graft_avro_gate_${spark.sparkContext.applicationId}_" +
          sfDir.replaceAll("[^a-zA-Z0-9.]", "_")
      ).getPath
      if (!new java.io.File(dir, "_SUCCESS").exists())
        graft.queries.Tables
          .table(spark, sfDir, "documents")
          .write
          // class-name resolution: works even when the services file is
          // not on a stripped classpath (the shortName "graft-avro" is
          // registered too, for interactive use)
          .format(classOf[graft.sources.AvroDataSource].getName)
          .mode(SaveMode.Overwrite)
          .save(dir)
      graft.TempDirs.deleteOnExit(dir)
    }

  private def q133(spark: SparkSession, sfDir: String): DataFrame =
    spark.read
      .format(classOf[graft.sources.AvroDataSource].getName)
      .load(avroDir(spark, sfDir))
      .groupBy("lang")
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_chars")).as("sum_chars"),
        sum(graft.llm.Winnowing.md5Long(col("text")) % ModP).as("text_digest"),
        min(col("doc_id")).as("min_id"),
        max(col("doc_id")).as("max_id")
      )
      .orderBy("lang")

  /** q133b: predicate pushdown through the connector — the read carries
    * a doc_id range filter that the scan evaluates against the per-file
    * min/max sidecar (`_stats.tsv`, written by the connector's own
    * commit). The gate's write range-partitions on doc_id so files hold
    * DISJOINT id ranges and the filter provably skips most of them
    * (AvroSourceSpec pins the planned-partition count, DppSpec-style;
    * this gate pins the VALUES through the skipping read — equality
    * with the parquet oracle proves a skipped file never hid a matching
    * row and a kept file decoded exactly).
    */
  private def avroRangedDir(spark: SparkSession, sfDir: String): String =
    synchronized {
      val dir = new java.io.File(
        sys.props("java.io.tmpdir"),
        s"graft_avro_gate_ranged_${spark.sparkContext.applicationId}_" +
          sfDir.replaceAll("[^a-zA-Z0-9.]", "_")
      ).getPath
      if (!new java.io.File(dir, "_SUCCESS").exists())
        graft.queries.Tables
          .table(spark, sfDir, "documents")
          .repartitionByRange(8, col("doc_id"))
          .write
          .format(classOf[graft.sources.AvroDataSource].getName)
          .mode(SaveMode.Overwrite)
          .save(dir)
      graft.TempDirs.deleteOnExit(dir)
    }

  private def q133b(spark: SparkSession, sfDir: String): DataFrame =
    spark.read
      .format(classOf[graft.sources.AvroDataSource].getName)
      .load(avroRangedDir(spark, sfDir))
      .filter(col("doc_id") >= 100 && col("doc_id") < 200)
      .groupBy("lang")
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_chars")).as("sum_chars"),
        sum(graft.llm.Winnowing.md5Long(col("text")) % ModP).as("text_digest"),
        min(col("doc_id")).as("min_id"),
        max(col("doc_id")).as("max_id")
      )
      .orderBy("lang")

  /** q133c: METADATA-ONLY aggregates through the connector — the global
    * MIN/MAX/COUNT(*) opener answered from the stats sidecar alone
    * (`SupportsPushDownAggregates`, complete pushdown: the executed
    * plan is a Project over the one-row BatchScan, no aggregate node,
    * no container block decoded — AvroSourceSpec pins both, including
    * the corrupted-data-files proof). Equality with the parquet oracle
    * proves the sidecar's mins/maxes/row-counts are exact, not
    * advisory.
    */
  private def q133c(spark: SparkSession, sfDir: String): DataFrame =
    spark.read
      .format(classOf[graft.sources.AvroDataSource].getName)
      .load(avroDir(spark, sfDir))
      .agg(
        count(lit(1)).as("n_docs"),
        min(col("doc_id")).as("min_id"),
        max(col("doc_id")).as("max_id"),
        min(col("lang")).as("min_lang"),
        max(col("lang")).as("max_lang"),
        min(col("n_chars")).as("min_chars"),
        max(col("n_chars")).as("max_chars")
      )

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q133_avro_roundtrip" -> q133,
    "q133b_avro_filter_skip" -> q133b,
    "q133c_avro_agg_pushdown" -> q133c
  )

  // The oracle reads the ORIGINAL parquet — equality proves the Spark
  // side's Avro write→read round trip byte-preserved the corpus.
  val oracleSql: Map[String, String] = Map(
    "q133_avro_roundtrip" ->
      s"""SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
         |  CAST(sum(n_chars) AS BIGINT) AS sum_chars,
         |  CAST(sum(CAST('0x' || substr(md5(text), 1, 15) AS BIGINT) % $ModP)
         |       AS BIGINT) AS text_digest,
         |  min(doc_id) AS min_id, max(doc_id) AS max_id
         |FROM documents GROUP BY lang ORDER BY lang""".stripMargin,
    "q133b_avro_filter_skip" ->
      s"""SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
         |  CAST(sum(n_chars) AS BIGINT) AS sum_chars,
         |  CAST(sum(CAST('0x' || substr(md5(text), 1, 15) AS BIGINT) % $ModP)
         |       AS BIGINT) AS text_digest,
         |  min(doc_id) AS min_id, max(doc_id) AS max_id
         |FROM documents WHERE doc_id >= 100 AND doc_id < 200
         |GROUP BY lang ORDER BY lang""".stripMargin,
    "q133c_avro_agg_pushdown" ->
      """SELECT CAST(count(*) AS BIGINT) AS n_docs,
        |  min(doc_id) AS min_id, max(doc_id) AS max_id,
        |  min(lang) AS min_lang, max(lang) AS max_lang,
        |  min(n_chars) AS min_chars, max(n_chars) AS max_chars
        |FROM documents""".stripMargin
  )
}
