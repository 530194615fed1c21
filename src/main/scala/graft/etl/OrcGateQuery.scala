package graft.etl

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** q74: the ORC source/sink as a driver-gated query — the third wire
  * format after JSONL (q60) and CSV (q66), and the second COLUMNAR one
  * after the parquet everything else reads. Reference scope: the
  * reference writes parquet only (`parquet.go:18-55`); ORC is the
  * format a consumer migrating between warehouse stacks asks for.
  *
  * Gate construction: the documents corpus is pushed through a full
  * Spark ORC write → ORC read round trip (once per JVM, app-id-keyed
  * tmpdir), then aggregated per language INCLUDING an exact md5-prefix
  * content digest of every text. DuckDB cannot read ORC — so the oracle
  * computes the SAME aggregates from the original parquet table: the
  * two agree iff the ORC round trip preserved every row, every string
  * byte, and every numeric value. Any corruption, row loss, or
  * encoding fault in either direction of the ORC path diverges the
  * digest sum; types (strings, longs) cross ORC's dictionary/RLE
  * encodings untouched.
  *
  * Scale shape: one partitioned write + one scan + one
  * partial-aggregated groupBy on a low-cardinality key; the digest is
  * an exact-integer sum (md5-prefix mod P — commutative, no float, no
  * order sensitivity).
  */
object OrcGateQuery {

  private val ModP = 1000003L

  private def orcDir(spark: SparkSession, sfDir: String): String =
    synchronized {
      val dir = new java.io.File(
        sys.props("java.io.tmpdir"),
        s"graft_orc_gate_${spark.sparkContext.applicationId}_" +
          sfDir.replaceAll("[^a-zA-Z0-9.]", "_")
      ).getPath
      if (!new java.io.File(dir, "_SUCCESS").exists())
        graft.queries.Tables
          .table(spark, sfDir, "documents")
          .write
          .mode(SaveMode.Overwrite)
          .orc(dir)
      graft.TempDirs.deleteOnExit(dir)
    }

  private def q74(spark: SparkSession, sfDir: String): DataFrame =
    spark.read
      .orc(orcDir(spark, sfDir))
      .groupBy("lang")
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_chars")).as("sum_chars"),
        sum(graft.llm.Winnowing.md5Long(col("text")) % ModP).as("text_digest"),
        min(col("doc_id")).as("min_id"),
        max(col("doc_id")).as("max_id")
      )
      .orderBy("lang")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q74_orc_roundtrip" -> q74
  )

  // The oracle reads the ORIGINAL parquet — equality proves the Spark
  // side's ORC write→read round trip byte-preserved the corpus.
  val oracleSql: Map[String, String] = Map(
    "q74_orc_roundtrip" ->
      s"""SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
         |  CAST(sum(n_chars) AS BIGINT) AS sum_chars,
         |  CAST(sum(CAST('0x' || substr(md5(text), 1, 15) AS BIGINT) % $ModP)
         |       AS BIGINT) AS text_digest,
         |  min(doc_id) AS min_id, max(doc_id) AS max_id
         |FROM documents GROUP BY lang ORDER BY lang""".stripMargin
  )
}
