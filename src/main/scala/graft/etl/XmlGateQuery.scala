package graft.etl

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** q260: the XML source/sink as a driver-gated query — the fifth wire
  * format after JSONL (q60), CSV (q66), ORC (q74), and Avro (q133),
  * exercising Spark 4's NATIVE XML datasource (the spark-xml package
  * folded into spark-sql as of 4.0). Reference scope: the reference
  * writes parquet only (`parquet.go:18-55`); XML is the format a
  * consumer ingesting B2B/enterprise feeds (the dominant XML habitat)
  * asks for.
  *
  * Gate construction (the q74 pattern): the documents corpus is pushed
  * through a full XML write → XML read round trip (once per JVM,
  * app-id-keyed tmpdir), then aggregated per language INCLUDING an
  * exact md5-prefix content digest of every text. DuckDB cannot read
  * XML — the oracle computes the SAME aggregates from the original
  * parquet table: the two agree iff the XML round trip preserved every
  * row, every string byte (through XML entity escaping of &, <, >, and
  * quotes — the encoding layer this gate uniquely exercises), and
  * every numeric value. `ignoreSurroundingSpaces=false` pins
  * byte-level whitespace fidelity; the read supplies the explicit
  * schema, so no inference step can drift types.
  *
  * Scale shape: one write + one scan + one partial-aggregated groupBy
  * on a low-cardinality key; the digest is an exact-integer sum
  * (md5-prefix mod P — commutative, no float, no order sensitivity).
  */
object XmlGateQuery {

  private val ModP = 1000003L

  private val schema = StructType(
    Seq(
      StructField("doc_id", LongType),
      StructField("text", StringType),
      StructField("lang", StringType),
      StructField("source", StringType),
      StructField("n_chars", LongType)
    )
  )

  private def xmlDir(spark: SparkSession, sfDir: String): String =
    synchronized {
      val dir = new java.io.File(
        sys.props("java.io.tmpdir"),
        s"graft_xml_gate_${spark.sparkContext.applicationId}_" +
          sfDir.replaceAll("[^a-zA-Z0-9.]", "_")
      ).getPath
      if (!new java.io.File(dir, "_SUCCESS").exists())
        graft.queries.Tables
          .table(spark, sfDir, "documents")
          .write
          .mode(SaveMode.Overwrite)
          .option("rootTag", "docs")
          .option("rowTag", "doc")
          .format("xml")
          .save(dir)
      graft.TempDirs.deleteOnExit(dir)
    }

  private def q260(spark: SparkSession, sfDir: String): DataFrame =
    spark.read
      .schema(schema)
      .option("rowTag", "doc")
      .option("ignoreSurroundingSpaces", "false")
      .format("xml")
      .load(xmlDir(spark, sfDir))
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
    "q260_xml_roundtrip" -> q260
  )

  // The oracle reads the ORIGINAL parquet — equality proves the Spark
  // side's XML write→read round trip byte-preserved the corpus
  // through entity escaping.
  val oracleSql: Map[String, String] = Map(
    "q260_xml_roundtrip" ->
      s"""SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
         |  CAST(sum(n_chars) AS BIGINT) AS sum_chars,
         |  CAST(sum(CAST('0x' || substr(md5(text), 1, 15) AS BIGINT) % $ModP)
         |       AS BIGINT) AS text_digest,
         |  min(doc_id) AS min_id, max(doc_id) AS max_id
         |FROM documents GROUP BY lang ORDER BY lang""".stripMargin
  )
}
