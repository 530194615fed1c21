package graft.llm

import graft.queries.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** q141: PII detection + redaction — the scrubbing stage every
  * training-data curation pipeline runs before anything leaves the raw
  * zone: count and mask emails, IPv4 addresses, and phone numbers per
  * document, emitting per-type counts and a digest of the redacted
  * text (the digest makes the gate sensitive to every replaced BYTE,
  * not just the counts).
  *
  * Corpus: the real `documents` table, with PII injected IN-PLAN by
  * closed-form doc_id formulas (every 3rd doc an email, every 5th an
  * IPv4, every 7th a phone) — the q60/q66 synthesis discipline, except
  * nothing is written: both engines derive the identical text from the
  * same table + the same formulas, so the oracle replays injection,
  * detection, and redaction end-to-end.
  *
  * Regex parity: the patterns use only constructs Java regex and RE2
  * (DuckDB) interpret identically — ASCII classes, bounded repetition,
  * `\b` word boundaries, no lookaround, no backreferences. Replacement
  * tokens contain no digits or `@`, so redaction order cannot create
  * or destroy later matches. Redaction replaces ALL occurrences on
  * both engines (Spark regexp_replace is global; DuckDB gets the 'g'
  * flag).
  *
  * Scale shape: a pure map-side projection — regex scans are
  * per-row, no shuffle, no UDF (regexp_count / regexp_replace are
  * codegen'd); at 100 TB this runs at scan speed alongside the other
  * single-pass text-quality stages (q32/q33).
  */
object Pii {

  private[graft] val EmailRe = """[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"""
  private[graft] val Ipv4Re = """\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"""
  private[graft] val PhoneRe = """\+1-555-\d{4}"""

  private def q141(s: SparkSession, dir: String): DataFrame = {
    val t = Tables
      .table(s, dir, "documents")
      .select(
        col("doc_id"),
        concat(
          col("text"),
          when(
            col("doc_id") % 3 === 0,
            concat(lit(" contact user"), col("doc_id"), lit("@example.com"))
          ).otherwise(lit("")),
          when(
            col("doc_id") % 5 === 0,
            concat(
              lit(" ip=10."),
              col("doc_id") % 256,
              lit("."),
              (col("doc_id") * 7) % 256,
              lit("."),
              col("doc_id") % 100
            )
          ).otherwise(lit("")),
          when(
            col("doc_id") % 7 === 0,
            concat(lit(" call +1-555-"), lpad((col("doc_id") % 10000).cast("string"), 4, "0"))
          ).otherwise(lit(""))
        ).as("t")
      )
    t.select(
      col("doc_id"),
      regexp_count(col("t"), lit(EmailRe)).cast("long").as("n_email"),
      regexp_count(col("t"), lit(Ipv4Re)).cast("long").as("n_ipv4"),
      regexp_count(col("t"), lit(PhoneRe)).cast("long").as("n_phone"),
      md5(
        regexp_replace(
          regexp_replace(
            regexp_replace(col("t"), EmailRe, "[EMAIL]"),
            Ipv4Re,
            "[IP]"
          ),
          PhoneRe,
          "[PHONE]"
        )
      ).as("red_digest")
    ).orderBy("doc_id")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q141_pii_redaction" -> q141
  )

  val oracleSql: Map[String, String] = Map(
    "q141_pii_redaction" ->
      s"""WITH t AS (
         |  SELECT doc_id, text ||
         |    CASE WHEN doc_id % 3 = 0
         |         THEN ' contact user' || doc_id || '@example.com' ELSE '' END ||
         |    CASE WHEN doc_id % 5 = 0
         |         THEN ' ip=10.' || (doc_id % 256) || '.' || ((doc_id * 7) % 256)
         |              || '.' || (doc_id % 100) ELSE '' END ||
         |    CASE WHEN doc_id % 7 = 0
         |         THEN ' call +1-555-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
         |         ELSE '' END AS t
         |  FROM documents)
         |SELECT doc_id,
         |  CAST(len(regexp_extract_all(t, '$EmailRe')) AS BIGINT) AS n_email,
         |  CAST(len(regexp_extract_all(t, '$Ipv4Re')) AS BIGINT) AS n_ipv4,
         |  CAST(len(regexp_extract_all(t, '$PhoneRe')) AS BIGINT) AS n_phone,
         |  md5(regexp_replace(regexp_replace(regexp_replace(t,
         |    '$EmailRe', '[EMAIL]', 'g'),
         |    '$Ipv4Re', '[IP]', 'g'),
         |    '$PhoneRe', '[PHONE]', 'g')) AS red_digest
         |FROM t ORDER BY doc_id""".stripMargin
  )
}
