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

  // ------------------------------- q142: URL extraction / domain report

  private[graft] val UrlRe = """https?://([A-Za-z0-9.-]+)(/[^ ]*)?"""

  /** q142: URL → domain curation report — the web-pipeline stage between
    * raw text and a domain-level keep/drop policy (the CommonCrawl-style
    * blocklist filter, the per-domain cap q77 consumes): extract every
    * URL, reduce to its domain, and report per-domain URL/document
    * counts with the blocklist verdict materialized as a column (the
    * decision a downstream anti-join applies). URLs are injected
    * in-plan by closed-form doc_id formulas (the q141 discipline) —
    * every 2nd doc a content URL over 20 rotating domains, every 11th a
    * blocklisted one — so both engines derive identical text. The
    * extraction regex stays in the Java∩RE2 subset and the domain is
    * capture group 1 of regexp_extract_all on both engines.
    *
    * Scale shape: map-side extraction + explode (bounded by URLs per
    * doc), one (domain)-keyed hash aggregate with map-side combine —
    * the same single-pass profile as every text-quality stage; the
    * blocklist membership is a pure column predicate here (a real
    * deployment broadcast-joins its blocklist dim; the verdict column
    * and the plan shape are identical).
    */
  private def q142(s: SparkSession, dir: String): DataFrame = {
    val t = Tables
      .table(s, dir, "documents")
      .select(
        col("doc_id"),
        concat(
          col("text"),
          when(
            col("doc_id") % 2 === 0,
            concat(
              lit(" see https://site"),
              col("doc_id") % 20,
              lit(".example.org/p/"),
              col("doc_id")
            )
          ).otherwise(lit("")),
          when(
            col("doc_id") % 11 === 0,
            concat(lit(" ref http://blocked"), col("doc_id") % 3, lit(".bad.net/x"))
          ).otherwise(lit(""))
        ).as("t")
      )
    t.select(
      col("doc_id"),
      explode(regexp_extract_all(col("t"), lit(UrlRe), lit(1))).as("domain")
    ).groupBy("domain")
      .agg(
        count(lit(1)).as("n_urls"),
        count_distinct(col("doc_id")).as("n_docs"),
        max(col("domain").endsWith(".bad.net").cast("int")).cast("boolean").as("blocked")
      )
      .orderBy("domain")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q141_pii_redaction" -> q141,
    "q142_url_domains" -> q142
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
         |FROM t ORDER BY doc_id""".stripMargin,
    "q142_url_domains" ->
      s"""WITH t AS (
         |  SELECT doc_id, text ||
         |    CASE WHEN doc_id % 2 = 0
         |         THEN ' see https://site' || (doc_id % 20) || '.example.org/p/' || doc_id
         |         ELSE '' END ||
         |    CASE WHEN doc_id % 11 = 0
         |         THEN ' ref http://blocked' || (doc_id % 3) || '.bad.net/x' ELSE '' END AS t
         |  FROM documents),
         |u AS (
         |  SELECT doc_id, unnest(regexp_extract_all(t, '$UrlRe', 1)) AS domain FROM t)
         |SELECT domain,
         |  CAST(count(*) AS BIGINT) AS n_urls,
         |  CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
         |  max(CASE WHEN domain LIKE '%.bad.net' THEN 1 ELSE 0 END) = 1 AS blocked
         |FROM u GROUP BY domain ORDER BY domain""".stripMargin
  )
}
