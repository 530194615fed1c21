package graft

import org.apache.spark.sql.functions._

/** Pins for q141 (llm/Pii): counts equal the closed-form injection
  * formulas, and redaction is COMPLETE — re-scanning the redacted text
  * finds zero residual matches for any pattern (the property a scrub
  * stage exists to guarantee, which count-equality alone can't prove).
  */
class PiiSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("q141 counts match the injection formulas; redaction leaves no residual PII") {
    val rows = SparkEntry
      .queries("q141_pii_redaction")(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.nonEmpty)
    rows.foreach { case (id, ne, ni, np) =>
      // the real corpus text carries no PII of its own (verified by the
      // exact equalities here — a stray match would break one)
      assert(ne == (if (id % 3 == 0) 1L else 0L), s"doc $id emails")
      assert(ni == (if (id % 5 == 0) 1L else 0L), s"doc $id ips")
      assert(np == (if (id % 7 == 0) 1L else 0L), s"doc $id phones")
    }
    // completeness: rebuild the redacted text exactly as the query does
    // and re-scan it with all three patterns
    val t = queries.Tables
      .table(spark, sf, "documents")
      .select(
        col("doc_id"),
        concat(
          col("text"),
          when(col("doc_id") % 3 === 0, concat(lit(" contact user"), col("doc_id"), lit("@example.com"))).otherwise(lit("")),
          when(col("doc_id") % 5 === 0, concat(lit(" ip=10."), col("doc_id") % 256, lit("."), (col("doc_id") * 7) % 256, lit("."), col("doc_id") % 100)).otherwise(lit("")),
          when(col("doc_id") % 7 === 0, concat(lit(" call +1-555-"), lpad((col("doc_id") % 10000).cast("string"), 4, "0"))).otherwise(lit(""))
        ).as("t")
      )
    val residual = t
      .select(
        regexp_replace(
          regexp_replace(
            regexp_replace(col("t"), graft.llm.Pii.EmailRe, "[EMAIL]"),
            graft.llm.Pii.Ipv4Re,
            "[IP]"
          ),
          graft.llm.Pii.PhoneRe,
          "[PHONE]"
        ).as("red")
      )
      .filter(
        regexp_count(col("red"), lit(graft.llm.Pii.EmailRe)) > 0 ||
          regexp_count(col("red"), lit(graft.llm.Pii.Ipv4Re)) > 0 ||
          regexp_count(col("red"), lit(graft.llm.Pii.PhoneRe)) > 0
      )
      .count()
    assert(residual == 0, s"$residual docs still carry PII after redaction")
  }

  test("q142 domain report matches the injection formulas; blocklist verdicts exact") {
    val ids = queries.Tables
      .table(spark, sf, "documents")
      .select("doc_id")
      .collect()
      .map(_.getLong(0))
    val rows = SparkEntry
      .queries("q142_url_domains")(spark, sf)
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getBoolean(3))))
      .toMap
    // expected: site{k}.example.org for even k (only even doc_ids carry
    // URLs), blocked{j}.bad.net for j = doc_id % 3 of doc_id % 11 == 0
    val content = ids.filter(_ % 2 == 0).groupBy(id => s"site${id % 20}.example.org")
    val blocked = ids.filter(_ % 11 == 0).groupBy(id => s"blocked${id % 3}.bad.net")
    assert(rows.keySet == content.keySet ++ blocked.keySet)
    content.foreach { case (d, ms) =>
      assert(rows(d) == ((ms.length.toLong, ms.distinct.length.toLong, false)), d)
    }
    blocked.foreach { case (d, ms) =>
      assert(rows(d) == ((ms.length.toLong, ms.distinct.length.toLong, true)), d)
    }
    // the real corpus text carries no URLs of its own (set equality
    // above would break on a stray extraction)
  }
}
